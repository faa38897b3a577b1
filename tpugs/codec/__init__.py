from tpugs.codec.linear import LinearCodec, train_codec  # noqa: F401
