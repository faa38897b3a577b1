from tpugs.encoders.base import (  # noqa: F401
    FeatureEncoder,
    GrayscaleEncoder,
    LinearRGBEncoder,
    PatchAverageEncoder,
)


def get_encoder(name: str, ckpt: str | None = None) -> FeatureEncoder:
    """Encoder registry: grayscale | linear[:D] | lseg | dino."""
    if name == "grayscale":
        return GrayscaleEncoder()
    if name.startswith("linear"):
        dim = int(name.split(":")[1]) if ":" in name else 16
        return LinearRGBEncoder(feature_dim=dim)
    if name == "lseg":
        from tpugs.encoders.lseg import LSegEncoder

        return LSegEncoder(ckpt)
    if name == "dino":
        from tpugs.encoders.dino import DinoEncoder

        return DinoEncoder(ckpt)
    raise ValueError(f"unknown encoder {name!r}")
