"""CLI: train the 512->16 linear feature codec (reference
``train_compression_encoder_decoder.py``): CLIP text embeddings of a
label vocabulary (ADE20K-150 by default), reconstruction MSE + latent
cosine-preservation loss, Adam."""

from __future__ import annotations

import os

import numpy as np


def main(
    output: str = "./results/encoder_decoder.npz",
    labels_csv: str = "./objectInfo150.csv",
    embeddings_npz: str = "",
    clip_ckpt: str = "",
    bpe_path: str = "",
    d_lat: int = 16,
    steps: int = 100_000,
    lr: float = 1e-4,
):
    """Embeddings come from (in priority order): a precomputed .npz
    (key 'embeddings'), or CLIP text encoding of the CSV vocabulary
    (requires the converted text tower + BPE file)."""
    from tpugs.codec.linear import save_codec, train_codec

    if embeddings_npz:
        emb = np.load(embeddings_npz)["embeddings"]
    else:
        if not os.path.exists(labels_csv):
            raise FileNotFoundError(
                f"{labels_csv} not found — download objectInfo150.csv from "
                "CSAILVision/sceneparsing (reference instructions), or pass "
                "--embeddings-npz."
            )
        import csv

        labels = []
        with open(labels_csv) as fh:
            for row in csv.DictReader(fh):
                labels.extend(row["Name"].split(";"))
        from tpugs.encoders.lseg import encode_text

        emb = np.asarray(
            encode_text(labels, ckpt=clip_ckpt or None, bpe_path=bpe_path or None)
        )

    codec, loss = train_codec(emb, d_lat=d_lat, steps=steps, lr=lr,
                              log_every=1000)
    os.makedirs(os.path.dirname(output) or ".", exist_ok=True)
    save_codec(codec, output)
    print(f"Saved codec to {output} (final loss {loss:.6f})")
    return codec


if __name__ == "__main__":
    from tpugs.utils.cli import cli

    cli(main)
