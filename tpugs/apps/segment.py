"""CLI: open-vocabulary 3D segmentation + scene editing + GIF outputs.

Covers the reference's ``segment.py``, ``segment_compressed.py``
(``--compressed`` loads the 16-d latent field and projects text queries
through the codec encoder, reference ``segment_compressed.py:73-74``)
and ``segment_f3dgs.py`` (--f3dgs uses the trained latent field @ conv).

Counterpart of the reference ``segment.py:261-311``: load + prune +
verify, load lifted features, build a text-query 3D mask, emit
mask-overlay / extracted / deleted GIFs, optionally export edited
checkpoints.

Text queries need a CLIP text tower; with the ``linear``/``grayscale``
synthetic encoders, queries are supplied as exemplar Gaussian indices
(``--pos-idx`` / ``--neg-idx``) instead of prompts.
"""

from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp


def main(
    data_dir: str = "./data/garden",
    checkpoint: str = "./data/garden/ckpts/ckpt_29999_rank0.pt",
    results_dir: str = "./results/garden",
    format: str = "gsplat",
    prompt: str = "Table",
    neg_prompt: str = "Vase;Other",
    pos_idx: str = "",
    neg_idx: str = "",
    data_factor: int = 4,
    feature: str = "lseg",
    f3dgs: bool = False,
    compressed: bool = False,
    codec_path: str = "./results/encoder_decoder.npz",
    export_checkpoint: bool = False,
    skip_prune: bool = False,
):
    from tpugs.io.checkpoints import load_checkpoint, save_checkpoint
    from tpugs.lift.prune import prune_by_gradients, verify_pruning_equivalence
    from tpugs.query.masks import apply_mask3d
    from tpugs.query.text import get_mask3d
    from tpugs.viz.gif import render_mask_2d_to_gif, render_to_gif

    os.makedirs(results_dir, exist_ok=True)
    scene, cams, _ = load_checkpoint(checkpoint, data_dir, format, data_factor)
    if not skip_prune:
        pruned = prune_by_gradients(scene, cams)
        verify_pruning_equivalence(scene, pruned, cams)
        scene = pruned

    if f3dgs:
        # Feature-3DGS checkpoint: expand the trained latent field through
        # the shared projection (reference segment_f3dgs.py:26-61 scores
        # `features @ conv` against text embeddings).
        assert scene.features is not None and scene.feature_proj is not None, (
            "--f3dgs needs a checkpoint trained with a feature field"
        )
        features = scene.features @ scene.feature_proj
    else:
        suffix = "_compressed" if compressed else ""
        feats = np.load(
            os.path.join(results_dir, f"features_{feature}{suffix}.npz")
        )["features"]
        features = jnp.asarray(feats)

    codec = None
    if compressed:
        # Compressed (16-d latent) feature fields: text queries live in
        # the 512-d CLIP space, so they must be projected through the
        # SAME codec encoder used for back-projection before scoring
        # (reference segment_compressed.py:73-74). score_features
        # re-normalizes, so compress alone suffices.
        from tpugs.codec.linear import load_codec

        codec = load_codec(codec_path)
        if features.shape[-1] != codec.encoder.shape[-1]:
            raise ValueError(
                f"compressed features are {features.shape[-1]}-d but the "
                f"codec at {codec_path} produces "
                f"{codec.encoder.shape[-1]}-d latents"
            )

    if pos_idx:
        pos_q = features[jnp.asarray([int(i) for i in pos_idx.split(",")])]
        neg_q = (
            features[jnp.asarray([int(i) for i in neg_idx.split(",")])]
            if neg_idx
            else -pos_q
        )
    else:
        from tpugs.encoders.lseg import encode_text

        pos_q = encode_text(prompt.split(";"))
        neg_q = encode_text(neg_prompt.split(";"))
        if codec is not None:
            pos_q = codec.compress(pos_q)
            neg_q = codec.compress(neg_q)

    mask3d, mask3d_inv = get_mask3d(features, pos_q, neg_q)
    extracted, deleted, _ = apply_mask3d(scene, mask3d, mask3d_inv)

    render_mask_2d_to_gif(
        scene, features, pos_q, neg_q, cams,
        os.path.join(results_dir, "mask2d.gif"),
    )
    render_to_gif(
        os.path.join(results_dir, "extracted.gif"),
        extracted, cams, use_checkerboard_background=True,
    )
    render_to_gif(os.path.join(results_dir, "deleted.gif"), deleted, cams)

    if export_checkpoint:
        save_checkpoint(extracted, os.path.join(results_dir, "extracted.pt"))
        save_checkpoint(deleted, os.path.join(results_dir, "deleted.pt"))
    print(
        f"mask: {int(mask3d.sum())}/{scene.num_gaussians} Gaussians selected"
    )
    return mask3d


if __name__ == "__main__":
    from tpugs.utils.cli import cli

    cli(main)
