"""CLI: lift 2D features onto per-Gaussian vectors.

TPU-native counterpart of the reference's ``backproject.py:301-340``:
load checkpoint + COLMAP -> prune by blend weights -> verify render
equivalence -> back-project features -> save ``features_<name>.npz``.

Encoders: ``grayscale`` / ``linear`` run out of the box (synthetic);
``lseg`` / ``dino`` require converted checkpoint weights (see
``tpugs/encoders``).
"""

from __future__ import annotations

import os

import numpy as np


def main(
    data_dir: str = "./data/garden",
    checkpoint: str = "./data/garden/ckpts/ckpt_29999_rank0.pt",
    results_dir: str = "./results/garden",
    format: str = "gsplat",
    data_factor: int = 4,
    feature: str = "lseg",
    encoder_ckpt: str = "",
    skip_prune: bool = False,
    batch: bool = True,
):
    from tpugs.encoders import get_encoder
    from tpugs.io.checkpoints import load_checkpoint
    from tpugs.lift.backproject import create_feature_field
    from tpugs.lift.prune import prune_by_gradients, verify_pruning_equivalence

    os.makedirs(results_dir, exist_ok=True)
    scene, cams, _ = load_checkpoint(checkpoint, data_dir, format, data_factor)

    if not skip_prune:
        pruned = prune_by_gradients(scene, cams)
        verify_pruning_equivalence(scene, pruned, cams)
        scene = pruned

    encoder = get_encoder(feature, encoder_ckpt or None)

    if batch:
        from tpugs.lift.batch import (
            create_feature_field_batch,
            estimate_sizes,
        )

        sizes = estimate_sizes(scene, cams, probe_cameras=4)
        features = create_feature_field_batch(
            scene, cams.viewmats, cams.Ks, cams.width, cams.height,
            encoder, sizes,
        )
    else:
        features = create_feature_field(scene, cams, encoder)

    out = os.path.join(results_dir, f"features_{feature}.npz")
    np.savez(out, features=np.asarray(features))
    print("Saved", out, features.shape)
    return features


if __name__ == "__main__":
    from tpugs.utils.cli import cli

    cli(main)
