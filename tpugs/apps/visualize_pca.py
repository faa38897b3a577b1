"""CLI: PCA visualization of a lifted feature field (reference
``visualize_pca.py:119-160`` and ``visualize_pca_f3dgs.py``)."""

from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp


def main(
    data_dir: str = "./data/garden",
    checkpoint: str = "./data/garden/ckpts/ckpt_29999_rank0.pt",
    results_dir: str = "./results/garden",
    format: str = "gsplat",
    data_factor: int = 4,
    feature: str = "lseg",
    f3dgs: bool = False,
    skip_prune: bool = False,
):
    from tpugs.io.checkpoints import load_checkpoint
    from tpugs.lift.prune import prune_by_gradients, verify_pruning_equivalence
    from tpugs.viz.pca import render_pca

    scene, cams, _ = load_checkpoint(checkpoint, data_dir, format, data_factor)
    if not skip_prune:
        pruned = prune_by_gradients(scene, cams)
        verify_pruning_equivalence(scene, pruned, cams)
        scene = pruned

    if f3dgs:
        # Feature-3DGS: expand latent features through the shared conv
        # (reference visualize_pca_f3dgs.py:54-63).
        assert scene.features is not None and scene.feature_proj is not None
        features = scene.features @ scene.feature_proj
    else:
        features = jnp.asarray(
            np.load(os.path.join(results_dir, f"features_{feature}.npz"))[
                "features"
            ]
        )

    os.makedirs(results_dir, exist_ok=True)
    render_pca(
        scene, features, cams,
        os.path.join(results_dir, "pca_gaussian.gif"), mode="gaussian",
    )
    render_pca(
        scene, features, cams,
        os.path.join(results_dir, "pca_frame.gif"), mode="frame",
    )
    print("Saved pca_gaussian.gif / pca_frame.gif to", results_dir)


if __name__ == "__main__":
    from tpugs.utils.cli import cli

    cli(main)
