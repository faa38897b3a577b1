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
    engine: str = "auto",
    strict_sizes: bool = False,
    morton: bool = False,
):
    """``engine``: 'pallas' (production TPU kernels, the bench path),
    'scan' (pure-JAX one-jit batch), 'eager' (per-view loop), or
    'auto' = pallas on an accelerator, scan on CPU. ``--no-batch`` is
    kept as an alias for engine=eager. ``strict_sizes`` turns the
    host-side static-size overflow audit from a warning into an error.
    ``morton``: Z-curve-sort the scene before lifting (clusters the hot
    gather indices); features are unpermuted before saving, so the
    output is identical up to float reassociation."""
    import jax

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

    inv_perm = None
    if morton:
        from tpugs.utils.order import (
            inverse_permutation,
            morton_permutation,
            permute_scene,
        )

        perm = morton_permutation(scene)
        inv_perm = inverse_permutation(perm)
        scene = permute_scene(scene, perm)

    if engine == "auto":
        on_cpu = jax.devices()[0].platform == "cpu"
        engine = "scan" if on_cpu else "pallas"
    if not batch:
        engine = "eager"

    if engine == "pallas":
        from tpugs.lift.batch import normalize_field
        from tpugs.lift.pallas_batch import (
            DEFAULT_TILE,
            backproject_views_grouped,
            estimate_sizes_pallas,
        )
        from tpugs.raster.pallas_tiled import check_pallas_sizes

        sizes = estimate_sizes_pallas(scene, cams, probe_stride=1)
        check_pallas_sizes(
            scene.means, scene.quats, scene.scales, scene.opacities,
            cams.viewmats, cams.Ks, cams.width, cams.height, sizes,
            tile_size=DEFAULT_TILE,  # must match the engine's tiling
            stride=2, raise_on_overflow=strict_sizes,
        )
        num, den = backproject_views_grouped(
            scene, cams.viewmats, cams.Ks, cams.width, cams.height,
            encoder, sizes,
            interpret=jax.devices()[0].platform == "cpu",
        )
        features = normalize_field(num, den)
    elif engine == "scan":
        from tpugs.lift.batch import (
            create_feature_field_batch,
            estimate_sizes,
        )

        sizes = estimate_sizes(scene, cams, probe_cameras=4)
        features = create_feature_field_batch(
            scene, cams.viewmats, cams.Ks, cams.width, cams.height,
            encoder, sizes,
        )
    elif engine == "eager":
        features = create_feature_field(scene, cams, encoder)
    else:
        raise ValueError(f"unknown engine {engine!r} "
                         "(expected auto|pallas|scan|eager)")

    features = np.asarray(features)
    if inv_perm is not None:
        features = features[np.asarray(inv_perm)]
    out = os.path.join(results_dir, f"features_{feature}.npz")
    np.savez(out, features=features)
    print("Saved", out, features.shape)
    return features


if __name__ == "__main__":
    from tpugs.utils.cli import cli

    cli(main)
