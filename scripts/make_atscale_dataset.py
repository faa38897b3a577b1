"""Build the at-scale synthetic training dataset.

The reference's canonical trainer workload is Mip-NeRF 360 garden at
data_factor=4 (``f3dgs/simple_trainer_feature_3dgs.py:57-78``). No
datasets exist in this environment, so the at-scale run uses the same
*shape* of problem on a synthetic scene: a dense ground-truth 3DGS scene
rendered from an orbit of cameras, with an SfM-like point cloud (points
sampled from the GT scene, as COLMAP triangulation would produce) for
``init_type=sfm``.

Usage:
    python scripts/make_atscale_dataset.py --out /tmp/atscale/data \
        --n-gaussians 20000 --n-cams 24 --width 480 --height 320
"""

from __future__ import annotations

import os as _os
import sys as _sys

_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO_ROOT not in _sys.path:
    _sys.path.insert(0, _REPO_ROOT)


import os


def main(
    out: str = "/tmp/atscale/data",
    n_gaussians: int = 20_000,
    n_cams: int = 24,
    width: int = 480,
    height: int = 320,
    n_sfm_points: int = 5_000,
    radius: float = 2.5,
    seed: int = 0,
):
    import imageio.v2 as imageio
    import numpy as np

    from tpugs.io.checkpoints import save_scene_pt
    from tpugs.utils.synthetic import (
        orbit_cameras,
        random_scene,
        write_synthetic_colmap,
    )
    from tpugs.viz.gif import render_to_gif

    scene = random_scene(
        n_gaussians, seed=seed, extent=0.9, scale_range=(0.008, 0.05)
    )
    cams = orbit_cameras(n_cams, width, height, radius=radius)
    os.makedirs(os.path.join(out, "images"), exist_ok=True)

    # SfM-like sparse cloud: GT gaussian centers + their DC colors
    rng = np.random.default_rng(seed + 1)
    idx = rng.choice(n_gaussians, size=min(n_sfm_points, n_gaussians),
                     replace=False)
    pts = np.asarray(scene.means)[idx]
    C0 = 0.28209479177387814
    rgb = np.clip(np.asarray(scene.sh0)[idx, 0] * C0 + 0.5, 0, 1)
    write_synthetic_colmap(
        out, cams, points=pts, point_rgbs=(rgb * 255).astype(np.uint8)
    )

    frames = render_to_gif(None, scene, cams, save_frames=False)
    for i, f in enumerate(frames):
        imageio.imwrite(os.path.join(out, f"images/frame_{i:04d}.jpg"), f)
    save_scene_pt(scene, os.path.join(out, "ckpt.pt"))
    print(
        f"wrote {out}: {n_cams} cams {width}x{height}, "
        f"{n_gaussians} GT gaussians, {len(pts)} sfm points"
    )


if __name__ == "__main__":
    from tpugs.utils.cli import cli

    cli(main)
