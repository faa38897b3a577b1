"""GIF render pipelines (reference ``segment.py:91-240``).

``render_to_gif``         — render every COLMAP view, optional
                            checkerboard composited via rendered alpha,
                            animated GIF at 10 fps + per-frame PNGs.
``render_mask_2d_to_gif`` — per view, render RGB *and* the per-Gaussian
                            feature field, score each pixel against text
                            queries, and overlay the mask in red.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import jax.numpy as jnp

from tpugs.core.camera import Camera
from tpugs.core.scene import GaussianScene
from tpugs.raster.api import plan_render, rasterize_with_plan
from tpugs.viz.common import create_checkerboard, to_uint8


def _render_view(scene: GaussianScene, cams: Camera, c: int, colors=None,
                 sh_degree="auto"):
    plan = plan_render(
        scene.means, scene.quats, scene.scales, scene.opacities,
        cams.viewmats[c], cams.Ks[c], cams.width, cams.height,
    )
    if colors is None:
        colors = scene.colors_all
        deg = scene.sh_degree if sh_degree == "auto" else sh_degree
    else:
        deg = None
    return rasterize_with_plan(
        scene.means, scene.quats, scene.scales, scene.opacities,
        colors, cams.viewmats[c], cams.Ks[c], plan, sh_degree=deg,
    ), plan


def save_gif(frames, output_path: str, fps: int = 10) -> None:
    import imageio

    # 10 fps playback matches the reference output (segment.py:140).
    imageio.mimsave(output_path, frames, duration=1000.0 / fps, loop=0)


def render_to_gif(
    output_path: Optional[str],
    scene: GaussianScene,
    cams: Camera,
    use_checkerboard_background: bool = False,
    no_sh: bool = False,
    save_frames: bool = True,
    fps: int = 10,
):
    """Returns the list of uint8 frames; writes GIF + per-frame PNGs
    (into ``<output>.images/``, reference segment.py:112-137)."""
    frames = []
    aux_dir = None
    if output_path is not None and save_frames:
        aux_dir = output_path + ".images"
        os.makedirs(aux_dir, exist_ok=True)
    colors = scene.sh0[:, 0, :] if no_sh else None
    for c in range(cams.num_cameras):
        (img, alpha), _ = _render_view(scene, cams, c, colors=colors)
        frame = to_uint8(img)
        if use_checkerboard_background:
            board = create_checkerboard(cams.width, cams.height)
            a = np.asarray(alpha)[..., None]
            frame = np.clip(frame * a + board * (1 - a), 0, 255).astype(np.uint8)
        frames.append(frame)
        if aux_dir is not None:
            import imageio

            imageio.imwrite(f"{aux_dir}/frame_{c:04d}.png", frame)
    if output_path is not None:
        save_gif(frames, output_path, fps)
    return frames


def overlay_mask_red(frame: np.ndarray, mask2d: np.ndarray) -> np.ndarray:
    """Reference semantics (segment.py:225-231): masked pixels become the
    0.75/0.25 alpha blend of the image with pure red; unmasked pixels
    pass through unchanged."""
    f = frame.astype(np.float64)
    m = mask2d.astype(np.float64)[..., None]
    red = np.array([255.0, 0.0, 0.0])
    out = (1 - m) * f + m * (0.75 * f + 0.25 * red)
    return np.clip(out, 0, 255).astype(np.uint8)


def render_mask_2d_to_gif(
    scene: GaussianScene,
    features: jnp.ndarray,  # (N, D) lifted features
    pos_queries: jnp.ndarray,
    neg_queries: jnp.ndarray,
    cams: Camera,
    output_path: Optional[str],
    fps: int = 10,
):
    """RGB + rendered-feature-field mask overlay per view (reference
    segment.py:145-240: the D-dim feature image is rasterized directly,
    normalized per pixel, scored vs text)."""
    from tpugs.query.text import get_mask2d

    frames = []
    for c in range(cams.num_cameras):
        (img, _), plan = _render_view(scene, cams, c)
        feat_img, _ = rasterize_with_plan(
            scene.means, scene.quats, scene.scales, scene.opacities,
            features, cams.viewmats[c], cams.Ks[c], plan,
        )
        mask2d = np.asarray(get_mask2d(feat_img, pos_queries, neg_queries))
        frame = overlay_mask_red(to_uint8(img), mask2d)
        frames.append(frame)
    if output_path is not None:
        save_gif(frames, output_path, fps)
    return frames
