"""PCA visualization of lifted feature fields (reference
``visualize_pca.py:27-116``).

Two modes, as in the reference:
  * ``gaussian`` — fit a 3-component PCA on the (N, D) per-Gaussian
    features, bake the normalized PCA colors into the scene's DC SH and
    render (reference ``:56-80``);
  * ``frame``    — rasterize the full D-dim feature image per view and
    project each pixel through the PCA (reference ``:81-113``).

PCA is a (D, D) eigendecomposition of the feature covariance — trivial
host/JAX work; no sklearn needed.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax.numpy as jnp

from tpugs.core.camera import Camera
from tpugs.core.scene import GaussianScene
from tpugs.viz.common import to_uint8
from tpugs.viz.gif import _render_view, save_gif
from tpugs.raster.api import rasterize_with_plan


def feature_pca(
    features: np.ndarray, n_components: int = 3
) -> Tuple[np.ndarray, np.ndarray]:
    """Fit PCA. Returns (mean (D,), components (D, C))."""
    x = np.asarray(features, np.float64)
    mean = x.mean(axis=0)
    xc = x - mean
    cov = xc.T @ xc / max(len(x) - 1, 1)
    eigvals, eigvecs = np.linalg.eigh(cov)
    comps = eigvecs[:, ::-1][:, :n_components]
    return mean, comps


def pca_colors(
    features: np.ndarray,
    mean: np.ndarray,
    comps: np.ndarray,
    lo: Optional[np.ndarray] = None,
    hi: Optional[np.ndarray] = None,
):
    """Project + min/max normalize to [0, 1] colors. Returns
    (colors, lo, hi) so frames can share one normalization."""
    proj = (np.asarray(features) - mean) @ comps
    if lo is None:
        lo = np.percentile(proj, 1, axis=0)
        hi = np.percentile(proj, 99, axis=0)
    colors = np.clip((proj - lo) / (hi - lo + 1e-9), 0, 1)
    return colors, lo, hi


def render_pca(
    scene: GaussianScene,
    features: jnp.ndarray,
    cams: Camera,
    output_path: Optional[str] = None,
    mode: str = "gaussian",
    fps: int = 10,
):
    """Render the PCA-colored scene over all views."""
    mean, comps = feature_pca(np.asarray(features))
    frames = []
    if mode == "gaussian":
        colors, _, _ = pca_colors(np.asarray(features), mean, comps)
        colors = jnp.asarray(colors, jnp.float32)
        for c in range(cams.num_cameras):
            (img, _), _ = _render_view(
                scene, cams, c, colors=colors
            )
            frames.append(to_uint8(img))
    elif mode == "frame":
        lo = hi = None
        for c in range(cams.num_cameras):
            (_, _), plan = _render_view(scene, cams, c)
            feat_img, alpha = rasterize_with_plan(
                scene.means, scene.quats, scene.scales, scene.opacities,
                features, cams.viewmats[c], cams.Ks[c], plan,
            )
            H, W, D = feat_img.shape
            cols, lo, hi = pca_colors(
                np.asarray(feat_img).reshape(-1, D), mean, comps, lo, hi
            )
            frames.append(to_uint8(cols.reshape(H, W, 3)))
    else:
        raise ValueError(f"unknown pca mode {mode!r}")
    if output_path is not None:
        save_gif(frames, output_path, fps)
    return frames
