"""Naive dense differentiable renderer — the correctness oracle.

O(N * pixels) memory/compute: materializes the full per-Gaussian,
per-pixel alpha matrix, composites with an exact exclusive cumprod along
the depth-sorted Gaussian axis. Only usable on tiny scenes, but it is
straight-line ``jax.numpy`` whose ``jax.grad`` is trivially trustworthy —
every production kernel (tiled renderer, Pallas kernels, fused
back-projection) is tested against this renderer and its gradients
(test strategy per SURVEY §4: the reference has no such oracle because
it trusts gsplat; here we own the rasterizer so we need one).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from tpugs.raster.projection import (
    ALPHA_CLIP_MAX,
    ALPHA_CLIP_MIN,
    Projected,
    ProjectionConfig,
    project,
)
from tpugs.raster import sh


def pixel_centers(width: int, height: int) -> jnp.ndarray:
    """(H, W, 2) pixel-center coordinates (x + 0.5, y + 0.5)."""
    ys = jnp.arange(height, dtype=jnp.float32) + 0.5
    xs = jnp.arange(width, dtype=jnp.float32) + 0.5
    xg, yg = jnp.meshgrid(xs, ys)
    return jnp.stack([xg, yg], axis=-1)


def evaluate_alpha(
    conics: jnp.ndarray,  # (..., 3)
    opacities: jnp.ndarray,  # (...)
    dx: jnp.ndarray,
    dy: jnp.ndarray,
) -> jnp.ndarray:
    """Shared alpha evaluation: alpha = min(0.999, o * exp(-sigma)),
    zeroed below the 1/255 contribution threshold (gsplat semantics;
    the reference relies on these cutoffs implicitly through gsplat)."""
    a = conics[..., 0]
    b = conics[..., 1]
    c = conics[..., 2]
    sigma = 0.5 * (a * dx * dx + c * dy * dy) + b * dx * dy
    alpha = opacities * jnp.exp(-jnp.maximum(sigma, 0.0))
    alpha = jnp.minimum(alpha, ALPHA_CLIP_MAX)
    alpha = jnp.where(sigma >= 0.0, alpha, 0.0)
    return jnp.where(alpha >= ALPHA_CLIP_MIN, alpha, 0.0)


def gaussian_alphas(
    proj: Projected, width: int, height: int, tile_size: int = 16
) -> jnp.ndarray:
    """(N, H*W) per-Gaussian per-pixel alpha (clipped, masked).

    Applies the same tile-coverage cutoff as the tiled renderer (a
    Gaussian only touches pixels whose tile its bbox covers), so naive
    and tiled agree bit-for-bit in structure.
    """
    from tpugs.raster.binning import tile_bbox, tile_grid

    ntx, nty = tile_grid(width, height, tile_size)
    px = pixel_centers(width, height).reshape(-1, 2)  # (P, 2)
    d = px[None, :, :] - proj.means2d[:, None, :]  # (N, P, 2)
    alpha = evaluate_alpha(
        proj.conics[:, None, :], proj.opacities[:, None], d[..., 0], d[..., 1]
    )
    alpha = jnp.where(proj.valid[:, None], alpha, 0.0)
    tx0, ty0, tx1, ty1 = tile_bbox(
        proj.means2d, proj.radii, proj.valid, tile_size, ntx, nty
    )
    ptx = (px[:, 0] // tile_size).astype(jnp.int32)
    pty = (px[:, 1] // tile_size).astype(jnp.int32)
    covered = (
        (ptx[None, :] >= tx0[:, None])
        & (ptx[None, :] < tx1[:, None])
        & (pty[None, :] >= ty0[:, None])
        & (pty[None, :] < ty1[:, None])
    )
    return jnp.where(covered, alpha, 0.0)


def composite(
    alphas_sorted: jnp.ndarray,  # (N, P) in front-to-back depth order
    colors_sorted: jnp.ndarray,  # (N, D)
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Front-to-back alpha compositing.

    Returns (image (P, D), alpha (P,), weights (N, P)) where
    weights[g, p] = alpha_g(p) * prod_{g' before g} (1 - alpha_g'(p)) —
    the same w(g, p) whose sums the reference extracts via autograd
    (``backproject.py:115-150``).
    """
    one_minus = 1.0 - alphas_sorted
    trans_excl = jnp.cumprod(one_minus, axis=0) / jnp.maximum(one_minus, 1e-12)
    weights = alphas_sorted * trans_excl  # (N, P)
    image = jnp.einsum(
        "np,nd->pd", weights, colors_sorted, precision=jax.lax.Precision.HIGHEST
    )  # (P, D)
    alpha_out = jnp.sum(weights, axis=0)
    return image, alpha_out, weights


def render_naive(
    means: jnp.ndarray,
    quats: jnp.ndarray,
    scales: jnp.ndarray,
    opacities: jnp.ndarray,
    colors: jnp.ndarray,  # (N, D) per-Gaussian colors (post-SH or raw)
    viewmat: jnp.ndarray,
    K: jnp.ndarray,
    width: int,
    height: int,
    background: Optional[jnp.ndarray] = None,
    config: ProjectionConfig = ProjectionConfig(),
    tile_size: int = 16,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Render one view densely. Returns (image (H, W, D), alpha (H, W))."""
    proj = project(
        means, quats, scales, opacities, viewmat, K, width, height, config
    )
    order = jnp.argsort(jnp.where(proj.valid, proj.depths, jnp.inf))
    proj_sorted = Projected(*[x[order] for x in proj])
    alphas = gaussian_alphas(proj_sorted, width, height, tile_size)
    image, alpha_out, _ = composite(alphas, colors[order])
    if background is not None:
        image = image + (1.0 - alpha_out)[:, None] * background[None, :]
    D = colors.shape[-1]
    return image.reshape(height, width, D), alpha_out.reshape(height, width)


def render_naive_sh(
    scene_means,
    quats,
    scales,
    opacities,
    sh_coeffs,  # (N, K, 3)
    viewmat,
    K,
    width: int,
    height: int,
    sh_degree: int,
    background: Optional[jnp.ndarray] = None,
    config: ProjectionConfig = ProjectionConfig(),
    tile_size: int = 16,
):
    from tpugs.raster.projection import view_directions

    dirs = view_directions(scene_means, viewmat)
    colors = sh.sh_to_color(sh_coeffs, dirs, sh_degree)
    return render_naive(
        scene_means,
        quats,
        scales,
        opacities,
        colors,
        viewmat,
        K,
        width,
        height,
        background,
        config,
        tile_size,
    )
