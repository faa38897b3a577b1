"""Public rasterization API.

Mirrors the call surface of the reference's device layer — gsplat's
``rasterization(means, quats, scales, opacities, colors, viewmats, Ks,
width, height, sh_degree, render_mode, backgrounds, radius_clip, ...)``
(call sites: ``/root/reference/backproject.py:89-100``,
``click_and_segment.py:241-252`` (RGB+D), ``segment.py:197-220``) — but
split TPU-style into two layers:

  * ``plan_render(...)``  — host-orchestrated: projects, measures the
    data-dependent sizes (max tiles/Gaussian, max per-tile span),
    buckets them to powers of two, and builds the static-shaped
    ``RasterPlan``. Re-jits only when a bucket grows.
  * ``rasterize_with_plan(...)`` — pure, jittable, reverse-mode
    differentiable end to end (projection + SH + tiled compositing),
    treating the plan's index arrays as constants (the same
    piecewise-constant treatment the CUDA backward uses).

``rasterize(...)`` composes the two for eager use.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from tpugs.raster import sh as sh_mod
from tpugs.raster.binning import (
    TileBinning,
    bucket,
    build_tile_binning,
    cdiv,
)
from tpugs.raster.projection import (
    Projected,
    ProjectionConfig,
    project,
    view_directions,
)
from tpugs.raster.tiled import TileConfig, render_tiled


def _pytree_dataclass(cls):
    return jax.tree_util.register_dataclass(dataclasses.dataclass(frozen=True)(cls))


_STATIC = dict(static=True)


@_pytree_dataclass
class RasterPlan:
    """Static-shaped tile plan for one camera."""

    order: jax.Array  # (N,) depth permutation
    sorted_gid: jax.Array  # (T,)
    tile_starts: jax.Array  # (n_tiles+1,)
    width: int = dataclasses.field(metadata=_STATIC, default=0)
    height: int = dataclasses.field(metadata=_STATIC, default=0)
    max_blocks: int = dataclasses.field(metadata=_STATIC, default=1)
    tile_size: int = dataclasses.field(metadata=_STATIC, default=16)
    block_size: int = dataclasses.field(metadata=_STATIC, default=128)
    tiles_per_chunk: int = dataclasses.field(metadata=_STATIC, default=32)

    @property
    def tile_config(self) -> TileConfig:
        return TileConfig(self.tile_size, self.block_size, self.tiles_per_chunk)


@functools.partial(jax.jit, static_argnames=("width", "height", "config"))
def _project_jit(means, quats, scales, opacities, viewmat, K, width, height, config):
    return project(means, quats, scales, opacities, viewmat, K, width, height, config)


@functools.partial(
    jax.jit, static_argnames=("tile_size", "width", "height")
)
def _cover_stats_jit(proj: Projected, tile_size, width, height):
    from tpugs.raster.binning import tile_bbox, tile_grid

    ntx, nty = tile_grid(width, height, tile_size)
    tx0, ty0, tx1, ty1 = tile_bbox(
        proj.means2d, proj.radii, proj.valid, tile_size, ntx, nty
    )
    return jnp.max((tx1 - tx0) * (ty1 - ty0))


@functools.partial(
    jax.jit, static_argnames=("tile_size", "width", "height", "max_cover")
)
def _bin_jit(proj: Projected, tile_size, width, height, max_cover):
    return build_tile_binning(proj, tile_size, width, height, max_cover)


def plan_render(
    means,
    quats,
    scales,
    opacities,
    viewmat,
    K,
    width: int,
    height: int,
    proj_config: ProjectionConfig = ProjectionConfig(),
    tile_config: TileConfig = TileConfig(),
) -> RasterPlan:
    """Build the static tile plan for one camera (host-orchestrated)."""
    proj = _project_jit(
        means, quats, scales, opacities, viewmat, K, width, height, proj_config
    )
    max_cover = bucket(int(_cover_stats_jit(proj, tile_config.tile_size, width, height)))
    binning = _bin_jit(proj, tile_config.tile_size, width, height, max_cover)
    max_blocks = bucket(cdiv(int(binning.max_span), tile_config.block_size))
    return RasterPlan(
        order=binning.order,
        sorted_gid=binning.sorted_gid,
        tile_starts=binning.tile_starts,
        width=width,
        height=height,
        max_blocks=max_blocks,
        tile_size=tile_config.tile_size,
        block_size=tile_config.block_size,
        tiles_per_chunk=tile_config.tiles_per_chunk,
    )


def _prepare_colors(
    means, colors, viewmat, sh_degree: Optional[int]
) -> jax.Array:
    """(N, D) per-Gaussian colors; SH-evaluated if sh_degree given."""
    if sh_degree is None:
        if colors.ndim == 3:  # (N, 1, 3) DC passed without SH eval
            colors = colors[:, 0, :]
        return colors
    dirs = view_directions(means, viewmat)
    return sh_mod.sh_to_color(colors, dirs, sh_degree)


def rasterize_with_plan(
    means,
    quats,
    scales,
    opacities,
    colors,
    viewmat,
    K,
    plan: RasterPlan,
    sh_degree: Optional[int] = None,
    render_mode: str = "RGB",
    background: Optional[jax.Array] = None,
    proj_config: ProjectionConfig = ProjectionConfig(),
) -> Tuple[jax.Array, jax.Array]:
    """Pure differentiable render for one camera given a plan.

    Returns (image (H, W, D[+1]), alpha (H, W)). ``render_mode`` in
    {"RGB", "RGB+D", "RGB+ED", "D", "ED"} (gsplat naming; ED =
    alpha-normalized expected depth).
    """
    proj = project(
        means,
        quats,
        scales,
        opacities,
        viewmat,
        K,
        plan.width,
        plan.height,
        proj_config,
    )
    cols = _prepare_colors(means, colors, viewmat, sh_degree)

    want_rgb = render_mode in ("RGB", "RGB+D", "RGB+ED")
    want_depth = render_mode in ("RGB+D", "RGB+ED", "D", "ED")
    chans = []
    if want_rgb:
        chans.append(cols)
    if want_depth:
        chans.append(proj.depths[:, None])
    cols = jnp.concatenate(chans, axis=-1) if len(chans) > 1 else chans[0]

    order = plan.order
    opac = jnp.where(proj.valid, proj.opacities, 0.0)
    image, alpha = render_tiled(
        proj.means2d[order],
        proj.conics[order],
        opac[order],
        cols[order],
        plan.sorted_gid,
        plan.tile_starts,
        plan.width,
        plan.height,
        plan.max_blocks,
        plan.tile_config,
        background=None,
    )
    if render_mode in ("RGB+ED", "ED"):
        d = image[..., -1:] / jnp.maximum(alpha[..., None], 1e-10)
        image = (
            jnp.concatenate([image[..., :-1], d], axis=-1)
            if want_rgb
            else d
        )
    if background is not None and want_rgb:
        nrgb = image.shape[-1] - (1 if want_depth else 0)
        rgb = image[..., :nrgb] + (1.0 - alpha[..., None]) * background[None, None, :]
        image = (
            jnp.concatenate([rgb, image[..., nrgb:]], axis=-1)
            if want_depth
            else rgb
        )
    return image, alpha


def rasterize(
    means,
    quats,
    scales,
    opacities,
    colors,
    viewmats,
    Ks,
    width: int,
    height: int,
    sh_degree: Optional[int] = None,
    render_mode: str = "RGB",
    backgrounds: Optional[jax.Array] = None,
    near_plane: float = 0.01,
    far_plane: float = 1e10,
    radius_clip: float = 0.0,
    eps2d: float = 0.3,
    antialiased: bool = False,
    tile_config: TileConfig = TileConfig(),
):
    """Eager multi-camera render; the gsplat-shaped entry point.

    ``viewmats`` (C,4,4), ``Ks`` (C,3,3). Returns (images (C,H,W,D),
    alphas (C,H,W,1), meta dict with ``means2d``/``radii``/``depths``/
    ``plans``).
    """
    proj_config = ProjectionConfig(
        eps2d=eps2d,
        near_plane=near_plane,
        far_plane=far_plane,
        radius_clip=radius_clip,
        antialiased=antialiased,
    )
    viewmats = jnp.asarray(viewmats)
    Ks = jnp.asarray(Ks)
    if viewmats.ndim == 2:
        viewmats, Ks = viewmats[None], Ks[None]
    images, alphas, plans, means2d_all, radii_all, depths_all = [], [], [], [], [], []
    for c in range(viewmats.shape[0]):
        vm, K = viewmats[c], Ks[c]
        plan = plan_render(
            means, quats, scales, opacities, vm, K, width, height,
            proj_config, tile_config,
        )
        bg = None if backgrounds is None else jnp.asarray(backgrounds)
        if bg is not None and bg.ndim == 2:
            bg = bg[c]
        img, alpha = _rasterize_with_plan_jit(
            means, quats, scales, opacities, colors, vm, K, plan,
            sh_degree, render_mode, bg, proj_config,
        )
        images.append(img)
        alphas.append(alpha[..., None])
        plans.append(plan)
        proj = _project_jit(
            means, quats, scales, opacities, vm, K, width, height, proj_config
        )
        means2d_all.append(proj.means2d)
        radii_all.append(proj.radii)
        depths_all.append(proj.depths)
    meta = {
        "means2d": jnp.stack(means2d_all),
        "radii": jnp.stack(radii_all),
        "depths": jnp.stack(depths_all),
        "plans": plans,
    }
    return jnp.stack(images), jnp.stack(alphas), meta


_rasterize_with_plan_jit = jax.jit(
    rasterize_with_plan,
    static_argnames=("sh_degree", "render_mode", "proj_config"),
)
