"""Fully-jitted multi-view back-projection.

``lift/backproject.py`` orchestrates per-view on the host (plan
bucketing between stages) — flexible, but it syncs per camera. This
module is the production path: static bucket sizes are fixed up front,
and the *entire* loop over cameras (project → bin → render → encode →
adjoint accumulate) runs as one ``lax.scan`` inside a single XLA
program. No host round-trips, no per-view dispatch, and the camera axis
becomes shardable (``tpugs/dist``).

The reference's equivalent loop (``backproject.py:77-165``) launches
~6 CUDA programs per view from Python and calls
``torch.cuda.empty_cache()`` each iteration.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from tpugs.core.camera import Camera
from tpugs.core.scene import GaussianScene
from tpugs.raster import sh as sh_mod
from tpugs.raster.adjoint import backproject_tiled
from tpugs.raster.api import plan_render
from tpugs.raster.binning import bucket, build_tile_binning, cdiv
from tpugs.raster.projection import (
    ProjectionConfig,
    project,
    view_directions,
)
from tpugs.raster.tiled import TileConfig, render_tiled


class StaticSizes(NamedTuple):
    """Static shape buckets shared by every camera in a batch."""

    max_cover: int
    max_blocks: int


def estimate_sizes(
    scene: GaussianScene,
    cams: Camera,
    proj_config: ProjectionConfig = ProjectionConfig(),
    tile_config: TileConfig = TileConfig(),
    probe_cameras: int = 0,
) -> StaticSizes:
    """Measure the true max cover / span over (a probe subset of) the
    cameras and bucket to powers of two. Host-side, done once per scene."""
    idxs = range(cams.num_cameras)
    if probe_cameras and probe_cameras < cams.num_cameras:
        step = max(1, cams.num_cameras // probe_cameras)
        idxs = range(0, cams.num_cameras, step)
    max_cover, max_blocks = 1, 1
    for c in idxs:
        plan = plan_render(
            scene.means,
            scene.quats,
            scene.scales,
            scene.opacities,
            cams.viewmats[c],
            cams.Ks[c],
            cams.width,
            cams.height,
            proj_config,
            tile_config,
        )
        # plan.max_blocks is already bucketed; recover cover from the plan
        cover = plan.sorted_gid.shape[0] // scene.num_gaussians
        max_cover = max(max_cover, cover)
        max_blocks = max(max_blocks, plan.max_blocks)
    return StaticSizes(bucket(max_cover), bucket(max_blocks))


def backproject_one_view(
    scene: GaussianScene,
    viewmat: jax.Array,
    K: jax.Array,
    width: int,
    height: int,
    encoder: Callable[[jax.Array], jax.Array],
    sizes: StaticSizes,
    proj_config: ProjectionConfig = ProjectionConfig(),
    tile_config: TileConfig = TileConfig(),
) -> Tuple[jax.Array, jax.Array]:
    """Fused per-view pipeline, fully traceable. Returns
    (feat_sums (N, D), weight_sums (N,)) in original Gaussian order."""
    proj = project(
        scene.means,
        scene.quats,
        scene.scales,
        scene.opacities,
        viewmat,
        K,
        width,
        height,
        proj_config,
    )
    binning = build_tile_binning(
        proj, tile_config.tile_size, width, height, sizes.max_cover
    )
    order = binning.order
    opac = jnp.where(proj.valid, proj.opacities, 0.0)

    # SH colors for the teacher rendering.
    dirs = view_directions(scene.means, viewmat)
    colors = sh_mod.sh_to_color(scene.colors_all, dirs, scene.sh_degree)

    rgb, _ = render_tiled(
        proj.means2d[order],
        proj.conics[order],
        opac[order],
        colors[order],
        binning.sorted_gid,
        binning.tile_starts,
        width,
        height,
        sizes.max_blocks,
        tile_config,
    )
    feats = encoder(rgb)  # (H, W, D)

    feat_sums_d, weight_sums_d = backproject_tiled(
        proj.means2d[order],
        proj.conics[order],
        opac[order],
        binning.sorted_gid,
        binning.tile_starts,
        feats,
        width,
        height,
        sizes.max_blocks,
        tile_config,
    )
    n = scene.num_gaussians
    inv = jnp.zeros((n,), jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
    return feat_sums_d[inv], weight_sums_d[inv]


def backproject_views(
    scene: GaussianScene,
    viewmats: jax.Array,  # (C, 4, 4)
    Ks: jax.Array,  # (C, 3, 3)
    width: int,
    height: int,
    encoder: Callable[[jax.Array], jax.Array],
    sizes: StaticSizes,
    cam_weights: Optional[jax.Array] = None,  # (C,) 0/1 padding mask
    proj_config: ProjectionConfig = ProjectionConfig(),
    tile_config: TileConfig = TileConfig(),
    feature_dim: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Scan over cameras, accumulating (numerator, denominator).
    Traceable end-to-end; cameras with weight 0 contribute nothing
    (used to pad the camera axis for even device sharding)."""
    n = scene.num_gaussians
    if feature_dim is None:
        feature_dim = getattr(encoder, "feature_dim")
    if cam_weights is None:
        cam_weights = jnp.ones((viewmats.shape[0],), jnp.float32)

    def body(carry, inputs):
        num, den = carry
        vm, K, wgt = inputs
        fs, ws = backproject_one_view(
            scene, vm, K, width, height, encoder, sizes, proj_config, tile_config
        )
        return (num + wgt * fs, den + wgt * ws), None

    num0 = jnp.zeros((n, feature_dim), jnp.float32)
    den0 = jnp.zeros((n,), jnp.float32)
    (num, den), _ = jax.lax.scan(
        body, (num0, den0), (viewmats, Ks, cam_weights)
    )
    return num, den


def normalize_field(num: jax.Array, den: jax.Array) -> jax.Array:
    """num/den, L2-normalize, NaN->0 (reference backproject.py:166-169)."""
    features = num / (den[:, None] + 1e-12)
    features = features / jnp.linalg.norm(features, axis=-1, keepdims=True)
    return jnp.nan_to_num(features, nan=0.0, posinf=0.0, neginf=0.0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "width",
        "height",
        "encoder",
        "sizes",
        "proj_config",
        "tile_config",
        "feature_dim",
    ),
)
def create_feature_field_batch(
    scene: GaussianScene,
    viewmats: jax.Array,
    Ks: jax.Array,
    width: int,
    height: int,
    encoder,
    sizes: StaticSizes,
    cam_weights: Optional[jax.Array] = None,
    proj_config: ProjectionConfig = ProjectionConfig(),
    tile_config: TileConfig = TileConfig(),
    feature_dim: Optional[int] = None,
) -> jax.Array:
    """One-shot jitted: all views -> normalized (N, D) feature field.
    ``encoder`` must be hashable (a module-level callable or frozen
    object) since it is a static argument."""
    num, den = backproject_views(
        scene,
        viewmats,
        Ks,
        width,
        height,
        encoder,
        sizes,
        cam_weights,
        proj_config,
        tile_config,
        feature_dim,
    )
    return normalize_field(num, den)
