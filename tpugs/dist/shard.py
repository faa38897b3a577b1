"""Sharded execution: multi-chip back-projection and training.

Two real parallel axes (see ``mesh.py``):

* Back-projection: cameras are split over the *flattened* mesh (every
  device lifts its own views), partial (numerator, denominator)
  accumulators are ``psum``-reduced over ICI — one collective per batch —
  and the result lands sharded over the ``gauss`` axis so the N×D
  accumulator never has to fit on one chip.

* Training: Gaussian parameters are sharded over ``gauss`` (the model
  axis, mirroring the reference's ``points[rank::world]`` striding at
  ``f3dgs/simple_trainer_feature_3dgs.py:205-208``); rendering
  all-gathers the projected shard, and reverse-mode autodiff through the
  ``all_gather`` inserts the matching ``reduce_scatter`` for gradients.
  Data parallelism over cameras adds a ``psum`` of gradients — the DDP
  equivalent (reference ``:355-384``) for free inside the jitted step.
"""

from __future__ import annotations

import functools
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from tpugs.core.scene import GaussianScene
from tpugs.lift.batch import StaticSizes, backproject_views
from tpugs.raster.projection import ProjectionConfig
from tpugs.raster.tiled import TileConfig


def backproject_views_sharded(
    scene: GaussianScene,
    viewmats: jax.Array,  # (C, 4, 4) — C divisible by mesh size (pad first)
    Ks: jax.Array,
    cam_weights: jax.Array,  # (C,)
    width: int,
    height: int,
    encoder: Callable,
    sizes: StaticSizes,
    mesh: Mesh,
    proj_config: ProjectionConfig = ProjectionConfig(),
    tile_config: TileConfig = TileConfig(),
) -> Tuple[jax.Array, jax.Array]:
    """All-view back-projection over the device mesh.

    Returns (num (N, D), den (N,)) sharded over the ``gauss`` axis.
    """
    all_axes = tuple(mesh.axis_names)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(all_axes), P(all_axes), P(all_axes)),
        out_specs=(P(all_axes[-1]), P(all_axes[-1])),
        check_vma=False,
    )
    def run(scene_rep, vms, ks, wgts):
        num, den = backproject_views(
            scene_rep,
            vms,
            ks,
            width,
            height,
            encoder,
            sizes,
            wgts,
            proj_config,
            tile_config,
        )
        # One collective per batch: reduce partial accumulators over every
        # mesh axis, keeping only this device's gauss-shard of the result
        # (psum_scatter = reduce-scatter over ICI).
        gauss = all_axes[-1]
        others = all_axes[:-1]
        if others:
            num = jax.lax.psum(num, others)
            den = jax.lax.psum(den, others)
        num = jax.lax.psum_scatter(num, gauss, scatter_dimension=0, tiled=True)
        den = jax.lax.psum_scatter(den, gauss, scatter_dimension=0, tiled=True)
        return num, den

    return run(scene, viewmats, Ks, cam_weights)


def gather_scene(scene_shard: GaussianScene, axis: str) -> GaussianScene:
    """all_gather every per-Gaussian array of a gauss-sharded scene."""
    gathered = jax.tree_util.tree_map(
        lambda a: jax.lax.all_gather(a, axis, axis=0, tiled=True),
        scene_shard,
    )
    # feature_proj (if any) is shared, not per-Gaussian: keep the local copy.
    return gathered.replace(feature_proj=scene_shard.feature_proj)


def make_sharded_train_step(
    mesh: Mesh,
    width: int,
    height: int,
    sizes: StaticSizes,
    lr: float = 1e-3,
    proj_config: ProjectionConfig = ProjectionConfig(),
    tile_config: TileConfig = TileConfig(),
):
    """Build a jitted DP+model-parallel train step.

    Scene parameter arrays are sharded over ``gauss`` (axis 0); target
    images + cameras over ``cam``. Returns step(scene_shard, viewmats,
    Ks, targets) -> (scene_shard, loss).
    """
    cam_axis, gauss_axis = mesh.axis_names[0], mesh.axis_names[-1]

    def local_loss(scene_shard: GaussianScene, vms, ks, targets):
        from tpugs.lift.batch import backproject_one_view  # noqa: F401
        from tpugs.raster import sh as sh_mod
        from tpugs.raster.binning import build_tile_binning
        from tpugs.raster.projection import project, view_directions
        from tpugs.raster.tiled import render_tiled

        scene = gather_scene(scene_shard, gauss_axis)

        def render_one(vm, K):
            proj = project(
                scene.means,
                scene.quats,
                scene.scales,
                scene.opacities,
                vm,
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
            dirs = view_directions(scene.means, vm)
            colors = sh_mod.sh_to_color(scene.colors_all, dirs, scene.sh_degree)
            img, _ = render_tiled(
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
            return img

        def body(carry, inp):
            vm, K, tgt = inp
            img = render_one(vm, K)
            return carry + jnp.mean(jnp.abs(img - tgt)), None

        loss, _ = jax.lax.scan(
            body, jnp.float32(0.0), (vms, ks, targets)
        )
        return loss / vms.shape[0]

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(gauss_axis), P(cam_axis), P(cam_axis), P(cam_axis)),
        out_specs=(P(gauss_axis), P()),
        check_vma=False,
    )
    def step(scene_shard, vms, ks, targets):
        loss, grads = jax.value_and_grad(local_loss)(
            scene_shard, vms, ks, targets
        )
        # DP gradient sync over the camera axis (the DDP equivalent).
        grads = jax.lax.pmean(grads, cam_axis)
        loss = jax.lax.pmean(loss, cam_axis)
        new_shard = jax.tree_util.tree_map(
            lambda p, g: p - lr * g if g is not None else p,
            scene_shard,
            grads,
        )
        return new_shard, loss

    return jax.jit(step)
