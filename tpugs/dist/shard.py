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

import numpy as np

import jax
import jax.numpy as jnp
import optax
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


def backproject_views_sharded_pallas(
    scene: GaussianScene,
    viewmats: jax.Array,  # (C, 4, 4) — C divisible by mesh size (pad first)
    Ks: jax.Array,
    cam_weights: jax.Array,  # (C,)
    width: int,
    height: int,
    encoder: Callable,
    sizes,  # PallasSizes
    mesh: Mesh,
    proj_config: ProjectionConfig = ProjectionConfig(),
    tile_size: int = 32,
    d_chunk: int = 640,
    contrib_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Production sharded back-projection: the Pallas fused kernels
    (``lift/pallas_batch.backproject_views_pallas``) run per device over
    that device's camera shard; partial accumulators are psum-reduced
    and the result lands gauss-sharded. The pure-JAX
    :func:`backproject_views_sharded` stays as the CPU-mesh oracle.
    Pass ``interpret=True`` on CPU meshes (Pallas interpreter)."""
    from tpugs.lift.pallas_batch import backproject_views_pallas

    all_axes = tuple(mesh.axis_names)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(all_axes), P(all_axes), P(all_axes)),
        out_specs=(P(all_axes[-1]), P(all_axes[-1])),
        check_vma=False,
    )
    def run(scene_rep, vms, ks, wgts):
        num, den = backproject_views_pallas(
            scene_rep, vms, ks, width, height, encoder, sizes,
            cam_weights=wgts, d_chunk=d_chunk, proj_config=proj_config,
            interpret=interpret, tile_size=tile_size,
            contrib_dtype=contrib_dtype,
        )
        gauss = all_axes[-1]
        others = all_axes[:-1]
        if others:
            num = jax.lax.psum(num, others)
            den = jax.lax.psum(den, others)
        num = jax.lax.psum_scatter(num, gauss, scatter_dimension=0, tiled=True)
        den = jax.lax.psum_scatter(den, gauss, scatter_dimension=0, tiled=True)
        return num, den

    return run(scene, viewmats, Ks, cam_weights)


def make_trainer_step_sharded(trainer, mesh: Mesh, batch_size: int):
    """Production multi-chip train step: the REAL trainer loss
    (L1 + SSIM + feature distillation + regularizers, schedules, per-
    group optax) over a ``cam × gauss`` mesh.

    Semantics mirror the reference's distributed Runner
    (``f3dgs/simple_trainer_feature_3dgs.py:205-208,460``): Gaussian
    parameters (and their Adam moments) are sharded over ``gauss``,
    rendering all-gathers the shard (autodiff inserts the matching
    reduce-scatter for the gradients), and the loss is the mean over a
    ``batch_size``-camera batch data-parallel over ``cam`` — gradient
    psum over ``cam`` is the DDP equivalent. Pose/appearance modules
    (reference DDP-wraps them at ``:343-384``) are REPLICATED params:
    every device carries a full copy, each camera shard contributes
    gradients only for its own ``cam_ids`` rows, and the cam-axis psum
    is exactly the DDP allreduce.

    Returns ``step(scene, opt_state, modules, viewmats, Ks, images,
    teachers, bkgds, cam_ids) -> (scene, opt_state, modules, loss,
    grad2d, vis)`` operating on GLOBAL arrays (jit shards them per
    spec). ``modules`` is the replicated 4-tuple ``(pose_params,
    pose_opt_state, app_params, app_opt_state)`` — pass
    ``trainer.module_state()`` (all None when disabled). ``teachers``
    is (B, H, W, D_out) — pass zeros when the scene has no feature
    field (ignored). ``grad2d``/``vis`` are the full-N densification
    stats (NDC-scaled screen-grad norm sum and per-view visibility
    count over the batch), gauss-sharded. Requires ``trainer._sizes``
    to be set, ``batch_size`` divisible by the cam-axis size, N by the
    gauss size."""
    cam_axis, gauss_axis = mesh.axis_names[0], mesh.axis_names[-1]
    cam_n = mesh.shape[cam_axis]
    gauss_n = mesh.shape[gauss_axis]
    cfg = trainer.cfg
    sizes = trainer._sizes
    assert sizes is not None, "call trainer._estimate_sizes first"
    n = trainer.scene.num_gaussians
    assert n % gauss_n == 0 and batch_size % cam_n == 0
    sh_degree = cfg.sh_degree
    optimizer = trainer.optimizer
    pose_optimizer = getattr(trainer, "pose_optimizer", None)
    app_optimizer = getattr(trainer, "app_optimizer", None)
    ndc = np.array([trainer.width / 2.0, trainer.height / 2.0], np.float32)

    def leaf_spec(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 1 and leaf.shape[0] == n:
            return P(gauss_axis)
        return P()

    scene_spec = jax.tree_util.tree_map(leaf_spec, trainer.scene)
    opt_spec = jax.tree_util.tree_map(leaf_spec, trainer.opt_state)
    has_teacher = trainer.scene.features is not None

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            scene_spec, opt_spec, P(), P(cam_axis), P(cam_axis),
            P(cam_axis), P(cam_axis), P(cam_axis), P(cam_axis),
        ),
        out_specs=(
            scene_spec, opt_spec, P(), P(), P(gauss_axis), P(gauss_axis),
        ),
        check_vma=False,
    )
    def step(scene_shard, opt_shard, modules, vms, ks, images, teachers,
             bkgds, cam_ids):
        pose_params, pose_opt, app_params, app_opt = modules

        def lf(shard, probes, aux_params):
            scene = gather_scene(shard, gauss_axis)

            def body(carry, inp):
                vm, K, img, tf, bk, cid = inp
                l, a = trainer._loss_fn(
                    scene, probes, aux_params, vm, K, img,
                    tf if has_teacher else None, None, None, None,
                    cid, bk, sh_degree, sizes,
                )
                acc, vis = carry
                return (
                    acc + l / batch_size,
                    vis + a["visible"].astype(jnp.float32),
                ), None

            (loss, vis), _ = jax.lax.scan(
                body,
                (jnp.float32(0.0), jnp.zeros((n,), jnp.float32)),
                (vms, ks, images, teachers, bkgds, cam_ids),
            )
            return loss, vis

        probes0 = trainer._zero_probes(n)
        aux_params = {"pose": pose_params, "app": app_params}
        (loss, vis), (grads, gprobes, gaux) = jax.value_and_grad(
            lf, argnums=(0, 1, 2), has_aux=True
        )(scene_shard, probes0, aux_params)
        goff = trainer._grow_stat(gprobes)
        # DP sum over cameras: local losses are already /batch_size, so
        # psum (not pmean) completes the global mean — and per-Gaussian
        # grads from disjoint camera shards add, the DDP allreduce.
        # Pose/app grads live on disjoint cam_ids rows per shard, so the
        # same psum IS their DDP allreduce (reference ``:355,361,384``).
        loss = jax.lax.psum(loss, cam_axis)
        grads = jax.lax.psum(grads, cam_axis)
        goff = jax.lax.psum(goff, cam_axis)
        vis = jax.lax.psum(vis, cam_axis)
        gaux = jax.lax.psum(gaux, cam_axis)
        if gauss_n > 1:
            # Every gauss-axis device computes the SAME replicated loss,
            # so the psum_scatter transpose of gather_scene's all_gather
            # sums gauss_n identical cotangents — normalize back. The
            # shared feature_proj head is NOT all-gathered (gather_scene
            # keeps the local copy), so its cotangent is counted once
            # and must not be divided; same for goff and gaux (pose/app
            # are replicated inputs that never traverse the all_gather —
            # each gauss device computes the full gradient once).
            fp_grad = grads.feature_proj
            grads = jax.tree_util.tree_map(lambda g: g / gauss_n, grads)
            grads = grads.replace(feature_proj=fp_grad)
        if gauss_n > 1:
            # goff/vis are full-N and identical across the gauss axis
            # after the cam psum; emit this shard's slice.
            i = jax.lax.axis_index(gauss_axis)
            goff = jax.lax.dynamic_slice_in_dim(
                goff, i * (n // gauss_n), n // gauss_n, axis=0
            )
            vis = jax.lax.dynamic_slice_in_dim(
                vis, i * (n // gauss_n), n // gauss_n, axis=0
            )
        grad2d = jnp.linalg.norm(goff * ndc[None, :], axis=1)
        updates, opt_shard = optimizer.update(grads, opt_shard, scene_shard)
        scene_shard = optax.apply_updates(scene_shard, updates)
        if pose_params is not None:
            pu, pose_opt = pose_optimizer.update(
                gaux["pose"], pose_opt, pose_params
            )
            pose_params = optax.apply_updates(pose_params, pu)
        if app_params is not None:
            au, app_opt = app_optimizer.update(
                gaux["app"], app_opt, app_params
            )
            app_params = optax.apply_updates(app_params, au)
        modules = (pose_params, pose_opt, app_params, app_opt)
        return scene_shard, opt_shard, modules, loss, grad2d, vis

    return jax.jit(step)


def refine_sharded(trainer, mesh: Mesh) -> dict:
    """Between-chunk densification for the sharded trainer (reference
    densifies in its distributed runs,
    ``f3dgs/simple_trainer_feature_3dgs.py:586-592,990-1006``).

    Strategy refinement changes N, which no compiled program can
    express: run it host-side on the GLOBAL (gauss-sharded) arrays —
    XLA gathers them on read — then re-pad the capacity so the new N
    still divides the gauss axis, and re-init the optimizer state for
    the new shape. The caller MUST rebuild the step function
    (:func:`make_trainer_step_sharded` bakes N and the sharding specs
    into its closure) and re-estimate sizes before the next chunk.

    Returns the refine info dict (duplicated/split/pruned/alive)."""
    from tpugs.train.strategy import GradState

    gauss_n = mesh.shape[mesh.axis_names[-1]]
    info = trainer.refine()
    n = trainer.scene.num_gaussians
    if n % gauss_n:
        cap = -(-n // gauss_n) * gauss_n
        trainer.scene = trainer.scene.pad_to(cap)
        trainer.grad_state = GradState.zeros(cap)
        trainer.opt_state = trainer.optimizer.init(trainer.scene)
    return info


def make_sharded_train_step(
    mesh: Mesh,
    width: int,
    height: int,
    sizes: StaticSizes,
    lr: float = 1e-3,
    proj_config: ProjectionConfig = ProjectionConfig(),
    tile_config: TileConfig = TileConfig(),
):
    """Build a jitted DP+model-parallel train step — TEST ORACLE ONLY.

    This is the round-1 minimal step (plain L1 loss + SGD-ish optax,
    pure-JAX tiled renderer): it exists so the CPU-mesh tests have a
    small, transparent sharded step to compare against the single-chip
    path. Production multi-chip training is
    ``make_trainer_step_sharded`` (real Trainer loss, per-group optax,
    Pallas engine); do not ship this one.

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
        gauss_n = mesh.shape[gauss_axis]
        if gauss_n > 1:
            # The psum_scatter transpose of gather_scene's all_gather
            # sums gauss_n identical cotangents (the loss is replicated
            # over the gauss axis) — normalize back.
            grads = jax.tree_util.tree_map(
                lambda g: g / gauss_n if g is not None else None, grads
            )
        new_shard = jax.tree_util.tree_map(
            lambda p, g: p - lr * g if g is not None else p,
            scene_shard,
            grads,
        )
        return new_shard, loss

    return jax.jit(step)
