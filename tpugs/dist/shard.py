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


def make_trainer_step_sharded(trainer, mesh: Mesh, batch_size: int,
                              exchange_rows: int = 0):
    """Production multi-chip train step: the REAL trainer loss
    (L1 + SSIM + feature distillation + regularizers, schedules, per-
    group optax) over a ``cam × gauss`` mesh.

    Semantics mirror the reference's distributed Runner
    (``f3dgs/simple_trainer_feature_3dgs.py:205-208,460``): Gaussian
    parameters (and their Adam moments) are sharded over ``gauss``, and
    — like gsplat ``distributed=True`` — each device projects only its
    OWN shard per camera and the devices exchange *projected splat
    rows* (means2d/conics/depth/opacity + blended channels), never the
    raw scene. The all-gather moves ~(10 + 3 + D_feat) floats per
    Gaussian instead of the full parameter set (SH coefficients and
    Adam moments stay sharded), and with ``exchange_rows`` set it moves
    only frustum-survivors, so per-device memory scales as
    ~N/gauss_n + survivors instead of N. Autodiff through the
    all_gather inserts the matching reduce-scatter for gradients. The
    loss is the mean over a ``batch_size``-camera batch data-parallel
    over ``cam`` — gradient psum over ``cam`` is the DDP equivalent.
    Pose/appearance modules (reference DDP-wraps them at ``:343-384``)
    are REPLICATED params: every device carries a full copy, each
    camera shard contributes gradients only for its own ``cam_ids``
    rows, and the cam-axis psum is exactly the DDP allreduce.

    ``exchange_rows``: 0 exchanges every local row (lossless); > 0
    compacts each shard's frustum survivors to that static capacity
    before the exchange (rows beyond it are dropped and counted in the
    returned ``xover`` — size it like the Pallas buckets).

    Returns ``step(scene, opt_state, modules, viewmats, Ks, images,
    teachers, bkgds, cam_ids) -> (scene, opt_state, modules, loss,
    grad2d, vis, xover)`` operating on GLOBAL arrays (jit shards them
    per spec). ``modules`` is the replicated 4-tuple ``(pose_params,
    pose_opt_state, app_params, app_opt_state)`` — pass
    ``trainer.module_state()`` (all None when disabled). ``teachers``
    is (B, H, W, D_out) — pass zeros when the scene has no feature
    field (ignored). ``grad2d``/``vis`` are the full-N densification
    stats (NDC-scaled screen-grad norm sum and per-view visibility
    count over the batch), gauss-sharded; ``xover`` counts real rows
    dropped by the ``exchange_rows`` cap (0 when lossless). Requires
    ``trainer._sizes`` to be set, ``batch_size`` divisible by the
    cam-axis size, N by the gauss size."""
    one_step, scene_spec, opt_spec, cam_axis, gauss_axis = (
        _sharded_step_parts(trainer, mesh, batch_size, exchange_rows)
    )

    step = jax.shard_map(
        one_step,
        mesh=mesh,
        in_specs=(
            scene_spec, opt_spec, P(), P(cam_axis), P(cam_axis),
            P(cam_axis), P(cam_axis), P(cam_axis), P(cam_axis),
        ),
        out_specs=(
            scene_spec, opt_spec, P(), P(), P(gauss_axis), P(gauss_axis),
            P(),
        ),
        check_vma=False,
    )
    return jax.jit(step)


def _sharded_step_parts(trainer, mesh: Mesh, batch_size: int,
                        exchange_rows: int = 0):
    """Core of the sharded train step: returns ``(one_step, scene_spec,
    opt_spec, cam_axis, gauss_axis)``. ``one_step`` contains the
    collectives and must run INSIDE shard_map — it is wrapped directly
    by :func:`make_trainer_step_sharded` and scanned over staged
    batches by :func:`make_trainer_chunk_sharded`."""
    cam_axis, gauss_axis = mesh.axis_names[0], mesh.axis_names[-1]
    cam_n = mesh.shape[cam_axis]
    gauss_n = mesh.shape[gauss_axis]
    cfg = trainer.cfg
    sizes = trainer._sizes
    assert sizes is not None, "call trainer._estimate_sizes first"
    n = trainer.scene.num_gaussians
    assert n % gauss_n == 0 and batch_size % cam_n == 0
    n_local = n // gauss_n
    s_cap = min(exchange_rows, n_local) if exchange_rows > 0 else 0
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
    feat_dim = (
        None if trainer.scene.features is None
        else trainer.scene.features.shape[-1]
    )

    def one_step(scene_shard, opt_shard, modules, vms, ks, images,
                 teachers, bkgds, cam_ids):
        pose_params, pose_opt, app_params, app_opt = modules

        def lf(shard, probes, aux_params):
            def body(carry, inp):
                vm, K, img, tf, bk, cid = inp
                # Local half on this device's shard only: projection,
                # SH colors (+pose/appearance), channel concat.
                proj_l, opac_l, allc_l = trainer._view_inputs(
                    shard, probes, aux_params, vm, K, cid, sh_degree
                )
                abs_l = probes.get("abs")
                xover = jnp.float32(0.0)
                if s_cap:
                    # Compact frustum survivors to the static exchange
                    # capacity (valid rows first, stable); real rows
                    # beyond the cap are dropped and counted.
                    sel = jnp.argsort(~proj_l.valid, stable=True)[:s_cap]
                    take = lambda a: a[sel]  # noqa: E731
                    n_valid = jnp.sum(proj_l.valid.astype(jnp.int32))
                    xover = jnp.maximum(n_valid - s_cap, 0).astype(
                        jnp.float32
                    )
                    proj_l2 = jax.tree_util.tree_map(take, proj_l)
                    opac_l2, allc_l2 = take(opac_l), take(allc_l)
                    abs_l2 = None if abs_l is None else take(abs_l)
                else:
                    proj_l2, opac_l2, allc_l2, abs_l2 = (
                        proj_l, opac_l, allc_l, abs_l
                    )
                # The exchange: projected rows only (gsplat
                # distributed=True, reference :460). Autodiff inserts
                # the matching reduce-scatter for the row cotangents.
                ag = lambda a: jax.lax.all_gather(  # noqa: E731
                    a, gauss_axis, axis=0, tiled=True
                )
                proj = jax.tree_util.tree_map(ag, proj_l2)
                opac, allc = ag(opac_l2), ag(allc_l2)
                absg = None if abs_l2 is None else ag(abs_l2)
                l, a = trainer._loss_from_projected(
                    proj, opac, allc, absg, img,
                    tf if has_teacher else None, None, None, None,
                    bk, sizes, shard.feature_proj, feat_dim,
                )
                acc, vis, xo = carry
                return (
                    # The rendered loss is REPLICATED over the gauss
                    # axis (identical gathered inputs); scaling it by
                    # 1/gauss_n here makes the device-sum semantics of
                    # shard_map autodiff exact: row cotangents arrive
                    # via psum_scatter as gauss_n * (cot / gauss_n).
                    acc + l / (batch_size * gauss_n),
                    vis + proj_l.valid.astype(jnp.float32),
                    xo + xover,
                ), None

            (loss, vis, xover), _ = jax.lax.scan(
                body,
                (
                    jnp.float32(0.0),
                    jnp.zeros((n_local,), jnp.float32),
                    jnp.float32(0.0),
                ),
                (vms, ks, images, teachers, bkgds, cam_ids),
            )
            # Regularizers read raw (sharded) rows once per shard: the
            # global mean is the psum of local sums / N.
            if cfg.opacity_reg > 0:
                loss = loss + cfg.opacity_reg * jnp.sum(
                    shard.opacities
                ) / n
            if cfg.scale_reg > 0:
                loss = loss + cfg.scale_reg * jnp.sum(shard.scales) / (
                    n * shard.scales.shape[-1]
                )
            return loss, (vis, xover)

        # Densification probes ride the LOCAL shard rows (their grads
        # come back through the reduce-scatter already per-shard).
        probes0 = trainer._zero_probes(n_local)
        aux_params = {"pose": pose_params, "app": app_params}
        (loss, (vis, xover)), (grads, gprobes, gaux) = jax.value_and_grad(
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
        xover = jax.lax.psum(xover, cam_axis)
        if gauss_n > 1:
            # Shard-row gradients are exact (the 1/gauss_n loss scaling
            # matches the psum_scatter transpose of the row exchange).
            # REPLICATED inputs (feature_proj head, pose/app modules)
            # never traverse the exchange: each gauss device holds
            # 1/gauss_n of their gradient — psum completes it. The
            # reported loss is scaled down the same way.
            loss = jax.lax.psum(loss, gauss_axis)
            gaux = jax.lax.psum(gaux, gauss_axis)
            xover = jax.lax.psum(xover, gauss_axis)
            grads = grads.replace(
                feature_proj=None if grads.feature_proj is None
                else jax.lax.psum(grads.feature_proj, gauss_axis)
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
        return scene_shard, opt_shard, modules, loss, grad2d, vis, xover

    return one_step, scene_spec, opt_spec, cam_axis, gauss_axis


def make_trainer_chunk_sharded(trainer, mesh: Mesh, batch_size: int,
                               n_steps: int, exchange_rows: int = 0):
    """Chunked multi-chip training: ``n_steps`` sharded train steps in
    ONE dispatch via ``lax.scan`` — the multi-chip counterpart of the
    single-chip ``Trainer.train_chunk`` (without it, a real multi-chip
    run re-pays the per-dispatch transport latency the single-chip path
    engineered away; BASELINE.md round-1 measured ~0.4 s/dispatch).

    The dataset is STAGED device-resident and sharded over the cam
    axis: each cam-shard holds ``C_local`` cameras and, per step, draws
    its ``batch_size/cam_n`` cameras from its own shard by LOCAL index
    (the standard DP sampling scheme — each rank samples its own data
    shard). Pass ``cam_sel`` of shape (n_steps, batch_size) whose row s
    holds, for cam-shard c, indices in ``[c*C_local, (c+1)*C_local)``
    at positions ``[c*per_dev : (c+1)*per_dev]`` — i.e. GLOBAL staged
    indices grouped by shard; the step converts them to local offsets.

    Returns ``chunk(scene, opt_state, modules, staged, cam_sel) ->
    (scene, opt_state, modules, stats)`` where ``staged`` is the dict
    from ``Trainer.stage_dataset`` (+"teachers" (C,H,W,D) when
    distilling, +"bkgds" (C,3) optional) and ``stats`` has per-step
    ``loss`` (n_steps,), summed ``grad2d``/``vis`` (gauss-sharded), and
    ``xover``."""
    one_step, scene_spec, opt_spec, cam_axis, gauss_axis = (
        _sharded_step_parts(trainer, mesh, batch_size, exchange_rows)
    )
    cam_n = mesh.shape[cam_axis]
    per_dev = batch_size // cam_n
    has_teacher = trainer.scene.features is not None

    staged_spec = {
        "images": P(cam_axis), "viewmats": P(cam_axis), "Ks": P(cam_axis),
        "image_ids": P(cam_axis),
    }
    if has_teacher:
        staged_spec["teachers"] = P(cam_axis)
    staged_spec_extra = dict(staged_spec)
    staged_spec_extra["bkgds"] = P(cam_axis)

    def chunk(scene_shard, opt_shard, modules, staged, cam_sel):
        c_local = staged["viewmats"].shape[0]

        def body(carry, sel):
            sc, op, mods = carry
            # sel: (per_dev,) global staged indices for THIS cam shard —
            # convert to local offsets into the staged shard.
            i = jax.lax.axis_index(cam_axis)
            loc = sel - i * c_local
            vms = staged["viewmats"][loc]
            ks = staged["Ks"][loc]
            images = staged["images"][loc]
            cam_ids = staged["image_ids"][loc]
            teachers = (
                staged["teachers"][loc]
                if has_teacher
                else jnp.zeros((per_dev, 1, 1, 1), jnp.float32)
            )
            bkgds = (
                staged["bkgds"][loc]
                if "bkgds" in staged
                else jnp.zeros((per_dev, 3), jnp.float32)
            )
            sc, op, mods, loss, grad2d, vis, xover = one_step(
                sc, op, mods, vms, ks, images, teachers, bkgds, cam_ids
            )
            return (sc, op, mods), (loss, grad2d, vis, xover)

        (scene_shard, opt_shard, modules), (losses, g2d, vis, xover) = (
            jax.lax.scan(body, (scene_shard, opt_shard, modules), cam_sel)
        )
        stats = {
            "loss": losses,
            "grad2d": jnp.sum(g2d, axis=0),
            "vis": jnp.sum(vis, axis=0),
            "xover": jnp.sum(xover),
        }
        return scene_shard, opt_shard, modules, stats

    def wrapped(scene, opt_state, modules, staged, cam_sel):
        spec = staged_spec_extra if "bkgds" in staged else staged_spec
        run = jax.shard_map(
            chunk,
            mesh=mesh,
            in_specs=(scene_spec, opt_spec, P(), spec, P(None, cam_axis)),
            out_specs=(
                scene_spec, opt_spec, P(),
                {
                    "loss": P(), "grad2d": P(gauss_axis),
                    "vis": P(gauss_axis), "xover": P(),
                },
            ),
            check_vma=False,
        )
        return run(scene, opt_state, modules, staged, cam_sel)

    return jax.jit(wrapped)


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
