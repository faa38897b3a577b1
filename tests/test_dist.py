"""Multi-device tests on the 8-device virtual CPU mesh: sharded
back-projection must match single-device, and the DP+model-parallel
train step must run and reduce the loss."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpugs.dist.mesh import make_mesh, pad_cameras
from tpugs.dist.shard import backproject_views_sharded, make_sharded_train_step
from tpugs.encoders.base import LinearRGBEncoder
from tpugs.lift.batch import (
    StaticSizes,
    backproject_views,
    create_feature_field_batch,
    estimate_sizes,
    normalize_field,
)
from tpugs.utils.synthetic import orbit_cameras, random_scene

W, H = 48, 32


def _setup(n=128, n_cams=8):
    scene = random_scene(n, seed=0, extent=0.8, scale_range=(0.02, 0.1))
    cams = orbit_cameras(n_cams, W, H, radius=2.5)
    return scene, cams


def test_devices_available():
    assert len(jax.devices()) == 8


def test_batch_matches_stagewise():
    """Fully-jitted scan-over-cameras == host-orchestrated per-view loop."""
    from tpugs.lift.backproject import create_feature_field

    scene, cams = _setup()
    enc = LinearRGBEncoder(feature_dim=6)
    sizes = estimate_sizes(scene, cams)
    feats_batch = create_feature_field_batch(
        scene, cams.viewmats, cams.Ks, W, H, enc, sizes
    )
    feats_loop = create_feature_field(scene, cams, enc, verbose=False)
    np.testing.assert_allclose(
        np.asarray(feats_batch), np.asarray(feats_loop), atol=1e-4
    )


def test_camera_padding_weights():
    scene, cams = _setup(n_cams=5)
    enc = LinearRGBEncoder(feature_dim=4)
    sizes = estimate_sizes(scene, cams)
    num, den = backproject_views(
        scene, cams.viewmats, cams.Ks, W, H, enc, sizes
    )
    vms, ks, w = pad_cameras(cams.viewmats, cams.Ks, 8)
    assert vms.shape[0] == 8
    num_p, den_p = backproject_views(
        scene, vms, ks, W, H, enc, sizes, cam_weights=w
    )
    np.testing.assert_allclose(np.asarray(num), np.asarray(num_p), atol=1e-5)
    np.testing.assert_allclose(np.asarray(den), np.asarray(den_p), atol=1e-5)


@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2), (2, 4)])
def test_sharded_backprojection_matches_single(mesh_shape):
    scene, cams = _setup(n=128, n_cams=8)
    enc = LinearRGBEncoder(feature_dim=4)
    sizes = estimate_sizes(scene, cams)
    mesh = make_mesh(mesh_shape, ("cam", "gauss"))
    w = jnp.ones((8,))
    num_s, den_s = backproject_views_sharded(
        scene, cams.viewmats, cams.Ks, w, W, H, enc, sizes, mesh
    )
    # outputs are gauss-sharded shards reassembled by jit into global arrays
    num, den = backproject_views(
        scene, cams.viewmats, cams.Ks, W, H, enc, sizes
    )
    np.testing.assert_allclose(np.asarray(num_s), np.asarray(num), atol=1e-4)
    np.testing.assert_allclose(np.asarray(den_s), np.asarray(den), atol=1e-4)
    feats = normalize_field(num_s, den_s)
    assert np.all(np.isfinite(np.asarray(feats)))


def test_sharded_train_step_runs_and_learns():
    scene, cams = _setup(n=128, n_cams=4)
    sizes = StaticSizes(max_cover=64, max_blocks=4)
    mesh = make_mesh((4, 2), ("cam", "gauss"))
    step = make_sharded_train_step(mesh, W, H, sizes, lr=5e-3)

    targets = jnp.zeros((4, H, W, 3))  # drive renders toward black
    s = scene
    losses = []
    for _ in range(3):
        s, loss = step(s, cams.viewmats, cams.Ks, targets)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # gradient step reduces L1 to target
    # parameters actually moved
    assert not np.allclose(np.asarray(s.sh0), np.asarray(scene.sh0))


def test_sharded_pallas_backprojection_matches_single():
    """Production path: the Pallas fused kernels (interpret mode on the
    CPU mesh) sharded over cam x gauss must match the single-device
    Pallas result."""
    from tpugs.dist.shard import backproject_views_sharded_pallas
    from tpugs.lift.pallas_batch import (
        backproject_views_pallas,
        estimate_sizes_pallas,
    )

    scene, cams = _setup(n=128, n_cams=8)
    enc = LinearRGBEncoder(feature_dim=4)
    sizes = estimate_sizes_pallas(scene, cams, tile_size=16)
    mesh = make_mesh((4, 2), ("cam", "gauss"))
    w = jnp.ones((8,))
    num_s, den_s = backproject_views_sharded_pallas(
        scene, cams.viewmats, cams.Ks, w, W, H, enc, sizes, mesh,
        tile_size=16, contrib_dtype=jnp.float32, interpret=True,
    )
    num, den = backproject_views_pallas(
        scene, cams.viewmats, cams.Ks, W, H, enc, sizes,
        tile_size=16, contrib_dtype=jnp.float32, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(num_s), np.asarray(num), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(den_s), np.asarray(den), atol=1e-4
    )


def _make_trainer_for_shard(n_pts=96, feature=True):
    from tpugs.train.config import TrainConfig
    from tpugs.train.trainer import Trainer, init_scene_random

    cfg = TrainConfig(
        max_steps=10,
        init_num_pts=n_pts,
        init_extent=0.6,
        sh_degree=1,
        feature_dim=8 if feature else 0,
        feature_out_dim=16 if feature else 0,
        strategy="none",
        reset_every=0,
        random_bkgd=False,
        batch_size=4,
        seed=5,
    )
    scene = init_scene_random(cfg)
    tr = Trainer(cfg, scene, width=W, height=H)
    return tr


@pytest.mark.parametrize("mesh_shape", [(4, 2), (2, 4)])
def test_trainer_step_sharded_matches_single(mesh_shape):
    """The production sharded train step (real loss: L1+SSIM+feature,
    per-group optax, schedules) must produce the same update and loss
    as the same step on a trivial 1x1 mesh."""
    from tpugs.dist.shard import make_trainer_step_sharded

    B = 4
    _, cams = _setup(n_cams=B)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32))
    teachers = jnp.asarray(
        rng.uniform(-1, 1, (B, H, W, 16)).astype(np.float32)
    )
    bkgds = jnp.zeros((B, 3), jnp.float32)

    import optax

    results = {}
    for shape in (mesh_shape, (1, 1)):
        tr = _make_trainer_for_shard()
        # Non-zero features: at the zero init the loss gradient w.r.t.
        # the shared feature_proj head is exactly zero, which would
        # blind this equivalence check to feature_proj grad-scaling
        # bugs on the gauss axis (the head is NOT all-gathered, so its
        # cotangent must not be divided by gauss_n like the per-
        # Gaussian leaves).
        f_rng = np.random.default_rng(11)
        tr.scene = tr.scene.replace(
            features=jnp.asarray(
                f_rng.normal(0, 0.3, tr.scene.features.shape)
                .astype(np.float32)
            )
        )
        tr._sizes = (64, 4)
        # SGD instead of Adam for the equivalence check: the param delta
        # is then exactly -lr*grad, so this compares the GRADIENTS of the
        # full sharded loss (Adam's first-step g/sqrt(g^2) normalization
        # turns float-noise-level grad differences into +-lr sign flips).
        tr.optimizer = optax.sgd(0.1)
        tr.opt_state = tr.optimizer.init(tr.scene)
        devs = jax.devices()[: shape[0] * shape[1]]
        mesh = make_mesh(shape, ("cam", "gauss"), devices=devs)
        step = make_trainer_step_sharded(tr, mesh, batch_size=B)
        cam_ids = jnp.arange(B, dtype=jnp.int32)
        scene2, opt2, _, loss, grad2d, vis, xover = step(
            tr.scene, tr.opt_state, tr.module_state(), cams.viewmats,
            cams.Ks, images, teachers, bkgds, cam_ids,
        )
        assert float(xover) == 0.0
        results[shape] = (scene2, loss, grad2d, vis)

    s_sh, l_sh, g_sh, v_sh = results[mesh_shape]
    s_1, l_1, g_1, v_1 = results[(1, 1)]
    assert np.isfinite(float(l_sh))
    np.testing.assert_allclose(np.asarray(v_sh), np.asarray(v_1))
    np.testing.assert_allclose(float(l_sh), float(l_1), rtol=1e-5)
    # The shared head's update must match TIGHTLY: a /gauss_n
    # mis-scaling of its (small at this toy scale) gradient slips under
    # the leaf-wise atol below. Measured: the bug gives exactly half
    # the (1,1) gradient on a (2,2) mesh; the fix gives bit-identical.
    np.testing.assert_allclose(
        np.asarray(s_sh.feature_proj), np.asarray(s_1.feature_proj),
        atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(g_sh), np.asarray(g_1), atol=1e-5
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(s_sh), jax.tree_util.tree_leaves(s_1)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5
        )


def test_trainer_step_sharded_no_features():
    """Sharded step without a feature field: teachers arg is a dummy."""
    from tpugs.dist.shard import make_trainer_step_sharded

    B = 4
    _, cams = _setup(n_cams=B)
    tr = _make_trainer_for_shard(feature=False)
    tr._sizes = (64, 4)
    mesh = make_mesh((2, 2), ("cam", "gauss"), devices=jax.devices()[:4])
    step = make_trainer_step_sharded(tr, mesh, batch_size=B)
    rng = np.random.default_rng(1)
    images = jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32))
    dummy_teachers = jnp.zeros((B, 1, 1, 1), jnp.float32)
    scene2, opt2, _, loss, grad2d, vis, _ = step(
        tr.scene, tr.opt_state, tr.module_state(), cams.viewmats, cams.Ks,
        images, dummy_teachers, jnp.zeros((B, 3)),
        jnp.arange(B, dtype=jnp.int32),
    )
    assert np.isfinite(float(loss))
    assert not np.allclose(np.asarray(scene2.sh0), np.asarray(tr.scene.sh0))


def test_trainer_step_sharded_pose_app_matches_single():
    """Pose + appearance modules under the sharded step (replicated
    params, cam-psum DDP of their grads, reference ``:343-384``) must
    match the single-device step: same loss, same pose/app updates."""
    from tpugs.dist.shard import make_trainer_step_sharded
    from tpugs.train.config import TrainConfig
    from tpugs.train.trainer import Trainer, init_scene_random

    import optax

    B = 4
    _, cams = _setup(n_cams=B)
    rng = np.random.default_rng(3)
    images = jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32))
    teachers = jnp.asarray(
        rng.uniform(-1, 1, (B, H, W, 16)).astype(np.float32)
    )
    bkgds = jnp.zeros((B, 3), jnp.float32)
    cam_ids = jnp.arange(B, dtype=jnp.int32)

    results = {}
    for shape in ((2, 2), (1, 1)):
        cfg = TrainConfig(
            max_steps=10, init_num_pts=96, init_extent=0.6, sh_degree=1,
            feature_dim=8, feature_out_dim=16, strategy="none",
            reset_every=0, random_bkgd=False, batch_size=B, seed=5,
            pose_opt=True, pose_noise=1e-3, app_opt=True,
        )
        scene = init_scene_random(cfg)
        tr = Trainer(cfg, scene, width=W, height=H, n_cameras=B)
        # non-trivial pose params so their gradient actually matters
        p_rng = np.random.default_rng(7)
        tr.pose_params = tr.pose_params + jnp.asarray(
            p_rng.normal(0, 1e-3, tr.pose_params.shape).astype(np.float32)
        )
        tr._sizes = (64, 4)
        # SGD everywhere: compares gradients exactly (see note in
        # test_trainer_step_sharded_matches_single)
        tr.optimizer = optax.sgd(0.1)
        tr.opt_state = tr.optimizer.init(tr.scene)
        tr.pose_optimizer = optax.sgd(0.1)
        tr.pose_opt_state = tr.pose_optimizer.init(tr.pose_params)
        tr.app_optimizer = optax.sgd(0.1)
        tr.app_opt_state = tr.app_optimizer.init(tr.app_params)
        devs = jax.devices()[: shape[0] * shape[1]]
        mesh = make_mesh(shape, ("cam", "gauss"), devices=devs)
        step = make_trainer_step_sharded(tr, mesh, batch_size=B)
        scene2, _, modules, loss, _, _, _ = step(
            tr.scene, tr.opt_state, tr.module_state(), cams.viewmats,
            cams.Ks, images, teachers, bkgds, cam_ids,
        )
        results[shape] = (scene2, modules, loss)

    s_sh, m_sh, l_sh = results[(2, 2)]
    s_1, m_1, l_1 = results[(1, 1)]
    assert np.isfinite(float(l_sh))
    np.testing.assert_allclose(float(l_sh), float(l_1), rtol=1e-5)
    # pose params moved and match
    pose_sh, _, app_sh, _ = m_sh
    pose_1, _, app_1, _ = m_1
    np.testing.assert_allclose(
        np.asarray(pose_sh), np.asarray(pose_1), atol=1e-6
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(app_sh), jax.tree_util.tree_leaves(app_1)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    for a, b in zip(
        jax.tree_util.tree_leaves(s_sh), jax.tree_util.tree_leaves(s_1)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_trainer_step_sharded_exchange_cap():
    """The projected-splat exchange with a survivor capacity: a cap
    covering every frustum survivor is lossless (same update as the
    uncapped exchange, xover == 0); a tiny cap drops rows and reports
    them. This is the memory-scaling mode: each device exchanges at
    most cap projected rows instead of the whole scene (gsplat
    distributed=True, reference :460)."""
    from tpugs.dist.shard import make_trainer_step_sharded

    B = 4
    _, cams = _setup(n_cams=B)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32))
    teachers = jnp.asarray(
        rng.uniform(-1, 1, (B, H, W, 16)).astype(np.float32)
    )
    bkgds = jnp.zeros((B, 3), jnp.float32)
    cam_ids = jnp.arange(B, dtype=jnp.int32)

    import optax

    results = {}
    # n_local = 96/2 = 48; cap=48 is trivially lossless, cap=4 drops
    for cap in (0, 48, 4):
        tr = _make_trainer_for_shard()
        tr._sizes = (64, 4)
        tr.optimizer = optax.sgd(0.1)
        tr.opt_state = tr.optimizer.init(tr.scene)
        mesh = make_mesh((2, 2), ("cam", "gauss"), devices=jax.devices()[:4])
        step = make_trainer_step_sharded(
            tr, mesh, batch_size=B, exchange_rows=cap
        )
        scene2, _, _, loss, grad2d, vis, xover = step(
            tr.scene, tr.opt_state, tr.module_state(), cams.viewmats,
            cams.Ks, images, teachers, bkgds, cam_ids,
        )
        results[cap] = (scene2, loss, xover)

    s0, l0, x0 = results[0]
    s1, l1, x1 = results[48]
    s2, l2, x2 = results[4]
    assert float(x0) == 0.0 and float(x1) == 0.0
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    for a, b in zip(
        jax.tree_util.tree_leaves(s1), jax.tree_util.tree_leaves(s0)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    # the tiny cap must drop real survivors and say so
    assert float(x2) > 0.0
    assert np.isfinite(float(l2))


def test_trainer_chunk_sharded_matches_stepwise():
    """The chunked (lax.scan) sharded trainer must reproduce the
    step-by-step sharded results exactly: same final params, same
    per-step losses — one dispatch instead of n_steps round-trips."""
    from tpugs.dist.shard import (
        make_trainer_chunk_sharded,
        make_trainer_step_sharded,
    )

    import optax

    B, C, n_steps = 4, 8, 3
    _, cams = _setup(n_cams=C)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0, 1, (C, H, W, 3)).astype(np.float32))
    teachers = jnp.asarray(
        rng.uniform(-1, 1, (C, H, W, 16)).astype(np.float32)
    )
    staged = {
        "images": images,
        "viewmats": cams.viewmats,
        "Ks": cams.Ks,
        "image_ids": jnp.arange(C, dtype=jnp.int32),
        "teachers": teachers,
    }
    # per-step camera picks: device c draws from [c*4, (c+1)*4)
    sel = np.stack([
        np.concatenate([
            np.random.default_rng(s).choice(4, 2, replace=False) + 0,
            np.random.default_rng(s + 100).choice(4, 2, replace=False) + 4,
        ])
        for s in range(n_steps)
    ]).astype(np.int32)

    def fresh():
        tr = _make_trainer_for_shard()
        tr._sizes = (64, 4)
        tr.optimizer = optax.sgd(0.1)
        tr.opt_state = tr.optimizer.init(tr.scene)
        return tr

    mesh = make_mesh((2, 2), ("cam", "gauss"), devices=jax.devices()[:4])

    tr = fresh()
    chunk = make_trainer_chunk_sharded(tr, mesh, batch_size=B,
                                       n_steps=n_steps)
    sc_c, _, _, stats = chunk(
        tr.scene, tr.opt_state, tr.module_state(), staged,
        jnp.asarray(sel),
    )

    tr = fresh()
    step = make_trainer_step_sharded(tr, mesh, batch_size=B)
    losses = []
    sc, op, mods = tr.scene, tr.opt_state, tr.module_state()
    for s in range(n_steps):
        idx = sel[s]
        sc, op, mods, loss, _, _, _ = step(
            sc, op, mods, cams.viewmats[idx], cams.Ks[idx], images[idx],
            teachers[idx], jnp.zeros((B, 3)),
            jnp.asarray(idx, jnp.int32),
        )
        losses.append(float(loss))

    np.testing.assert_allclose(
        np.asarray(stats["loss"]), np.asarray(losses), rtol=1e-6
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(sc_c), jax.tree_util.tree_leaves(sc)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_refine_sharded_cycle():
    """Sharded densification cycle: step -> accumulate stats ->
    refine_sharded (gather, refine, re-pad to the gauss axis, re-init
    opt) -> rebuild step -> step again. N stays divisible by the gauss
    axis and training continues finite."""
    from tpugs.dist.shard import make_trainer_step_sharded, refine_sharded
    from tpugs.train.config import TrainConfig
    from tpugs.train.strategy import GradState
    from tpugs.train.trainer import Trainer, init_scene_random

    B = 4
    _, cams = _setup(n_cams=B)
    cfg = TrainConfig(
        max_steps=10, init_num_pts=96, init_extent=0.6, sh_degree=1,
        feature_dim=0, feature_out_dim=0, strategy="default",
        reset_every=0, random_bkgd=False, batch_size=B, seed=5,
        capacity_multiple=0, grow_grad2d=1e-12,  # force some growth
    )
    scene = init_scene_random(cfg)
    tr = Trainer(cfg, scene, width=W, height=H, n_cameras=B)
    tr._sizes = (64, 4)
    mesh = make_mesh((2, 2), ("cam", "gauss"), devices=jax.devices()[:4])
    rng = np.random.default_rng(2)
    images = jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32))
    dummy_teachers = jnp.zeros((B, 1, 1, 1), jnp.float32)
    cam_ids = jnp.arange(B, dtype=jnp.int32)

    step = make_trainer_step_sharded(tr, mesh, batch_size=B)
    tr.scene, tr.opt_state, _, loss, g2d, vis, _ = step(
        tr.scene, tr.opt_state, tr.module_state(), cams.viewmats, cams.Ks,
        images, dummy_teachers, jnp.zeros((B, 3)), cam_ids,
    )
    tr.grad_state.accumulate(np.asarray(g2d), np.asarray(vis))
    n_before = tr.scene.num_gaussians
    info = refine_sharded(tr, mesh)
    assert tr.scene.num_gaussians % 2 == 0  # divisible by gauss axis
    assert info["split"] + info["duplicated"] > 0  # growth happened
    assert tr.grad_state.grad2d_sum.shape[0] == tr.scene.num_gaussians
    # rebuild the step for the new N and keep training
    tr._sizes = (64, 4)
    step = make_trainer_step_sharded(tr, mesh, batch_size=B)
    tr.scene, tr.opt_state, _, loss2, g2d2, vis2, _ = step(
        tr.scene, tr.opt_state, tr.module_state(), cams.viewmats, cams.Ks,
        images, dummy_teachers, jnp.zeros((B, 3)), cam_ids,
    )
    assert np.isfinite(float(loss2))
    assert g2d2.shape[0] == tr.scene.num_gaussians
