"""Trainer on the fused Pallas engine (raster_engine="pallas",
interpret mode on CPU) vs the pure-JAX tiled engine: same losses, same
parameter updates, same densification stats. This pins the production
TPU train step (reference trains via gsplat's CUDA autograd,
``f3dgs/simple_trainer_feature_3dgs.py:442-487,646``; here the backward
is the Pallas kernel in ``raster/pallas_train.py``)."""

import os

import imageio.v2 as imageio
import numpy as np
import jax
import jax.numpy as jnp

from tpugs.train.config import TrainConfig
from tpugs.utils.synthetic import orbit_cameras, random_scene

W, H = 64, 48


def _make_disk_dataset(tmp_path, n_cams=4):
    from tpugs.utils.synthetic import write_synthetic_colmap
    from tpugs.viz.gif import render_to_gif

    scene = random_scene(120, seed=0, extent=0.8, scale_range=(0.02, 0.1))
    cams = orbit_cameras(n_cams, W, H, radius=2.5)
    data_dir = str(tmp_path / "data")
    os.makedirs(data_dir + "/images", exist_ok=True)
    write_synthetic_colmap(data_dir, cams)
    frames = render_to_gif(None, scene, cams, save_frames=False)
    for i, f in enumerate(frames):
        imageio.imwrite(f"{data_dir}/images/frame_{i:04d}.jpg", f)
    return data_dir, scene, cams


def _trainer(parser, cfg):
    from tpugs.train.trainer import Trainer, init_scene_from_points

    scene = init_scene_from_points(
        parser.points.astype(np.float32),
        parser.points_rgb.astype(np.float32),
        cfg,
        parser.scene_scale,
    )
    return Trainer(cfg, scene, parser.scene_scale, width=W, height=H,
                   n_cameras=parser.num_images)


def test_pallas_engine_matches_tiled(tmp_path):
    from tpugs.encoders import get_encoder
    from tpugs.train.dataset import Dataset, Parser

    data_dir, _, _ = _make_disk_dataset(tmp_path)
    parser = Parser(data_dir, factor=1, test_every=8)
    train = Dataset(parser, "train")
    kw = dict(
        max_steps=8, sh_degree=1, feature_dim=8, feature_out_dim=4,
        strategy="default", sh_degree_interval=100, random_bkgd=False,
        refine_start_iter=1000, depth_loss=True,
    )
    teacher = get_encoder("linear:4")
    t_ref = _trainer(parser, TrainConfig(raster_engine="tiled", **kw))
    # trans_eps=0 composites every block like the tiled engine (which has
    # no early exit) — required for gradient-exact comparison, since Adam
    # normalizes away gradient magnitude and amplifies tiny differences
    t_pal = _trainer(
        parser,
        TrainConfig(raster_engine="pallas", pallas_trans_eps=0.0, **kw),
    )
    assert t_pal.engine == "pallas" and t_ref.engine == "tiled"

    train_d = Dataset(parser, "train", load_depths=True)

    # ---- gradient-level equivalence at the SAME scene state, through
    # the full trainer loss (rgb + ssim + depth + feature distillation):
    # the Pallas backward must reproduce the tiled autodiff gradients.
    # (Adam trajectories are NOT compared element-wise: with eps=1e-15
    # the update is ~lr*sign(g), so parameters whose true gradient is
    # ~0 flip sign on any engine difference below test tolerance.)
    d = train_d[0]
    feats = teacher(jnp.asarray(d["image"]))
    common = dict(
        viewmat=jnp.asarray(d["viewmat"]), K=jnp.asarray(d["K"]),
        image=jnp.asarray(d["image"]), teacher_feats=feats,
        cam_id=jnp.int32(0), bkgd=jnp.zeros(3), sh_degree=1,
    )
    pts = np.zeros((4096, 2), np.float32)
    dep = np.ones((4096,), np.float32)
    msk = np.zeros((4096,), np.float32)
    m = min(4096, len(d["points"]))
    pts[:m], dep[:m], msk[:m] = d["points"][:m], d["depths"][:m], 1.0
    t_ref._estimate_sizes(common["viewmat"][None], common["K"][None])
    t_pal._estimate_sizes(common["viewmat"][None], common["K"][None])

    def grads_of(t):
        def lf(s, probes):
            return t._loss_fn(
                s, probes, {"pose": None, "app": None},
                common["viewmat"], common["K"], common["image"],
                common["teacher_feats"], jnp.asarray(pts),
                jnp.asarray(dep), jnp.asarray(msk), common["cam_id"],
                common["bkgd"], common["sh_degree"], t._sizes,
            )

        zeros = jnp.zeros((t.scene.num_gaussians, 2), jnp.float32)
        probes0 = {"off": zeros, "abs": zeros}
        (loss, _), (gs, gp) = jax.value_and_grad(
            lf, argnums=(0, 1), has_aux=True
        )(t.scene, probes0)
        return loss, gs, gp["off"], gp["abs"]

    l_ref, g_ref, goff_ref, gabs_ref = grads_of(t_ref)
    l_pal, g_pal, goff_pal, gabs_pal = grads_of(t_pal)
    # the absgrad stat agrees across engines too
    np.testing.assert_allclose(
        np.asarray(gabs_pal), np.asarray(gabs_ref),
        atol=3e-4 * float(np.abs(gabs_ref).max()) + 1e-8, rtol=3e-4,
    )
    np.testing.assert_allclose(float(l_pal), float(l_ref), rtol=1e-4)
    names = ("means", "quats", "log_scales", "logit_opacities", "sh0",
             "shN", "features", "feature_proj")
    for name in names:
        a = np.asarray(getattr(g_ref, name))
        b = np.asarray(getattr(g_pal, name))
        # noise floor 1e-8: a gradient that is truly ~0 (e.g. quats with
        # isotropic init scales) is pure accumulation-order float noise
        scale = float(np.abs(a).max())
        np.testing.assert_allclose(
            b, a, atol=3e-4 * scale + 1e-8, rtol=3e-4,
            err_msg=f"gradient mismatch: {name}",
        )
    # densification screen-grad probe agrees too
    np.testing.assert_allclose(
        np.asarray(goff_pal), np.asarray(goff_ref),
        atol=3e-4 * float(np.abs(goff_ref).max()) + 1e-8,
    )

    # ---- and the training loop itself stays healthy + loss-equivalent
    for step in range(3):
        d = train_d[step % len(train_d)]
        feats = teacher(jnp.asarray(d["image"]))
        s_ref = t_ref.train_step(d, teacher_feats=feats)
        s_pal = t_pal.train_step(d, teacher_feats=feats)
        for k in ("loss", "l1", "feature_l1", "depth_l"):
            np.testing.assert_allclose(
                s_pal[k], s_ref[k], rtol=2e-3, atol=2e-5,
                err_msg=f"step {step} stat {k}",
            )
    assert float(np.abs(np.asarray(t_pal.grad_state.grad2d_sum)).sum()) > 0


def test_pallas_size_overflow_triggers_reestimate(tmp_path):
    """When the scene outgrows the static Pallas buckets, the train step
    reports it on-device and the trainer re-estimates sizes instead of
    letting the kernels truncate silently (ADVICE r1)."""
    import warnings

    from tpugs.encoders import get_encoder
    from tpugs.raster.pallas_tiled import BLOCK, PallasSizes
    from tpugs.train.dataset import Dataset, Parser

    data_dir, _, _ = _make_disk_dataset(tmp_path)
    parser = Parser(data_dir, factor=1, test_every=8)
    train = Dataset(parser, "train")
    cfg = TrainConfig(
        max_steps=8, sh_degree=1, feature_dim=8, feature_out_dim=4,
        strategy="none", sh_degree_interval=100, random_bkgd=False,
        raster_engine="pallas",
    )
    t = _trainer(parser, cfg)
    teacher = get_encoder("linear:4")
    d = train[0]
    feats = teacher(jnp.asarray(d["image"]))

    # healthy sizes: no overflow reported
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        s = t.train_step(d, teacher_feats=feats)
    assert s.get("size_overflow", 0) == 0
    assert t._sizes is not None

    # cripple the buckets: one expansion slot per Gaussian, minimal T
    n = t.scene.num_gaussians
    t._sizes = PallasSizes(
        max_cover=8, T_padded=BLOCK, cover_pad=8,
        cover_caps=(1,) * 8, classes=((n, 1),),
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        s = t.train_step(d, teacher_feats=feats)
    assert s["size_overflow"] > 0
    assert any("overflow" in str(x.message) for x in w)
    assert t._sizes is None  # re-estimate scheduled

    # next step self-heals (re-estimates and runs clean)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        s = t.train_step(d, teacher_feats=feats)
    assert s.get("size_overflow", 0) == 0
    assert isinstance(t._sizes, PallasSizes)


def test_pallas_engine_chunked_scan(tmp_path):
    """The Pallas custom VJP composes inside the chunked lax.scan train
    path (one dispatch per chunk)."""
    from tpugs.encoders import get_encoder
    from tpugs.train.dataset import Dataset, Parser

    data_dir, _, _ = _make_disk_dataset(tmp_path)
    parser = Parser(data_dir, factor=1, test_every=8)
    train = Dataset(parser, "train")
    cfg = TrainConfig(
        max_steps=8, sh_degree=1, feature_dim=8, feature_out_dim=4,
        strategy="none", sh_degree_interval=100, random_bkgd=False,
        raster_engine="pallas",
    )
    t = _trainer(parser, cfg)
    t.teacher = get_encoder("linear:4")
    staged = t.stage_dataset(train)
    out = t.train_chunk(staged, 4, cam_idx=[0, 1, 2, 0])
    assert np.isfinite(out["loss"]).all()
    assert t.step == 4

    # eval render goes through the Pallas forward and matches the pure
    # tiled render of the same scene
    from tpugs.raster.api import plan_render, rasterize_with_plan

    d = train[0]
    img_p, alpha_p = t.render_eval(d["viewmat"], d["K"])
    vm, K = jnp.asarray(d["viewmat"]), jnp.asarray(d["K"])
    plan = plan_render(
        t.scene.means, t.scene.quats, t.scene.scales, t.scene.opacities,
        vm, K, W, H, t.proj_config, t.tile_config,
    )
    img_r, alpha_r = rasterize_with_plan(
        t.scene.means, t.scene.quats, t.scene.scales, t.scene.opacities,
        t.scene.colors_all, vm, K, plan, sh_degree=t.scene.sh_degree,
    )
    np.testing.assert_allclose(
        np.asarray(img_p), np.asarray(img_r), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(alpha_p), np.asarray(alpha_r), atol=2e-4
    )
