"""Trainer subsystem: metrics, normalization, trajectories, dataset,
train step convergence, densification strategies."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpugs.train.config import TrainConfig
from tpugs.train.metrics import psnr, ssim
from tpugs.train.normalize import (
    align_principle_axes,
    similarity_from_cameras,
    transform_cameras,
    transform_points,
)
from tpugs.train.traj import (
    generate_ellipse_path_z,
    generate_interpolated_path,
    c2w_to_viewmat,
)
from tpugs.utils.synthetic import orbit_cameras, random_scene

W, H = 64, 48


def test_psnr_ssim_identity():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (32, 40, 3)).astype(np.float32))
    assert float(psnr(img, img)) > 100
    np.testing.assert_allclose(float(ssim(img, img)), 1.0, atol=1e-5)


def test_psnr_known_value():
    a = jnp.zeros((8, 8, 3))
    b = jnp.full((8, 8, 3), 0.1)
    np.testing.assert_allclose(float(psnr(a, b)), 20.0, atol=1e-4)


def test_ssim_decreases_with_noise():
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(0.2, 0.8, (48, 48, 3)).astype(np.float32))
    noisy = img + 0.2 * jnp.asarray(
        rng.normal(size=img.shape).astype(np.float32)
    )
    assert float(ssim(img, noisy)) < 0.8


def test_similarity_from_cameras_normalizes():
    cams = orbit_cameras(8, W, H, radius=5.0)
    c2w = np.linalg.inv(np.asarray(cams.viewmats))
    T = similarity_from_cameras(c2w)
    c2w2 = transform_cameras(T, c2w.copy())
    dists = np.linalg.norm(c2w2[:, :3, 3], axis=1)
    np.testing.assert_allclose(np.median(dists), 1.0, rtol=0.05)
    # rotations stay orthonormal
    R = c2w2[0, :3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)


def test_align_principle_axes():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(500, 3)) * np.array([5.0, 1.0, 0.2])
    theta = 0.7
    R = np.array(
        [
            [np.cos(theta), -np.sin(theta), 0],
            [np.sin(theta), np.cos(theta), 0],
            [0, 0, 1.0],
        ]
    )
    T = align_principle_axes(pts @ R.T)
    aligned = transform_points(T, pts @ R.T)
    cov = np.cov(aligned.T)
    off_diag = np.abs(cov - np.diag(np.diag(cov))).max()
    assert off_diag < 0.1


def test_interpolated_path():
    cams = orbit_cameras(6, W, H, radius=3.0)
    c2w = np.linalg.inv(np.asarray(cams.viewmats))
    path = generate_interpolated_path(c2w, n_interp=4, spline_degree=3)
    assert path.shape == (20, 3, 4)
    # path positions should stay near the orbit radius
    r = np.linalg.norm(path[:, :3, 3], axis=1)
    assert (r > 1.5).all() and (r < 4.5).all()


def test_ellipse_path_and_viewmat():
    cams = orbit_cameras(6, W, H, radius=3.0)
    c2w = np.linalg.inv(np.asarray(cams.viewmats))
    path = generate_ellipse_path_z(c2w, n_frames=12)
    assert path.shape == (12, 3, 4)
    vm = c2w_to_viewmat(path[0])
    R = vm[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)


def _make_disk_dataset(tmp_path, n_cams=6):
    import imageio.v2 as imageio
    import os

    from tpugs.io.checkpoints import save_scene_pt
    from tpugs.utils.synthetic import write_synthetic_colmap

    scene = random_scene(120, seed=0, extent=0.8, scale_range=(0.02, 0.1))
    cams = orbit_cameras(n_cams, W, H, radius=2.5)
    data_dir = str(tmp_path / "data")
    os.makedirs(data_dir + "/images", exist_ok=True)
    write_synthetic_colmap(data_dir, cams)
    # render images from the scene as "ground truth" photos
    from tpugs.viz.gif import render_to_gif

    frames = render_to_gif(None, scene, cams, save_frames=False)
    for i, f in enumerate(frames):
        imageio.imwrite(f"{data_dir}/images/frame_{i:04d}.jpg", f)
    return data_dir, scene, cams


def test_parser_and_dataset(tmp_path):
    from tpugs.train.dataset import Dataset, Parser

    data_dir, scene, cams = _make_disk_dataset(tmp_path)
    parser = Parser(data_dir, factor=1, normalize=False, test_every=3)
    assert parser.num_images == 6
    assert parser.scene_scale > 0
    train = Dataset(parser, "train")
    val = Dataset(parser, "val")
    assert len(train) == 4 and len(val) == 2
    d = train[0]
    assert d["image"].shape == (H, W, 3)
    assert d["K"].shape == (3, 3)
    np.testing.assert_allclose(
        d["viewmat"],
        np.asarray(cams.viewmats[int(d["image_id"])]),
        atol=1e-4,
    )
    d2 = Dataset(parser, "train", load_depths=True)[0]
    assert "points" in d2 and "depths" in d2


def test_train_step_reduces_loss(tmp_path):
    from tpugs.train.dataset import Dataset, Parser
    from tpugs.train.trainer import Trainer, init_scene_from_points

    data_dir, gt_scene, cams = _make_disk_dataset(tmp_path, n_cams=4)
    parser = Parser(data_dir, factor=1, test_every=8)
    train = Dataset(parser, "train")
    cfg = TrainConfig(
        max_steps=40, sh_degree=1, feature_dim=8, feature_out_dim=4,
        strategy="none", sh_degree_interval=10,
    )
    scene = init_scene_from_points(
        parser.points.astype(np.float32),
        parser.points_rgb.astype(np.float32),
        cfg,
        parser.scene_scale,
    )
    trainer = Trainer(
        cfg, scene, parser.scene_scale, width=W, height=H
    )

    class TinyTeacher:
        feature_dim = 4

        def __call__(self, img):
            return jnp.concatenate([img, img[..., :1]], axis=-1)

    teacher = TinyTeacher()
    losses = []
    for i in range(12):
        d = train[i % len(train)]
        feats = teacher(jnp.asarray(d["image"]))
        stats = trainer.train_step(d, teacher_feats=feats)
        losses.append(stats["loss"])
    assert np.isfinite(losses).all()
    assert np.mean(losses[-4:]) < np.mean(losses[:4])

    ev = trainer.evaluate(train, max_images=2)
    assert np.isfinite(ev["psnr"]) and 0 <= ev["ssim"] <= 1

    ckpt = str(tmp_path / "ckpt.npz")
    trainer.save_checkpoint(ckpt)
    import os

    assert os.path.exists(ckpt)


def _tiny_trainer(parser, train, cfg):
    from tpugs.train.trainer import Trainer, init_scene_from_points

    scene = init_scene_from_points(
        parser.points.astype(np.float32),
        parser.points_rgb.astype(np.float32),
        cfg,
        parser.scene_scale,
    )
    return Trainer(cfg, scene, parser.scene_scale, width=W, height=H,
                   n_cameras=parser.num_images)


def test_train_chunk_matches_per_step(tmp_path):
    """One 4-step lax.scan chunk == four host-driven train_step calls
    (same cameras, no random background)."""
    from tpugs.encoders import get_encoder
    from tpugs.train.dataset import Dataset, Parser

    data_dir, _, cams = _make_disk_dataset(tmp_path, n_cams=4)
    parser = Parser(data_dir, factor=1, test_every=8)
    train = Dataset(parser, "train")
    cfg = TrainConfig(
        max_steps=8, sh_degree=1, feature_dim=8, feature_out_dim=4,
        strategy="default", sh_degree_interval=100, random_bkgd=False,
        refine_start_iter=1000,
    )
    teacher = get_encoder("linear:4")
    t1 = _tiny_trainer(parser, train, cfg)
    t2 = _tiny_trainer(parser, train, cfg)
    t2.teacher = teacher
    vms = np.stack(
        [np.asarray(train[i]["viewmat"]) for i in range(len(train))]
    )
    Ks = np.stack([np.asarray(train[i]["K"]) for i in range(len(train))])
    t1._estimate_sizes(vms, Ks)
    t2._estimate_sizes(vms, Ks)

    order = [0, 2, 1, 0]
    for ci in order:
        d = train[ci]
        feats = teacher(jnp.asarray(d["image"]))
        t1.train_step(d, teacher_feats=feats)

    staged = t2.stage_dataset(train)
    stats = t2.train_chunk(staged, 4, cam_idx=order)
    assert stats["loss"].shape == (4,)
    assert np.isfinite(stats["loss"]).all()
    assert t2.step == 4

    for name in ("means", "log_scales", "logit_opacities", "sh0",
                 "features", "feature_proj"):
        a = np.asarray(getattr(t1.scene, name))
        b = np.asarray(getattr(t2.scene, name))
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-5, err_msg=name)
    # densification stats accumulated identically on device
    np.testing.assert_allclose(
        t1.grad_state.count, t2.grad_state.count, atol=1e-6
    )
    np.testing.assert_allclose(
        t1.grad_state.grad2d_sum, t2.grad_state.grad2d_sum,
        rtol=2e-3, atol=1e-6,
    )


def test_train_chunk_rejects_sh_boundary_cross(tmp_path):
    from tpugs.train.dataset import Dataset, Parser

    data_dir, _, _ = _make_disk_dataset(tmp_path, n_cams=4)
    parser = Parser(data_dir, factor=1, test_every=8)
    train = Dataset(parser, "train")
    cfg = TrainConfig(
        max_steps=8, sh_degree=2, feature_dim=0, strategy="none",
        sh_degree_interval=2, random_bkgd=False,
    )
    t = _tiny_trainer(parser, train, cfg)
    staged = t.stage_dataset(train)
    with pytest.raises(ValueError, match="sh_degree_interval"):
        t.train_chunk(staged, 4)


def test_capacity_padding_refine(tmp_path):
    """With capacity_multiple set, refine pads N to the bucket and the
    padded Gaussians are invisible: a render of the padded scene matches
    the unpadded one exactly."""
    from tpugs.raster.api import plan_render, rasterize_with_plan
    from tpugs.raster.projection import ProjectionConfig
    from tpugs.raster.tiled import TileConfig
    from tpugs.train.dataset import Dataset, Parser
    from tpugs.train.trainer import Trainer, init_scene_from_points

    data_dir, _, cams = _make_disk_dataset(tmp_path, n_cams=4)
    parser = Parser(data_dir, factor=1, test_every=8)
    train = Dataset(parser, "train")
    cfg = TrainConfig(
        max_steps=8, sh_degree=1, feature_dim=0, strategy="default",
        random_bkgd=False, capacity_multiple=64, grow_grad2d=1e9,
    )
    t = _tiny_trainer(parser, train, cfg)
    n0 = t.scene.num_gaussians
    t.grad_state.count[:] = 1.0
    t.refine()
    n1 = t.scene.num_gaussians
    assert n1 % 64 == 0 and n1 >= t.grad_state.count.shape[0] - 64
    assert len(t.grad_state.count) == n1

    def render(scene):
        vm = jnp.asarray(train[0]["viewmat"])
        K = jnp.asarray(train[0]["K"])
        plan = plan_render(
            scene.means, scene.quats, scene.scales, scene.opacities,
            vm, K, W, H, ProjectionConfig(), TileConfig(),
        )
        img, _ = rasterize_with_plan(
            scene.means, scene.quats, scene.scales, scene.opacities,
            scene.colors_all, vm, K, plan, sh_degree=1,
        )
        return np.asarray(img)

    padded = render(t.scene)
    alive = np.asarray(t.scene.opacities) > 1e-6
    unpadded = render(t.scene.select(alive))
    np.testing.assert_allclose(padded, unpadded, atol=1e-6)
    # a chunk runs fine on the padded scene
    staged = t.stage_dataset(train)
    stats = t.train_chunk(staged, 2)
    assert np.isfinite(stats["loss"]).all()


def test_default_strategy_refines():
    from tpugs.train.strategy import DefaultStrategy, GradState

    scene = random_scene(100, seed=0)
    cfg = TrainConfig(grow_grad2d=0.5, prune_opa=0.3)
    strat = DefaultStrategy(cfg, scene_scale=1.0)
    state = GradState.zeros(100)
    state.grad2d_sum[:10] = 10.0  # high-gradient -> grow
    state.count[:] = 1.0
    new_scene, new_state, info = strat.refine(scene, state)
    assert info["num_gaussians"] == new_scene.num_gaussians
    assert len(new_state.grad2d_sum) == new_scene.num_gaussians
    assert info["pruned"] >= 0


def test_mcmc_strategy_keeps_n():
    from tpugs.train.strategy import GradState, MCMCStrategy

    scene = random_scene(50, seed=1)
    # force some dead Gaussians
    lo = np.array(scene.logit_opacities)
    lo[:7] = -10.0
    scene = scene.replace(logit_opacities=jnp.asarray(lo))
    cfg = TrainConfig(prune_opa=0.01)
    strat = MCMCStrategy(cfg, 1.0)
    new_scene, _, info = strat.refine(scene, GradState.zeros(50))
    assert new_scene.num_gaussians == 50
    assert info["relocated"] == 7
    assert np.all(np.asarray(new_scene.opacities) >= 0.009)


def test_config_adjust_steps():
    cfg = TrainConfig(max_steps=1000, steps_scaler=0.5, eval_steps=[100])
    cfg2 = cfg.adjust_steps()
    assert cfg2.max_steps == 500 and cfg2.eval_steps == [50]
