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
