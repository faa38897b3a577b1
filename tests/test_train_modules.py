"""Round-2 trainer features: pose/appearance optimization wiring, masked
depth loss, opacity-reset optimizer state, full checkpoint/resume, LPIPS,
compression eval. Reference: f3dgs/simple_trainer_feature_3dgs.py
(:120-141 pose/app config, :343-384 module optimizers, :613-631 depth
loss, :683-709 ckpt, :783-856 eval, :911-926 compression)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpugs.train.config import TrainConfig
from tpugs.train.trainer import Trainer, init_scene_random


W, H = 64, 48


def tiny_cfg(**kw):
    base = dict(
        max_steps=50,
        init_num_pts=128,
        init_extent=0.6,
        sh_degree=1,
        feature_dim=0,
        feature_out_dim=0,
        strategy="none",
        refine_start_iter=10_000,
        reset_every=0,
        random_bkgd=False,
        seed=3,
    )
    base.update(kw)
    return TrainConfig(**base)


def make_batch(trainer, cam_id=0, angle=0.0):
    vm = np.eye(4, dtype=np.float32)
    vm[:3, 3] = [0.1 * np.sin(angle), 0, 2.0]
    K = np.array([[60, 0, W / 2], [0, 60, H / 2], [0, 0, 1]], np.float32)
    img, _ = trainer.render_eval(vm, K, sh_degree=0)
    return {
        "viewmat": vm,
        "K": K,
        "image": np.asarray(jnp.clip(img, 0, 1)),
        "image_id": cam_id,
    }


def test_pose_opt_counteracts_noise():
    """With noisy extrinsics, enabling pose_opt must reach a lower loss
    than training without it (the learned 6D deltas absorb the noise)."""
    losses = {}
    for pose_opt in (False, True):
        cfg = tiny_cfg(
            pose_opt=pose_opt,
            pose_noise=0.02,
            pose_opt_lr=3e-3,  # large lr: tiny test budget
            means_lr=0.0, scales_lr=0.0, opacities_lr=0.0, quats_lr=0.0,
            sh0_lr=0.0, shN_lr=0.0,
        )
        scene = init_scene_random(cfg)
        tr = Trainer(cfg, scene, width=W, height=H, n_cameras=2)
        gt = make_batch(tr, cam_id=0)  # GT from unperturbed pose
        last = None
        for _ in range(25):
            last = tr.train_step(gt)["loss"]
        losses[pose_opt] = last
    assert losses[True] < losses[False] * 0.98, losses


def test_pose_noise_changes_render_loss():
    cfg0 = tiny_cfg()
    scene = init_scene_random(cfg0)
    tr0 = Trainer(cfg0, scene, width=W, height=H, n_cameras=1)
    gt = make_batch(tr0)
    l_clean = tr0.train_step(gt)["loss"]

    cfg1 = tiny_cfg(pose_noise=0.05)
    tr1 = Trainer(cfg1, scene, width=W, height=H, n_cameras=1)
    l_noisy = tr1.train_step(gt)["loss"]
    assert l_noisy > l_clean


def test_app_opt_params_update():
    cfg = tiny_cfg(app_opt=True, feature_dim=8, feature_out_dim=16)
    scene = init_scene_random(cfg)
    tr = Trainer(cfg, scene, width=W, height=H, n_cameras=2)
    assert tr.app_params is not None
    p0 = jax.tree_util.tree_map(np.asarray, tr.app_params)
    # zero-init head -> appearance starts neutral
    assert float(jnp.abs(p0["params"]["out"]["kernel"]).max()) == 0.0
    batch = make_batch(tr, cam_id=1)
    tr.train_step(batch)
    p1 = tr.app_params
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(jnp.asarray(a) - jnp.asarray(b)).max()),
        p0, jax.tree_util.tree_map(np.asarray, p1),
    )
    assert max(jax.tree_util.tree_leaves(diff)) > 0.0


def test_depth_loss_ignores_padding():
    """Padded point slots must not contribute to the depth loss: the
    loss from m real points is identical no matter what sits in the
    padded tail."""
    cfg = tiny_cfg(depth_loss=True)
    scene = init_scene_random(cfg)
    tr = Trainer(cfg, scene, width=W, height=H)
    gt = make_batch(tr)
    pts = np.array([[10, 12], [30, 20], [50, 40]], np.float32)
    deps = np.array([1.9, 2.1, 2.0], np.float32)

    tr._estimate_sizes(np.asarray(gt["viewmat"])[None], np.asarray(gt["K"])[None])
    sizes = tr._sizes

    def loss_with_pad(pad_depth):
        cap = 64
        p = np.zeros((cap, 2), np.float32)
        d = np.full((cap,), pad_depth, np.float32)
        m_ = np.zeros((cap,), np.float32)
        p[:3], d[:3], m_[:3] = pts, deps, 1.0
        out, _ = tr._loss_fn(
            tr.scene, tr._zero_probes(tr.scene.num_gaussians),
            {"pose": None, "app": None},
            jnp.asarray(gt["viewmat"]), jnp.asarray(gt["K"]),
            jnp.asarray(gt["image"]), None,
            jnp.asarray(p), jnp.asarray(d), jnp.asarray(m_),
            jnp.int32(0), jnp.zeros(3), 0, sizes,
        )
        return float(out)

    assert loss_with_pad(1.0) == pytest.approx(loss_with_pad(777.0), rel=1e-6)


def test_opacity_reset_clears_adam_state():
    cfg = tiny_cfg(reset_every=2, strategy="default",
                   refine_start_iter=10_000, refine_stop_iter=10_001)
    scene = init_scene_random(cfg)
    tr = Trainer(cfg, scene, width=W, height=H)
    gt = make_batch(tr)
    tr.train_step(gt)
    tr.train_step(gt)
    tr.train_step(gt)  # entered with step==2 -> reset fires post-update
    state = tr.opt_state.inner_states["opacities"]
    moment_leaves = [
        leaf for leaf in jax.tree_util.tree_leaves(state)
        if hasattr(leaf, "shape") and leaf.ndim >= 1
    ]
    assert moment_leaves
    for leaf in moment_leaves:
        assert float(jnp.abs(leaf).max()) == 0.0
    # other groups keep their accumulated moments
    other = tr.opt_state.inner_states["means"]
    mx = max(
        float(jnp.abs(l).max())
        for l in jax.tree_util.tree_leaves(other)
        if hasattr(l, "shape") and l.ndim >= 1
    )
    assert mx > 0.0


def test_opacity_reset_stops_at_refine_stop_iter():
    """gsplat DefaultStrategy gates ALL post-backward maintenance (incl.
    opacity resets) at refine_stop_iter — un-gated resets after
    densification ends collapsed the round-3 at-scale final eval."""
    cfg = tiny_cfg(reset_every=2, strategy="default",
                   refine_start_iter=10_000, refine_stop_iter=2)
    scene = init_scene_random(cfg)
    tr = Trainer(cfg, scene, width=W, height=H)
    gt = make_batch(tr)
    tr.train_step(gt)
    tr.train_step(gt)
    tr.train_step(gt)  # step==2 == refine_stop_iter -> reset must NOT fire
    state = tr.opt_state.inner_states["opacities"]
    mx = max(
        float(jnp.abs(l).max())
        for l in jax.tree_util.tree_leaves(state)
        if hasattr(l, "shape") and l.ndim >= 1
    )
    assert mx > 0.0  # moments intact => no reset fired


def test_full_checkpoint_resume(tmp_path):
    cfg = tiny_cfg()
    scene = init_scene_random(cfg)
    tr = Trainer(cfg, scene, width=W, height=H)
    gt = make_batch(tr)
    for _ in range(3):
        tr.train_step(gt)
    path = str(tmp_path / "full.npz")
    tr.save_checkpoint_full(path)

    tr2 = Trainer(cfg, init_scene_random(cfg), width=W, height=H)
    tr2.load_checkpoint_full(path)
    assert tr2.step == tr.step
    np.testing.assert_allclose(
        np.asarray(tr2.scene.means), np.asarray(tr.scene.means)
    )
    # one more step from the restored state matches exactly
    s1 = tr.train_step(gt)
    s2 = tr2.train_step(gt)
    assert s1["loss"] == pytest.approx(s2["loss"], rel=1e-6)
    np.testing.assert_allclose(
        np.asarray(tr.scene.means), np.asarray(tr2.scene.means), atol=1e-7
    )


def test_compression_eval():
    cfg = tiny_cfg(compression="png")
    scene = init_scene_random(cfg)
    tr = Trainer(cfg, scene, width=W, height=H)
    out = tr.eval_compression()
    assert out["compressed_bytes"] > 0
    assert out["psnr_vs_uncompressed"] > 20.0

    # val-split path (reference evaluates compression on val views,
    # f3dgs/simple_trainer_feature_3dgs.py:911-926)
    vm = np.eye(4, dtype=np.float32)
    vm[2, 3] = 2.5
    K = np.array(
        [[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]], np.float32
    )
    fake_val = [{"viewmat": vm, "K": K}, {"viewmat": vm, "K": K}]
    out2 = tr.eval_compression(fake_val, max_images=1)
    assert out2["compressed_bytes"] == out["compressed_bytes"]
    assert out2["psnr_vs_uncompressed"] > 20.0


class TestLPIPS:
    def test_distance_properties(self):
        from tpugs.train.lpips import lpips_distance, random_lpips_params

        params = random_lpips_params("alex")
        rng = np.random.default_rng(0)
        a = jnp.asarray(rng.uniform(0, 1, (64, 64, 3)).astype(np.float32))
        b = jnp.asarray(rng.uniform(0, 1, (64, 64, 3)).astype(np.float32))
        d_aa = float(lpips_distance(params, a, a))
        d_ab = float(lpips_distance(params, a, b))
        assert d_aa == pytest.approx(0.0, abs=1e-6)
        assert d_ab > 1e-4

    def test_torch_layout_converter(self):
        """Synthetic state_dict with the exact torchvision/lpips key
        layout: any drift in the mapping fails loudly."""
        from tpugs.train.lpips import (
            _ALEX_CONVS,
            _ALEX_FEATURE_IDX,
            load_lpips_params,
            lpips_distance,
        )

        rng = np.random.default_rng(1)
        backbone = {}
        ins = [3] + [c for c, *_ in _ALEX_CONVS][:-1]
        for (co, k, _, _), ci, fi in zip(_ALEX_CONVS, ins, _ALEX_FEATURE_IDX):
            backbone[f"features.{fi}.weight"] = rng.normal(
                0, 0.05, (co, ci, k, k)
            ).astype(np.float32)
            backbone[f"features.{fi}.bias"] = np.zeros(co, np.float32)
        lin = {
            f"lin{t}.model.1.weight": np.abs(
                rng.normal(0, 1, (1, c, 1, 1))
            ).astype(np.float32)
            for t, c in enumerate([64, 192, 384, 256, 256])
        }
        params = load_lpips_params(backbone, lin, "alex")
        a = jnp.asarray(rng.uniform(0, 1, (32, 32, 3)).astype(np.float32))
        b = a.at[:8].set(0.0)
        assert float(lpips_distance(params, a, b)) > 0.0

    def test_missing_key_fails(self):
        from tpugs.train.lpips import load_lpips_params

        with pytest.raises(KeyError):
            load_lpips_params({}, {}, "alex")

    def test_vgg_shapes(self):
        from tpugs.train.lpips import lpips_distance, random_lpips_params

        params = random_lpips_params("vgg")
        a = jnp.zeros((40, 40, 3))
        assert float(lpips_distance(params, a, a)) == pytest.approx(0.0, 1e-6)


def test_evaluate_reports_lpips():
    from tpugs.train.lpips import random_lpips_params

    cfg = tiny_cfg()
    scene = init_scene_random(cfg)
    tr = Trainer(
        cfg, scene, width=W, height=H,
        lpips_params=random_lpips_params("alex"),
    )
    gt = make_batch(tr)

    class DS:
        def __len__(self):
            return 1

        def __getitem__(self, i):
            return gt

    out = tr.evaluate(DS())
    assert "lpips" in out and np.isfinite(out["lpips"])


def test_full_checkpoint_resume_after_densification(tmp_path):
    """Resuming a checkpoint whose N differs from the fresh trainer's
    must rebuild the N-sized densification stats (GradState), or the
    first post-resume step crashes — the exact scenario the training
    supervisor exists for."""
    cfg = tiny_cfg(strategy="default", refine_start_iter=1,
                   refine_every=2, refine_stop_iter=100,
                   grow_grad2d=1e-12, prune_opa=-1.0)
    scene = init_scene_random(cfg)
    tr = Trainer(cfg, scene, width=W, height=H)
    gt = make_batch(tr)
    n0 = tr.scene.num_gaussians
    for _ in range(6):
        tr.train_step(gt)
    assert tr.scene.num_gaussians != n0, "densification never fired"
    path = str(tmp_path / "full.npz")
    tr.save_checkpoint_full(path)

    tr2 = Trainer(cfg, init_scene_random(cfg), width=W, height=H)
    assert tr2.scene.num_gaussians == n0
    tr2.load_checkpoint_full(path)
    assert tr2.grad_state.grad2d_sum.shape[0] == tr2.scene.num_gaussians
    out = tr2.train_step(gt)  # crashed before the GradState rebuild
    assert np.isfinite(out["loss"])
