"""Lift layer: fused adjoint vs autodiff oracle, pruning invariants,
end-to-end back-projection."""

import jax
import jax.numpy as jnp
import numpy as np

from tpugs.core.camera import Camera
from tpugs.encoders.base import GrayscaleEncoder, LinearRGBEncoder
from tpugs.lift.backproject import backproject_view, create_feature_field
from tpugs.lift.ops import accumulate_view
from tpugs.lift.prune import (
    compute_visibility_weights,
    prune_by_gradients,
    verify_pruning_equivalence,
)
from tpugs.raster.naive import render_naive
from tpugs.utils.synthetic import orbit_cameras, random_scene

W, H = 64, 48


def _setup(n=150, seed=0):
    scene = random_scene(n, seed=seed, extent=0.8, scale_range=(0.02, 0.1))
    cams = orbit_cameras(4, W, H, radius=2.5)
    return scene, cams


def test_adjoint_matches_autodiff_of_naive():
    """The fused adjoint must equal jax.grad of the naive renderer w.r.t.
    colors — the identity the whole reference pipeline is built on
    (backproject.py:115-150)."""
    scene, cams = _setup(n=80)
    vm, K = cams.viewmats[0], cams.Ks[0]
    D = 5
    rng = np.random.default_rng(1)
    feats = jnp.asarray(rng.normal(size=(H, W, D)).astype(np.float32))

    feat_sums, weight_sums = accumulate_view(
        scene, vm, K, W, H, feat_image=feats
    )

    def target(colors):
        img, _ = render_naive(
            scene.means, scene.quats, scene.scales, scene.opacities,
            colors, vm, K, W, H,
        )
        return jnp.sum(img * feats)

    zeros = jnp.zeros((scene.num_gaussians, D))
    g = jax.grad(target)(zeros)  # = Σ_p w(g,p) F(p)
    np.testing.assert_allclose(
        np.asarray(feat_sums), np.asarray(g), atol=3e-5
    )

    def target_ones(colors):
        img, _ = render_naive(
            scene.means, scene.quats, scene.scales, scene.opacities,
            colors, vm, K, W, H,
        )
        return jnp.sum(img)

    g1 = jax.grad(target_ones)(jnp.zeros((scene.num_gaussians, 1)))
    np.testing.assert_allclose(
        np.asarray(weight_sums), np.asarray(g1[:, 0]), atol=3e-5
    )


def test_weight_sums_bounded_by_pixels():
    """Σ_g Σ_p w(g,p) = Σ_p alpha(p) <= #pixels."""
    scene, cams = _setup()
    _, wsum = accumulate_view(scene, cams.viewmats[0], cams.Ks[0], W, H)
    total = float(jnp.sum(wsum))
    assert 0 < total <= W * H + 1e-3


def test_weight_sums_equal_alpha_integral():
    from tpugs.raster.api import plan_render, rasterize_with_plan

    scene, cams = _setup()
    vm, K = cams.viewmats[0], cams.Ks[0]
    plan = plan_render(
        scene.means, scene.quats, scene.scales, scene.opacities, vm, K, W, H
    )
    colors = jnp.abs(scene.sh0[:, 0, :])
    _, alpha = rasterize_with_plan(
        scene.means, scene.quats, scene.scales, scene.opacities,
        colors, vm, K, plan,
    )
    _, wsum = accumulate_view(scene, vm, K, W, H, plan=plan)
    np.testing.assert_allclose(
        float(jnp.sum(wsum)), float(jnp.sum(alpha)), rtol=1e-5
    )


def test_prune_then_render_equivalence():
    """The reference's core invariant (utils.py:292-360): pruning zero-
    weight Gaussians must not change any rendered pixel by > 1/510."""
    scene, cams = _setup(n=200, seed=2)
    # Plant guaranteed-invisible Gaussians (behind every orbit camera is
    # impossible; instead: far outside the frustum).
    far = scene.replace(
        means=jnp.concatenate(
            [scene.means, jnp.array([[100.0, 100.0, 100.0]] * 10)], 0
        ),
        quats=jnp.concatenate([scene.quats, jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (10, 1))], 0),
        log_scales=jnp.concatenate([scene.log_scales, jnp.full((10, 3), -3.0)], 0),
        logit_opacities=jnp.concatenate([scene.logit_opacities, jnp.full((10,), 2.0)], 0),
        sh0=jnp.concatenate([scene.sh0, jnp.ones((10, 1, 3))], 0),
        shN=jnp.concatenate([scene.shN, jnp.zeros((10, 15, 3))], 0),
    )
    pruned = prune_by_gradients(far, cams, verbose=False)
    assert pruned.num_gaussians < far.num_gaussians
    max_err, _ = verify_pruning_equivalence(far, pruned, cams, verbose=False)
    assert max_err < 1 / 510


def test_visibility_weights_detect_occlusion():
    """A Gaussian fully hidden behind an opaque wall gets ~zero weight."""
    # Wall of big opaque Gaussians at z=2, hidden point at z=3, cam at 0.
    means = jnp.array([[0.0, 0.0, 2.0], [0.0, 0.0, 3.0]])
    quats = jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (2, 1))
    log_scales = jnp.log(jnp.array([[1.0, 1.0, 0.01], [0.01, 0.01, 0.01]]))
    logit_op = jnp.array([12.0, 2.0])  # wall ~ opaque
    sh0 = jnp.ones((2, 1, 3)) * 0.5
    shN = jnp.zeros((2, 15, 3))
    from tpugs.core.scene import GaussianScene

    scene = GaussianScene(means, quats, log_scales, logit_op, sh0, shN)
    from tpugs.core.camera import intrinsics_matrix

    K = jnp.asarray(intrinsics_matrix(60.0, 60.0, W / 2, H / 2))
    vm = jnp.eye(4)
    cams = Camera(vm[None], K[None], W, H)
    weights = compute_visibility_weights(scene, cams)
    assert weights[0] > 100  # wall visible everywhere
    # alpha is capped at 0.999 so ~0.1% transmittance leaks through the
    # wall; the hidden Gaussian keeps a tiny residual weight.
    assert weights[1] < 1e-2  # hidden
    assert weights[1] < weights[0] * 1e-4


def test_create_feature_field_grayscale():
    """End-to-end lifting with the 1-d grayscale encoder: lifted feature
    of each visible Gaussian should be a convex-ish blend of scene
    luminances, and the output must be unit-norm or zero."""
    scene, cams = _setup(n=100)
    feats = create_feature_field(
        scene, cams, GrayscaleEncoder(), verbose=False
    )
    assert feats.shape == (100, 1)
    f = np.asarray(feats)
    assert np.all(np.isfinite(f))
    norms = np.abs(f[:, 0])
    # L2-normalized 1-d features are ±1 (or 0 for invisible Gaussians)
    assert np.all((np.abs(norms - 1) < 1e-4) | (norms < 1e-6))


def test_create_feature_field_multi_d_normalized():
    scene, cams = _setup(n=120)
    enc = LinearRGBEncoder(feature_dim=8, seed=0)
    feats = create_feature_field(scene, cams, enc, verbose=False)
    assert feats.shape == (120, 8)
    f = np.asarray(feats)
    norms = np.linalg.norm(f, axis=1)
    assert np.all((np.abs(norms - 1) < 1e-4) | (norms < 1e-6))
    # Visible Gaussians should have non-zero features
    w = compute_visibility_weights(scene, cams)
    assert (norms[w > 1e-3] > 0.5).all()


def test_backproject_view_constant_feature_recovers_constant():
    """If every pixel has the same feature vector v, then
    num/den = v exactly for every Gaussian with weight > 0."""
    scene, cams = _setup(n=60)
    vm, K = cams.viewmats[0], cams.Ks[0]
    v = jnp.array([0.3, -0.7, 0.2])

    class ConstEncoder:
        feature_dim = 3

        def __call__(self, img):
            return jnp.broadcast_to(v, img.shape[:2] + (3,))

    num, den = backproject_view(scene, vm, K, W, H, ConstEncoder())
    m = np.asarray(den) > 1e-5
    ratio = np.asarray(num)[m] / np.asarray(den)[m][:, None]
    expected = np.broadcast_to(np.asarray(v), ratio.shape)
    np.testing.assert_allclose(ratio, expected, atol=1e-4)
