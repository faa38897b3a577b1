"""Rasterizer correctness: tiled renderer vs the naive dense oracle,
autodiff gradients vs finite differences (SURVEY §4 test plan)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpugs.raster.api import plan_render, rasterize, rasterize_with_plan
from tpugs.raster.naive import render_naive, render_naive_sh
from tpugs.raster.projection import ProjectionConfig
from tpugs.raster.tiled import TileConfig
from tpugs.utils.synthetic import orbit_cameras, random_scene

W, H = 64, 48


def _setup(n=300, seed=0, sh_degree=3):
    scene = random_scene(n, seed=seed, sh_degree=sh_degree, extent=0.8,
                         scale_range=(0.02, 0.12))
    cams = orbit_cameras(3, W, H, radius=2.5)
    return scene, cams


def _args(scene):
    return (
        scene.means,
        scene.quats,
        scene.scales,
        scene.opacities,
    )


@pytest.mark.parametrize("cam_idx", [0, 1, 2])
def test_tiled_matches_naive_rgb(cam_idx):
    scene, cams = _setup()
    vm, K = cams.viewmats[cam_idx], cams.Ks[cam_idx]
    colors = jnp.abs(scene.sh0[:, 0, :])

    img_naive, alpha_naive = render_naive(
        *_args(scene), colors, vm, K, W, H
    )
    plan = plan_render(*_args(scene), vm, K, W, H)
    img_tiled, alpha_tiled = rasterize_with_plan(
        *_args(scene), colors, vm, K, plan
    )
    np.testing.assert_allclose(
        np.asarray(img_tiled), np.asarray(img_naive), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(alpha_tiled), np.asarray(alpha_naive), atol=2e-5
    )


def test_tiled_matches_naive_sh():
    scene, cams = _setup()
    vm, K = cams.viewmats[0], cams.Ks[0]
    img_naive, _ = render_naive_sh(
        scene.means, scene.quats, scene.scales, scene.opacities,
        scene.colors_all, vm, K, W, H, sh_degree=3,
    )
    plan = plan_render(*_args(scene), vm, K, W, H)
    img_tiled, _ = rasterize_with_plan(
        *_args(scene), scene.colors_all, vm, K, plan, sh_degree=3
    )
    np.testing.assert_allclose(
        np.asarray(img_tiled), np.asarray(img_naive), atol=2e-5
    )


def test_tiled_block_boundary_invariance():
    """The block-parallel prefix compositing must be independent of the
    block size (exactness of the parallel scan vs serial recurrence)."""
    scene, cams = _setup(n=500)
    vm, K = cams.viewmats[0], cams.Ks[0]
    colors = jnp.abs(scene.sh0[:, 0, :])
    images = []
    for bs in (16, 64, 128):
        plan = plan_render(
            *_args(scene), vm, K, W, H,
            tile_config=TileConfig(block_size=bs),
        )
        img, _ = rasterize_with_plan(*_args(scene), colors, vm, K, plan)
        images.append(np.asarray(img))
    np.testing.assert_allclose(images[0], images[1], atol=1e-5)
    np.testing.assert_allclose(images[1], images[2], atol=1e-5)


def test_background_blending():
    scene, cams = _setup(n=50)
    vm, K = cams.viewmats[0], cams.Ks[0]
    colors = jnp.abs(scene.sh0[:, 0, :])
    bg = jnp.array([1.0, 0.0, 0.5])
    plan = plan_render(*_args(scene), vm, K, W, H)
    img, alpha = rasterize_with_plan(
        *_args(scene), colors, vm, K, plan, background=bg
    )
    img0, _ = rasterize_with_plan(*_args(scene), colors, vm, K, plan)
    expected = np.asarray(img0) + (1 - np.asarray(alpha))[..., None] * np.asarray(bg)
    np.testing.assert_allclose(np.asarray(img), expected, atol=1e-6)


def test_depth_modes():
    scene, cams = _setup(n=200)
    vm, K = cams.viewmats[0], cams.Ks[0]
    colors = jnp.abs(scene.sh0[:, 0, :])
    plan = plan_render(*_args(scene), vm, K, W, H)
    rgbd, alpha = rasterize_with_plan(
        *_args(scene), colors, vm, K, plan, render_mode="RGB+D"
    )
    assert rgbd.shape == (H, W, 4)
    rgbed, _ = rasterize_with_plan(
        *_args(scene), colors, vm, K, plan, render_mode="RGB+ED"
    )
    # ED = D / alpha where alpha > 0
    a = np.asarray(alpha)
    m = a > 0.1
    np.testing.assert_allclose(
        np.asarray(rgbed[..., 3])[m],
        np.asarray(rgbd[..., 3])[m] / a[m],
        rtol=1e-4,
    )
    # Depth should be near the camera distance scale (positive where hit)
    assert np.all(np.asarray(rgbd[..., 3])[m] > 0)


def test_rasterize_facade_multicamera():
    scene, cams = _setup(n=100)
    colors = jnp.abs(scene.sh0[:, 0, :])
    imgs, alphas, meta = rasterize(
        *_args(scene), colors, cams.viewmats, cams.Ks, W, H
    )
    assert imgs.shape == (3, H, W, 3)
    assert alphas.shape == (3, H, W, 1)
    assert meta["means2d"].shape == (3, scene.num_gaussians, 2)


def test_tiled_gradients_match_naive():
    """d(loss)/d(all params) must agree between tiled and naive paths."""
    scene, cams = _setup(n=120)
    vm, K = cams.viewmats[0], cams.Ks[0]
    colors = jnp.abs(scene.sh0[:, 0, :])
    plan = plan_render(*_args(scene), vm, K, W, H)
    target = jnp.ones((H, W, 3)) * 0.3

    def loss_tiled(means, quats, scales, opac, cols):
        img, _ = rasterize_with_plan(means, quats, scales, opac, cols, vm, K, plan)
        return jnp.sum((img - target) ** 2)

    def loss_naive(means, quats, scales, opac, cols):
        img, _ = render_naive(means, quats, scales, opac, cols, vm, K, W, H)
        return jnp.sum((img - target) ** 2)

    args = (*_args(scene), colors)
    g_tiled = jax.grad(loss_tiled, argnums=(0, 1, 2, 3, 4))(*args)
    g_naive = jax.grad(loss_naive, argnums=(0, 1, 2, 3, 4))(*args)
    for gt, gn, name in zip(
        g_tiled, g_naive, ["means", "quats", "scales", "opac", "colors"]
    ):
        gt, gn = np.asarray(gt), np.asarray(gn)
        scale = np.abs(gn).max() + 1e-8
        np.testing.assert_allclose(
            gt / scale, gn / scale, atol=5e-5, err_msg=name
        )


def test_color_gradient_finite_difference():
    """Gradient w.r.t. colors is the blend-weight sum — check vs FD.
    This gradient IS the back-projection operator (reference
    backproject.py:127-131), so it must be right."""
    scene, cams = _setup(n=60)
    vm, K = cams.viewmats[0], cams.Ks[0]
    colors = jnp.abs(scene.sh0[:, 0, :])
    plan = plan_render(*_args(scene), vm, K, W, H)
    feats = jnp.asarray(
        np.random.default_rng(3).normal(size=(H, W, 3)), jnp.float32
    )

    def loss(cols):
        img, _ = rasterize_with_plan(*_args(scene), cols, vm, K, plan)
        return jnp.sum(img * feats)

    g = np.asarray(jax.grad(loss)(colors))
    rng = np.random.default_rng(0)
    for _ in range(5):
        i = rng.integers(0, colors.shape[0])
        j = rng.integers(0, 3)
        eps = 1e-2
        cp = colors.at[i, j].add(eps)
        cm = colors.at[i, j].add(-eps)
        fd = (float(loss(cp)) - float(loss(cm))) / (2 * eps)
        # colors enter linearly -> FD is exact up to float noise
        np.testing.assert_allclose(g[i, j], fd, atol=5e-3)


def test_empty_scene_renders_background():
    scene, cams = _setup(n=10)
    vm, K = cams.viewmats[0], cams.Ks[0]
    # Push all Gaussians behind the camera.
    scene = scene.replace(means=scene.means + jnp.array([0.0, 0.0, 1e4]))
    colors = jnp.abs(scene.sh0[:, 0, :])
    plan = plan_render(*_args(scene), vm, K, W, H)
    img, alpha = rasterize_with_plan(
        *_args(scene), colors, vm, K, plan,
        background=jnp.array([0.2, 0.4, 0.6]),
    )
    np.testing.assert_allclose(np.asarray(alpha), 0.0, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(img), np.broadcast_to([0.2, 0.4, 0.6], (H, W, 3)), atol=1e-6
    )


def test_scene_padding_no_effect():
    scene, cams = _setup(n=100)
    vm, K = cams.viewmats[0], cams.Ks[0]
    colors = jnp.abs(scene.sh0[:, 0, :])
    plan = plan_render(*_args(scene), vm, K, W, H)
    img, _ = rasterize_with_plan(*_args(scene), colors, vm, K, plan)

    padded = scene.pad_to(256)
    colors_p = jnp.concatenate([colors, jnp.zeros((156, 3))], 0)
    plan_p = plan_render(*_args(padded), vm, K, W, H)
    img_p, _ = rasterize_with_plan(*_args(padded), colors_p, vm, K, plan_p)
    np.testing.assert_allclose(np.asarray(img), np.asarray(img_p), atol=1e-6)
