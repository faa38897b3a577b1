"""Pallas kernel correctness vs the pure-JAX tiled path (interpret mode
on CPU; the same kernels compile for real on TPU — exercised by bench)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpugs.raster.api import plan_render, rasterize_with_plan
from tpugs.raster.pallas_tiled import (
    backproject_view_pallas,
    build_pallas_plan,
    render_view_pallas,
)
from tpugs.lift.ops import accumulate_view
from tpugs.utils.synthetic import orbit_cameras, random_scene

W, H = 64, 48


def _setup(n=200, seed=0):
    scene = random_scene(n, seed=seed, extent=0.8, scale_range=(0.02, 0.1))
    cams = orbit_cameras(2, W, H, radius=2.5)
    return scene, cams


def _args(scene):
    return scene.means, scene.quats, scene.scales, scene.opacities


def test_pallas_plan_slot_table():
    """Every real intersection appears exactly once in the slot table,
    at a position inside its tile's padded span."""
    scene, cams = _setup(n=100)
    plan = build_pallas_plan(*_args(scene), cams.viewmats[0], cams.Ks[0], W, H)
    slots = np.asarray(plan.slots)
    valid = slots < plan.T_padded
    real = slots[valid]
    assert len(real) == len(np.unique(real)), "slot collisions"
    ps = np.asarray(plan.padded_starts)
    starts = np.asarray(plan.tile_starts)
    ends = np.asarray(plan.tile_ends)
    n_real = int((ends - starts).sum())
    assert valid.sum() == n_real, "slot count != intersection count"


@pytest.mark.parametrize("cam_idx", [0, 1])
def test_pallas_render_matches_tiled(cam_idx):
    scene, cams = _setup()
    vm, K = cams.viewmats[cam_idx], cams.Ks[cam_idx]
    colors = jnp.abs(scene.sh0[:, 0, :])

    plan_ref = plan_render(*_args(scene), vm, K, W, H)
    img_ref, alpha_ref = rasterize_with_plan(
        *_args(scene), colors, vm, K, plan_ref
    )
    plan = build_pallas_plan(*_args(scene), vm, K, W, H)
    img, alpha = render_view_pallas(
        *_args(scene), colors, vm, K, plan, interpret=True
    )
    # early-exit threshold allows 1e-4-level differences
    np.testing.assert_allclose(
        np.asarray(img), np.asarray(img_ref), atol=3e-4
    )
    np.testing.assert_allclose(
        np.asarray(alpha), np.asarray(alpha_ref), atol=3e-4
    )


def test_pallas_render_sh_and_depth():
    scene, cams = _setup(n=120)
    vm, K = cams.viewmats[0], cams.Ks[0]
    plan_ref = plan_render(*_args(scene), vm, K, W, H)
    img_ref, _ = rasterize_with_plan(
        *_args(scene), scene.colors_all, vm, K, plan_ref,
        sh_degree=3, render_mode="RGB+D",
    )
    plan = build_pallas_plan(*_args(scene), vm, K, W, H)
    img, _ = render_view_pallas(
        *_args(scene), scene.colors_all, vm, K, plan,
        sh_degree=3, render_mode="RGB+D", interpret=True,
    )
    np.testing.assert_allclose(np.asarray(img), np.asarray(img_ref), atol=5e-4)


def test_pallas_adjoint_matches_jax():
    scene, cams = _setup(n=150)
    vm, K = cams.viewmats[0], cams.Ks[0]
    D = 20
    rng = np.random.default_rng(2)
    feats = jnp.asarray(rng.normal(size=(H, W, D)).astype(np.float32))

    fs_ref, ws_ref = accumulate_view(scene, vm, K, W, H, feat_image=feats)

    plan = build_pallas_plan(*_args(scene), vm, K, W, H)
    fs, ws = backproject_view_pallas(
        *_args(scene), feats, vm, K, plan, d_chunk=16, interpret=True,
        trans_eps=0.0,
    )
    np.testing.assert_allclose(
        np.asarray(ws), np.asarray(ws_ref), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(fs), np.asarray(fs_ref), atol=1e-4
    )


def test_pallas_adjoint_channel_chunking_consistent():
    scene, cams = _setup(n=80)
    vm, K = cams.viewmats[0], cams.Ks[0]
    D = 24
    feats = jnp.asarray(
        np.random.default_rng(0).normal(size=(H, W, D)).astype(np.float32)
    )
    plan = build_pallas_plan(*_args(scene), vm, K, W, H)
    fs1, ws1 = backproject_view_pallas(
        *_args(scene), feats, vm, K, plan, d_chunk=8, interpret=True
    )
    fs2, ws2 = backproject_view_pallas(
        *_args(scene), feats, vm, K, plan, d_chunk=32, interpret=True
    )
    np.testing.assert_allclose(np.asarray(fs1), np.asarray(fs2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ws1), np.asarray(ws2), atol=1e-5)


def test_pallas_sizes_path_with_cover_caps():
    """estimate_sizes + build_plan_pure + prefix-capped reduction must
    match the host-bucketed plan path."""
    from tpugs.lift.pallas_batch import (
        backproject_one_view_pallas,
        estimate_sizes_pallas,
    )
    from tpugs.encoders.base import LinearRGBEncoder

    scene, cams = _setup(n=150)
    vm, K = cams.viewmats[0], cams.Ks[0]
    sizes = estimate_sizes_pallas(scene, cams, tile_size=16)
    assert len(sizes.cover_caps) == sizes.cover_pad
    assert all(
        sizes.cover_caps[j] >= sizes.cover_caps[j + 1]
        for j in range(len(sizes.cover_caps) - 1)
    )
    import jax.numpy as jnp2

    enc = LinearRGBEncoder(feature_dim=8)
    fs, ws = backproject_one_view_pallas(
        scene, vm, K, W, H, enc, sizes, d_chunk=16,
        interpret=True, trans_eps=0.0, tile_size=16,
        contrib_dtype=jnp2.float32,
    )
    fs_ref, ws_ref = accumulate_view(
        scene, vm, K, W, H,
        feat_image=None,
    )
    np.testing.assert_allclose(np.asarray(ws), np.asarray(ws_ref), atol=1e-4)



def test_pallas_bf16_contribs_close():
    """bfloat16 contribution rows (the production fast path) stay within
    ~0.5% relative error of the exact float32 path."""
    from tpugs.lift.pallas_batch import (
        backproject_one_view_pallas,
        estimate_sizes_pallas,
    )
    from tpugs.encoders.base import LinearRGBEncoder

    scene, cams = _setup(n=120)
    vm, K = cams.viewmats[0], cams.Ks[0]
    sizes = estimate_pallas = estimate_sizes_pallas(scene, cams, tile_size=16)
    enc = LinearRGBEncoder(feature_dim=8)
    kw = dict(d_chunk=16, interpret=True, trans_eps=0.0, tile_size=16)
    fs32, ws32 = backproject_one_view_pallas(
        scene, vm, K, W, H, enc, sizes, contrib_dtype=jnp.float32, **kw
    )
    fsbf, wsbf = backproject_one_view_pallas(
        scene, vm, K, W, H, enc, sizes, contrib_dtype=jnp.bfloat16, **kw
    )
    scale = float(jnp.abs(ws32).max())
    assert float(jnp.abs(wsbf - ws32).max()) < 0.005 * scale
    fscale = float(jnp.abs(fs32).max())
    assert float(jnp.abs(fsbf - fs32).max()) < 0.01 * fscale


def test_grouped_dispatch_matches_loop():
    """backproject_views_grouped (incl. the padded last group) must match
    per-view accumulation exactly."""
    from tpugs.encoders.base import LinearRGBEncoder
    from tpugs.lift.pallas_batch import (
        backproject_one_view_pallas,
        backproject_views_grouped,
        estimate_sizes_pallas,
    )

    scene, _ = _setup(n=100)
    cams = orbit_cameras(3, W, H, radius=2.5)  # 3 views, group=2 -> pad
    sizes = estimate_sizes_pallas(scene, cams, tile_size=16)
    enc = LinearRGBEncoder(feature_dim=8)
    kw = dict(interpret=True, tile_size=16, d_chunk=16,
              contrib_dtype=jnp.float32)
    num_g, den_g = backproject_views_grouped(
        scene, cams.viewmats, cams.Ks, W, H, enc, sizes, group_size=2, **kw
    )
    num = jnp.zeros_like(num_g)
    den = jnp.zeros_like(den_g)
    for c in range(3):
        fs, ws = backproject_one_view_pallas(
            scene, cams.viewmats[c], cams.Ks[c], W, H, enc, sizes, **kw
        )
        num, den = num + fs, den + ws
    np.testing.assert_allclose(np.asarray(den_g), np.asarray(den), atol=1e-4)
    np.testing.assert_allclose(np.asarray(num_g), np.asarray(num), atol=1e-4)
