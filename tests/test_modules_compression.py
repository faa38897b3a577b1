"""Trainer aux modules (pose/appearance) + PNG scene compression."""

import numpy as np
import jax
import jax.numpy as jnp

from tpugs.train.modules import (
    AppearanceOptModule,
    CameraOptModule,
    apply_depth_colormap,
    rotation_6d_to_matrix,
)
from tpugs.utils.synthetic import orbit_cameras, random_scene

W, H = 48, 32


def test_rotation_6d_identity_and_orthonormal():
    d6 = jnp.array([[1.0, 0, 0, 0, 1, 0]])
    R = rotation_6d_to_matrix(d6)
    np.testing.assert_allclose(np.asarray(R[0]), np.eye(3), atol=1e-6)
    rng = np.random.default_rng(0)
    d6r = jnp.asarray(rng.normal(size=(5, 6)).astype(np.float32))
    Rr = np.asarray(rotation_6d_to_matrix(d6r))
    for R in Rr:
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
        assert np.linalg.det(R) > 0.99


def test_camera_opt_identity_init():
    mod = CameraOptModule(n_cameras=3)
    c2w = jnp.tile(jnp.eye(4)[None], (2, 1, 1))
    ids = jnp.array([0, 2])
    params = mod.init(jax.random.PRNGKey(0), c2w, ids)
    out = mod.apply(params, c2w, ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(c2w), atol=1e-6)
    # gradients flow to the selected rows only (linear probe — a
    # quadratic loss has zero gradient at the identity pose)
    probe = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 4, 4)).astype(np.float32)
    )

    def loss(p):
        return jnp.sum(mod.apply(p, c2w, ids) * probe)

    g = jax.grad(loss)(params)["params"]["pose_deltas"]
    assert np.abs(np.asarray(g[0])).sum() > 0
    assert np.abs(np.asarray(g[1])).sum() == 0


def test_appearance_module_shapes():
    mod = AppearanceOptModule(n_images=4, feature_dim=8, embed_dim=4,
                              sh_degree=2)
    feats = jnp.zeros((10, 8))
    dirs = jnp.tile(jnp.array([[0.0, 0, 1.0]]), (10, 1))
    params = mod.init(jax.random.PRNGKey(0), feats, jnp.int32(1), dirs)
    out = mod.apply(params, feats, jnp.int32(1), dirs)
    assert out.shape == (10, 3)
    out2 = mod.apply(params, feats, None, dirs)
    assert out2.shape == (10, 3)


def test_depth_colormap():
    d = np.linspace(0, 1, 64).reshape(8, 8)
    img = apply_depth_colormap(d)
    assert img.shape == (8, 8, 3) and img.dtype == np.uint8


def test_compression_roundtrip_render_quality(tmp_path):
    from tpugs.io.compression import (
        compress_scene,
        compressed_size_bytes,
        decompress_scene,
    )
    from tpugs.raster.api import plan_render, rasterize_with_plan
    from tpugs.train.metrics import psnr

    scene = random_scene(200, seed=0, extent=0.8, scale_range=(0.02, 0.1))
    cams = orbit_cameras(1, W, H, radius=2.5)
    out = str(tmp_path / "compressed")
    meta = compress_scene(scene, out)
    assert meta["n"] == 200
    size = compressed_size_bytes(out)
    raw = 200 * (3 + 4 + 3 + 1 + 3 + 45) * 4
    assert size < raw  # actually compresses

    back = decompress_scene(out)
    assert back.num_gaussians == 200

    def render(s):
        plan = plan_render(
            s.means, s.quats, s.scales, s.opacities,
            cams.viewmats[0], cams.Ks[0], W, H,
        )
        img, _ = rasterize_with_plan(
            s.means, s.quats, s.scales, s.opacities, s.colors_all,
            cams.viewmats[0], cams.Ks[0], plan, sh_degree=3,
        )
        return jnp.clip(img, 0, 1)

    p = float(psnr(render(back), render(scene)))
    assert p > 30.0, f"compression render PSNR too low: {p}"
