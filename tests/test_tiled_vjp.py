"""Custom VJP of render_tiled vs the plain-autodiff oracle.

The trainer differentiates through render_tiled at feature-channel
width; the recompute-based custom VJP exists so that backward memory
is O(block) instead of O(all blocks) (see tiled.py docstring). These
tests pin every gradient path — means2d, conics, opacities, colors,
background — under cotangents on both outputs (image AND alpha),
against jax.grad of the identical plain-autodiff composition.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpugs.raster.binning import build_tile_binning
from tpugs.raster.projection import ProjectionConfig, project
from tpugs.raster.tiled import (
    TileConfig,
    render_tiled,
    render_tiled_autodiff,
    required_blocks,
)
from tpugs.utils.synthetic import orbit_cameras, random_scene


def _setup(n=300, w=64, h=48, d=5, seed=3):
    scene = random_scene(n, seed=seed, extent=0.8, scale_range=(0.02, 0.12))
    cams = orbit_cameras(1, w, h, radius=2.5)
    vm, K = cams.viewmats[0], cams.Ks[0]
    proj = project(
        scene.means, scene.quats, scene.scales, scene.opacities,
        vm, K, w, h, ProjectionConfig(),
    )
    cfg = TileConfig(tile_size=16, block_size=32, tiles_per_chunk=4)
    binning = build_tile_binning(proj, cfg.tile_size, w, h, max_cover=64)
    order = binning.order
    opac = jnp.where(proj.valid, proj.opacities, 0.0)
    rng = np.random.default_rng(seed)
    colors = jnp.asarray(rng.uniform(0, 1, (n, d)).astype(np.float32))
    mb = required_blocks(binning, cfg.block_size)
    args = (
        proj.means2d[order], proj.conics[order], opac[order],
        colors[order], binning.sorted_gid, binning.tile_starts,
    )
    return args, w, h, mb, cfg, rng


@pytest.mark.parametrize("with_bg", [False, True])
def test_custom_vjp_matches_autodiff(with_bg):
    args, w, h, mb, cfg, rng = _setup()
    d = args[3].shape[-1]
    bg = (
        jnp.asarray(rng.uniform(0, 1, (d,)).astype(np.float32))
        if with_bg else None
    )
    # random cotangents on both outputs
    ct_img = jnp.asarray(rng.normal(size=(h, w, d)).astype(np.float32))
    ct_alpha = jnp.asarray(rng.normal(size=(h, w)).astype(np.float32))

    def loss(fn, m2d, con, opa, col, background):
        img, alpha = fn(
            m2d, con, opa, col, args[4], args[5], w, h, mb, cfg,
            background,
        )
        return jnp.sum(img * ct_img) + jnp.sum(alpha * ct_alpha)

    diff_args = args[:4] + (bg,)
    argnums = (1, 2, 3, 4) if bg is None else (1, 2, 3, 4, 5)
    g_ref = jax.grad(loss, argnums=argnums)(
        render_tiled_autodiff, *diff_args
    )
    g_new = jax.grad(loss, argnums=argnums)(render_tiled, *diff_args)

    names = ["means2d", "conics", "opacities", "colors", "background"]
    for name, a, b in zip(names, g_ref, g_new):
        scale = max(1e-3, float(jnp.max(jnp.abs(a))))
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=0, atol=2e-4 * scale,
            err_msg=f"grad mismatch: {name}",
        )


def test_custom_vjp_forward_identical():
    args, w, h, mb, cfg, _ = _setup(seed=7)
    img_a, al_a = render_tiled_autodiff(*args, w, h, mb, cfg)
    img_b, al_b = render_tiled(*args, w, h, mb, cfg)
    np.testing.assert_allclose(np.asarray(img_b), np.asarray(img_a))
    np.testing.assert_allclose(np.asarray(al_b), np.asarray(al_a))


def test_custom_vjp_under_jit_and_value_and_grad():
    args, w, h, mb, cfg, _ = _setup(n=120, w=32, h=32, d=3, seed=11)

    @jax.jit
    def f(col):
        img, alpha = render_tiled(
            args[0], args[1], args[2], col, args[4], args[5],
            w, h, mb, cfg,
        )
        return jnp.mean(img) + jnp.mean(alpha)

    v, g = jax.value_and_grad(f)(args[3])
    assert np.isfinite(float(v))
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0
