"""Training-path Pallas kernels (raster/pallas_train.py) vs the
pure-JAX tiled renderer and its autodiff gradients (interpret mode on
CPU; the same kernels compile for real on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpugs.raster.api import plan_render
from tpugs.raster.pallas_tiled import build_pallas_plan
from tpugs.raster.pallas_train import render_plan_train
from tpugs.raster.projection import ProjectionConfig, project
from tpugs.raster.tiled import render_tiled_autodiff
from tpugs.utils.synthetic import orbit_cameras, random_scene

W, H = 64, 48


def _setup(n=160, seed=0, D=11, with_bg=True, cam_idx=0):
    scene = random_scene(n, seed=seed, extent=0.8, scale_range=(0.02, 0.1))
    cams = orbit_cameras(2, W, H, radius=2.5)
    vm, K = cams.viewmats[cam_idx], cams.Ks[cam_idx]
    proj = project(
        scene.means, scene.quats, scene.scales, scene.opacities,
        vm, K, W, H, ProjectionConfig(),
    )
    opac = jnp.where(proj.valid, proj.opacities, 0.0)
    rng = np.random.default_rng(seed + 100)
    colors = jnp.asarray(rng.uniform(0, 1, (n, D)).astype(np.float32))
    bg = (
        jnp.asarray(rng.uniform(0, 1, (D,)).astype(np.float32))
        if with_bg
        else None
    )
    rplan = plan_render(
        scene.means, scene.quats, scene.scales, scene.opacities, vm, K, W, H
    )
    pplan = build_pallas_plan(
        scene.means, scene.quats, scene.scales, scene.opacities, vm, K, W, H
    )
    return proj, opac, colors, bg, rplan, pplan


def _oracle_render(proj, opac, colors, bg, rplan):
    o = rplan.order
    return render_tiled_autodiff(
        proj.means2d[o], proj.conics[o], opac[o], colors[o],
        rplan.sorted_gid, rplan.tile_starts, W, H, rplan.max_blocks,
        rplan.tile_config, background=bg,
    )


@pytest.mark.parametrize("D,with_bg", [(3, False), (11, True)])
def test_train_forward_matches_tiled(D, with_bg):
    proj, opac, colors, bg, rplan, pplan = _setup(D=D, with_bg=with_bg)
    img_ref, alpha_ref = _oracle_render(proj, opac, colors, bg, rplan)
    img, alpha = render_plan_train(
        proj.means2d, proj.conics, opac, colors, pplan,
        background=bg, interpret=True, trans_eps=0.0,
    )
    np.testing.assert_allclose(
        np.asarray(img), np.asarray(img_ref), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(alpha), np.asarray(alpha_ref), atol=2e-5
    )


@pytest.mark.parametrize("D,with_bg,seed", [(3, True, 0), (11, False, 1)])
def test_train_gradients_match_autodiff(D, with_bg, seed):
    """Full geometric backward (means2d / conics / opacities / colors /
    background) vs jax.grad of the pure-JAX tiled renderer."""
    proj, opac, colors, bg, rplan, pplan = _setup(
        D=D, with_bg=with_bg, seed=seed
    )
    rng = np.random.default_rng(seed + 7)
    r = jnp.asarray(rng.normal(0, 1, (H, W, D)).astype(np.float32))
    s = jnp.asarray(rng.normal(0, 1, (H, W)).astype(np.float32))

    def loss_of(render_fn):
        def f(m2d, con, op, cols, *bg_arg):
            b = bg_arg[0] if bg_arg else None
            img, alpha = render_fn(m2d, con, op, cols, b)
            return jnp.sum(img * r) + jnp.sum(alpha * s)

        return f

    def ref_render(m2d, con, op, cols, b):
        o = rplan.order
        return render_tiled_autodiff(
            m2d[o], con[o], op[o], cols[o],
            rplan.sorted_gid, rplan.tile_starts, W, H, rplan.max_blocks,
            rplan.tile_config, background=b,
        )

    def our_render(m2d, con, op, cols, b):
        return render_plan_train(
            m2d, con, op, cols, pplan, background=b,
            interpret=True, trans_eps=0.0,
        )

    args = (proj.means2d, proj.conics, opac, colors)
    if with_bg:
        args = args + (bg,)
    argnums = tuple(range(len(args)))
    g_ref = jax.grad(loss_of(ref_render), argnums)(*args)
    g_our = jax.grad(loss_of(our_render), argnums)(*args)

    names = ["means2d", "conics", "opacities", "colors", "background"]
    for name, a, b_ in zip(names, g_ref, g_our):
        a, b_ = np.asarray(a), np.asarray(b_)
        scale = max(1.0, float(np.abs(a).max()))
        np.testing.assert_allclose(
            b_, a, atol=2e-4 * scale, rtol=2e-4,
            err_msg=f"gradient mismatch: {name}",
        )


def test_train_gradients_bf16_contribs_close_to_f32():
    """bf16 per-intersection gradient rows (the train-step HBM diet,
    TrainConfig.pallas_contrib_dtype) stay within bf16 tolerance of the
    exact f32 backward — the same contract the lift path's bf16
    contribution rows ship under."""
    proj, opac, colors, bg, rplan, pplan = _setup(D=8, with_bg=True)
    rng = np.random.default_rng(9)
    r = jnp.asarray(rng.normal(0, 1, (H, W, 8)).astype(np.float32))

    def loss_with(dtype):
        def f(m2d, con, op, cols):
            img, _ = render_plan_train(
                m2d, con, op, cols, pplan, background=bg,
                interpret=True, trans_eps=0.0, contrib_dtype=dtype,
            )
            return jnp.sum(img * r)

        return f

    args = (proj.means2d, proj.conics, opac, colors)
    g32 = jax.grad(loss_with(jnp.float32), (0, 1, 2, 3))(*args)
    g16 = jax.grad(loss_with(jnp.bfloat16), (0, 1, 2, 3))(*args)
    for name, a, b_ in zip(
        ["means2d", "conics", "opacities", "colors"], g32, g16
    ):
        a, b_ = np.asarray(a), np.asarray(b_)
        scale = max(1.0, float(np.abs(a).max()))
        np.testing.assert_allclose(
            b_, a, atol=1.5e-2 * scale,
            err_msg=f"bf16 contrib gradient drift: {name}",
        )


def test_train_value_and_grad_jit():
    """The custom VJP composes under jit + value_and_grad and returns
    finite gradients with the production early-exit threshold."""
    proj, opac, colors, bg, rplan, pplan = _setup(D=8, with_bg=True)
    target = jnp.zeros((H, W, 8), jnp.float32)

    @jax.jit
    def step(m2d, con, op, cols, b):
        def f(m2d, con, op, cols, b):
            img, alpha = render_plan_train(
                m2d, con, op, cols, pplan, background=b, interpret=True
            )
            return jnp.mean((img - target) ** 2) + 0.01 * jnp.mean(alpha)

        return jax.value_and_grad(f, (0, 1, 2, 3, 4))(m2d, con, op, cols, b)

    val, grads = step(proj.means2d, proj.conics, opac, colors, bg)
    assert np.isfinite(float(val))
    for g in grads:
        assert np.all(np.isfinite(np.asarray(g)))
    # at least some gradients are nonzero (the scene is visible)
    assert float(jnp.abs(grads[3]).sum()) > 0.0


def test_train_grad_chains_through_projection():
    """End-to-end: gradients flow to scene parameters (means / quats /
    scales / opacities) through project() + the Pallas render, matching
    autodiff through the tiled path."""
    scene = random_scene(120, seed=3, extent=0.8, scale_range=(0.02, 0.1))
    cams = orbit_cameras(1, W, H, radius=2.5)
    vm, K = cams.viewmats[0], cams.Ks[0]
    colors = jnp.abs(scene.sh0[:, 0, :])
    rplan = plan_render(
        scene.means, scene.quats, scene.scales, scene.opacities, vm, K, W, H
    )
    pplan = build_pallas_plan(
        scene.means, scene.quats, scene.scales, scene.opacities, vm, K, W, H
    )
    rng = np.random.default_rng(11)
    r = jnp.asarray(rng.normal(0, 1, (H, W, 3)).astype(np.float32))

    def loss(means, quats, scales, opacs, use_pallas):
        proj = project(
            means, quats, scales, opacs, vm, K, W, H, ProjectionConfig()
        )
        om = jnp.where(proj.valid, proj.opacities, 0.0)
        if use_pallas:
            img, _ = render_plan_train(
                proj.means2d, proj.conics, om, colors, pplan,
                interpret=True, trans_eps=0.0,
            )
        else:
            o = rplan.order
            img, _ = render_tiled_autodiff(
                proj.means2d[o], proj.conics[o], om[o], colors[o],
                rplan.sorted_gid, rplan.tile_starts, W, H,
                rplan.max_blocks, rplan.tile_config,
            )
        return jnp.sum(img * r)

    args = (scene.means, scene.quats, scene.scales, scene.opacities)
    g_ref = jax.grad(lambda *a: loss(*a, False), (0, 1, 2, 3))(*args)
    g_our = jax.grad(lambda *a: loss(*a, True), (0, 1, 2, 3))(*args)
    for name, a, b in zip(["means", "quats", "scales", "opacities"],
                          g_ref, g_our):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(1.0, float(np.abs(a).max()))
        np.testing.assert_allclose(
            b, a, atol=3e-4 * scale, rtol=3e-4,
            err_msg=f"scene gradient mismatch: {name}",
        )
