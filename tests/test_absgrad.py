"""absgrad densification stat (gsplat's ``means2d.absgrad``; reference
flag at ``f3dgs/simple_trainer_feature_3dgs.py:453-476``): per-Gaussian
``sum_p |dL/d means2d(p)|`` with the abs applied per pixel, exposed on
both rasterizer engines through the ``abs_probe`` VJP input.

Pinned against a dense per-pixel jacobian oracle: compositing is
per-pixel independent, so ``dL/d alpha_b(p) = d l(p)/d alpha_b(p)`` and
the per-pixel gradient is exactly one row of the jacobian of the
pixelwise loss vector.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tpugs.raster.api import plan_render
from tpugs.raster.pallas_tiled import build_pallas_plan
from tpugs.raster.pallas_train import render_plan_train
from tpugs.raster.projection import ProjectionConfig, project
from tpugs.raster.tiled import render_tiled, render_tiled_autodiff
from tpugs.utils.synthetic import orbit_cameras, random_scene

W, H = 32, 16
N = 40
D = 3


def _setup(seed=0):
    scene = random_scene(N, seed=seed, extent=0.8, scale_range=(0.05, 0.2))
    cams = orbit_cameras(2, W, H, radius=2.5)
    vm, K = cams.viewmats[0], cams.Ks[0]
    proj = project(
        scene.means, scene.quats, scene.scales, scene.opacities,
        vm, K, W, H, ProjectionConfig(),
    )
    opac = jnp.where(proj.valid, proj.opacities, 0.0)
    rng = np.random.default_rng(seed + 100)
    colors = jnp.asarray(rng.uniform(0, 1, (N, D)).astype(np.float32))
    r = jnp.asarray(rng.normal(0, 1, (H, W, D)).astype(np.float32))
    s = jnp.asarray(rng.normal(0, 1, (H, W)).astype(np.float32))
    rplan = plan_render(
        scene.means, scene.quats, scene.scales, scene.opacities, vm, K, W, H
    )
    pplan = build_pallas_plan(
        scene.means, scene.quats, scene.scales, scene.opacities, vm, K, W, H
    )
    return proj, opac, colors, r, s, rplan, pplan


def _oracle_absgrad(proj, opac, colors, r, s, rplan):
    """Dense oracle: |row p of the jacobian of the pixelwise loss|,
    summed over pixels — through the autodiff tiled renderer that the
    production backward is already pinned against."""
    o = rplan.order

    def pixel_losses(m2d):
        img, alpha = render_tiled_autodiff(
            m2d[o], proj.conics[o], opac[o], colors[o],
            rplan.sorted_gid, rplan.tile_starts, W, H, rplan.max_blocks,
            rplan.tile_config,
        )
        return jnp.sum(img * r, axis=-1) + alpha * s  # (H, W)

    J = jax.jacrev(pixel_losses)(proj.means2d)  # (H, W, N, 2)
    return jnp.sum(jnp.abs(J), axis=(0, 1))  # (N, 2)


def test_absgrad_tiled_matches_dense_oracle():
    proj, opac, colors, r, s, rplan, pplan = _setup()
    oracle = np.asarray(_oracle_absgrad(proj, opac, colors, r, s, rplan))

    o = rplan.order

    def loss(m2d, absp):
        img, alpha = render_tiled(
            m2d[o], proj.conics[o], opac[o], colors[o],
            rplan.sorted_gid, rplan.tile_starts, W, H, rplan.max_blocks,
            rplan.tile_config, abs_probe=absp[o],
        )
        return jnp.sum(img * r) + jnp.sum(alpha * s)

    goff, gabs = jax.grad(loss, argnums=(0, 1))(
        proj.means2d, jnp.zeros((N, 2), jnp.float32)
    )
    gabs = np.asarray(gabs)
    scale = max(1.0, float(oracle.max()))
    np.testing.assert_allclose(gabs, oracle, atol=2e-4 * scale, rtol=2e-4)
    # triangle inequality: abs-sum dominates |signed sum|
    assert (gabs + 1e-5 * scale >= np.abs(np.asarray(goff))).all()
    # the probe never changes the forward
    l0 = float(loss(proj.means2d, jnp.zeros((N, 2))))
    l1 = float(loss(proj.means2d, jnp.ones((N, 2))))
    assert l0 == l1


def test_absgrad_pallas_matches_tiled():
    proj, opac, colors, r, s, rplan, pplan = _setup(seed=1)
    oracle = np.asarray(_oracle_absgrad(proj, opac, colors, r, s, rplan))

    def loss_p(m2d, absp):
        img, alpha = render_plan_train(
            m2d, proj.conics, opac, colors, pplan,
            interpret=True, trans_eps=0.0, abs_probe=absp,
        )
        return jnp.sum(img * r) + jnp.sum(alpha * s)

    goff, gabs = jax.grad(loss_p, argnums=(0, 1))(
        proj.means2d, jnp.zeros((N, 2), jnp.float32)
    )
    gabs = np.asarray(gabs)
    scale = max(1.0, float(oracle.max()))
    np.testing.assert_allclose(gabs, oracle, atol=2e-4 * scale, rtol=2e-4)
    assert (gabs + 1e-5 * scale >= np.abs(np.asarray(goff))).all()


def test_absgrad_strategy_grow_sets():
    """DefaultStrategy grow criterion under cfg.absgrad vs the signed
    stat (reference pairs absgrad with a 4x higher grow_grad2d): the
    abs stat dominates the signed one per Gaussian, so at the SAME
    threshold the absgrad grow set is a superset; with the reference's
    4x threshold the sets generally differ."""
    from tpugs.train.config import TrainConfig
    from tpugs.train.trainer import Trainer, init_scene_random

    stats = {}
    for absgrad in (False, True):
        cfg = TrainConfig(
            max_steps=4, init_num_pts=64, init_extent=0.6, sh_degree=1,
            feature_dim=0, feature_out_dim=0, strategy="default",
            reset_every=0, random_bkgd=False, batch_size=2, seed=3,
            absgrad=absgrad,
        )
        tr = Trainer(cfg, init_scene_random(cfg), width=W, height=H)
        tr._sizes = (64, 4)
        cams = orbit_cameras(2, W, H, radius=2.5)
        rng = np.random.default_rng(4)
        img = rng.uniform(0, 1, (H, W, 3)).astype(np.float32)
        for c in range(2):
            tr.train_step(
                {
                    "viewmat": np.asarray(cams.viewmats[c]),
                    "K": np.asarray(cams.Ks[c]),
                    "image": img,
                    "image_id": c,
                }
            )
        stats[absgrad] = tr.grad_state.grad2d_sum.copy()

    signed, absed = stats[False], stats[True]
    assert np.isfinite(absed).all() and absed.max() > 0
    # per-Gaussian domination (both runs see identical data/params)
    assert (absed + 1e-7 >= signed - 1e-7).all()
    # grow sets: at the same threshold, absgrad grows a superset
    thr = np.percentile(signed[signed > 0], 70)
    grow_signed = signed > thr
    grow_abs = absed > thr
    assert (grow_abs | ~grow_signed).all()  # superset
    assert grow_abs.sum() >= grow_signed.sum()
