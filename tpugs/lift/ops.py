"""High-level adjoint ops on (scene, camera) pairs.

Bridges the GaussianScene pytree to the raster-level adjoint kernels:
projection + depth reorder + fused weight/feature accumulation, with
results returned in original Gaussian order.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from tpugs.core.scene import GaussianScene
from tpugs.raster.adjoint import backproject_tiled
from tpugs.raster.api import RasterPlan, plan_render
from tpugs.raster.projection import ProjectionConfig, project


@functools.partial(
    jax.jit, static_argnames=("proj_config",)
)
def _accumulate_jit(
    means,
    quats,
    scales,
    opacities,
    viewmat,
    K,
    plan: RasterPlan,
    feat_image,
    proj_config: ProjectionConfig,
):
    proj = project(
        means,
        quats,
        scales,
        opacities,
        viewmat,
        K,
        plan.width,
        plan.height,
        proj_config,
    )
    order = plan.order
    opac = jnp.where(proj.valid, proj.opacities, 0.0)
    feat_sums_d, weight_sums_d = backproject_tiled(
        proj.means2d[order],
        proj.conics[order],
        opac[order],
        plan.sorted_gid,
        plan.tile_starts,
        feat_image,
        plan.width,
        plan.height,
        plan.max_blocks,
        plan.tile_config,
    )
    # Un-permute back to original Gaussian order.
    n = means.shape[0]
    inv = jnp.zeros((n,), jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
    weight_sums = weight_sums_d[inv]
    feat_sums = None if feat_sums_d is None else feat_sums_d[inv]
    return feat_sums, weight_sums


def accumulate_view(
    scene: GaussianScene,
    viewmat: jax.Array,
    K: jax.Array,
    width: int,
    height: int,
    feat_image: Optional[jax.Array] = None,
    proj_config: ProjectionConfig = ProjectionConfig(),
    plan: Optional[RasterPlan] = None,
) -> Tuple[Optional[jax.Array], jax.Array]:
    """One view's fused adjoint pass.

    Returns (Σ_p w(g,p)·F(p) or None, Σ_p w(g,p)) per Gaussian, in
    original order. Replaces the reference's two backward rasterizations
    per view (``backproject.py:115-150``).
    """
    if plan is None:
        plan = plan_render(
            scene.means,
            scene.quats,
            scene.scales,
            scene.opacities,
            viewmat,
            K,
            width,
            height,
            proj_config,
        )
    return _accumulate_jit(
        scene.means,
        scene.quats,
        scene.scales,
        scene.opacities,
        viewmat,
        K,
        plan,
        feat_image,
        proj_config,
    )
