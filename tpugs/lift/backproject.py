"""Gradient-weighted feature back-projection engine (the paper's core).

Reference algorithm (``/root/reference/backproject.py:25-172``), per
training camera:
  1. no-grad RGB render (SH deg 3);
  2. run the 2D encoder on the rendering -> per-pixel features F(p);
  3. grad-render with N×D zero colors, backward of (render·F).sum()
     -> Σ_p w(g,p)·F(p) per Gaussian;
  4. a second grad-render with N×3 zeros, backward of render.sum()
     -> the normalizer Σ_p w(g,p);
  5. accumulate both across views; finally divide, L2-normalize,
     NaN -> 0 (``backproject.py:166-169``).

TPU-native version: steps 3+4 collapse into ONE fused adjoint pass
(``tpugs/raster/adjoint.py``) that reuses the render's tile plan, never
materializes an H×W×512 feature rendering, and never runs autograd.
The per-view work drops from 3 rasterizer invocations + 2 backwards to
1 render + 1 adjoint sweep sharing the same binning.
"""

from __future__ import annotations

import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from tpugs.core.camera import Camera
from tpugs.core.scene import GaussianScene
from tpugs.lift.ops import accumulate_view
from tpugs.raster.api import plan_render, rasterize_with_plan
from tpugs.raster.projection import ProjectionConfig

DENOM_INIT = 1e-12  # reference backproject.py:63 — denominators start at 1e-12


def backproject_view(
    scene: GaussianScene,
    viewmat: jax.Array,
    K: jax.Array,
    width: int,
    height: int,
    encoder: Callable[[jax.Array], jax.Array],
    proj_config: ProjectionConfig = ProjectionConfig(),
):
    """One camera: render -> encode -> fused adjoint.

    Returns (feat_sums (N, D), weight_sums (N,)). The tile plan is built
    once and shared between the RGB render and the adjoint pass (blend
    weights depend only on geometry, not colors)."""
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
    rgb, _ = rasterize_with_plan(
        scene.means,
        scene.quats,
        scene.scales,
        scene.opacities,
        scene.colors_all,
        viewmat,
        K,
        plan,
        sh_degree=scene.sh_degree,
        proj_config=proj_config,
    )
    feats = encoder(rgb)  # (H, W, D)
    return accumulate_view(
        scene,
        viewmat,
        K,
        width,
        height,
        feat_image=feats,
        proj_config=proj_config,
        plan=plan,
    )


def create_feature_field(
    scene: GaussianScene,
    cams: Camera,
    encoder: Callable[[jax.Array], jax.Array],
    feature_dim: Optional[int] = None,
    proj_config: ProjectionConfig = ProjectionConfig(),
    verbose: bool = True,
) -> jax.Array:
    """Back-project 2D features from all views onto per-Gaussian vectors.

    Returns (N, D) L2-normalized features (NaN rows zeroed), matching the
    reference's normalization (``backproject.py:166-169``).
    """
    n = scene.num_gaussians
    if feature_dim is None:
        feature_dim = getattr(encoder, "feature_dim")
    num = jnp.zeros((n, feature_dim), jnp.float32)
    den = jnp.full((n,), DENOM_INIT, jnp.float32)

    t1 = time.time()
    for c in range(cams.num_cameras):
        feat_sums, weight_sums = backproject_view(
            scene,
            cams.viewmats[c],
            cams.Ks[c],
            cams.width,
            cams.height,
            encoder,
            proj_config,
        )
        num = num + feat_sums
        den = den + weight_sums

    features = num / den[:, None]
    features = features / jnp.linalg.norm(features, axis=-1, keepdims=True)
    features = jnp.nan_to_num(features, nan=0.0, posinf=0.0, neginf=0.0)
    if verbose:
        jax.block_until_ready(features)
        print("Time taken for feature backprojection", time.time() - t1)
    return features
