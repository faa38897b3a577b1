"""Gradient pruning + render-equivalence verification (reference L2).

``prune_by_gradients`` (reference ``utils.py:222-271``) renders every
training view with a pseudo-loss chosen so that each contributing
Gaussian receives a unit-scale color gradient, then keeps the Gaussians
with non-zero accumulated gradient norm. The color gradient of a render
is Σ_p w(g,p)·(dL/dI_p); with the reference's pseudo-loss the mask
reduces to "total blend weight > 0". Our fused adjoint computes
Σ_p w(g,p) directly — one forward-structured pass per view instead of a
forward + backward, no pseudo-loss trick needed.

``test_proper_pruning`` (reference ``utils.py:292-360``) then *proves*
the pruned scene renders identically: every view re-rendered with both
scenes, asserting max pixel error < 1/(255*2). Preserved verbatim as
the framework's render-equivalence oracle.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax.numpy as jnp

from tpugs.core.camera import Camera
from tpugs.core.scene import GaussianScene
from tpugs.lift.ops import accumulate_view
from tpugs.raster.api import plan_render, rasterize_with_plan


def compute_visibility_weights(scene: GaussianScene, cams: Camera) -> np.ndarray:
    """(N,) total blend weight summed over all views' pixels."""
    total = jnp.zeros((scene.num_gaussians,), jnp.float32)
    for c in range(cams.num_cameras):
        _, wsum = accumulate_view(
            scene, cams.viewmats[c], cams.Ks[c], cams.width, cams.height
        )
        total = total + wsum
    return np.asarray(total)


def prune_by_gradients(
    scene: GaussianScene, cams: Camera, verbose: bool = True
) -> GaussianScene:
    """Drop Gaussians that contribute zero blend weight in every view."""
    weights = compute_visibility_weights(scene, cams)
    mask = weights > 0
    if verbose:
        print("Total splats", len(weights))
        print("Pruned", int((~mask).sum()), "splats")
        print("Remaining", int(mask.sum()), "splats")
    return scene.select(mask)


def render_view_sh(scene: GaussianScene, cams: Camera, c: int):
    plan = plan_render(
        scene.means,
        scene.quats,
        scene.scales,
        scene.opacities,
        cams.viewmats[c],
        cams.Ks[c],
        cams.width,
        cams.height,
    )
    return rasterize_with_plan(
        scene.means,
        scene.quats,
        scene.scales,
        scene.opacities,
        scene.colors_all,
        cams.viewmats[c],
        cams.Ks[c],
        plan,
        sh_degree=scene.sh_degree,
    )


def verify_pruning_equivalence(
    scene: GaussianScene,
    scene_pruned: GaussianScene,
    cams: Camera,
    verbose: bool = True,
) -> Tuple[float, float]:
    """Assert the pruned scene is render-equivalent on every view
    (max pixel error < 1/510, the reference's safety margin)."""
    total_error = 0.0
    max_pixel_error = 0.0
    for c in range(cams.num_cameras):
        img_a, _ = render_view_sh(scene, cams, c)
        img_b, _ = render_view_sh(scene_pruned, cams, c)
        diff = np.abs(np.asarray(img_a) - np.asarray(img_b))
        total_error += float(diff.sum())
        max_pixel_error = max(max_pixel_error, float(diff.max()))

    percentage_pruned = (
        (scene.num_gaussians - scene_pruned.num_gaussians)
        / scene.num_gaussians
        * 100
    )
    assert max_pixel_error < 1 / (255 * 2), (
        "Max pixel error should be less than 1/(255*2), safety margin"
    )
    if verbose:
        print(
            "Report {}% pruned, max pixel error = {}, total pixel error = {}".format(
                percentage_pruned, max_pixel_error, total_error
            )
        )
    return max_pixel_error, total_error


# Reference-parity alias (utils.py:292 names this test_proper_pruning);
# __test__ = False keeps pytest from collecting it as a test.
test_proper_pruning = verify_pruning_equivalence
test_proper_pruning.__test__ = False
