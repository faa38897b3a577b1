"""EWA projection of 3D Gaussians to screen space.

The reference's projection lives inside gsplat's CUDA
``fully_fused_projection`` (invoked via ``rasterization``); here it is
pure ``jax.numpy`` over the whole Gaussian batch — dense, static-shaped,
branch-free math that XLA maps directly onto the VPU and fuses with SH
evaluation. Differentiable end-to-end (no custom VJP needed: autodiff of
these closed-form ops is already optimal).

Outputs per Gaussian: 2D means, conic (inverse 2D covariance, upper
triangle), depth, screen radius, and a validity mask (frustum +
near/far + min-radius culling).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

ALPHA_CLIP_MIN = 1.0 / 255.0  # skip threshold (matches gsplat semantics)
ALPHA_CLIP_MAX = 0.999


class Projected(NamedTuple):
    means2d: jax.Array  # (N, 2) pixel coordinates
    conics: jax.Array  # (N, 3) upper-tri of inverse 2D cov: (a, b, c)
    depths: jax.Array  # (N,) camera-space z
    radii: jax.Array  # (N,) conservative pixel radius (0 if culled)
    opacities: jax.Array  # (N,) effective opacity (compensated if antialiased)
    valid: jax.Array  # (N,) bool
    cut_r2: jax.Array  # (N,) squared pixel distance beyond which alpha is
    #                     provably < 1/255 (the compositing clip) — tiles
    #                     entirely outside this circle can be dropped from
    #                     tile lists (output exact up to f32 reassociation)
    sig_cut: jax.Array  # (N,) sigma threshold of the same 1/255 clip:
    #                     alpha = op*exp(-sigma) < 1/255 iff sigma >
    #                     ln(255*op). Drives the EXACT ellipse-vs-tile
    #                     cull (binning.tile_cut_mask), which prunes the
    #                     anisotropy slop the circular cut_r2 bound keeps
    #                     (~14% of intersections at garden scale). -1
    #                     where invalid (culls every candidate).


def quat_to_rotmat(quats: jax.Array) -> jax.Array:
    """(N, 4) wxyz (unnormalized ok) -> (N, 3, 3)."""
    q = quats / (jnp.linalg.norm(quats, axis=-1, keepdims=True) + 1e-12)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack(
                [
                    1 - 2 * (y * y + z * z),
                    2 * (x * y - w * z),
                    2 * (x * z + w * y),
                ],
                -1,
            ),
            jnp.stack(
                [
                    2 * (x * y + w * z),
                    1 - 2 * (x * x + z * z),
                    2 * (y * z - w * x),
                ],
                -1,
            ),
            jnp.stack(
                [
                    2 * (x * z - w * y),
                    2 * (y * z + w * x),
                    1 - 2 * (x * x + y * y),
                ],
                -1,
            ),
        ],
        axis=-2,
    )


def covariance_3d(quats: jax.Array, scales: jax.Array) -> jax.Array:
    """Σ = R S S^T R^T. scales are activated stddevs (N, 3)."""
    R = quat_to_rotmat(quats)
    M = R * scales[..., None, :]  # R @ diag(s)
    return jnp.einsum(
        "nij,nkj->nik", M, M, precision=jax.lax.Precision.HIGHEST
    )


@dataclasses.dataclass(frozen=True)
class ProjectionConfig:
    eps2d: float = 0.3  # screen-space low-pass filter (classic EWA dilation)
    near_plane: float = 0.01
    far_plane: float = 1e10
    radius_clip: float = 0.0  # cull Gaussians with radius <= this (px)
    antialiased: bool = False  # opacity compensation instead of plain dilation
    sigma_factor: float = 3.0  # extent of the splat in stddevs


def project(
    means: jax.Array,  # (N, 3)
    quats: jax.Array,  # (N, 4)
    scales: jax.Array,  # (N, 3) activated
    opacities: jax.Array,  # (N,) activated
    viewmat: jax.Array,  # (4, 4) world-to-cam
    K: jax.Array,  # (3, 3)
    width: int,
    height: int,
    config: ProjectionConfig = ProjectionConfig(),
) -> Projected:
    """Project every Gaussian into one camera. Dense over N."""
    R_wc = viewmat[:3, :3]
    t_wc = viewmat[:3, 3]
    p_cam = (
        jnp.einsum("ni,ji->nj", means, R_wc, precision=jax.lax.Precision.HIGHEST)
        + t_wc
    )  # (N, 3)
    z = p_cam[..., 2]

    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]

    # Guard z for the division; culled later by the near-plane mask.
    zs = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    x_ndc = p_cam[..., 0] / zs
    y_ndc = p_cam[..., 1] / zs
    mean_x = fx * x_ndc + cx
    mean_y = fy * y_ndc + cy
    means2d = jnp.stack([mean_x, mean_y], axis=-1)

    # EWA: cov2d = J W Σ W^T J^T with J the projection Jacobian.
    # gsplat clamps the tangent-plane extent to limit distortion at the
    # image border; we clamp x/z, y/z to the frustum extended by 30%.
    lim_x = 1.3 * (0.5 * width / fx)
    lim_y = 1.3 * (0.5 * height / fy)
    tx = zs * jnp.clip(x_ndc, -lim_x, lim_x)
    ty = zs * jnp.clip(y_ndc, -lim_y, lim_y)

    cov3d = covariance_3d(quats, scales)  # (N, 3, 3)
    cov_cam = jnp.einsum(
        "ij,njk,lk->nil", R_wc, cov3d, R_wc, precision=jax.lax.Precision.HIGHEST
    )  # (N, 3, 3)

    inv_z = 1.0 / zs
    inv_z2 = inv_z * inv_z
    # J rows: [fx/z, 0, -fx*tx/z^2], [0, fy/z, -fy*ty/z^2]
    j00 = fx * inv_z
    j02 = -fx * tx * inv_z2
    j11 = fy * inv_z
    j12 = -fy * ty * inv_z2

    c00, c01, c02 = cov_cam[..., 0, 0], cov_cam[..., 0, 1], cov_cam[..., 0, 2]
    c11, c12, c22 = cov_cam[..., 1, 1], cov_cam[..., 1, 2], cov_cam[..., 2, 2]

    # cov2d = J C J^T expanded (J is 2x3 with the sparsity above).
    a = j00 * (j00 * c00 + j02 * c02) + j02 * (j00 * c02 + j02 * c22)
    b = j00 * (j11 * c01 + j12 * c02) + j02 * (j11 * c12 + j12 * c22)
    c = j11 * (j11 * c11 + j12 * c12) + j12 * (j11 * c12 + j12 * c22)

    det_orig = a * c - b * b
    a_d = a + config.eps2d
    c_d = c + config.eps2d
    det = a_d * c_d - b * b

    if config.antialiased:
        compensation = jnp.sqrt(jnp.maximum(det_orig / det, 0.0))
    else:
        compensation = jnp.ones_like(det)

    det_safe = jnp.where(det <= 0.0, 1.0, det)
    inv_det = 1.0 / det_safe
    conic = jnp.stack([c_d * inv_det, -b * inv_det, a_d * inv_det], axis=-1)

    # Conservative radius: sigma_factor * sqrt(max eigenvalue).
    mid = 0.5 * (a_d + c_d)
    disc = jnp.sqrt(jnp.maximum(mid * mid - det, 0.01))
    lambda_max = mid + disc
    radius = jnp.ceil(config.sigma_factor * jnp.sqrt(lambda_max))

    opac = opacities * compensation

    inside = (
        (mean_x + radius > 0)
        & (mean_x - radius < width)
        & (mean_y + radius > 0)
        & (mean_y - radius < height)
    )
    valid = (
        (z > config.near_plane)
        & (z < config.far_plane)
        & (det > 0.0)
        & (radius > config.radius_clip)
        & inside
        # Below the 1/255 alpha cutoff every pixel's alpha is zeroed by
        # evaluate_alpha, so culling here is numerically free — and it
        # keeps dead capacity-padding rows (opacity~0 at the origin)
        # out of the tile lists, where they would inflate the per-tile
        # span every frame (gsplat likewise skips alpha<1/255).
        & (opac >= ALPHA_CLIP_MIN)
    )
    radius = jnp.where(valid, radius, 0.0)
    # Sub-cutoff circle: alpha(p) = op*exp(-q/2) with q >= |p-mean|^2 /
    # lambda_max, so |p-mean|^2 > 2*lambda_max*ln(255*op) implies
    # alpha < 1/255, which evaluate_alpha/_block_weights zero exactly.
    # Tiles whose nearest point lies outside this circle contribute
    # nothing and can be dropped from tile lists (gsplat can't: its bbox
    # is baked into the radix-sort key). 1e-4 headroom absorbs f32
    # rounding differences between this bound and the kernel's sigma.
    cut_r2 = 2.0 * lambda_max * jnp.log(jnp.maximum(255.0 * opac, 1.0))
    cut_r2 = jnp.minimum(cut_r2 * 1.0001, radius * radius)
    cut_r2 = jnp.where(valid, cut_r2, 0.0)
    # Exact sigma-space form of the same clip (see Projected.sig_cut).
    sig_cut = jnp.log(jnp.maximum(255.0 * opac, 1.0))
    sig_cut = jnp.where(valid, sig_cut, -1.0)
    return Projected(
        means2d=means2d,
        conics=conic,
        depths=z,
        radii=radius,
        opacities=opac,
        valid=valid,
        cut_r2=cut_r2,
        sig_cut=sig_cut,
    )


def view_directions(means: jax.Array, viewmat: jax.Array) -> jax.Array:
    """Per-Gaussian viewing directions (world frame) for SH evaluation."""
    R = viewmat[:3, :3]
    t = viewmat[:3, 3]
    cam_center = -R.T @ t
    return means - cam_center
