"""Unit tests for EWA projection and SH evaluation against closed-form
expectations (SURVEY §4: projection/SH math vs a NumPy reference)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpugs.raster.projection import (
    ProjectionConfig,
    covariance_3d,
    project,
    quat_to_rotmat,
)
from tpugs.raster.sh import eval_sh_basis, num_sh_bases, sh_to_color


def test_quat_identity():
    R = quat_to_rotmat(jnp.array([[1.0, 0, 0, 0]]))
    np.testing.assert_allclose(np.asarray(R[0]), np.eye(3), atol=1e-6)


def test_quat_90deg_z():
    # 90 deg about z: w = cos(45), z = sin(45)
    s = np.sqrt(0.5)
    R = np.asarray(quat_to_rotmat(jnp.array([[s, 0, 0, s]]))[0])
    expected = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]])
    np.testing.assert_allclose(R, expected, atol=1e-6)


def test_quat_unnormalized_matches_normalized():
    q = jnp.array([[0.3, -0.5, 0.2, 0.9]])
    R1 = quat_to_rotmat(q)
    R2 = quat_to_rotmat(4.2 * q)
    np.testing.assert_allclose(np.asarray(R1), np.asarray(R2), atol=1e-5)


def test_covariance_isotropic():
    cov = covariance_3d(
        jnp.array([[1.0, 0, 0, 0]]), jnp.array([[0.2, 0.2, 0.2]])
    )
    np.testing.assert_allclose(np.asarray(cov[0]), 0.04 * np.eye(3), atol=1e-6)


def test_covariance_rotation_invariant_trace():
    rng = np.random.default_rng(0)
    q = rng.normal(size=(10, 4)).astype(np.float32)
    s = rng.uniform(0.1, 1.0, (10, 3)).astype(np.float32)
    cov = np.asarray(covariance_3d(jnp.asarray(q), jnp.asarray(s)))
    traces = np.trace(cov, axis1=1, axis2=2)
    np.testing.assert_allclose(traces, (s**2).sum(axis=1), rtol=1e-4)


def _simple_setup():
    means = jnp.array([[0.0, 0.0, 2.0], [0.0, 0.0, -1.0]])
    quats = jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (2, 1))
    scales = jnp.full((2, 3), 0.1)
    opac = jnp.full((2,), 0.9)
    viewmat = jnp.eye(4)
    K = jnp.array([[100.0, 0, 50.0], [0, 100.0, 50.0], [0, 0, 1]])
    return means, quats, scales, opac, viewmat, K


def test_project_center_and_culling():
    means, quats, scales, opac, viewmat, K = _simple_setup()
    proj = project(means, quats, scales, opac, viewmat, K, 100, 100)
    # First Gaussian projects to the principal point.
    np.testing.assert_allclose(np.asarray(proj.means2d[0]), [50.0, 50.0], atol=1e-4)
    assert bool(proj.valid[0])
    # Behind the camera -> culled.
    assert not bool(proj.valid[1])
    assert float(proj.radii[1]) == 0.0


def test_project_cov2d_isotropic_on_axis():
    """On-axis isotropic Gaussian: cov2d = (f*s/z)^2 I + eps2d I."""
    means, quats, scales, opac, viewmat, K = _simple_setup()
    cfg = ProjectionConfig(eps2d=0.3)
    proj = project(means, quats, scales, opac, viewmat, K, 100, 100, cfg)
    expected_var = (100.0 * 0.1 / 2.0) ** 2 + 0.3
    conic = np.asarray(proj.conics[0])
    np.testing.assert_allclose(conic[0], 1.0 / expected_var, rtol=1e-4)
    np.testing.assert_allclose(conic[2], 1.0 / expected_var, rtol=1e-4)
    np.testing.assert_allclose(conic[1], 0.0, atol=1e-6)
    # radius = ceil(3 * sqrt(max_eig))
    np.testing.assert_allclose(
        float(proj.radii[0]), np.ceil(3 * np.sqrt(expected_var)), atol=1e-5
    )


def test_project_depth():
    means, quats, scales, opac, viewmat, K = _simple_setup()
    proj = project(means, quats, scales, opac, viewmat, K, 100, 100)
    np.testing.assert_allclose(float(proj.depths[0]), 2.0, atol=1e-6)


def test_antialiased_compensation_below_one():
    means, quats, scales, opac, viewmat, K = _simple_setup()
    cfg = ProjectionConfig(antialiased=True)
    proj = project(means, quats, scales, opac, viewmat, K, 100, 100, cfg)
    assert float(proj.opacities[0]) < 0.9
    cfg0 = ProjectionConfig(antialiased=False)
    proj0 = project(means, quats, scales, opac, viewmat, K, 100, 100, cfg0)
    np.testing.assert_allclose(float(proj0.opacities[0]), 0.9, rtol=1e-6)


def test_radius_clip():
    means, quats, scales, opac, viewmat, K = _simple_setup()
    cfg = ProjectionConfig(radius_clip=1e6)
    proj = project(means, quats, scales, opac, viewmat, K, 100, 100, cfg)
    assert not bool(proj.valid[0])


@pytest.mark.parametrize("degree", [0, 1, 2, 3])
def test_sh_basis_shape(degree):
    dirs = jnp.array([[0.0, 0.0, 1.0], [0.6, 0.8, 0.0]])
    basis = eval_sh_basis(degree, dirs)
    assert basis.shape == (2, num_sh_bases(degree))


def test_sh_degree0_constant():
    coeffs = jnp.ones((4, 16, 3))
    dirs = jnp.array(np.random.default_rng(1).normal(size=(4, 3)), jnp.float32)
    col = sh_to_color(coeffs, dirs, 0)
    np.testing.assert_allclose(
        np.asarray(col), 0.28209479177387814 + 0.5, rtol=1e-5
    )


def test_sh_clamped_nonnegative():
    coeffs = -5.0 * jnp.ones((4, 16, 3))
    dirs = jnp.tile(jnp.array([[0.0, 0, 1.0]]), (4, 1))
    col = sh_to_color(coeffs, dirs, 3)
    assert np.all(np.asarray(col) >= 0.0)


def test_sh_orthogonality():
    """Monte-Carlo check: the basis functions are orthonormal on S^2."""
    rng = np.random.default_rng(0)
    v = rng.normal(size=(200_000, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    basis = np.asarray(eval_sh_basis(3, jnp.asarray(v, jnp.float32)))
    gram = 4 * np.pi * basis.T @ basis / len(v)
    np.testing.assert_allclose(gram, np.eye(16), atol=0.05)


def test_projection_grad_finite():
    """Gradients of projection outputs w.r.t. inputs are finite."""
    means, quats, scales, opac, viewmat, K = _simple_setup()

    def loss(m, q, s, o):
        p = project(m, q, s, o, viewmat, K, 100, 100)
        return (
            jnp.sum(p.means2d * p.valid[:, None])
            + jnp.sum(p.conics)
            + jnp.sum(p.opacities)
        )

    grads = jax.grad(loss, argnums=(0, 1, 2, 3))(means, quats, scales, opac)
    for g in grads:
        assert np.all(np.isfinite(np.asarray(g)))
