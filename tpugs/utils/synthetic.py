"""Synthetic scenes and camera rigs for tests and benchmarks.

The reference validates against real Mip-NeRF 360 captures; this
environment has no datasets, so tests and benches run on procedurally
generated scenes: random anisotropic Gaussians in a box, viewed by an
orbit of pinhole cameras (the same geometry class as a COLMAP ring of
training views)."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from tpugs.core.camera import Camera, intrinsics_matrix, make_viewmat
from tpugs.core.scene import GaussianScene


def random_scene(
    n: int,
    seed: int = 0,
    extent: float = 1.0,
    scale_range=(0.01, 0.05),
    sh_degree: int = 3,
    feature_dim: int | None = None,
) -> GaussianScene:
    rng = np.random.default_rng(seed)
    means = rng.uniform(-extent, extent, (n, 3)).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    log_scales = np.log(
        rng.uniform(scale_range[0], scale_range[1], (n, 3))
    ).astype(np.float32)
    # logits roughly uniform opacity in (0.3, 0.95)
    opac = rng.uniform(0.3, 0.95, (n,)).astype(np.float32)
    logit_opac = np.log(opac / (1 - opac)).astype(np.float32)
    k_rest = (sh_degree + 1) ** 2 - 1
    sh0 = rng.uniform(-0.5, 1.5, (n, 1, 3)).astype(np.float32)
    shN = (0.1 * rng.normal(size=(n, k_rest, 3))).astype(np.float32)
    features = None
    if feature_dim:
        features = rng.normal(size=(n, feature_dim)).astype(np.float32)
    return GaussianScene(
        means=jnp.asarray(means),
        quats=jnp.asarray(quats),
        log_scales=jnp.asarray(log_scales),
        logit_opacities=jnp.asarray(logit_opac),
        sh0=jnp.asarray(sh0),
        shN=jnp.asarray(shN),
        features=None if features is None else jnp.asarray(features),
    )


def lookat_viewmat(eye, target=(0.0, 0.0, 0.0), up=(0.0, -1.0, 0.0)):
    """World-to-camera viewmat for a camera at `eye` looking at `target`.
    OpenCV convention: +z forward, +y down. Pure numpy (host-side)."""
    eye = np.asarray(eye, np.float64)
    target = np.asarray(target, np.float64)
    up = np.asarray(up, np.float64)
    fwd = target - eye
    fwd /= np.linalg.norm(fwd)
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    R_c2w = np.stack([right, down, fwd], axis=1)  # columns
    R_w2c = R_c2w.T
    t = -R_w2c @ eye
    vm = np.eye(4, dtype=np.float32)
    vm[:3, :3] = R_w2c
    vm[:3, 3] = t
    return vm


def write_synthetic_colmap(
    data_dir: str,
    cams: Camera,
    n_points: int = 100,
    seed: int = 0,
    points: "np.ndarray | None" = None,
    point_rgbs: "np.ndarray | None" = None,
) -> None:
    """Write a COLMAP sparse/0 model matching a Camera batch — gives
    tests a real on-disk dataset in the reference's expected layout.
    Pass ``points``/``point_rgbs`` (world xyz in [-1,1]-ish, rgb uint8)
    to emit an SfM point cloud correlated with the scene (realistic
    ``init_type=sfm`` training); otherwise random points are written."""
    import os

    from tpugs.io.colmap import (
        ColmapCamera,
        ColmapImage,
        ColmapPoint3D,
        rotmat_to_qvec,
        write_sparse_model,
    )

    K = np.asarray(cams.Ks[0])
    cameras = {
        1: ColmapCamera(
            1,
            "PINHOLE",
            cams.width,
            cams.height,
            np.array([K[0, 0], K[1, 1], K[0, 2], K[1, 2]], np.float64),
        )
    }
    images = {}
    for i in range(cams.num_cameras):
        vm = np.asarray(cams.viewmats[i])
        images[i + 1] = ColmapImage(
            i + 1,
            rotmat_to_qvec(vm[:3, :3]),
            vm[:3, 3].astype(np.float64),
            1,
            f"frame_{i:04d}.jpg",
            np.zeros((0, 2)),
            np.zeros((0,), np.int64),
        )
    rng = np.random.default_rng(seed)
    if points is None:
        xyz = rng.uniform(-1, 1, (n_points, 3))
        rgb = rng.integers(0, 255, (n_points, 3)).astype(np.uint8)
    else:
        xyz = np.asarray(points, np.float64)
        rgb = (
            np.asarray(point_rgbs, np.uint8)
            if point_rgbs is not None
            else rng.integers(0, 255, (len(xyz), 3)).astype(np.uint8)
        )
    pts3d = {
        int(j + 1): ColmapPoint3D(
            int(j + 1),
            xyz[j],
            rgb[j],
            0.5,
            np.array([1], np.int64),
            np.array([0], np.int64),
        )
        for j in range(len(xyz))
    }
    write_sparse_model(os.path.join(data_dir, "sparse/0"), cameras, images, pts3d)


def orbit_cameras(
    n_cams: int,
    width: int,
    height: int,
    radius: float = 3.0,
    fov_deg: float = 60.0,
    elevation: float = 0.35,
) -> Camera:
    f = 0.5 * width / np.tan(np.radians(fov_deg) / 2)
    K = intrinsics_matrix(f, f, width / 2, height / 2)
    viewmats = []
    for i in range(n_cams):
        theta = 2 * np.pi * i / max(n_cams, 1)
        eye = (
            radius * np.cos(theta),
            -elevation * radius,
            radius * np.sin(theta),
        )
        viewmats.append(lookat_viewmat(eye))
    return Camera(
        viewmats=jnp.asarray(np.stack(viewmats), jnp.float32),
        Ks=jnp.asarray(np.tile(K[None], (n_cams, 1, 1)), jnp.float32),
        width=width,
        height=height,
    )
