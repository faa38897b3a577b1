"""Camera model and pose math.

Mirrors the reference's camera conventions:
  * pinhole intrinsics K with image size (2*cx, 2*cy) after the
    ``data_factor`` division (``/root/reference/utils.py:93-105``);
  * world-to-camera 4x4 viewmats built from COLMAP image R|t
    (``/root/reference/utils.py:215-219``);
  * roll/pitch/yaw viewer matrices (``/root/reference/utils.py:185-212``).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _pytree_dataclass(cls):
    return jax.tree_util.register_dataclass(dataclasses.dataclass(frozen=True)(cls))


@_pytree_dataclass
class Camera:
    """A batch of pinhole cameras.

    ``viewmats`` — (C, 4, 4) world-to-camera transforms.
    ``Ks``       — (C, 3, 3) intrinsics.
    Width/height are static Python ints (XLA shape parameters).
    """

    viewmats: jax.Array  # (C, 4, 4)
    Ks: jax.Array  # (C, 3, 3)
    width: int = dataclasses.field(metadata=dict(static=True), default=0)
    height: int = dataclasses.field(metadata=dict(static=True), default=0)

    @property
    def num_cameras(self) -> int:
        return self.viewmats.shape[0]

    @property
    def cam_centers(self) -> jax.Array:
        """(C, 3) camera centers in world frame: -R^T t."""
        R = self.viewmats[:, :3, :3]
        t = self.viewmats[:, :3, 3]
        return -jnp.einsum("cij,ci->cj", R, t)

    def __getitem__(self, idx) -> "Camera":
        vm = self.viewmats[idx]
        K = self.Ks[idx]
        if vm.ndim == 2:
            vm, K = vm[None], K[None]
        return Camera(vm, K, self.width, self.height)


def make_viewmat(R: jax.Array, t: jax.Array) -> jax.Array:
    """4x4 world-to-camera from rotation (3,3) and translation (3,)
    (reference ``get_viewmat_from_colmap_image``, utils.py:215-219)."""
    R = jnp.asarray(R, jnp.float32)
    t = jnp.asarray(t, jnp.float32)
    top = jnp.concatenate([R, t[:, None]], axis=1)
    bottom = jnp.array([[0.0, 0.0, 0.0, 1.0]], jnp.float32)
    return jnp.concatenate([top, bottom], axis=0)


def rpy_matrix(roll: float, pitch: float, yaw: float) -> np.ndarray:
    """Yaw @ pitch @ roll 4x4 (reference ``get_rpy_matrix``,
    utils.py:185-212). Host-side numpy: used by the interactive viewer."""
    cr, sr = np.cos(roll), np.sin(roll)
    cp, sp = np.cos(pitch), np.sin(pitch)
    cy, sy = np.cos(yaw), np.sin(yaw)
    roll_m = np.array(
        [[1, 0, 0, 0], [0, cr, -sr, 0], [0, sr, cr, 0], [0, 0, 0, 1.0]]
    )
    pitch_m = np.array(
        [[cp, 0, sp, 0], [0, 1, 0, 0], [-sp, 0, cp, 0], [0, 0, 0, 1.0]]
    )
    yaw_m = np.array(
        [[cy, -sy, 0, 0], [sy, cy, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1.0]]
    )
    return yaw_m @ pitch_m @ roll_m


def intrinsics_matrix(fx, fy, cx, cy) -> np.ndarray:
    return np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]], dtype=np.float32)


def cameras_from_colmap(
    images: Sequence, K: np.ndarray, width: int, height: int
) -> Camera:
    """Stack sorted COLMAP images (objects with .R() and .t) into a Camera
    batch; sorting by name matches the reference iteration order
    (``backproject.py:74``). Pure numpy until the final device put —
    per-image device round-trips are both wasteful and a stall hazard
    on remote TPU transports."""

    def vm(im):
        m = np.eye(4, dtype=np.float32)
        m[:3, :3] = im.R()
        m[:3, 3] = im.t
        return m

    viewmats = np.stack([vm(im) for im in images], axis=0)
    Ks = np.tile(np.asarray(K, np.float32)[None], (len(images), 1, 1))
    return Camera(
        viewmats=jnp.asarray(viewmats),
        Ks=jnp.asarray(Ks),
        width=int(width),
        height=int(height),
    )
