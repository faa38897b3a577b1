"""Trainer auxiliary modules (reference ``f3dgs/utils_simple_trainer.py``):

* ``CameraOptModule``  — per-camera 6D-rotation + translation deltas on
  camera-to-world poses (``:12-48``);
* ``AppearanceOptModule`` — per-image embedding + view-direction SH MLP
  predicting additive appearance colors (``:51-114``);
* ``rotation_6d_to_matrix`` (``:117-138``), depth colormaps (``:160-223``).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def rotation_6d_to_matrix(d6: jax.Array) -> jax.Array:
    """(..., 6) continuous rotation parameterization -> (..., 3, 3)
    (Zhou et al., the reference's ``rotation_6d_to_matrix``)."""
    a1, a2 = d6[..., :3], d6[..., 3:]
    b1 = a1 / (jnp.linalg.norm(a1, axis=-1, keepdims=True) + 1e-12)
    b2 = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = b2 / (jnp.linalg.norm(b2, axis=-1, keepdims=True) + 1e-12)
    b3 = jnp.cross(b1, b2)
    return jnp.stack((b1, b2, b3), axis=-2)


class CameraOptModule(nn.Module):
    """Residual pose adjustment: identity-initialized (6D rot = identity
    encoding, zero translation) per-camera deltas applied to c2w."""

    n_cameras: int

    @nn.compact
    def __call__(self, camtoworlds: jax.Array, embed_ids: jax.Array):
        # (B, 4, 4), (B,) -> adjusted (B, 4, 4)
        deltas = self.param(
            "pose_deltas",
            lambda key, shape: jnp.tile(
                jnp.array([1, 0, 0, 0, 1, 0, 0, 0, 0], jnp.float32),
                (shape[0], 1),
            ),
            (self.n_cameras, 9),
        )
        d = deltas[embed_ids]
        rot = rotation_6d_to_matrix(d[..., :6])  # (B, 3, 3)
        t = d[..., 6:]
        transform = jnp.zeros((camtoworlds.shape[0], 4, 4))
        transform = transform.at[:, :3, :3].set(rot)
        transform = transform.at[:, :3, 3].set(t)
        transform = transform.at[:, 3, 3].set(1.0)
        return jnp.einsum("bij,bjk->bik", camtoworlds, transform)


class AppearanceOptModule(nn.Module):
    """Per-image appearance embedding + view-direction SH features -> MLP
    -> additive RGB (reference ``:51-114``)."""

    n_images: int
    feature_dim: int = 32
    embed_dim: int = 16
    sh_degree: int = 3
    mlp_width: int = 64
    mlp_depth: int = 2

    @nn.compact
    def __call__(
        self,
        features: jax.Array,  # (N, feature_dim) per-Gaussian
        embed_ids: Optional[jax.Array],  # () or (N,) image index
        dirs: jax.Array,  # (N, 3) view directions
    ):
        from tpugs.raster.sh import eval_sh_basis, num_sh_bases

        if embed_ids is None:
            embed = jnp.zeros((features.shape[0], self.embed_dim))
        else:
            table = self.param(
                "embeds",
                nn.initializers.zeros,
                (self.n_images, self.embed_dim),
            )
            embed = jnp.broadcast_to(
                table[embed_ids], (features.shape[0], self.embed_dim)
            )
        dirs = dirs / (jnp.linalg.norm(dirs, axis=-1, keepdims=True) + 1e-12)
        basis = eval_sh_basis(self.sh_degree, dirs)
        k = num_sh_bases(self.sh_degree)
        h = jnp.concatenate([embed, features, basis[:, :k]], axis=-1)
        for i in range(self.mlp_depth):
            h = nn.relu(nn.Dense(self.mlp_width, name=f"hidden{i}")(h))
        return nn.Dense(3, name="out")(h)


def apply_float_colormap(img: np.ndarray, colormap: str = "turbo") -> np.ndarray:
    """[0,1] float map -> uint8 RGB via matplotlib colormap (reference
    ``apply_float_colormap``/``apply_depth_colormap``, ``:160-223``)."""
    import matplotlib.cm as cm

    mapper = cm.get_cmap(colormap)
    return (mapper(np.clip(img, 0, 1))[..., :3] * 255).astype(np.uint8)


def apply_depth_colormap(
    depth: np.ndarray,
    acc: Optional[np.ndarray] = None,
    near: Optional[float] = None,
    far: Optional[float] = None,
) -> np.ndarray:
    near = float(np.nanmin(depth)) if near is None else near
    far = float(np.nanmax(depth)) if far is None else far
    norm = (depth - near) / (far - near + 1e-10)
    img = apply_float_colormap(norm)
    if acc is not None:
        img = (img * acc[..., None]).astype(np.uint8)
    return img
