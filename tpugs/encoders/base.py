"""2D feature-encoder protocol + synthetic encoders.

The reference hard-codes two torch teachers — LSeg (512-d CLIP-aligned
pixel features, ``backproject.py:28-41``) and DINOv2 ViT-L/14-reg
patch tokens (``backproject.py:177-249``). Here encoders are pluggable:
anything mapping an (H, W, 3) rendering to an (H, W, D) feature map.
Real ViT encoders live in ``tpugs/encoders/lseg.py`` / ``dino.py``; the
synthetic encoders below exercise the full back-projection math without
a pretrained checkpoint (the reference itself has such a path: grayscale
features at ``affordance_transfer/demo_affordance_transfer.py:545-634``).
"""

from __future__ import annotations

from typing import Protocol, runtime_checkable

import jax
import jax.numpy as jnp
import numpy as np


@runtime_checkable
class FeatureEncoder(Protocol):
    feature_dim: int
    # pixelwise=True marks encoders that map each pixel independently
    # (any (..., 3) -> (..., feature_dim), finite on finite input): the
    # fused back-projection then runs them on the rasterizer's native
    # tile layout, skipping both image<->tile transpose passes.
    # Spatial encoders (ViTs) leave it False/absent.

    def __call__(self, image: jax.Array) -> jax.Array:
        """(H, W, 3) -> (H, W, feature_dim)."""
        ...


class GrayscaleEncoder:
    """1-d luminance features — the minimal end-to-end probe."""

    feature_dim = 1
    pixelwise = True

    def __call__(self, image: jax.Array) -> jax.Array:
        w = jnp.array([0.299, 0.587, 0.114], image.dtype)
        return (image @ w)[..., None]


class LinearRGBEncoder:
    """Fixed random linear map of RGB -> D features, L2-normalized
    per pixel (mimics LSeg's per-pixel normalization,
    reference ``backproject.py:109``)."""

    pixelwise = True

    def __init__(self, feature_dim: int = 16, seed: int = 0, normalize: bool = True):
        self.feature_dim = feature_dim
        rng = np.random.default_rng(seed)
        self._proj = jnp.asarray(
            rng.normal(size=(3, feature_dim)).astype(np.float32)
        )
        self._normalize = normalize

    def __call__(self, image: jax.Array) -> jax.Array:
        f = image @ self._proj
        if self._normalize:
            f = f / (jnp.linalg.norm(f, axis=-1, keepdims=True) + 1e-8)
        return f


class PatchAverageEncoder:
    """Averages over PxP patches then nearest-upsamples back — mimics the
    patch-token granularity of a ViT teacher (reference DINO path:
    ``backproject.py:236-249``)."""

    def __init__(self, inner: FeatureEncoder, patch: int = 8):
        self.inner = inner
        self.patch = patch
        self.feature_dim = inner.feature_dim

    def __call__(self, image: jax.Array) -> jax.Array:
        f = self.inner(image)
        H, W, D = f.shape
        P = self.patch
        hp, wp = H // P, W // P
        f = f[: hp * P, : wp * P]
        f = f.reshape(hp, P, wp, P, D).mean(axis=(1, 3))
        f = jnp.repeat(jnp.repeat(f, P, axis=0), P, axis=1)
        f = jnp.pad(f, ((0, H - hp * P), (0, W - wp * P), (0, 0)), mode="edge")
        return f
