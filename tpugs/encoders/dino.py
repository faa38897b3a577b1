"""DINOv2 ViT-L/14-reg patch-feature encoder.

Reference usage (``backproject.py:175-249``): resize render to 896x896,
``forward_features(...)["x_norm_patchtokens"]`` -> (64, 64, 1024),
nearest-upsample back to image size."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from tpugs.encoders.vit import DINOV2_VIT_L14_REG, VisionTransformer

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class DinoEncoder:
    feature_dim = 1024

    def __init__(self, ckpt: Optional[str] = None, image_size: int = 896):
        self.image_size = image_size
        self.vit = VisionTransformer(DINOV2_VIT_L14_REG, act="gelu")
        if ckpt:
            from tpugs.encoders.convert import load_dino_params

            self.params = load_dino_params(ckpt)
        else:
            rng = jax.random.PRNGKey(0)
            dummy = jnp.zeros((1, image_size, image_size, 3))
            self.params = self.vit.init(rng, dummy)
            import warnings

            warnings.warn(
                "DinoEncoder initialized with RANDOM weights (no checkpoint)."
            )
        self._apply = jax.jit(
            lambda p, x: self.vit.apply(p, x)
        )

    def __call__(self, image: jax.Array) -> jax.Array:
        H, W, _ = image.shape
        s = self.image_size
        x = (image - IMAGENET_MEAN) / IMAGENET_STD
        x = jax.image.resize(x, (s, s, 3), "bilinear")[None]
        out = self._apply(self.params, x)
        gh, gw = s // 14, s // 14
        tokens = out["final"][:, out["n_prefix"]:, :]
        feats = tokens.reshape(gh, gw, self.feature_dim)
        # nearest-neighbor upsample back (reference uses mode="nearest")
        return jax.image.resize(
            feats, (H, W, self.feature_dim), "nearest"
        )
