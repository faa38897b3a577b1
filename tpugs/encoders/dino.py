"""DINOv2 ViT-L/14-reg patch-feature encoder.

Reference usage (``backproject.py:175-249``): resize render to 896x896
(RAW [0,1] — the reference applies no ImageNet normalization before
``forward_features``), ``["x_norm_patchtokens"]`` -> (64, 64, 1024),
nearest-upsample back to image size."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from tpugs.encoders.vit import DINOV2_VIT_L14_REG, VisionTransformer


class DinoEncoder:
    feature_dim = 1024

    def __init__(self, ckpt: Optional[str] = None, image_size: int = 896,
                 scan_blocks: bool = True):
        """``scan_blocks`` (default on): run the 24 blocks as one
        lax.scan over stacked params — ~24x smaller HLO so the ViT-L
        program stays within what the remote TPU compile service
        handles (see ``ViTConfig.scan_blocks``); converted per-block
        checkpoints are restacked on load. Numerics identical."""
        import dataclasses as _dc

        self.image_size = image_size
        cfg = _dc.replace(DINOV2_VIT_L14_REG, scan_blocks=scan_blocks)
        self.vit = VisionTransformer(cfg, act="gelu")
        if ckpt:
            from tpugs.encoders.convert import load_dino_params
            from tpugs.encoders.vit import stack_block_params

            self.params = load_dino_params(ckpt)
            if scan_blocks:
                self.params = {"params": stack_block_params(
                    dict(self.params["params"]), cfg.layers
                )}
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
        # raw input, matching the reference call (backproject.py:236-242)
        x = jax.image.resize(image, (s, s, 3), "bilinear")[None]
        out = self._apply(self.params, x)
        gh, gw = s // 14, s // 14
        tokens = out["final"][:, out["n_prefix"]:, :]
        feats = tokens.reshape(gh, gw, self.feature_dim)
        # nearest-neighbor upsample back (reference uses mode="nearest")
        return jax.image.resize(
            feats, (H, W, self.feature_dim), "nearest"
        )
