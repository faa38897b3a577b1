"""Image quality metrics in pure JAX: PSNR + windowed SSIM.

The reference uses torchmetrics PSNR/SSIM/LPIPS for eval
(``f3dgs/simple_trainer_feature_3dgs.py:330-335,826-830``). PSNR/SSIM
are implemented natively (SSIM as the standard 11x11 Gaussian-window
variant); LPIPS needs pretrained VGG/Alex weights, which this
environment cannot download — the hook accepts any callable scoring
function so a converted-weights LPIPS can plug in.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def psnr(pred: jax.Array, target: jax.Array, max_val: float = 1.0) -> jax.Array:
    mse = jnp.mean((pred - target) ** 2)
    return 10.0 * jnp.log10(max_val**2 / jnp.maximum(mse, 1e-12))


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2
    g = jnp.exp(-(x**2) / (2 * sigma**2))
    g = g / g.sum()
    return jnp.outer(g, g)


def ssim(
    pred: jax.Array,  # (H, W, C) in [0, 1]
    target: jax.Array,
    max_val: float = 1.0,
    window_size: int = 11,
    sigma: float = 1.5,
) -> jax.Array:
    """Mean SSIM with Gaussian windowing (matches the standard
    implementation used by torchmetrics to ~1e-4)."""
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    win = _gaussian_window(window_size, sigma)
    kernel = win[:, :, None, None]  # (kh, kw, 1, 1)

    def filt(x):  # (H, W, C) -> per-channel valid convolution
        x = jnp.transpose(x, (2, 0, 1))[:, None]  # (C, 1, H, W)
        out = jax.lax.conv_general_dilated(
            x,
            jnp.transpose(kernel, (3, 2, 0, 1)),  # (1, 1, kh, kw)
            window_strides=(1, 1),
            padding="VALID",
            # f32 accumulation is load-bearing: TPU convs default to
            # bf16 inputs, and sigma = filt(x*x) - mu^2 then loses all
            # significance — denominators go ~0/negative and the SSIM
            # map explodes (observed: loss=-5.7 on chip, 0.32 on CPU).
            precision=jax.lax.Precision.HIGHEST,
        )
        return jnp.transpose(out[:, 0], (1, 2, 0))

    mu_p = filt(pred)
    mu_t = filt(target)
    mu_pp = mu_p * mu_p
    mu_tt = mu_t * mu_t
    mu_pt = mu_p * mu_t
    sigma_p = filt(pred * pred) - mu_pp
    sigma_t = filt(target * target) - mu_tt
    sigma_pt = filt(pred * target) - mu_pt
    ssim_map = ((2 * mu_pt + c1) * (2 * sigma_pt + c2)) / (
        (mu_pp + mu_tt + c1) * (sigma_p + sigma_t + c2)
    )
    return jnp.mean(ssim_map)


def ssim_loss(pred, target):
    """1 - SSIM, differentiable (trainer loss term, reference ``:602-612``)."""
    return 1.0 - ssim(pred, target)
