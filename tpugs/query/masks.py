"""Scene editing via 3D masks (reference ``segment.py:64-88``).

``apply_mask3d`` returns three edited scenes:
  * ``extracted`` — only the masked Gaussians;
  * ``deleted``   — only the unmasked Gaussians;
  * ``masked``    — all Gaussians, DC color forced to 1 (mask) / 0
    (rest) with higher-order SH zeroed for the rest, so a render shows
    the mask in white-on-black (reference ``segment.py:84-86``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from tpugs.core.scene import GaussianScene


def apply_mask3d(
    scene: GaussianScene,
    mask3d,
    mask3d_inverted=None,
) -> Tuple[GaussianScene, GaussianScene, GaussianScene]:
    mask = np.asarray(mask3d)
    inv = np.asarray(mask3d_inverted) if mask3d_inverted is not None else ~mask

    extracted = scene.select(mask)
    deleted = scene.select(inv)

    sh0 = jnp.where(mask[:, None, None], 1.0, 0.0) * jnp.ones_like(scene.sh0)
    shN = jnp.where(mask[:, None, None], scene.shN, 0.0)
    masked = scene.replace(sh0=sh0, shN=shN)
    return extracted, deleted, masked


def segment_by_opacity(
    scene: GaussianScene, mask3d, hidden_logit: float = -30.0
) -> GaussianScene:
    """Soft deletion: zero out opacity outside the mask (the viewer /
    LLM-editor path, reference ``viewer_with_llm.py:394-413`` and
    ``click_and_segment.py:360-393``). Shape-preserving (jit-friendly)."""
    mask = jnp.asarray(mask3d)
    return scene.replace(
        logit_opacities=jnp.where(
            mask, scene.logit_opacities, hidden_logit
        )
    )


def recolor(
    scene: GaussianScene,
    mask3d,
    rgb: Tuple[float, float, float],
    strength: float = 1.0,
) -> GaussianScene:
    """Tint masked Gaussians toward an RGB color: grayscale the DC SH
    then scale by the target color (reference ``viewer_with_llm.py:419-435``,
    using the SH0 constant 0.28209...)."""
    C0 = 0.2820947917738781
    mask = jnp.asarray(mask3d)[:, None]
    dc = scene.sh0[:, 0, :]
    colors = dc * C0 + 0.5  # to linear color
    gray = jnp.mean(colors, axis=-1, keepdims=True)
    target = gray * jnp.asarray(rgb, jnp.float32)[None, :]
    new_colors = jnp.where(mask, (1 - strength) * colors + strength * target, colors)
    new_dc = (new_colors - 0.5) / C0
    return scene.replace(sh0=new_dc[:, None, :])
