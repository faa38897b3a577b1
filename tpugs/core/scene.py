"""Canonical 3DGS scene pytree.

The reference keeps scenes as loose dicts of torch tensors
(``/root/reference/utils.py:45-85``) with *raw* (pre-activation)
parameters: ``opacity`` is a logit and ``scaling`` is a log-scale —
activations ``sigmoid`` / ``exp`` are applied at every call site
(``/root/reference/utils.py:229-231``). Here the scene is a frozen JAX
pytree dataclass holding the same raw parameterization once, with the
activations available as properties, so the whole scene can flow
through ``jit`` / ``grad`` / ``shard_map`` as a single value.

Conventions (matching gsplat checkpoints):
  * ``quats``  — (N, 4) rotations in **wxyz** order, not necessarily
    normalized (normalized at projection time).
  * ``sh0``    — (N, 1, 3) DC spherical-harmonic coefficients.
  * ``shN``    — (N, K, 3) rest coefficients, K = (deg+1)^2 - 1.
  * ``opacities`` / ``scales`` stored raw (logit / log).
  * ``features`` — optional (N, D) auxiliary per-Gaussian feature field
    (used by the Feature-3DGS path, reference ``utils.py:157-158``).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _pytree_dataclass(cls):
    return jax.tree_util.register_dataclass(dataclasses.dataclass(frozen=True)(cls))


@_pytree_dataclass
class GaussianScene:
    means: jax.Array  # (N, 3) float32 world-space centers
    quats: jax.Array  # (N, 4) wxyz rotation
    log_scales: jax.Array  # (N, 3) log of per-axis stddev
    logit_opacities: jax.Array  # (N,)
    sh0: jax.Array  # (N, 1, 3)
    shN: jax.Array  # (N, K, 3); K may be 0
    features: Optional[jax.Array] = None  # (N, D) aux feature field
    feature_proj: Optional[jax.Array] = None  # (D, D_out) shared projection ("conv")

    # -- derived ------------------------------------------------------------
    @property
    def num_gaussians(self) -> int:
        return self.means.shape[0]

    @property
    def sh_degree(self) -> int:
        k = 1 + self.shN.shape[1]
        return int(round(k**0.5)) - 1

    @property
    def opacities(self) -> jax.Array:
        """Activated opacity in (0, 1)."""
        return jax.nn.sigmoid(self.logit_opacities)

    @property
    def scales(self) -> jax.Array:
        """Activated per-axis standard deviations."""
        return jnp.exp(self.log_scales)

    @property
    def colors_all(self) -> jax.Array:
        """(N, 1+K, 3) concatenated SH coefficients (reference
        ``utils.py:228`` ``torch.cat([colors_dc, colors_rest], dim=1)``)."""
        return jnp.concatenate([self.sh0, self.shN], axis=1)

    # -- functional updates --------------------------------------------------
    def replace(self, **kw) -> "GaussianScene":
        return dataclasses.replace(self, **kw)

    def select(self, mask_or_idx) -> "GaussianScene":
        """Boolean-mask / index every per-Gaussian array (the reference's
        ``apply_mask3d`` indexing pattern, ``segment.py:70-82``).

        Host-side only (data-dependent output shape)."""
        take = lambda a: None if a is None else a[np.asarray(mask_or_idx)]
        return GaussianScene(
            means=take(self.means),
            quats=take(self.quats),
            log_scales=take(self.log_scales),
            logit_opacities=take(self.logit_opacities),
            sh0=take(self.sh0),
            shN=take(self.shN),
            features=take(self.features) if self.features is not None else None,
            feature_proj=self.feature_proj,
        )

    def pad_to(self, n_pad: int) -> "GaussianScene":
        """Pad with fully transparent Gaussians up to a static capacity.

        XLA wants static shapes; padded Gaussians have opacity
        sigmoid(-30) ≈ 0 and are additionally masked out at projection
        time, so they never contribute.
        """
        n = self.num_gaussians
        if n_pad < n:
            raise ValueError(f"pad_to({n_pad}) smaller than N={n}")
        extra = n_pad - n
        if extra == 0:
            return self

        def pad(a, fill=0.0):
            if a is None:
                return None
            shape = (extra,) + a.shape[1:]
            return jnp.concatenate([a, jnp.full(shape, fill, a.dtype)], axis=0)

        quats_pad = jnp.concatenate(
            [
                self.quats,
                jnp.tile(
                    jnp.array([[1.0, 0, 0, 0]], self.quats.dtype), (extra, 1)
                ),
            ],
            axis=0,
        )
        return GaussianScene(
            means=pad(self.means),
            quats=quats_pad,
            log_scales=pad(self.log_scales, fill=-10.0),
            logit_opacities=pad(self.logit_opacities, fill=-30.0),
            sh0=pad(self.sh0),
            shN=pad(self.shN),
            features=pad(self.features) if self.features is not None else None,
            feature_proj=self.feature_proj,
        )


def pad_count(n: int, multiple: int = 256) -> int:
    """Round N up to a lane-aligned capacity."""
    return ((n + multiple - 1) // multiple) * multiple
