"""Densification strategies (reference gsplat DefaultStrategy / MCMC,
wired at ``f3dgs/simple_trainer_feature_3dgs.py:107-109,990-1006``).

TPU note on dynamic shapes: growing/pruning changes N, which XLA cannot
express inside one compiled program. The strategy therefore runs
host-side between jitted train steps, at ``refine_every`` cadence, and
the trainer re-pads N to a bucketed capacity so recompilation happens
only when the capacity bucket grows (SURVEY §7 step 8).

(The reference baseline itself ships with the post-backward
densification call commented out — ``simple_trainer_feature_3dgs.py:711-730``
— so training parity does not depend on refinement being active.)
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from tpugs.core.scene import GaussianScene


@dataclasses.dataclass
class GradState:
    """Accumulated screen-space gradient statistics (the reference's
    absgrad/means2d stats feeding grow decisions)."""

    grad2d_sum: np.ndarray  # (N,) accumulated ||d mean2d|| per Gaussian
    count: np.ndarray  # (N,) number of visible frames

    @staticmethod
    def zeros(n: int) -> "GradState":
        return GradState(np.zeros(n, np.float32), np.zeros(n, np.float32))

    def accumulate(self, grad2d_norm, visible):
        self.grad2d_sum += np.asarray(grad2d_norm)
        self.count += np.asarray(visible, np.float32)


_SCENE_FIELDS = (
    "means", "quats", "log_scales", "logit_opacities", "sh0", "shN",
    "features",
)


def _scene_to_host(scene: GaussianScene) -> dict:
    """Per-Gaussian arrays as numpy. Refinement runs ENTIRELY host-side:
    device selects/concats have data-dependent shapes, so every refine
    used to trigger a storm of tiny XLA compiles (new shapes each time)
    that dominated at-scale training wall-clock through the remote
    transport."""
    return {
        f: (None if getattr(scene, f) is None else np.asarray(getattr(scene, f)))
        for f in _SCENE_FIELDS
    }


def _host_to_scene(arrs: dict, feature_proj) -> GaussianScene:
    return GaussianScene(
        means=jnp.asarray(arrs["means"]),
        quats=jnp.asarray(arrs["quats"]),
        log_scales=jnp.asarray(arrs["log_scales"]),
        logit_opacities=jnp.asarray(arrs["logit_opacities"]),
        sh0=jnp.asarray(arrs["sh0"]),
        shN=jnp.asarray(arrs["shN"]),
        features=(
            None if arrs["features"] is None else jnp.asarray(arrs["features"])
        ),
        feature_proj=feature_proj,
    )


def _np_quat_rotmat(quats: np.ndarray) -> np.ndarray:
    """(N, 4) wxyz quaternions -> (N, 3, 3) rotations (numpy mirror of
    raster.projection.quat_to_rotmat)."""
    q = quats / np.maximum(
        np.linalg.norm(quats, axis=-1, keepdims=True), 1e-12
    )
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    R = np.empty((len(q), 3, 3), np.float32)
    R[:, 0, 0] = 1 - 2 * (y * y + z * z)
    R[:, 0, 1] = 2 * (x * y - w * z)
    R[:, 0, 2] = 2 * (x * z + w * y)
    R[:, 1, 0] = 2 * (x * y + w * z)
    R[:, 1, 1] = 1 - 2 * (x * x + z * z)
    R[:, 1, 2] = 2 * (y * z - w * x)
    R[:, 2, 0] = 2 * (x * z - w * y)
    R[:, 2, 1] = 2 * (y * z + w * x)
    R[:, 2, 2] = 1 - 2 * (z * z + x * x)
    return R


def _split_arrs(arrs: dict, mask: np.ndarray, rng) -> dict:
    """Split the masked (large, high-gradient) Gaussians into two samples
    drawn from each Gaussian, with scales shrunk by 1.6 (Inria recipe)."""
    n = int(mask.sum())
    if n == 0:
        return None
    sel = {
        f: (None if a is None else a[mask]) for f, a in arrs.items()
    }
    R = _np_quat_rotmat(sel["quats"])
    scales = np.exp(sel["log_scales"])
    parts = []
    for _ in range(2):
        eps = rng.normal(size=(n, 3)).astype(np.float32) * scales
        offs = np.einsum("nij,nj->ni", R, eps).astype(np.float32)
        p = dict(sel)
        p["means"] = sel["means"] + offs
        p["log_scales"] = sel["log_scales"] - np.float32(np.log(1.6))
        parts.append(p)
    return _concat_arrs(parts)


def _concat_arrs(parts) -> dict:
    return {
        f: (
            None
            if parts[0][f] is None
            else np.concatenate([p[f] for p in parts], axis=0)
        )
        for f in _SCENE_FIELDS
    }


class DefaultStrategy:
    """Duplicate-small / split-large / prune-transparent refinement
    (the Inria + gsplat default)."""

    def __init__(self, config, scene_scale: float = 1.0, seed: int = 0):
        self.cfg = config
        self.scene_scale = scene_scale
        self.rng = np.random.default_rng(seed)

    def refine(
        self, scene: GaussianScene, state: GradState
    ) -> Tuple[GaussianScene, GradState, dict]:
        cfg = self.cfg
        avg_grad = state.grad2d_sum / np.maximum(state.count, 1.0)
        is_grad_high = avg_grad > cfg.grow_grad2d
        arrs = _scene_to_host(scene)
        scales = np.exp(arrs["log_scales"]).max(axis=1)
        is_small = scales <= cfg.grow_scale3d * self.scene_scale
        is_dupli = is_grad_high & is_small
        is_split = is_grad_high & ~is_small

        opac = 1.0 / (1.0 + np.exp(-arrs["logit_opacities"]))
        is_prune = opac < cfg.prune_opa
        is_prune |= scales > cfg.prune_scale3d * self.scene_scale

        keep = ~(is_prune | is_split)
        parts = [{f: (None if a is None else a[keep]) for f, a in arrs.items()}]
        dupli_mask = is_dupli & keep
        if dupli_mask.any():
            parts.append(
                {f: (None if a is None else a[dupli_mask]) for f, a in arrs.items()}
            )
        split = _split_arrs(arrs, is_split, self.rng)
        if split is not None:
            parts.append(split)
        new = _concat_arrs(parts) if len(parts) > 1 else parts[0]
        new_scene = _host_to_scene(new, scene.feature_proj)
        info = {
            "duplicated": int(dupli_mask.sum()),
            "split": int(is_split.sum()),
            "pruned": int(is_prune.sum()),
            "num_gaussians": new_scene.num_gaussians,
        }
        return new_scene, GradState.zeros(new_scene.num_gaussians), info

    def reset_opacities(self, scene: GaussianScene, value: float = 0.01):
        """Clamp opacities down periodically (reference reset_every)."""
        cap = float(np.log(value / (1 - value)))
        return scene.replace(
            logit_opacities=jnp.minimum(scene.logit_opacities, cap)
        )


class MCMCStrategy:
    """Stochastic relocation strategy (gsplat MCMC): dead Gaussians are
    relocated to high-opacity ones' positions instead of pruned, keeping
    N constant — ideal for TPU static shapes."""

    def __init__(self, config, scene_scale: float = 1.0, seed: int = 0):
        self.cfg = config
        self.rng = np.random.default_rng(seed)
        self.scene_scale = scene_scale

    def refine(
        self, scene: GaussianScene, state: GradState
    ) -> Tuple[GaussianScene, GradState, dict]:
        opac = np.asarray(scene.opacities)
        dead = opac < self.cfg.prune_opa
        n_dead = int(dead.sum())
        if n_dead == 0:
            return scene, state, {"relocated": 0, "num_gaussians": scene.num_gaussians}
        alive_idx = np.where(~dead)[0]
        probs = opac[alive_idx] / opac[alive_idx].sum()
        targets = self.rng.choice(alive_idx, size=n_dead, p=probs)

        def reassign(a):
            a = np.asarray(a).copy()
            a[dead] = a[targets]
            return jnp.asarray(a)

        new_scene = GaussianScene(
            means=reassign(scene.means),
            quats=reassign(scene.quats),
            log_scales=reassign(scene.log_scales),
            logit_opacities=reassign(scene.logit_opacities),
            sh0=reassign(scene.sh0),
            shN=reassign(scene.shN),
            features=reassign(scene.features)
            if scene.features is not None
            else None,
            feature_proj=scene.feature_proj,
        )
        return new_scene, GradState.zeros(scene.num_gaussians), {
            "relocated": n_dead,
            "num_gaussians": scene.num_gaussians,
        }

    def reset_opacities(self, scene, value: float = 0.01):
        return scene


def make_strategy(config, scene_scale: float, seed: int = 0):
    if config.strategy == "default":
        return DefaultStrategy(config, scene_scale, seed)
    if config.strategy == "mcmc":
        return MCMCStrategy(config, scene_scale, seed)
    if config.strategy == "none":
        return None
    raise ValueError(f"unknown strategy {config.strategy!r}")
