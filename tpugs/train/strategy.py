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


def _split_scene(scene: GaussianScene, mask: np.ndarray, rng) -> GaussianScene:
    """Split the masked (large, high-gradient) Gaussians into two samples
    drawn from each Gaussian, with scales shrunk by 1.6 (Inria recipe)."""
    sel = scene.select(mask)
    n = sel.num_gaussians
    if n == 0:
        return None
    from tpugs.raster.projection import quat_to_rotmat

    R = np.asarray(quat_to_rotmat(sel.quats))
    scales = np.asarray(sel.scales)
    out = []
    for _ in range(2):
        eps = rng.normal(size=(n, 3)).astype(np.float32) * scales
        offs = np.einsum("nij,nj->ni", R, eps)
        out.append(
            sel.replace(
                means=sel.means + jnp.asarray(offs),
                log_scales=sel.log_scales - np.log(1.6),
            )
        )
    return _concat_scenes(out)


def _concat_scenes(scenes) -> GaussianScene:
    cat = lambda xs: jnp.concatenate(xs, axis=0)
    feats = [s.features for s in scenes]
    return GaussianScene(
        means=cat([s.means for s in scenes]),
        quats=cat([s.quats for s in scenes]),
        log_scales=cat([s.log_scales for s in scenes]),
        logit_opacities=cat([s.logit_opacities for s in scenes]),
        sh0=cat([s.sh0 for s in scenes]),
        shN=cat([s.shN for s in scenes]),
        features=cat(feats) if feats[0] is not None else None,
        feature_proj=scenes[0].feature_proj,
    )


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
        scales = np.asarray(scene.scales).max(axis=1)
        is_small = scales <= cfg.grow_scale3d * self.scene_scale
        is_dupli = is_grad_high & is_small
        is_split = is_grad_high & ~is_small

        opac = np.asarray(scene.opacities)
        is_prune = opac < cfg.prune_opa
        is_prune |= scales > cfg.prune_scale3d * self.scene_scale

        keep = ~(is_prune | is_split)
        parts = [scene.select(keep)]
        n_dupli = int(is_dupli[keep].sum()) if keep.any() else 0
        dupli_mask = is_dupli & keep
        if dupli_mask.any():
            parts.append(scene.select(dupli_mask))
        split = _split_scene(scene, is_split, self.rng)
        if split is not None:
            parts.append(split)
        new_scene = _concat_scenes(parts) if len(parts) > 1 else parts[0]
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
