"""LSeg pixel-feature encoder (CLIP-aligned 512-d per-pixel features).

Reference usage: ``LSegNet(backbone="clip_vitl16_384", features=256,
crop_size=480, ...)`` loaded from ``lseg_minimal_e200.ckpt``
(``backproject.py:28-41``); inference = resize render to 480x480,
forward, L2-normalize per pixel, resize back (``backproject.py:102-113``).

Architecture here: CLIP ViT-L/16 backbone with hypercolumns from 4
intermediate blocks, a DPT-style reassemble+fusion head at
``features=256`` channels, and a final projection into the 512-d CLIP
text space. Weights convert from the torch checkpoint with
``tpugs/encoders/convert.py`` (no network access in this environment —
checkpoint files must be supplied, exactly as the reference requires)."""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tpugs.encoders.vit import CLIP_VIT_L16, VisionTransformer

HOOK_LAYERS = (5, 11, 17, 23)  # lseg clip_vitl16_384 hooks
IMAGENET_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
IMAGENET_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


class ResidualConvUnit(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        h = nn.relu(x)
        h = nn.Conv(self.features, (3, 3), padding=1, name="conv1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding=1, name="conv2")(h)
        return x + h


class FeatureFusion(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, skip=None):
        if skip is not None:
            x = x + ResidualConvUnit(self.features, name="rcu1")(skip)
        x = ResidualConvUnit(self.features, name="rcu2")(x)
        B, H, W, C = x.shape
        x = jax.image.resize(x, (B, 2 * H, 2 * W, C), "bilinear")
        return nn.Conv(self.features, (1, 1), name="out_conv")(x)


class LSegHead(nn.Module):
    """DPT-style head: reassemble 4 hypercolumn levels, fuse coarse to
    fine, project to the CLIP embedding dim."""

    features: int = 256
    out_dim: int = 512

    @nn.compact
    def __call__(self, levels: Sequence[jax.Array]):
        # levels: 4 x (B, gh, gw, width) from shallow to deep
        reassembled = []
        scales = [4, 2, 1, 0.5]  # DPT reassemble scale factors
        for i, (lv, s) in enumerate(zip(levels, scales)):
            h = nn.Conv(self.features, (3, 3), padding=1, name=f"proj{i}")(lv)
            B, gh, gw, C = h.shape
            nh, nw = int(gh * s), int(gw * s)
            h = jax.image.resize(h, (B, nh, nw, C), "bilinear")
            reassembled.append(h)
        x = FeatureFusion(self.features, name="fuse3")(reassembled[3])
        x = FeatureFusion(self.features, name="fuse2")(x, reassembled[2])
        x = FeatureFusion(self.features, name="fuse1")(x, reassembled[1])
        x = FeatureFusion(self.features, name="fuse0")(x, reassembled[0])
        x = nn.Conv(self.features, (3, 3), padding=1, name="head_conv")(x)
        x = nn.relu(x)
        return nn.Conv(self.out_dim, (1, 1), name="head_proj")(x)


class LSegNet(nn.Module):
    features: int = 256
    out_dim: int = 512

    @nn.compact
    def __call__(self, images):  # (B, H, W, 3) in [0,1]
        x = (images - IMAGENET_MEAN) / IMAGENET_STD
        vit = VisionTransformer(CLIP_VIT_L16, act="quick_gelu", name="vit")
        out = vit(x, out_layers=list(HOOK_LAYERS))
        gh, gw = out["grid"]
        np_ = out["n_prefix"]
        levels = [
            out[f"layer{i}"][:, np_:, :].reshape(x.shape[0], gh, gw, -1)
            for i in HOOK_LAYERS
        ]
        feats = LSegHead(self.features, self.out_dim, name="head")(levels)
        # head output is at half input resolution; callers resize.
        return feats


class LSegEncoder:
    """FeatureEncoder adapter: (H, W, 3) render -> (H, W, 512), with the
    reference's 480x480 crop + per-pixel L2 norm + resize-back protocol
    (``backproject.py:102-113``)."""

    feature_dim = 512

    def __init__(self, ckpt: Optional[str] = None, crop_size: int = 480):
        self.crop_size = crop_size
        self.net = LSegNet()
        if ckpt:
            from tpugs.encoders.convert import load_lseg_params

            self.params = load_lseg_params(ckpt)
        else:
            rng = jax.random.PRNGKey(0)
            dummy = jnp.zeros((1, crop_size, crop_size, 3))
            self.params = self.net.init(rng, dummy)
            import warnings

            warnings.warn(
                "LSegEncoder initialized with RANDOM weights (no checkpoint "
                "given); outputs are not CLIP-aligned."
            )
        self._apply = jax.jit(self.net.apply)

    def __call__(self, image: jax.Array) -> jax.Array:
        H, W, _ = image.shape
        cs = self.crop_size
        x = jax.image.resize(image, (cs, cs, 3), "bilinear")[None]
        feats = self._apply(self.params, x)[0]
        feats = feats / (
            jnp.linalg.norm(feats, axis=-1, keepdims=True) + 1e-8
        )
        return jax.image.resize(feats, (H, W, feats.shape[-1]), "bilinear")


_TEXT_CACHE = {}


def encode_text(
    prompts,
    ckpt: Optional[str] = None,
    bpe_path: Optional[str] = None,
):
    """CLIP text embeddings for query prompts (reference
    ``segment.py:42-52``). Requires the converted text tower + BPE file;
    without them raises with a clear message."""
    from tpugs.encoders.clip_text import CLIPTextTower, SimpleTokenizer, tokenize

    if ckpt is None or bpe_path is None:
        raise FileNotFoundError(
            "Text queries need the CLIP text tower checkpoint and BPE "
            "merges file (offline environment). Use exemplar-feature "
            "queries (--pos-idx) or supply --encoder-ckpt/--bpe-path."
        )
    key = (ckpt, bpe_path)
    if key not in _TEXT_CACHE:
        from tpugs.encoders.convert import load_clip_text_params

        tok = SimpleTokenizer(bpe_path)
        tower = CLIPTextTower()
        params = load_clip_text_params(ckpt)
        _TEXT_CACHE[key] = (tok, tower, params)
    tok, tower, params = _TEXT_CACHE[key]
    tokens = jnp.asarray(tokenize(tok, list(prompts)))
    return tower.apply(params, tokens)
