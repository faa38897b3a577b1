"""LSeg pixel-feature encoder (CLIP-aligned 512-d per-pixel features).

Reference usage: ``LSegNet(backbone="clip_vitl16_384", features=256,
crop_size=480, arch_option=0, block_depth=0, activation="lrelu")``
loaded from ``lseg_minimal_e200.ckpt`` (``backproject.py:28-41``);
inference = resize render to 480x480, forward, L2-normalize per pixel,
resize back (``backproject.py:102-113``). The reference feeds RAW [0,1]
renders with no external normalization (also the f3dgs teacher path,
``simple_trainer_feature_3dgs.py:595-601``), so no input normalization
is applied here either.

Architecture (lang-seg, which lseg-minimal vendors):
  * image backbone = timm-style ViT-L/16-384 (``pretrained.model.*`` in
    the checkpoint: biased patch embed, cls token, 577-token pos_embed
    interpolated to the 480 grid, 24 pre-norm GELU blocks) — NOT CLIP's
    visual tower; LSeg only borrows CLIP (ViT-B/32) for its TEXT tower,
    which is why the output space is 512-d;
  * DPT readout: hook blocks (5, 11, 17, 23), "project" readout (concat
    cls to every patch token -> Linear(2C->C) + GELU), 1x1 convs to
    (256, 512, 1024, 1024) channels, spatial resample (x4, x2, x1, /2)
    — ``pretrained.act_postprocess{1..4}`` in the checkpoint;
  * DPT fusion: ``scratch.layer{1..4}_rn`` 3x3 (no bias) to 256ch,
    ``scratch.refinenet{4..1}`` residual fusion coarse-to-fine,
    ``scratch.head1`` 1x1 conv to the 512-d CLIP space.

Output is at input/2 resolution (DPT path1 is stride 2); callers
resize — matching the reference, which bilinearly resizes features to
the render size afterwards anyway.

Weights convert from the torch checkpoint with
``tpugs/encoders/convert.py`` (no network access in this environment —
checkpoint files must be supplied, exactly as the reference requires).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tpugs.encoders.vit import ViTConfig, VisionTransformer

HOOK_LAYERS = (5, 11, 17, 23)  # lseg clip_vitl16_384 hooks

# timm vit_large_patch16_384: biased patch embed, post-norm GELU blocks
TIMM_VIT_L16_384 = ViTConfig(
    image_size=480, patch_size=16, width=1024, layers=24, heads=16,
    pre_norm=False, layer_norm_eps=1e-6,
)


class ResidualConvUnit(nn.Module):
    """DPT ResidualConvUnit_custom (bn=False): x + conv(relu(conv(relu(x))))."""

    features: int

    @nn.compact
    def __call__(self, x):
        h = nn.relu(x)
        h = nn.Conv(self.features, (3, 3), padding=1, name="conv1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding=1, name="conv2")(h)
        return x + h


class FeatureFusion(nn.Module):
    """DPT FeatureFusionBlock_custom: skip-add via RCU1, RCU2, 2x
    bilinear upsample, 1x1 out_conv."""

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
    """DPT readout + reassemble + fusion head.

    Checkpoint key map (see ``convert.load_lseg_params``):
    read{i} <- act_postprocess{i+1}.0.project.0 (Linear 2C->C),
    proj{i} <- act_postprocess{i+1}.3 (1x1 conv to layer_channels[i]),
    up0/up1 <- act_postprocess{1,2}.4 (ConvTranspose x4/x2),
    down3   <- act_postprocess4.4 (3x3 stride-2 conv),
    rn{i}   <- scratch.layer{i+1}_rn, fuse{3-i} <- scratch.refinenet{4-i},
    head1   <- scratch.head1."""

    features: int = 256
    out_dim: int = 512
    vit_width: int = 1024
    layer_channels: Tuple[int, ...] = (256, 512, 1024, 1024)

    @nn.compact
    def __call__(self, levels: Sequence[jax.Array], cls_tokens, grid):
        # levels: 4 x (B, gh*gw, C) patch tokens; cls_tokens: 4 x (B, C)
        gh, gw = grid
        reassembled = []
        for i, (tokens, cls) in enumerate(zip(levels, cls_tokens)):
            B, N, C = tokens.shape
            # "project" readout: concat cls onto every token
            h = jnp.concatenate(
                [tokens, jnp.broadcast_to(cls[:, None, :], tokens.shape)],
                axis=-1,
            )
            h = nn.Dense(self.vit_width, name=f"read{i}")(h)
            h = nn.gelu(h, approximate=False)
            h = h.reshape(B, gh, gw, self.vit_width)
            h = nn.Conv(
                self.layer_channels[i], (1, 1), name=f"proj{i}"
            )(h)
            if i == 0:
                h = nn.ConvTranspose(
                    self.layer_channels[i], (4, 4), strides=(4, 4),
                    padding="VALID", transpose_kernel=True, name="up0",
                )(h)
            elif i == 1:
                h = nn.ConvTranspose(
                    self.layer_channels[i], (2, 2), strides=(2, 2),
                    padding="VALID", transpose_kernel=True, name="up1",
                )(h)
            elif i == 3:
                h = nn.Conv(
                    self.layer_channels[i], (3, 3), strides=(2, 2),
                    padding=1, name="down3",
                )(h)
            h = nn.Conv(
                self.features, (3, 3), padding=1, use_bias=False,
                name=f"rn{i}",
            )(h)
            reassembled.append(h)
        x = FeatureFusion(self.features, name="fuse3")(reassembled[3])
        x = FeatureFusion(self.features, name="fuse2")(x, reassembled[2])
        x = FeatureFusion(self.features, name="fuse1")(x, reassembled[1])
        x = FeatureFusion(self.features, name="fuse0")(x, reassembled[0])
        return nn.Conv(self.out_dim, (1, 1), name="head1")(x)


class LSegNet(nn.Module):
    features: int = 256
    out_dim: int = 512
    vit_cfg: ViTConfig = TIMM_VIT_L16_384
    hooks: Tuple[int, ...] = HOOK_LAYERS
    layer_channels: Tuple[int, ...] = (256, 512, 1024, 1024)

    @nn.compact
    def __call__(self, images):  # (B, H, W, 3) in [0,1], raw (see module doc)
        vit = VisionTransformer(self.vit_cfg, act="gelu", name="vit")
        out = vit(images, out_layers=list(self.hooks))
        np_ = out["n_prefix"]
        levels = [out[f"layer{i}"][:, np_:, :] for i in self.hooks]
        cls_tokens = [out[f"layer{i}"][:, 0, :] for i in self.hooks]
        feats = LSegHead(
            self.features, self.out_dim, self.vit_cfg.width,
            self.layer_channels, name="head",
        )(levels, cls_tokens, out["grid"])
        # head output is at half input resolution; callers resize.
        return feats


class LSegEncoder:
    """FeatureEncoder adapter: (H, W, 3) render -> (H, W, 512), with the
    reference's 480x480 crop + per-pixel L2 norm + resize-back protocol
    (``backproject.py:102-113``)."""

    feature_dim = 512

    def __init__(self, ckpt: Optional[str] = None, crop_size: int = 480,
                 dtype=None, scan_blocks: bool = True):
        """``dtype=jnp.bfloat16`` runs the ViT + head in bf16 (params,
        activations) — the TPU-native production precision (MXU bf16
        peak is ~4x the f32 rate); the per-pixel L2 norm and the resize
        back to render resolution stay f32. The reference runs the
        torch LSeg in f32 — the exact-parity path keeps dtype=None.

        ``scan_blocks`` (default on): run the 24 transformer blocks as
        one lax.scan over stacked params — identical numerics, ~24x
        smaller HLO; the unrolled ViT-L program at production scale
        kills the remote XLA compile service. Converted checkpoints
        (per-block layout) are restacked on load."""
        import dataclasses as _dc

        self.crop_size = crop_size
        self.dtype = dtype
        self.net = LSegNet(
            vit_cfg=_dc.replace(TIMM_VIT_L16_384, scan_blocks=scan_blocks)
        )
        if ckpt:
            from tpugs.encoders.convert import load_lseg_params
            from tpugs.encoders.vit import stack_block_params

            self.params = load_lseg_params(ckpt)
            if scan_blocks:
                p = dict(self.params["params"])
                p["vit"] = stack_block_params(
                    dict(p["vit"]), TIMM_VIT_L16_384.layers
                )
                self.params = {"params": p}
        else:
            rng = jax.random.PRNGKey(0)
            dummy = jnp.zeros((1, crop_size, crop_size, 3))
            self.params = self.net.init(rng, dummy)
            import warnings

            warnings.warn(
                "LSegEncoder initialized with RANDOM weights (no checkpoint "
                "given); outputs are not CLIP-aligned."
            )
        if dtype is not None:
            self.params = jax.tree_util.tree_map(
                lambda a: a.astype(dtype)
                if hasattr(a, "dtype") and a.dtype == jnp.float32
                else a,
                self.params,
            )
        self._apply = jax.jit(self.net.apply)

        cs = crop_size

        def _pre(imgs):  # (G, H, W, 3) -> (G, cs, cs, 3) in model dtype
            x = jax.image.resize(
                imgs, (imgs.shape[0], cs, cs, 3), "bilinear"
            )
            return x if dtype is None else x.astype(dtype)

        def _post(feats, out_hw):  # norm at cs^2, resize back, bf16
            f = feats.astype(jnp.float32)
            f = f / (jnp.linalg.norm(f, axis=-1, keepdims=True) + 1e-8)
            g = f.shape[0]
            h, w = out_hw
            f = jax.image.resize(f, (g, h, w, f.shape[-1]), "bilinear")
            return f.astype(jnp.bfloat16)

        self._pre_jit = jax.jit(_pre)
        self._post_jit = jax.jit(_post, static_argnums=(1,))

    def staged_apply(self, rgbs: jax.Array) -> jax.Array:
        """Batched encode as THREE small programs — jitted pre-resize,
        the per-image ViT+head program (``self._apply``, the only
        compile the remote XLA service is known to survive at this
        scale), jitted norm/resize-back — instead of one mega-program.
        The split backprojection pipeline
        (``lift/pallas_batch.backproject_views_grouped_split``) uses
        this when present; a fused scan over the whole __call__ body
        repeatedly crashes the compile service. Returns
        (G, H, W, feature_dim) bfloat16."""
        g, h, w, _ = rgbs.shape
        x = self._pre_jit(rgbs)
        feats = jnp.concatenate(
            [self._apply(self.params, x[i : i + 1]) for i in range(g)],
            axis=0,
        )
        return self._post_jit(feats, (h, w))

    def __call__(self, image: jax.Array) -> jax.Array:
        H, W, _ = image.shape
        cs = self.crop_size
        x = jax.image.resize(image, (cs, cs, 3), "bilinear")[None]
        if self.dtype is not None:
            x = x.astype(self.dtype)
        feats = self._apply(self.params, x)[0].astype(jnp.float32)
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
