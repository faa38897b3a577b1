"""Minimal Flax Vision Transformer shared by the LSeg (CLIP ViT-L/16)
and DINOv2 (ViT-L/14 + register tokens) encoders.

The reference consumes these as torch models (LSegNet at
``backproject.py:28-41``; DINOv2 via torch.hub at ``:177-181``). Here
the backbone is a small pure-Flax implementation; pretrained torch
checkpoints are converted with ``tpugs/encoders/convert.py`` (this
environment has no network access, so checkpoints must be provided as
files — the same requirement the reference has for
``lseg_minimal_e200.ckpt``)."""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    image_size: int = 480
    patch_size: int = 16
    width: int = 1024
    layers: int = 24
    heads: int = 16
    mlp_ratio: float = 4.0
    num_register_tokens: int = 0  # DINOv2-reg: 4
    use_class_token: bool = True
    pre_norm: bool = False  # CLIP applies LN before the transformer
    layer_norm_eps: float = 1e-5
    swiglu: bool = False  # DINOv2 giant uses SwiGLU; L uses plain MLP
    layer_scale: bool = False  # DINOv2 blocks scale residuals by ls1/ls2
    pos_interp: str = "bilinear"  # DINOv2 resizes pos embeds bicubic
    # Run the (homogeneous) blocks as ONE lax.scan over stacked params
    # instead of an unrolled Python loop: the HLO shrinks ~layers x,
    # which keeps XLA compile time/size tractable for ViT-L inside
    # larger pipelines (the remote TPU compile service dies on the
    # unrolled 24-block program at production scale). Param layout
    # changes from block{i}/... to blocks/... with a leading (layers,)
    # axis — convert loaded per-block checkpoints with
    # ``stack_block_params``. Numerics are identical.
    scan_blocks: bool = False

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size


CLIP_VIT_L16 = ViTConfig(
    image_size=480, patch_size=16, width=1024, layers=24, heads=16,
    pre_norm=True,
)
DINOV2_VIT_L14_REG = ViTConfig(
    image_size=896, patch_size=14, width=1024, layers=24, heads=16,
    num_register_tokens=4, layer_norm_eps=1e-6, layer_scale=True,
    pos_interp="cubic",
)


class Mlp(nn.Module):
    width: int
    mlp_ratio: float
    act: str = "gelu"

    @nn.compact
    def __call__(self, x):
        hidden = int(self.width * self.mlp_ratio)
        x = nn.Dense(hidden, name="fc1")(x)
        x = (
            nn.gelu(x, approximate=False)
            if self.act == "gelu"
            else jax.nn.sigmoid(1.702 * x) * x  # quick_gelu (CLIP)
        )
        return nn.Dense(self.width, name="fc2")(x)


class Attention(nn.Module):
    width: int
    heads: int

    @nn.compact
    def __call__(self, x):
        B, T, C = x.shape
        qkv = nn.Dense(3 * C, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        hd = C // self.heads

        def heads_split(t):
            return t.reshape(B, T, self.heads, hd).transpose(0, 2, 1, 3)

        q, k, v = map(heads_split, (q, k, v))
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(hd)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, T, C)
        return nn.Dense(C, name="proj")(out)


class Block(nn.Module):
    cfg: ViTConfig
    act: str

    @nn.compact
    def __call__(self, x):
        eps = self.cfg.layer_norm_eps
        a = Attention(self.cfg.width, self.cfg.heads, name="attn")(
            nn.LayerNorm(epsilon=eps, name="norm1")(x)
        )
        if self.cfg.layer_scale:
            # DINOv2 LayerScale: learned per-channel residual gains
            # (torch keys blocks.{i}.ls{1,2}.gamma)
            a = a * self.param(
                "ls1", nn.initializers.constant(1e-5), (self.cfg.width,)
            )
        x = x + a
        m = Mlp(self.cfg.width, self.cfg.mlp_ratio, self.act, name="mlp")(
            nn.LayerNorm(epsilon=eps, name="norm2")(x)
        )
        if self.cfg.layer_scale:
            m = m * self.param(
                "ls2", nn.initializers.constant(1e-5), (self.cfg.width,)
            )
        return x + m


class VisionTransformer(nn.Module):
    """Returns every requested block's token sequence (hypercolumns for
    LSeg's DPT-style head need intermediate layers)."""

    cfg: ViTConfig
    act: str = "gelu"

    @nn.compact
    def __call__(self, images, out_layers=None):
        cfg = self.cfg
        B, H, W, _ = images.shape
        x = nn.Conv(
            cfg.width,
            (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            use_bias=not cfg.pre_norm,
            name="patch_embed",
        )(images)
        gh, gw = x.shape[1], x.shape[2]
        x = x.reshape(B, gh * gw, cfg.width)

        tokens = []
        if cfg.use_class_token:
            cls = self.param(
                "class_token", nn.initializers.zeros, (1, 1, cfg.width)
            )
            tokens.append(jnp.tile(cls, (B, 1, 1)))
        if cfg.num_register_tokens:
            reg = self.param(
                "register_tokens",
                nn.initializers.zeros,
                (1, cfg.num_register_tokens, cfg.width),
            )
            tokens.append(jnp.tile(reg, (B, 1, 1)))
        n_prefix = (1 if cfg.use_class_token else 0) + cfg.num_register_tokens

        pos = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1, (1 if cfg.use_class_token else 0) + cfg.grid**2, cfg.width),
        )
        # Interpolate positional embeddings if the grid differs.
        cls_pos = pos[:, :1] if cfg.use_class_token else None
        patch_pos = pos[:, 1:] if cfg.use_class_token else pos
        if gh * gw != patch_pos.shape[1]:
            g0 = int(round(patch_pos.shape[1] ** 0.5))
            pp = patch_pos.reshape(1, g0, g0, cfg.width)
            pp = jax.image.resize(pp, (1, gh, gw, cfg.width), cfg.pos_interp)
            patch_pos = pp.reshape(1, gh * gw, cfg.width)
        x = x + patch_pos
        if cfg.use_class_token:
            tokens[0] = tokens[0] + cls_pos
        x = jnp.concatenate(tokens + [x], axis=1) if tokens else x

        if cfg.pre_norm:
            x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="ln_pre")(x)

        outputs = {}
        want = set(out_layers or [cfg.layers - 1])
        if cfg.scan_blocks:
            def body_fn(block, carry, _):
                y = block(carry)
                return y, y

            scan = nn.scan(
                body_fn,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                length=cfg.layers,
            )
            x, ys = scan(Block(cfg, self.act, name="blocks"), x, None)
            for i in want:
                outputs[f"layer{i}"] = ys[i]
        else:
            for i in range(cfg.layers):
                x = Block(cfg, self.act, name=f"block{i}")(x)
                if i in want:
                    outputs[f"layer{i}"] = x
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="ln_post")(x)
        outputs["final"] = x
        outputs["grid"] = (gh, gw)
        outputs["n_prefix"] = n_prefix
        return outputs


def patch_tokens(out, layer="final"):
    """(B, gh*gw, C) patch tokens with prefix (cls/register) stripped."""
    x = out[layer]
    return x[:, out["n_prefix"]:, :]


def stack_block_params(vit_params: dict, layers: int,
                       prefix: str = "block") -> dict:
    """Convert per-block params (``block0`` .. ``block{L-1}``, the
    unrolled layout the checkpoint converters emit) into the
    ``scan_blocks`` layout: one ``blocks`` subtree whose leaves carry a
    leading (layers,) axis. Non-block entries pass through unchanged."""
    blocks = [vit_params[f"{prefix}{i}"] for i in range(layers)]
    stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs, axis=0), *blocks
    )
    out = {
        k: v
        for k, v in vit_params.items()
        if not (k.startswith(prefix) and k[len(prefix):].isdigit())
    }
    out["blocks"] = stacked
    return out
