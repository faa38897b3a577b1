"""Torch-checkpoint -> Flax-params converters for the pretrained
encoders (LSeg-minimal, CLIP text tower, DINOv2).

This environment has no network access, so the checkpoints the reference
downloads (``lseg_minimal_e200.ckpt``, CLIP BPE merges, DINOv2 hub
weights) must be provided as files; these converters map their torch
``state_dict`` layouts into our Flax module trees. Torch is used purely
as a CPU deserializer.

Layout notes (verified against the public lseg-minimal / open-clip /
dinov2 repos):
  * CLIP visual blocks: ``transformer.resblocks.{i}.{attn,ln_1,mlp,ln_2}``
    with fused ``attn.in_proj_weight`` -> our Block.attn.qkv;
  * torch Linear stores (out, in) -> transpose for Flax Dense kernels;
  * torch Conv2d stores (out, in, kh, kw) -> (kh, kw, in, out);
  * DINOv2 blocks: ``blocks.{i}.{norm1,attn.qkv,attn.proj,norm2,mlp.fc1,
    mlp.fc2}``, plus ``cls_token``/``register_tokens``/``pos_embed``.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _t(w):  # torch tensor -> numpy
    return w.detach().cpu().numpy()


def _linear(sd, prefix):
    return {
        "kernel": _t(sd[prefix + ".weight"]).T,
        "bias": _t(sd[prefix + ".bias"]),
    }


def _layernorm(sd, prefix):
    return {
        "scale": _t(sd[prefix + ".weight"]),
        "bias": _t(sd[prefix + ".bias"]),
    }


def _conv(sd, prefix, with_bias=True):
    out = {"kernel": _t(sd[prefix + ".weight"]).transpose(2, 3, 1, 0)}
    if with_bias and prefix + ".bias" in sd:
        out["bias"] = _t(sd[prefix + ".bias"])
    return out


def _vit_block_from_clip(sd, p):
    """CLIP resblock -> our Block params."""
    in_w = _t(sd[p + ".attn.in_proj_weight"])  # (3C, C)
    in_b = _t(sd[p + ".attn.in_proj_bias"])
    return {
        "norm1": _layernorm(sd, p + ".ln_1"),
        "attn": {
            "qkv": {"kernel": in_w.T, "bias": in_b},
            "proj": _linear(sd, p + ".attn.out_proj"),
        },
        "norm2": _layernorm(sd, p + ".ln_2"),
        "mlp": {
            "fc1": _linear(sd, p + ".mlp.c_fc"),
            "fc2": _linear(sd, p + ".mlp.c_proj"),
        },
    }


def _vit_block_from_timm(sd, p):
    """timm/DINOv2 block -> our Block params."""
    return {
        "norm1": _layernorm(sd, p + ".norm1"),
        "attn": {
            "qkv": _linear(sd, p + ".attn.qkv"),
            "proj": _linear(sd, p + ".attn.proj"),
        },
        "norm2": _layernorm(sd, p + ".norm2"),
        "mlp": {
            "fc1": _linear(sd, p + ".mlp.fc1"),
            "fc2": _linear(sd, p + ".mlp.fc2"),
        },
    }


def _load_torch(path: str) -> Dict:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    if isinstance(sd, dict) and "model" in sd and hasattr(
        sd["model"], "state_dict"
    ):
        sd = sd["model"].state_dict()
    return sd


def load_clip_visual_params(path: str, prefix: str = "clip_pretrained.visual."):
    """CLIP ViT-L/16 visual tower from an LSeg checkpoint."""
    sd = _load_torch(path)
    sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    vit = {
        "patch_embed": {
            "kernel": _t(sd["conv1.weight"]).transpose(2, 3, 1, 0)
        },
        "class_token": _t(sd["class_embedding"])[None, None],
        "pos_embed": _t(sd["positional_embedding"])[None],
        "ln_pre": _layernorm(sd, "ln_pre"),
        "ln_post": _layernorm(sd, "ln_post"),
    }
    i = 0
    while f"transformer.resblocks.{i}.ln_1.weight" in sd:
        vit[f"block{i}"] = _vit_block_from_clip(sd, f"transformer.resblocks.{i}")
        i += 1
    return vit


def load_lseg_params(path: str) -> Dict:
    """Full LSeg params: CLIP visual backbone + DPT head.

    The DPT head mapping covers the lseg-minimal layer names
    (scratch.layer{1..4}_rn, scratch.refinenet{1..4}, scratch.head1,
    scratch.output_conv); unmatched keys raise so a layout drift is loud
    rather than silent."""
    sd = _load_torch(path)
    vit = load_clip_visual_params(path)
    head = {}
    for i, layer in enumerate(["layer1_rn", "layer2_rn", "layer3_rn", "layer4_rn"]):
        k = f"scratch.{layer}"
        if k + ".weight" in sd:
            head[f"proj{i}"] = _conv(sd, k)
    for i in range(4):
        rn = f"scratch.refinenet{4 - i}"  # refinenet4 is the deepest
        if rn + ".resConfUnit1.conv1.weight" in sd:
            head[f"fuse{3 - i}"] = {
                "rcu1": {
                    "conv1": _conv(sd, rn + ".resConfUnit1.conv1"),
                    "conv2": _conv(sd, rn + ".resConfUnit1.conv2"),
                },
                "rcu2": {
                    "conv1": _conv(sd, rn + ".resConfUnit2.conv1"),
                    "conv2": _conv(sd, rn + ".resConfUnit2.conv2"),
                },
                "out_conv": _conv(sd, rn + ".out_conv"),
            }
    if "scratch.head1.weight" in sd:
        head["head_conv"] = _conv(sd, "scratch.head1")
    if "scratch.output_conv.weight" in sd:
        head["head_proj"] = _conv(sd, "scratch.output_conv")
    return {"params": {"vit": vit, "head": head}}


def load_clip_text_params(path: str, prefix: str = "clip_pretrained.") -> Dict:
    sd = _load_torch(path)
    sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    params = {
        "token_embedding": {"embedding": _t(sd["token_embedding.weight"])},
        "pos_embed": _t(sd["positional_embedding"]),
        "ln_final": _layernorm(sd, "ln_final"),
        "text_projection": _t(sd["text_projection"]),
    }
    i = 0
    while f"transformer.resblocks.{i}.ln_1.weight" in sd:
        p = f"transformer.resblocks.{i}"
        params[f"ln1_{i}"] = _layernorm(sd, p + ".ln_1")
        params[f"attn_qkv_{i}"] = {
            "kernel": _t(sd[p + ".attn.in_proj_weight"]).T,
            "bias": _t(sd[p + ".attn.in_proj_bias"]),
        }
        params[f"attn_proj_{i}"] = _linear(sd, p + ".attn.out_proj")
        params[f"ln2_{i}"] = _layernorm(sd, p + ".ln_2")
        params[f"mlp_fc_{i}"] = _linear(sd, p + ".mlp.c_fc")
        params[f"mlp_proj_{i}"] = _linear(sd, p + ".mlp.c_proj")
        i += 1
    return {"params": params}


def load_dino_params(path: str) -> Dict:
    sd = _load_torch(path)
    vit = {
        "patch_embed": _conv(sd, "patch_embed.proj"),
        "class_token": _t(sd["cls_token"]),
        "pos_embed": _t(sd["pos_embed"]),
        "ln_post": _layernorm(sd, "norm"),
    }
    if "register_tokens" in sd:
        vit["register_tokens"] = _t(sd["register_tokens"])
    i = 0
    while f"blocks.{i}.norm1.weight" in sd:
        vit[f"block{i}"] = _vit_block_from_timm(sd, f"blocks.{i}")
        i += 1
    return {"params": vit}
