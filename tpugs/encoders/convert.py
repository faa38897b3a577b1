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
    """timm/DINOv2 block -> our Block params (incl. LayerScale)."""
    out = {
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
    if p + ".ls1.gamma" in sd:  # DINOv2 LayerScale
        out["ls1"] = _t(sd[p + ".ls1.gamma"])
        out["ls2"] = _t(sd[p + ".ls2.gamma"])
    return out


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


class _Tracked(dict):
    """state_dict wrapper that records key reads, so converters can
    verify they consumed every relevant checkpoint tensor (layout drift
    fails loudly instead of silently dropping layers)."""

    def __init__(self, sd):
        super().__init__(sd)
        self.read = set()

    def __getitem__(self, k):
        self.read.add(k)
        return super().__getitem__(k)

    def __contains__(self, k):
        # membership probes don't count as consumption
        return super().__contains__(k)

    def check_consumed(self, prefixes, ignore=()):
        """Raise if any key under ``prefixes`` was never read (minus
        ``ignore`` substrings)."""
        missed = [
            k
            for k in self
            if any(k.startswith(p) for p in prefixes)
            and k not in self.read
            and not any(s in k for s in ignore)
        ]
        if missed:
            raise KeyError(
                "checkpoint keys not consumed by the converter "
                f"(layout drift?): {sorted(missed)[:10]}"
                + (f" ... +{len(missed) - 10} more" if len(missed) > 10 else "")
            )


def load_clip_visual_params(
    path: str, prefix: str = "clip_pretrained.visual.", strict: bool = True
):
    """CLIP ViT-L/16 visual tower from an LSeg checkpoint.

    ``strict``: every checkpoint key under ``prefix`` must be consumed
    (``proj`` — the unused CLIP image-embedding projection — excepted)."""
    sd = _load_torch(path) if isinstance(path, str) else path
    sd = _Tracked(
        {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    )
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
    if strict:
        if i == 0:
            raise KeyError("no transformer.resblocks.* found under " + prefix)
        sd.check_consumed([""], ignore=("proj",))
    return vit


def _conv_transpose(sd, prefix):
    """torch ConvTranspose2d (in, out, kh, kw) -> flax ConvTranspose
    with ``transpose_kernel=True`` (the exact gradient-of-conv, torch's
    semantics), whose kernel layout is (kh, kw, OUT, IN)."""
    out = {"kernel": _t(sd[prefix + ".weight"]).transpose(2, 3, 1, 0)}
    if prefix + ".bias" in sd:
        out["bias"] = _t(sd[prefix + ".bias"])
    return out


def load_lseg_params(path: str, strict: bool = True) -> Dict:
    """Full LSeg params from ``lseg_minimal_e200.ckpt`` (lang-seg layout,
    reference loads it at backproject.py:28-41).

    Image side: ``pretrained.model.*`` — the timm ViT-L/16-384 backbone
    (NOT CLIP's visual; LSeg only uses CLIP ViT-B/32 for text) — plus
    ``pretrained.act_postprocess{1..4}`` (DPT "project" readout Linear,
    1x1 channel conv, ConvTranspose/strided-conv resample) and
    ``scratch.*`` (layer_rn reassembly convs, refinenet fusion, head1).

    With ``strict`` (default) a missing required layer OR an unconsumed
    ``pretrained.*``/``scratch.*`` key raises, so any layout drift
    fails loudly. ``clip_pretrained.*`` (text tower -> use
    ``load_clip_text_params``; unused ViT-B/32 visual) and the scalar
    ``logit_scale`` are the only ignored families."""
    raw = _load_torch(path) if isinstance(path, str) else path
    sd = _Tracked(raw)
    bb = "pretrained.model."
    for req in (bb + "cls_token", bb + "pos_embed",
                bb + "patch_embed.proj.weight", bb + "norm.weight"):
        if req not in sd:
            raise KeyError(f"missing backbone tensor {req} "
                           "(expected timm ViT under pretrained.model.*)")
    vit = {
        "patch_embed": _conv(sd, bb + "patch_embed.proj"),
        "class_token": _t(sd[bb + "cls_token"]),
        "pos_embed": _t(sd[bb + "pos_embed"]),
        "ln_post": _layernorm(sd, bb + "norm"),
    }
    i = 0
    while f"{bb}blocks.{i}.norm1.weight" in sd:
        vit[f"block{i}"] = _vit_block_from_timm(sd, f"{bb}blocks.{i}")
        i += 1
    if strict and i == 0:
        raise KeyError(f"no {bb}blocks.* found")

    head = {}
    for i in range(4):
        ap = f"pretrained.act_postprocess{i + 1}"
        if strict and ap + ".0.project.0.weight" not in sd:
            raise KeyError(f"missing DPT readout {ap}.0.project.0 "
                           "(readout='project' layout)")
        head[f"read{i}"] = _linear(sd, ap + ".0.project.0")
        head[f"proj{i}"] = _conv(sd, ap + ".3")
    head["up0"] = _conv_transpose(sd, "pretrained.act_postprocess1.4")
    head["up1"] = _conv_transpose(sd, "pretrained.act_postprocess2.4")
    head["down3"] = _conv(sd, "pretrained.act_postprocess4.4")
    for i in range(4):
        k = f"scratch.layer{i + 1}_rn"
        if strict and k + ".weight" not in sd:
            raise KeyError(f"missing DPT reassembly conv {k}.weight")
        head[f"rn{i}"] = _conv(sd, k)
    for i in range(4):
        rn = f"scratch.refinenet{4 - i}"  # refinenet4 is the deepest
        if strict and rn + ".resConfUnit1.conv1.weight" not in sd:
            raise KeyError(f"missing DPT fusion block {rn}")
        fuse = {
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
        if i == 0:
            # refinenet4 takes a single input: its resConfUnit1 exists in
            # the checkpoint but is never applied (DPT), and our fuse3
            # module has no rcu1 — read (for accounting) then drop.
            del fuse["rcu1"]
        head[f"fuse{3 - i}"] = fuse
    if "scratch.head1.weight" not in sd:
        raise KeyError("missing scratch.head1")
    head["head1"] = _conv(sd, "scratch.head1")
    if strict:
        sd.check_consumed(
            ["pretrained.", "scratch."],
            # classifier head of the timm ViT is unused by the DPT hooks
            ignore=("model.head.",),
        )
    return {"params": {"vit": vit, "head": head}}


def load_clip_text_params(
    path: str, prefix: str = "clip_pretrained.", strict: bool = True
) -> Dict:
    """CLIP text tower (token embedding + causal transformer +
    projection) from an LSeg/CLIP checkpoint (reference segment.py:42-52
    encodes prompts through this tower)."""
    sd = _load_torch(path) if isinstance(path, str) else path
    sd = _Tracked(
        {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    )
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
    if strict:
        if i == 0:
            raise KeyError("no transformer.resblocks.* found under " + prefix)
        # visual.* keys belong to load_clip_visual_params; logit_scale
        # is CLIP's temperature (unused for feature scoring)
        sd.check_consumed([""], ignore=("visual.", "logit_scale"))
    return {"params": params}


def load_dino_params(path: str, strict: bool = True) -> Dict:
    """DINOv2 ViT (timm layout: ``blocks.{i}.{norm1,attn.qkv,attn.proj,
    norm2,mlp.fc1,mlp.fc2}`` + cls/register/pos tokens; reference pulls
    these weights via torch.hub at backproject.py:177-181)."""
    sd = _load_torch(path) if isinstance(path, str) else path
    sd = _Tracked(sd)
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
    if strict:
        if i == 0:
            raise KeyError("no blocks.* found (timm DINOv2 layout)")
        # mask_token is for masked-image pretraining only; ls1/ls2 are
        # LayerScale (present in some DINOv2 variants — if the target
        # checkpoint has them the Flax module must apply them, so DON'T
        # ignore; absence from this list makes that drift loud)
        sd.check_consumed([""], ignore=("mask_token",))
    return {"params": vit}
