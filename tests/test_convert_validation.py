"""Converter validation without real checkpoints (VERDICT r1 item 3):
synthetic torch state_dicts with the EXACT public layouts
(lseg-minimal / lang-seg, DINOv2, CLIP), shape-checked tensor-by-tensor
against the Flax modules, plus numerical block-level equivalence vs
torch forwards so every transpose convention is pinned down. Any layout
drift in the converters fails loudly here.

Reference load sites: lseg ``backproject.py:28-41``, CLIP text
``segment.py:42-52``, DINOv2 ``backproject.py:177-181``."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from tpugs.encoders.convert import (
    load_clip_text_params,
    load_dino_params,
    load_lseg_params,
)
from tpugs.encoders.lseg import LSegNet
from tpugs.encoders.vit import ViTConfig


def _rt(rng, *shape):
    return torch.from_numpy(rng.normal(0, 0.05, shape).astype(np.float32))


# --------------------------------------------------- synthetic layouts


def make_lseg_state_dict(
    rng, width=16, layers=4, patch=8, img=32, features=8, out_c=16,
    layer_channels=(8, 16, 16, 16), text_width=12, text_layers=2,
    vocab=64, ctx=8, embed=16,
):
    """The exact lseg_minimal_e200.ckpt key layout (lang-seg LSegNet:
    timm ViT backbone under pretrained.model, DPT act_postprocess +
    scratch, CLIP ViT-B/32 under clip_pretrained)."""
    grid = img // patch
    sd = {}

    # --- pretrained.model: timm ViT ---
    bb = "pretrained.model."
    sd[bb + "cls_token"] = _rt(rng, 1, 1, width)
    sd[bb + "pos_embed"] = _rt(rng, 1, 1 + grid * grid, width)
    sd[bb + "patch_embed.proj.weight"] = _rt(rng, width, 3, patch, patch)
    sd[bb + "patch_embed.proj.bias"] = _rt(rng, width)
    for i in range(layers):
        p = f"{bb}blocks.{i}."
        sd[p + "norm1.weight"] = _rt(rng, width)
        sd[p + "norm1.bias"] = _rt(rng, width)
        sd[p + "attn.qkv.weight"] = _rt(rng, 3 * width, width)
        sd[p + "attn.qkv.bias"] = _rt(rng, 3 * width)
        sd[p + "attn.proj.weight"] = _rt(rng, width, width)
        sd[p + "attn.proj.bias"] = _rt(rng, width)
        sd[p + "norm2.weight"] = _rt(rng, width)
        sd[p + "norm2.bias"] = _rt(rng, width)
        sd[p + "mlp.fc1.weight"] = _rt(rng, 4 * width, width)
        sd[p + "mlp.fc1.bias"] = _rt(rng, 4 * width)
        sd[p + "mlp.fc2.weight"] = _rt(rng, width, 4 * width)
        sd[p + "mlp.fc2.bias"] = _rt(rng, width)
    sd[bb + "norm.weight"] = _rt(rng, width)
    sd[bb + "norm.bias"] = _rt(rng, width)

    # --- pretrained.act_postprocess{1..4}: DPT readout/resample ---
    for i, ch in enumerate(layer_channels):
        ap = f"pretrained.act_postprocess{i + 1}"
        sd[ap + ".0.project.0.weight"] = _rt(rng, width, 2 * width)
        sd[ap + ".0.project.0.bias"] = _rt(rng, width)
        sd[ap + ".3.weight"] = _rt(rng, ch, width, 1, 1)
        sd[ap + ".3.bias"] = _rt(rng, ch)
    # resample: ConvTranspose x4, x2; level3 none; level4 stride-2 conv
    sd["pretrained.act_postprocess1.4.weight"] = _rt(
        rng, layer_channels[0], layer_channels[0], 4, 4
    )
    sd["pretrained.act_postprocess1.4.bias"] = _rt(rng, layer_channels[0])
    sd["pretrained.act_postprocess2.4.weight"] = _rt(
        rng, layer_channels[1], layer_channels[1], 2, 2
    )
    sd["pretrained.act_postprocess2.4.bias"] = _rt(rng, layer_channels[1])
    sd["pretrained.act_postprocess4.4.weight"] = _rt(
        rng, layer_channels[3], layer_channels[3], 3, 3
    )
    sd["pretrained.act_postprocess4.4.bias"] = _rt(rng, layer_channels[3])

    # --- scratch: reassembly convs + fusion + head ---
    for i, ch in enumerate(layer_channels):
        sd[f"scratch.layer{i + 1}_rn.weight"] = _rt(rng, features, ch, 3, 3)
    for r in range(1, 5):
        rn = f"scratch.refinenet{r}."
        for u in ("resConfUnit1", "resConfUnit2"):
            for c in ("conv1", "conv2"):
                sd[rn + f"{u}.{c}.weight"] = _rt(
                    rng, features, features, 3, 3
                )
                sd[rn + f"{u}.{c}.bias"] = _rt(rng, features)
        sd[rn + "out_conv.weight"] = _rt(rng, features, features, 1, 1)
        sd[rn + "out_conv.bias"] = _rt(rng, features)
    sd["scratch.head1.weight"] = _rt(rng, out_c, features, 1, 1)
    sd["scratch.head1.bias"] = _rt(rng, out_c)
    sd["logit_scale"] = _rt(rng)

    # --- clip_pretrained: ViT-B/32-style CLIP (text used, visual not) ---
    cp = "clip_pretrained."
    sd[cp + "logit_scale"] = _rt(rng)
    sd[cp + "token_embedding.weight"] = _rt(rng, vocab, text_width)
    sd[cp + "positional_embedding"] = _rt(rng, ctx, text_width)
    sd[cp + "ln_final.weight"] = _rt(rng, text_width)
    sd[cp + "ln_final.bias"] = _rt(rng, text_width)
    sd[cp + "text_projection"] = _rt(rng, text_width, embed)
    for i in range(text_layers):
        p = cp + f"transformer.resblocks.{i}."
        sd[p + "ln_1.weight"] = _rt(rng, text_width)
        sd[p + "ln_1.bias"] = _rt(rng, text_width)
        sd[p + "attn.in_proj_weight"] = _rt(rng, 3 * text_width, text_width)
        sd[p + "attn.in_proj_bias"] = _rt(rng, 3 * text_width)
        sd[p + "attn.out_proj.weight"] = _rt(rng, text_width, text_width)
        sd[p + "attn.out_proj.bias"] = _rt(rng, text_width)
        sd[p + "ln_2.weight"] = _rt(rng, text_width)
        sd[p + "ln_2.bias"] = _rt(rng, text_width)
        sd[p + "mlp.c_fc.weight"] = _rt(rng, 4 * text_width, text_width)
        sd[p + "mlp.c_fc.bias"] = _rt(rng, 4 * text_width)
        sd[p + "mlp.c_proj.weight"] = _rt(rng, text_width, 4 * text_width)
        sd[p + "mlp.c_proj.bias"] = _rt(rng, text_width)
    # unused CLIP visual tower (must be ignored without complaint)
    vis = cp + "visual."
    sd[vis + "conv1.weight"] = _rt(rng, text_width, 3, 4, 4)
    sd[vis + "class_embedding"] = _rt(rng, text_width)
    sd[vis + "positional_embedding"] = _rt(rng, 5, text_width)
    sd[vis + "proj"] = _rt(rng, text_width, embed)
    return sd


def make_dino_state_dict(rng, width=16, layers=3, patch=8, grid=4,
                         registers=4, layer_scale=True):
    sd = {
        "cls_token": _rt(rng, 1, 1, width),
        "pos_embed": _rt(rng, 1, 1 + grid * grid, width),
        "register_tokens": _rt(rng, 1, registers, width),
        "mask_token": _rt(rng, 1, width),
        "patch_embed.proj.weight": _rt(rng, width, 3, patch, patch),
        "patch_embed.proj.bias": _rt(rng, width),
        "norm.weight": _rt(rng, width),
        "norm.bias": _rt(rng, width),
    }
    for i in range(layers):
        p = f"blocks.{i}."
        sd[p + "norm1.weight"] = _rt(rng, width)
        sd[p + "norm1.bias"] = _rt(rng, width)
        sd[p + "attn.qkv.weight"] = _rt(rng, 3 * width, width)
        sd[p + "attn.qkv.bias"] = _rt(rng, 3 * width)
        sd[p + "attn.proj.weight"] = _rt(rng, width, width)
        sd[p + "attn.proj.bias"] = _rt(rng, width)
        sd[p + "norm2.weight"] = _rt(rng, width)
        sd[p + "norm2.bias"] = _rt(rng, width)
        sd[p + "mlp.fc1.weight"] = _rt(rng, 4 * width, width)
        sd[p + "mlp.fc1.bias"] = _rt(rng, 4 * width)
        sd[p + "mlp.fc2.weight"] = _rt(rng, width, 4 * width)
        sd[p + "mlp.fc2.bias"] = _rt(rng, width)
        if layer_scale:
            sd[p + "ls1.gamma"] = _rt(rng, width)
            sd[p + "ls2.gamma"] = _rt(rng, width)
    return sd


TINY_VIT = ViTConfig(
    image_size=32, patch_size=8, width=16, layers=4, heads=4,
    pre_norm=False, layer_norm_eps=1e-6,
)
TINY_LSEG = dict(
    features=8, out_dim=16, vit_cfg=TINY_VIT, hooks=(0, 1, 2, 3),
    layer_channels=(8, 16, 16, 16),
)


def _tree_shapes(tree):
    return jax.tree_util.tree_map(
        lambda x: tuple(x.shape) if hasattr(x, "shape") else x, tree
    )


# ------------------------------------------------------------- LSeg


class TestLSegConverter:
    def test_shapes_match_module_exactly(self):
        """Every converted tensor must land at the module-init shape
        (the synthetic ckpt grid == the crop grid, so even pos_embed
        matches without interpolation)."""
        rng = np.random.default_rng(0)
        sd = make_lseg_state_dict(rng)
        params = load_lseg_params(sd)
        net = LSegNet(**TINY_LSEG)
        ref = jax.eval_shape(
            lambda: net.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
        )
        got, want = _tree_shapes(params), _tree_shapes(ref)
        assert jax.tree_util.tree_structure(got) == \
            jax.tree_util.tree_structure(want), (
            f"param tree mismatch:\n{got}\nvs\n{want}"
        )
        for kp, g in jax.tree_util.tree_flatten_with_path(got)[0]:
            w = want
            for k in kp:
                w = w[k.key] if hasattr(k, "key") else w[k.idx]
            assert g == w, f"shape mismatch at {kp}: ckpt {g} vs module {w}"

    def test_forward_runs(self):
        rng = np.random.default_rng(1)
        params = load_lseg_params(make_lseg_state_dict(rng))
        net = LSegNet(**TINY_LSEG)
        out = net.apply(params, jnp.ones((1, 32, 32, 3)) * 0.5)
        # DPT path1 ends at grid*8 = 32 here (half input res only for
        # patch 16); channel dim = out_dim
        assert out.shape == (1, 32, 32, 16)
        assert np.isfinite(np.asarray(out)).all()

    @pytest.mark.parametrize("missing", [
        "pretrained.model.cls_token",
        "pretrained.act_postprocess1.0.project.0.weight",
        "pretrained.act_postprocess2.4.weight",
        "scratch.layer3_rn.weight",
        "scratch.refinenet2.resConfUnit1.conv1.weight",
        "scratch.head1.weight",
    ])
    def test_missing_key_fails_loudly(self, missing):
        rng = np.random.default_rng(2)
        sd = make_lseg_state_dict(rng)
        del sd[missing]
        with pytest.raises(KeyError):
            load_lseg_params(sd)

    def test_unconsumed_key_fails_loudly(self):
        """An extra tensor in a converted family (layout drift: a layer
        we don't map) must raise, not be dropped silently."""
        rng = np.random.default_rng(3)
        sd = make_lseg_state_dict(rng)
        sd["scratch.head_block.weight"] = _rt(rng, 4, 4)
        with pytest.raises(KeyError, match="not consumed"):
            load_lseg_params(sd)
        sd2 = make_lseg_state_dict(rng)
        sd2["pretrained.model.blocks.0.gamma_1"] = _rt(rng, 16)
        with pytest.raises(KeyError, match="not consumed"):
            load_lseg_params(sd2)

    def test_clip_visual_and_logit_scale_ignored(self):
        rng = np.random.default_rng(4)
        sd = make_lseg_state_dict(rng)
        load_lseg_params(sd)  # visual.* + logit_scale present: no raise


# ------------------------------------------------------------- text


class TestClipTextConverter:
    def test_shapes_and_forward(self):
        from tpugs.encoders.clip_text import CLIPTextTower

        rng = np.random.default_rng(5)
        sd = make_lseg_state_dict(rng)
        params = load_clip_text_params(sd)
        tower = CLIPTextTower(
            vocab_size=64, context_length=8, width=12, heads=4,
            layers=2, embed_dim=16,
        )
        toks = jnp.asarray(
            np.random.default_rng(0).integers(1, 60, (3, 8)).astype(np.int32)
        )
        out = tower.apply(params, toks)
        assert out.shape == (3, 16)
        ref = jax.eval_shape(lambda: tower.init(jax.random.PRNGKey(0), toks))
        assert _tree_shapes(params) == _tree_shapes(ref)

    def test_unconsumed_text_key_fails(self):
        rng = np.random.default_rng(6)
        sd = make_lseg_state_dict(rng)
        sd["clip_pretrained.transformer.resblocks.0.extra.weight"] = _rt(
            rng, 4
        )
        with pytest.raises(KeyError, match="not consumed"):
            load_clip_text_params(sd)


# ------------------------------------------------------------- DINO


class TestDinoConverter:
    def test_shapes_match_module(self):
        from tpugs.encoders.vit import VisionTransformer

        rng = np.random.default_rng(7)
        sd = make_dino_state_dict(rng)
        params = load_dino_params(sd)
        cfg = ViTConfig(
            image_size=32, patch_size=8, width=16, layers=3, heads=4,
            num_register_tokens=4, layer_norm_eps=1e-6, layer_scale=True,
        )
        vit = VisionTransformer(cfg)
        ref = jax.eval_shape(
            lambda: vit.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
        )
        assert _tree_shapes(params) == _tree_shapes(ref)
        out = vit.apply(params, jnp.ones((1, 32, 32, 3)) * 0.4)
        assert np.isfinite(np.asarray(out["final"])).all()

    def test_layer_scale_not_silently_dropped(self):
        """A DINOv2 ckpt with LayerScale converted into a module WITHOUT
        layer_scale would change outputs massively — the converter must
        carry ls1/ls2 through (they are in the param tree)."""
        rng = np.random.default_rng(8)
        params = load_dino_params(make_dino_state_dict(rng))
        assert "ls1" in params["params"]["block0"]
        assert "ls2" in params["params"]["block0"]

    def test_unknown_key_fails(self):
        rng = np.random.default_rng(9)
        sd = make_dino_state_dict(rng)
        sd["blocks.0.attn.q_norm.weight"] = _rt(rng, 16)
        with pytest.raises(KeyError, match="not consumed"):
            load_dino_params(sd)


# ---------------------------------------- numerical layout equivalence


class TestTorchNumericalEquivalence:
    def test_timm_block_with_layerscale(self):
        """torch timm/DINOv2 block (fused qkv + LayerScale) == our Block
        on converted weights."""
        import torch.nn as tnn

        from tpugs.encoders.convert import _vit_block_from_timm
        from tpugs.encoders.vit import Block

        C, Hd = 16, 4

        class TorchTimmBlock(tnn.Module):
            def __init__(self):
                super().__init__()
                self.norm1 = tnn.LayerNorm(C, eps=1e-6)
                self.attn_qkv = tnn.Linear(C, 3 * C)
                self.attn_proj = tnn.Linear(C, C)
                self.norm2 = tnn.LayerNorm(C, eps=1e-6)
                self.fc1 = tnn.Linear(C, 4 * C)
                self.fc2 = tnn.Linear(4 * C, C)
                self.ls1 = tnn.Parameter(torch.rand(C) * 0.1)
                self.ls2 = tnn.Parameter(torch.rand(C) * 0.1)

            def forward(self, x):  # (B, T, C)
                B, T, _ = x.shape
                h = self.norm1(x)
                qkv = self.attn_qkv(h).reshape(B, T, 3, Hd, C // Hd)
                q, k, v = qkv.permute(2, 0, 3, 1, 4)
                a = (q @ k.transpose(-2, -1)) / np.sqrt(C // Hd)
                a = a.softmax(dim=-1)
                o = (a @ v).transpose(1, 2).reshape(B, T, C)
                x = x + self.ls1 * self.attn_proj(o)
                h = self.norm2(x)
                h = self.fc2(tnn.functional.gelu(self.fc1(h)))
                return x + self.ls2 * h

        torch.manual_seed(0)
        tb = TorchTimmBlock().eval()
        sd = {}
        raw = tb.state_dict()
        sd["b.norm1.weight"] = raw["norm1.weight"]
        sd["b.norm1.bias"] = raw["norm1.bias"]
        sd["b.attn.qkv.weight"] = raw["attn_qkv.weight"]
        sd["b.attn.qkv.bias"] = raw["attn_qkv.bias"]
        sd["b.attn.proj.weight"] = raw["attn_proj.weight"]
        sd["b.attn.proj.bias"] = raw["attn_proj.bias"]
        sd["b.norm2.weight"] = raw["norm2.weight"]
        sd["b.norm2.bias"] = raw["norm2.bias"]
        sd["b.mlp.fc1.weight"] = raw["fc1.weight"]
        sd["b.mlp.fc1.bias"] = raw["fc1.bias"]
        sd["b.mlp.fc2.weight"] = raw["fc2.weight"]
        sd["b.mlp.fc2.bias"] = raw["fc2.bias"]
        sd["b.ls1.gamma"] = raw["ls1"]
        sd["b.ls2.gamma"] = raw["ls2"]
        params = _vit_block_from_timm(sd, "b")

        cfg = ViTConfig(
            width=C, heads=Hd, layers=1, layer_norm_eps=1e-6,
            layer_scale=True,
        )
        blk = Block(cfg, act="gelu")
        x = np.random.default_rng(0).normal(size=(2, 5, C)).astype(np.float32)
        with torch.no_grad():
            ref = tb(torch.from_numpy(x)).numpy()
        out = blk.apply({"params": params}, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)

    @pytest.mark.parametrize("k,s", [(4, 4), (2, 2)])
    def test_conv_transpose_layout(self, k, s):
        """torch ConvTranspose2d == flax ConvTranspose on converted
        weights (the DPT x4/x2 upsamplers)."""
        import flax.linen as fnn
        import torch.nn as tnn

        from tpugs.encoders.convert import _conv_transpose

        Cin, Cout = 6, 6
        torch.manual_seed(1)
        tc = tnn.ConvTranspose2d(Cin, Cout, k, stride=s).eval()
        sd = {"u." + n: p for n, p in tc.state_dict().items()}
        params = _conv_transpose(sd, "u")
        fc = fnn.ConvTranspose(
            Cout, (k, k), strides=(s, s), padding="VALID",
            transpose_kernel=True,
        )
        x = np.random.default_rng(0).normal(size=(1, 5, 7, Cin)).astype(
            np.float32
        )
        with torch.no_grad():
            ref = tc(torch.from_numpy(x.transpose(0, 3, 1, 2)))
            ref = ref.numpy().transpose(0, 2, 3, 1)
        out = fc.apply({"params": params}, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)

    def test_strided_conv_layout(self):
        """torch Conv2d stride-2 pad-1 == flax Conv (the DPT /2 level)."""
        import flax.linen as fnn
        import torch.nn as tnn

        from tpugs.encoders.convert import _conv

        torch.manual_seed(2)
        tc = tnn.Conv2d(6, 6, 3, stride=2, padding=1).eval()
        sd = {"d." + n: p for n, p in tc.state_dict().items()}
        params = _conv(sd, "d")
        fc = fnn.Conv(6, (3, 3), strides=(2, 2), padding=1)
        x = np.random.default_rng(1).normal(size=(1, 8, 8, 6)).astype(
            np.float32
        )
        with torch.no_grad():
            ref = tc(torch.from_numpy(x.transpose(0, 3, 1, 2)))
            ref = ref.numpy().transpose(0, 2, 3, 1)
        out = fc.apply({"params": params}, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


# ------------------------------------------------- convert_weights CLI


def test_convert_weights_script_text_tower(tmp_path):
    """`scripts/convert_weights.py` (VERDICT r4 #9): converting the text
    tower out of a reference-layout checkpoint emits the Flax npz and a
    report; the parity gate is one command away once real weights
    exist."""
    import json as _json
    import subprocess
    import sys

    import torch

    rng = np.random.default_rng(11)
    sd = make_lseg_state_dict(rng)
    ckpt = str(tmp_path / "synthetic_lseg.ckpt")
    torch.save(sd, ckpt)
    out_dir = str(tmp_path / "weights")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    res = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "convert_weights.py"),
         "--clip-text-ckpt", ckpt, "--out-dir", out_dir],
        capture_output=True, text=True, timeout=300,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert os.path.exists(os.path.join(out_dir, "clip_text_flax.npz"))
    report = _json.load(
        open(os.path.join(out_dir, "convert_report.json"))
    )
    assert report["clip_text"]["converted"]["tensors"] > 10
    flat = np.load(os.path.join(out_dir, "clip_text_flax.npz"))
    total = sum(int(flat[k].size) for k in flat.files)
    assert total == report["clip_text"]["converted"]["parameters"]
