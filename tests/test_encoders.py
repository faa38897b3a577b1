"""Encoder stack: ViT forward shapes, LSeg/DINO adapters (random
weights), CLIP tokenizer, torch->Flax conversion round-trip."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def test_vit_forward_shapes():
    from tpugs.encoders.vit import ViTConfig, VisionTransformer, patch_tokens

    cfg = ViTConfig(
        image_size=64, patch_size=16, width=32, layers=2, heads=4,
        num_register_tokens=2,
    )
    vit = VisionTransformer(cfg)
    x = jnp.zeros((2, 64, 64, 3))
    params = vit.init(jax.random.PRNGKey(0), x)
    out = vit.apply(params, x, out_layers=[0])
    assert out["grid"] == (4, 4)
    assert out["n_prefix"] == 3  # cls + 2 registers
    assert out["final"].shape == (2, 3 + 16, 32)
    assert out["layer0"].shape == (2, 19, 32)
    toks = patch_tokens(out)
    assert toks.shape == (2, 16, 32)


def test_vit_pos_embed_interpolation():
    from tpugs.encoders.vit import ViTConfig, VisionTransformer

    cfg = ViTConfig(image_size=64, patch_size=16, width=32, layers=1, heads=4)
    vit = VisionTransformer(cfg)
    x64 = jnp.zeros((1, 64, 64, 3))
    params = vit.init(jax.random.PRNGKey(0), x64)
    # different input size reuses params via interpolation
    out = vit.apply(params, jnp.zeros((1, 96, 96, 3)))
    assert out["grid"] == (6, 6)
    assert out["final"].shape == (1, 1 + 36, 32)


def test_lseg_head_shapes():
    from tpugs.encoders.lseg import LSegHead

    head = LSegHead(
        features=16, out_dim=24, vit_width=32,
        layer_channels=(8, 16, 32, 32),
    )
    levels = [jnp.zeros((1, 64, 32)) for _ in range(4)]  # 8x8 tokens
    cls = [jnp.zeros((1, 32)) for _ in range(4)]
    params = head.init(jax.random.PRNGKey(0), levels, cls, (8, 8))
    out = head.apply(params, levels, cls, (8, 8))
    # DPT pyramid: finest level x4 = 32, final fusion x2 = 64
    assert out.shape == (1, 64, 64, 24)


def test_clip_tokenizer_synthetic_vocab(tmp_path):
    from tpugs.encoders.clip_text import SimpleTokenizer, tokenize

    # minimal merges file: version line + a few merges
    merges = "#version: 0.2\nt h\nth e</w>\nc a\nca t</w>\n"
    p = tmp_path / "bpe.txt"
    p.write_text(merges)
    tok = SimpleTokenizer(str(p))
    ids = tok.encode("the cat")
    assert len(ids) >= 2
    arr = tokenize(tok, ["the cat", "cat"], context_length=16)
    assert arr.shape == (2, 16)
    sot = tok.encoder["<|startoftext|>"]
    eot = tok.encoder["<|endoftext|>"]
    assert arr[0, 0] == sot
    assert eot in arr[0]


def test_clip_text_tower_shapes():
    from tpugs.encoders.clip_text import CLIPTextTower

    tower = CLIPTextTower(
        vocab_size=512, context_length=16, width=32, heads=4, layers=2,
        embed_dim=24,
    )
    tokens = jnp.asarray(
        np.random.default_rng(0).integers(1, 500, (3, 16)).astype(np.int32)
    )
    params = tower.init(jax.random.PRNGKey(0), tokens)
    out = tower.apply(params, tokens)
    assert out.shape == (3, 24)


def test_conversion_roundtrip_clip_block():
    """A torch CLIP-style resblock converted to Flax must produce the
    same output as the torch forward."""
    torch = pytest.importorskip("torch")
    import torch.nn as tnn

    from tpugs.encoders.convert import _vit_block_from_clip
    from tpugs.encoders.vit import Block, ViTConfig

    C, H = 32, 4

    class TorchBlock(tnn.Module):
        def __init__(self):
            super().__init__()
            self.ln_1 = tnn.LayerNorm(C)
            self.attn = tnn.MultiheadAttention(C, H, batch_first=False)
            self.ln_2 = tnn.LayerNorm(C)
            self.mlp = tnn.Sequential()
            self.mlp.add_module("c_fc", tnn.Linear(C, 4 * C))
            self.mlp.add_module("gelu", tnn.GELU())
            self.mlp.add_module("c_proj", tnn.Linear(4 * C, C))

        def forward(self, x):  # (T, B, C)
            a = self.ln_1(x)
            a, _ = self.attn(a, a, a, need_weights=False)
            x = x + a
            x = x + self.mlp(self.ln_2(x))
            return x

    torch.manual_seed(0)
    tb = TorchBlock().eval()
    sd = {"b." + k: v for k, v in tb.state_dict().items()}
    params = _vit_block_from_clip(sd, "b")

    cfg = ViTConfig(width=C, heads=H, layers=1)
    blk = Block(cfg, act="gelu")
    x = np.random.default_rng(0).normal(size=(1, 5, C)).astype(np.float32)
    with torch.no_grad():
        ref = tb(torch.from_numpy(x).permute(1, 0, 2)).permute(1, 0, 2).numpy()
    out = blk.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_lseg_encoder_pipeline_random_weights():
    from tpugs.encoders.lseg import LSegEncoder

    with pytest.warns(UserWarning):
        enc = LSegEncoder(ckpt=None, crop_size=32)
    img = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (24, 30, 3)).astype(np.float32)
    )
    feats = enc(img)
    assert feats.shape == (24, 30, 512)
    norms = np.linalg.norm(np.asarray(feats), axis=-1)
    assert np.isfinite(norms).all()


def test_dino_encoder_pipeline_random_weights():
    from tpugs.encoders.dino import DinoEncoder

    with pytest.warns(UserWarning):
        enc = DinoEncoder(ckpt=None, image_size=28)  # 2x2 patches
    img = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (20, 24, 3)).astype(np.float32)
    )
    feats = enc(img)
    assert feats.shape == (20, 24, 1024)
    assert np.isfinite(np.asarray(feats)).all()


def test_vit_scan_blocks_matches_unrolled():
    """scan_blocks (one lax.scan over stacked block params — the
    compile-tractable production layout) must match the unrolled loop
    exactly, including intermediate hook layers, after restacking the
    unrolled params with stack_block_params."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpugs.encoders.vit import (
        ViTConfig,
        VisionTransformer,
        stack_block_params,
    )

    cfg = ViTConfig(
        image_size=32, patch_size=8, width=16, layers=4, heads=4,
        pre_norm=True,
    )
    vit = VisionTransformer(cfg)
    vit_s = VisionTransformer(dataclasses.replace(cfg, scan_blocks=True))
    x = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (2, 32, 32, 3))
        .astype(np.float32)
    )
    params = vit.init(jax.random.PRNGKey(0), x, out_layers=[1, 3])
    stacked = {
        "params": stack_block_params(dict(params["params"]), cfg.layers)
    }
    # layouts agree with a fresh scan init
    ref = jax.eval_shape(
        lambda: vit_s.init(jax.random.PRNGKey(1), x, out_layers=[1, 3])
    )
    t1 = jax.tree_util.tree_map(lambda a: a.shape, stacked)
    t2 = jax.tree_util.tree_map(lambda a: a.shape, ref)
    assert t1 == t2
    out = vit.apply(params, x, out_layers=[1, 3])
    out_s = vit_s.apply(stacked, x, out_layers=[1, 3])
    for k in ("layer1", "layer3", "final"):
        np.testing.assert_allclose(
            np.asarray(out_s[k]), np.asarray(out[k]), atol=1e-5,
            err_msg=k,
        )


def test_lseg_encoder_scan_blocks_matches_unrolled():
    """LSegEncoder(scan_blocks=True) — the production default — equals
    the unrolled encoder when given the same converted checkpoint."""
    import numpy as np
    import jax.numpy as jnp

    # Full-layout synthetic ckpt at tiny sizes can't drive LSegEncoder
    # (fixed ViT-L arch), so check the restack path on the real-size
    # RANDOM encoder instead: same rng -> same unrolled params, then
    # restack must reproduce the scan encoder's output exactly.
    import warnings

    from tpugs.encoders.lseg import LSegEncoder
    from tpugs.encoders.vit import stack_block_params

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        enc_u = LSegEncoder(ckpt=None, crop_size=32, scan_blocks=False)
        enc_s = LSegEncoder(ckpt=None, crop_size=32, scan_blocks=True)
    p = dict(enc_u.params["params"])
    p["vit"] = stack_block_params(dict(p["vit"]), 24)
    enc_s.params = {"params": p}
    img = jnp.asarray(
        np.random.default_rng(1).uniform(0, 1, (40, 40, 3))
        .astype(np.float32)
    )
    out_u = np.asarray(enc_u(img))
    out_s = np.asarray(enc_s(img))
    np.testing.assert_allclose(out_s, out_u, atol=2e-5)
