"""Golden numeric vectors for the encoder / LPIPS blocks.

No real pretrained checkpoints exist in this environment, so encoder
correctness cannot be pinned against the reference pipeline's outputs
(`/root/reference/backproject.py:28-41,175-181`). What CAN be pinned is
the numerics of every block under fixed random weights: these tests
compare each block's output on committed inputs against committed
golden outputs (``tests/golden/*.npz``), so a refactor that silently
changes layer wiring, normalization placement, activation choice or
precision breaks loudly.

Regenerate (only after an INTENDED numerics change) with:
    python scripts/gen_golden.py
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def _rng_array(shape, seed, scale=1.0, dtype=np.float32):
    return jnp.asarray(
        (np.random.default_rng(seed).normal(0, scale, shape)).astype(dtype)
    )


# ----------------------------------------------------------- case builders


def case_vit_block():
    """One transformer block (attention + MLP residual)."""
    from tpugs.encoders.vit import Block, ViTConfig

    cfg = ViTConfig(image_size=32, patch_size=16, width=64, layers=2, heads=4)
    x = _rng_array((1, 10, 64), seed=1)
    m = Block(cfg, "gelu")
    params = m.init(jax.random.PRNGKey(0), x)
    return {"out": m.apply(params, x)}


def case_vit_block_dino():
    """DINOv2-flavored block: layer_scale residuals, eps 1e-6."""
    from tpugs.encoders.vit import Block, ViTConfig

    cfg = ViTConfig(
        image_size=28, patch_size=14, width=64, layers=2, heads=4,
        layer_norm_eps=1e-6, layer_scale=True,
    )
    x = _rng_array((1, 9, 64), seed=2)
    m = Block(cfg, "gelu")
    params = m.init(jax.random.PRNGKey(1), x)
    # zero-init layer_scale would hide the whole block: set ls to 0.1
    params = jax.tree_util.tree_map(
        lambda a: jnp.full_like(a, 0.1) if a.ndim == 1 and a.shape[0] == 64
        else a,
        params,
    )
    return {"out": m.apply(params, x)}


def case_vit_tiny():
    """Full ViT trunk, CLIP flavor (pre-norm, class token), two sizes of
    input to also pin the positional-embedding interpolation."""
    from tpugs.encoders.vit import ViTConfig, VisionTransformer

    cfg = ViTConfig(
        image_size=32, patch_size=16, width=64, layers=2, heads=4,
        pre_norm=True,
    )
    m = VisionTransformer(cfg)
    img = _rng_array((1, 32, 32, 3), seed=3, scale=0.5)
    img_big = _rng_array((1, 48, 48, 3), seed=4, scale=0.5)
    params = m.init(jax.random.PRNGKey(2), img)
    out = m.apply(params, img)
    out_interp = m.apply(params, img_big)
    return {"final": out["final"], "final_interp": out_interp["final"]}


def case_vit_tiny_dino():
    """DINOv2 flavor: register tokens, layer scale, cubic pos interp."""
    from tpugs.encoders.vit import ViTConfig, VisionTransformer

    cfg = ViTConfig(
        image_size=28, patch_size=14, width=64, layers=2, heads=4,
        num_register_tokens=4, layer_norm_eps=1e-6, layer_scale=True,
        pos_interp="cubic",
    )
    m = VisionTransformer(cfg)
    img = _rng_array((1, 28, 28, 3), seed=5, scale=0.5)
    params = m.init(jax.random.PRNGKey(3), img)
    params = jax.tree_util.tree_map(
        lambda a: jnp.full_like(a, 0.1) if a.ndim == 1 and a.shape[0] == 64
        else a,
        params,
    )
    out = m.apply(params, img)
    return {"final": out["final"]}


def case_lseg_head():
    """DPT readout/reassemble/fusion head on 4 synthetic levels."""
    from tpugs.encoders.lseg import LSegHead

    m = LSegHead(
        features=32, out_dim=16, vit_width=64,
        layer_channels=(16, 32, 64, 64),
    )
    levels = [_rng_array((1, 16, 64), seed=10 + i) for i in range(4)]
    cls = [_rng_array((1, 64), seed=20 + i) for i in range(4)]
    params = m.init(jax.random.PRNGKey(4), levels, cls, (4, 4))
    return {"out": m.apply(params, levels, cls, (4, 4))}


def case_lseg_net():
    """Full LSegNet wiring (tiny trunk + head)."""
    from tpugs.encoders.lseg import LSegNet
    from tpugs.encoders.vit import ViTConfig

    cfg = ViTConfig(image_size=32, patch_size=16, width=64, layers=4, heads=4)
    m = LSegNet(
        features=32, out_dim=16, vit_cfg=cfg, hooks=(0, 1, 2, 3),
        layer_channels=(16, 32, 64, 64),
    )
    img = _rng_array((1, 32, 32, 3), seed=6, scale=0.5)
    params = m.init(jax.random.PRNGKey(5), img)
    return {"out": m.apply(params, img)}


def case_clip_text():
    """Causal CLIP text tower (argmax-token pooling, projection)."""
    from tpugs.encoders.clip_text import CLIPTextTower

    m = CLIPTextTower(
        vocab_size=128, context_length=16, width=32, heads=4, layers=2,
        embed_dim=24,
    )
    rng = np.random.default_rng(30)
    tokens = np.zeros((2, 16), np.int32)
    for p in range(2):
        L = 5 + 3 * p
        tokens[p, 0] = 126  # SOT
        tokens[p, 1 : 1 + L] = rng.integers(1, 126, L)
        tokens[p, 1 + L] = 127  # EOT (argmax pool position)
    tokens = jnp.asarray(tokens)
    params = m.init(jax.random.PRNGKey(6), tokens)
    return {"out": m.apply(params, tokens)}


def case_lpips():
    """LPIPS distance on both trunks under fixed random weights."""
    from tpugs.train.lpips import lpips_distance, random_lpips_params

    img0 = _rng_array((64, 64, 3), seed=40, scale=0.3) + 0.5
    img1 = _rng_array((64, 64, 3), seed=41, scale=0.3) + 0.5
    out = {}
    for net in ("alex", "vgg"):
        params = random_lpips_params(net=net, seed=0)
        out[net] = lpips_distance(params, img0, img1)
    return out


CASES = {
    "vit_block": case_vit_block,
    "vit_block_dino": case_vit_block_dino,
    "vit_tiny": case_vit_tiny,
    "vit_tiny_dino": case_vit_tiny_dino,
    "lseg_head": case_lseg_head,
    "lseg_net": case_lseg_net,
    "clip_text": case_clip_text,
    "lpips": case_lpips,
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_golden(name):
    path = os.path.join(GOLDEN_DIR, f"{name}.npz")
    assert os.path.exists(path), (
        f"missing golden file {path} — generate with "
        "`python scripts/gen_golden.py` and commit it"
    )
    golden = np.load(path)
    got = {k: np.asarray(v) for k, v in CASES[name]().items()}
    assert set(got) == set(golden.files), (
        f"{name}: outputs {sorted(got)} != golden {sorted(golden.files)}"
    )
    for k in got:
        scale = max(1.0, float(np.abs(golden[k]).max()))
        np.testing.assert_allclose(
            got[k], golden[k], atol=1e-5 * scale, rtol=1e-5,
            err_msg=(
                f"{name}/{k} drifted from the committed golden output — "
                "if the numerics change was intended, regenerate with "
                "scripts/gen_golden.py"
            ),
        )
