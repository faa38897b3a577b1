"""One-command weight conversion + parity report (VERDICT r4 #9).

Given the public checkpoint files the reference uses
(`lseg_minimal_e200.ckpt`, reference backproject.py:28-41; a DINOv2
torch checkpoint, backproject.py:176-187), this script:

1. converts them to Flax params via the strict layout loaders in
   `tpugs/encoders/convert.py` (missing or unconsumed keys raise),
2. saves the converted params as an .npz per tower,
3. runs a parity check against the TORCH forward when a torch
   implementation is importable (pass --reference-dir pointing at a
   checkout of lang-seg/lseg_minimal or dinov2), reporting max-abs /
   cosine agreement per output,
4. always runs an offline self-check (Flax forward on a fixed probe
   image: shape, finiteness, output stats) and writes
   `convert_report.json`.

The day real weights are available, the BASELINE.md gate ("masks
bit-comparable to the CUDA pipeline") is:

    python scripts/convert_weights.py --lseg-ckpt lseg_minimal_e200.ckpt \
        --bpe-path bpe_simple_vocab_16e6.txt.gz --out-dir /tmp/weights \
        --reference-dir /path/to/lang-seg

Nothing here needs the network; torch (CPU) is baked in.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def _flatten(params, prefix=""):
    out = {}
    for k, v in params.items():
        key = f"{prefix}{k}" if not prefix else f"{prefix}/{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = v
    return out


def _save_params(params, path):
    import numpy as np

    flat = {k: np.asarray(v) for k, v in _flatten(params).items()}
    np.savez(path, **flat)
    return {
        "tensors": len(flat),
        "parameters": int(sum(v.size for v in flat.values())),
    }


def _stats(x):
    import numpy as np

    x = np.asarray(x, np.float64)
    return {
        "shape": list(x.shape),
        "finite": bool(np.isfinite(x).all()),
        "mean": float(x.mean()),
        "std": float(x.std()),
        "absmax": float(np.abs(x).max()),
    }


def _parity(ours, theirs):
    import numpy as np

    a = np.asarray(ours, np.float64).ravel()
    b = np.asarray(theirs, np.float64).ravel()
    cos = float(
        (a @ b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30)
    )
    return {
        "max_abs_err": float(np.abs(a - b).max()),
        "rel_err": float(
            np.abs(a - b).max() / (np.abs(b).max() + 1e-30)
        ),
        "cosine": cos,
    }


def convert_lseg(ckpt, out_dir, reference_dir, report):
    import numpy as np
    import jax.numpy as jnp

    from tpugs.encoders.convert import load_lseg_params
    from tpugs.encoders.lseg import LSegEncoder

    params = load_lseg_params(ckpt)  # strict: layout drift raises
    meta = _save_params(params, os.path.join(out_dir, "lseg_flax.npz"))
    enc = LSegEncoder(ckpt=ckpt)
    rng = np.random.default_rng(0)
    probe = jnp.asarray(
        rng.uniform(0, 1, (480, 480, 3)).astype(np.float32)
    )
    feats = np.asarray(enc(probe))
    entry = {"converted": meta, "self_check": _stats(feats)}

    torch_feats = _torch_lseg_forward(ckpt, probe, reference_dir)
    if torch_feats is not None:
        entry["parity_vs_torch"] = _parity(feats, torch_feats)
    else:
        entry["parity_vs_torch"] = (
            "torch LSeg implementation not importable — pass "
            "--reference-dir with a lang-seg/lseg_minimal checkout"
        )
    report["lseg"] = entry


def _torch_lseg_forward(ckpt, probe, reference_dir):
    """Reference torch forward (backproject.py:102-113) if the public
    lseg_minimal package is importable; None otherwise."""
    if reference_dir:
        sys.path.insert(0, reference_dir)
    try:
        import torch
        from lseg import LSegNet  # the package the reference imports
    except Exception:
        return None
    import numpy as np

    net = LSegNet(
        backbone="clip_vitl16_384",
        features=256,
        crop_size=480,
        arch_option=0,
        block_depth=0,
        activation="lrelu",
    )
    net.load_state_dict(torch.load(ckpt, map_location="cpu"), strict=True)
    net.eval()
    x = torch.from_numpy(
        np.asarray(probe, np.float32).transpose(2, 0, 1)[None]
    )
    with torch.no_grad():
        out = net.forward(x)
    return out[0].permute(1, 2, 0).numpy()


def convert_clip_text(ckpt, bpe_path, out_dir, report):
    import numpy as np

    from tpugs.encoders.convert import load_clip_text_params
    from tpugs.encoders.lseg import encode_text

    params = load_clip_text_params(ckpt)
    meta = _save_params(params, os.path.join(out_dir, "clip_text_flax.npz"))
    entry = {"converted": meta}
    if bpe_path:
        emb = np.asarray(
            encode_text(
                ["table", "a photo of a vase"], ckpt=ckpt, bpe_path=bpe_path
            )
        )
        entry["self_check"] = _stats(emb)
    else:
        entry["self_check"] = "pass --bpe-path to run the tokenizer probe"
    report["clip_text"] = entry


def convert_dino(ckpt, out_dir, reference_dir, report):
    import numpy as np
    import jax.numpy as jnp

    from tpugs.encoders.convert import load_dino_params
    from tpugs.encoders.dino import DinoEncoder

    params = load_dino_params(ckpt)
    meta = _save_params(params, os.path.join(out_dir, "dino_flax.npz"))
    enc = DinoEncoder(ckpt=ckpt)
    rng = np.random.default_rng(0)
    probe = jnp.asarray(
        rng.uniform(0, 1, (224, 224, 3)).astype(np.float32)
    )
    feats = np.asarray(enc(probe))
    entry = {"converted": meta, "self_check": _stats(feats)}
    torch_feats = _torch_dino_forward(ckpt, probe, reference_dir)
    if torch_feats is not None:
        entry["parity_vs_torch"] = _parity(feats, torch_feats)
    else:
        entry["parity_vs_torch"] = (
            "torch DINOv2 not importable — pass --reference-dir "
            "with a facebookresearch/dinov2 checkout"
        )
    report["dino"] = entry


def _torch_dino_forward(ckpt, probe, reference_dir):
    """Reference path: torch.hub dinov2_vitl14 patch features
    (backproject.py:176-187, 206-224)."""
    if reference_dir:
        sys.path.insert(0, reference_dir)
    try:
        import torch
        from dinov2.models.vision_transformer import vit_large
    except Exception:
        return None
    import numpy as np

    net = vit_large(patch_size=14, img_size=518, init_values=1.0,
                    block_chunks=0)
    net.load_state_dict(torch.load(ckpt, map_location="cpu"), strict=True)
    net.eval()
    x = torch.from_numpy(
        np.asarray(probe, np.float32).transpose(2, 0, 1)[None]
    )
    with torch.no_grad():
        out = net.forward_features(x)["x_norm_patchtokens"]
    g = int(round(out.shape[1] ** 0.5))
    return out[0].reshape(g, g, -1).numpy()


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--lseg-ckpt", default="",
                    help="lseg_minimal_e200.ckpt (also holds the CLIP "
                         "text tower)")
    ap.add_argument("--clip-text-ckpt", default="",
                    help="checkpoint for the text tower (defaults to "
                         "--lseg-ckpt)")
    ap.add_argument("--bpe-path", default="",
                    help="CLIP BPE merges file (bpe_simple_vocab_16e6)")
    ap.add_argument("--dino-ckpt", default="",
                    help="dinov2_vitl14 state dict")
    ap.add_argument("--reference-dir", default="",
                    help="path to a torch lang-seg / dinov2 checkout "
                         "for the parity forward")
    ap.add_argument("--out-dir", default="./converted_weights")
    args = ap.parse_args()

    if not (args.lseg_ckpt or args.dino_ckpt or args.clip_text_ckpt):
        ap.error("nothing to convert: pass --lseg-ckpt / --dino-ckpt "
                 "/ --clip-text-ckpt")

    import jax

    if jax.devices()[0].platform != "cpu":
        # conversion + parity are host-side numerics; keep them off the
        # (possibly busy) accelerator
        jax.config.update("jax_platforms", "cpu")

    os.makedirs(args.out_dir, exist_ok=True)
    report = {}
    if args.lseg_ckpt:
        convert_lseg(args.lseg_ckpt, args.out_dir, args.reference_dir,
                     report)
    text_ckpt = args.clip_text_ckpt or args.lseg_ckpt
    if text_ckpt:
        convert_clip_text(text_ckpt, args.bpe_path, args.out_dir, report)
    if args.dino_ckpt:
        convert_dino(args.dino_ckpt, args.out_dir, args.reference_dir,
                     report)

    path = os.path.join(args.out_dir, "convert_report.json")
    with open(path, "w") as fh:
        json.dump(report, fh, indent=2)
    print(json.dumps(report, indent=2))
    print("report:", path)


if __name__ == "__main__":
    main()
