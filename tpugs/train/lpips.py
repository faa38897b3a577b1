"""LPIPS perceptual metric in pure JAX (reference evals PSNR/SSIM/LPIPS,
``f3dgs/simple_trainer_feature_3dgs.py:386-399,783-856``; the torch side
uses torchmetrics' LPIPS with an AlexNet or VGG16 trunk).

Structure mirrors the canonical ``lpips`` package (v0.1): input images
are shift/scale normalized, run through the conv trunk, each tapped
feature map is channel-unit-normalized, squared differences are
projected through a learned 1x1 "lin" layer, spatially averaged, and
summed over taps.

Weights are not bundled (this environment has no torchvision/lpips
checkpoints) — ``load_lpips_params`` converts the torch layouts
(torchvision ``alexnet/vgg16`` ``features.*`` + lpips ``lin*.model.1``)
into the JAX tree, and is validated against a synthetic state_dict with
the exact key layout in tests/test_train_modules.py. With no weights, callers
should skip LPIPS (the trainer reports it only when configured)."""

from __future__ import annotations

from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

# conv specs per trunk: (out_channels, kernel, stride, padding) and the
# indices (into the torchvision ``features`` Sequential) of the conv
# layers; taps are taken after each listed ReLU.
_ALEX_CONVS = [  # torchvision alexnet.features
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
]
_ALEX_FEATURE_IDX = [0, 3, 6, 8, 10]  # conv positions in the Sequential
_ALEX_POOL_BEFORE = {1, 2}  # maxpool before conv i (3x3 stride 2)

_VGG_CHANNELS = [64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512]
_VGG_FEATURE_IDX = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
_VGG_POOL_BEFORE = {2, 4, 7, 10}  # maxpool (2x2 stride 2) before conv i
_VGG_TAPS = [1, 3, 6, 9, 12]  # taps after these convs' ReLUs

# lpips v0.1 scaling layer constants (lpips/lpips.py ScalingLayer)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _conv2d(x, w, b, stride, padding):
    """NHWC conv with OIHW torch-layout weights."""
    y = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "OIHW", "NHWC"),
    )
    return y + b[None, None, None, :]


def _maxpool(x, k, s):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, s, s, 1), "VALID"
    )


def _alex_features(params: Dict, x: jax.Array) -> List[jax.Array]:
    taps = []
    for i in range(5):
        if i in _ALEX_POOL_BEFORE:
            x = _maxpool(x, 3, 2)
        _, kk, st, pd = _ALEX_CONVS[i]
        x = _conv2d(x, params[f"conv{i}_w"], params[f"conv{i}_b"], st, pd)
        x = jax.nn.relu(x)
        taps.append(x)
    return taps


def _vgg_features(params: Dict, x: jax.Array) -> List[jax.Array]:
    taps = []
    for i in range(len(_VGG_CHANNELS)):
        if i in _VGG_POOL_BEFORE:
            x = _maxpool(x, 2, 2)
        x = _conv2d(x, params[f"conv{i}_w"], params[f"conv{i}_b"], 1, 1)
        x = jax.nn.relu(x)
        if i in _VGG_TAPS:
            taps.append(x)
    return taps


def _normalize_channels(x, eps=1e-10):
    n = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
    return x / (n + eps)


def lpips_distance(params: Dict, img0: jax.Array, img1: jax.Array) -> jax.Array:
    """LPIPS(img0, img1) for (H, W, 3) images in [0, 1].

    ``params``: output of :func:`load_lpips_params` (includes ``net``)."""
    net = params["net"]
    extract = _alex_features if net == "alex" else _vgg_features

    def prep(im):
        im = im * 2.0 - 1.0  # [0,1] -> [-1,1] (lpips convention)
        im = (im - _SHIFT[None, None, :]) / _SCALE[None, None, :]
        return im[None]

    f0 = extract(params, prep(img0))
    f1 = extract(params, prep(img1))
    total = jnp.float32(0.0)
    for t, (a, b) in enumerate(zip(f0, f1)):
        d = (_normalize_channels(a) - _normalize_channels(b)) ** 2
        w = params[f"lin{t}_w"]  # (C,) nonneg 1x1 projection
        total = total + jnp.mean(jnp.sum(d * w[None, None, None, :], axis=-1))
    return total


def load_lpips_params(
    backbone_state: Dict[str, np.ndarray],
    lin_state: Dict[str, np.ndarray],
    net: str = "alex",
) -> Dict:
    """Convert torch state dicts to the JAX tree.

    * ``backbone_state``: torchvision ``alexnet``/``vgg16`` state_dict
      (keys ``features.{idx}.weight/bias`` in OIHW layout);
    * ``lin_state``: the lpips v0.1 head (keys
      ``lin{t}.model.1.weight`` with shape (1, C, 1, 1))."""
    idxs = _ALEX_FEATURE_IDX if net == "alex" else _VGG_FEATURE_IDX
    taps = range(5)
    params: Dict = {"net": net}
    for i, fi in enumerate(idxs):
        w = np.asarray(backbone_state[f"features.{fi}.weight"], np.float32)
        b = np.asarray(backbone_state[f"features.{fi}.bias"], np.float32)
        params[f"conv{i}_w"] = jnp.asarray(w)  # OIHW
        params[f"conv{i}_b"] = jnp.asarray(b)
    for t in taps:
        key = f"lin{t}.model.1.weight"
        w = np.asarray(lin_state[key], np.float32).reshape(-1)
        params[f"lin{t}_w"] = jnp.asarray(np.maximum(w, 0.0))
    return params


def load_lpips_file(path: str, net: str = "alex") -> Dict:
    """Load from a single torch .pt/.pth containing both the backbone
    ``features.*`` keys and the ``lin*`` head keys, or an .npz with the
    already-converted tree."""
    if path.endswith(".npz"):
        data = dict(np.load(path))
        out: Dict = {"net": str(data.pop("net"))} if "net" in data else {
            "net": net
        }
        for k, v in data.items():
            out[k] = jnp.asarray(v)
        return out
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    sd = {k: v.numpy() for k, v in sd.items()}
    backbone = {k: v for k, v in sd.items() if k.startswith("features.")}
    lin = {k: v for k, v in sd.items() if k.startswith("lin")}
    return load_lpips_params(backbone, lin, net)


def random_lpips_params(net: str = "alex", seed: int = 0) -> Dict:
    """Synthetic weights with the production shapes (tests / smoke)."""
    rng = np.random.default_rng(seed)
    if net == "alex":
        chans = [c for c, *_ in _ALEX_CONVS]
        kernels = [k for _, k, *_ in _ALEX_CONVS]
        ins = [3] + chans[:-1]
        tap_chans = chans
    else:
        chans = _VGG_CHANNELS
        kernels = [3] * len(chans)
        ins = [3] + chans[:-1]
        tap_chans = [chans[i] for i in _VGG_TAPS]
    params: Dict = {"net": net}
    for i, (ci, co, k) in enumerate(zip(ins, chans, kernels)):
        params[f"conv{i}_w"] = jnp.asarray(
            rng.normal(0, 0.05, (co, ci, k, k)).astype(np.float32)
        )
        params[f"conv{i}_b"] = jnp.asarray(np.zeros(co, np.float32))
    for t, c in enumerate(tap_chans):
        params[f"lin{t}_w"] = jnp.asarray(
            np.abs(rng.normal(0, 1, c)).astype(np.float32) / c
        )
    return params
