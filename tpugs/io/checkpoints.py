"""Checkpoint loading/saving for all three reference formats + a native one.

Reference formats (``/root/reference/utils.py:20-109``):
  * ``gsplat`` — torch ``.pt`` with ``model["splats"]`` dict of
    means/quats/scales/opacities/sh0/shN (+ conv/features for f3dgs,
    ``utils.py:146-159``);
  * ``inria``  — torch ``.pt`` tuple (model_params, iter) from the
    original 3DGS repo;
  * ``ply``    — Inria point-cloud export with f_dc_*/f_rest_* fields.

Torch is used only as a host-side deserializer (CPU map_location); the
native format is ``.npz`` (zero-copy into JAX). Loading also parses the
COLMAP project and builds the camera batch exactly as the reference does
(single shared camera, K divided by ``data_factor``, ``utils.py:93-105``).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np
import jax.numpy as jnp

from tpugs.core.camera import Camera, cameras_from_colmap
from tpugs.core.scene import GaussianScene
from tpugs.io.colmap import SceneManager
from tpugs.io.ply import read_ply, write_ply


def _to_np(x) -> np.ndarray:
    if hasattr(x, "detach"):  # torch tensor
        return x.detach().cpu().numpy()
    return np.asarray(x)


def _scene_from_dict(d: dict) -> GaussianScene:
    feats = d.get("features")
    proj = d.get("conv")
    return GaussianScene(
        means=jnp.asarray(_to_np(d["means"]), jnp.float32),
        quats=jnp.asarray(_to_np(d["quats"]), jnp.float32),
        log_scales=jnp.asarray(_to_np(d["scales"]), jnp.float32),
        logit_opacities=jnp.asarray(
            _to_np(d["opacities"]).reshape(-1), jnp.float32
        ),
        sh0=jnp.asarray(_to_np(d["sh0"]), jnp.float32),
        shN=jnp.asarray(_to_np(d["shN"]), jnp.float32),
        features=None if feats is None else jnp.asarray(_to_np(feats), jnp.float32),
        feature_proj=None if proj is None else jnp.asarray(_to_np(proj), jnp.float32),
    )


def load_scene_pt(path: str, format: str = "gsplat") -> GaussianScene:
    """Load a torch checkpoint (gsplat or inria layout)."""
    import torch

    model = torch.load(path, map_location="cpu", weights_only=False)
    if format == "gsplat":
        sp = model["splats"]
        return _scene_from_dict(
            {
                "means": sp["means"],
                "quats": sp["quats"],
                "scales": sp["scales"],
                "opacities": sp["opacities"],
                "sh0": sp["sh0"],
                "shN": sp["shN"],
                "features": sp.get("features"),
                "conv": sp.get("conv"),
            }
        )
    elif format == "inria":
        model_params, _ = model
        # (active_sh_degree, means, features_dc, features_rest, scaling,
        #  rotation, opacity, ...) — reference utils.py:45-55
        return _scene_from_dict(
            {
                "means": model_params[1],
                "sh0": model_params[2],
                "shN": model_params[3],
                "scales": model_params[4],
                "quats": model_params[5],
                "opacities": _to_np(model_params[6]).squeeze(-1)
                if _to_np(model_params[6]).ndim > 1
                else model_params[6],
            }
        )
    raise ValueError(f"unknown torch checkpoint format {format!r}")


def load_scene_ply(path: str, sh_degree: int = 3) -> GaussianScene:
    fields = read_ply(path)
    n_rest = 3 * ((sh_degree + 1) ** 2 - 1)
    means = np.stack([fields["x"], fields["y"], fields["z"]], axis=1)
    sh0 = np.stack(
        [fields[f"f_dc_{i}"] for i in range(3)], axis=1
    ).reshape(-1, 1, 3)
    # Inria PLY stores f_rest channel-major: (3, K) flattened.
    rest = np.stack(
        [fields[f"f_rest_{i}"] for i in range(n_rest)], axis=1
    )
    k = n_rest // 3
    shN = rest.reshape(-1, 3, k).transpose(0, 2, 1)
    scales = np.stack([fields[f"scale_{i}"] for i in range(3)], axis=1)
    quats = np.stack([fields[f"rot_{i}"] for i in range(4)], axis=1)
    return _scene_from_dict(
        {
            "means": means,
            "quats": quats,
            "scales": scales,
            "opacities": fields["opacity"],
            "sh0": sh0,
            "shN": shN,
        }
    )


def save_scene_ply(scene: GaussianScene, path: str) -> None:
    """Inria-layout PLY export (round-trips through load_scene_ply)."""
    n = scene.num_gaussians
    means = np.asarray(scene.means)
    sh0 = np.asarray(scene.sh0).reshape(n, 3)
    shN = np.asarray(scene.shN)  # (N, K, 3)
    rest = shN.transpose(0, 2, 1).reshape(n, -1)  # channel-major
    fields = {"x": means[:, 0], "y": means[:, 1], "z": means[:, 2]}
    fields.update({f"f_dc_{i}": sh0[:, i] for i in range(3)})
    fields.update({f"f_rest_{i}": rest[:, i] for i in range(rest.shape[1])})
    fields["opacity"] = np.asarray(scene.logit_opacities)
    sc = np.asarray(scene.log_scales)
    fields.update({f"scale_{i}": sc[:, i] for i in range(3)})
    q = np.asarray(scene.quats)
    fields.update({f"rot_{i}": q[:, i] for i in range(4)})
    write_ply(path, fields)


def load_scene_npz(path: str) -> GaussianScene:
    d = np.load(path)
    return _scene_from_dict(
        {
            "means": d["means"],
            "quats": d["quats"],
            "scales": d["scales"],
            "opacities": d["opacities"],
            "sh0": d["sh0"],
            "shN": d["shN"],
            "features": d["features"] if "features" in d else None,
            "conv": d["conv"] if "conv" in d else None,
        }
    )


def save_scene_npz(scene: GaussianScene, path: str) -> None:
    out = {
        "means": np.asarray(scene.means),
        "quats": np.asarray(scene.quats),
        "scales": np.asarray(scene.log_scales),
        "opacities": np.asarray(scene.logit_opacities),
        "sh0": np.asarray(scene.sh0),
        "shN": np.asarray(scene.shN),
    }
    if scene.features is not None:
        out["features"] = np.asarray(scene.features)
    if scene.feature_proj is not None:
        out["conv"] = np.asarray(scene.feature_proj)
    np.savez(path, **out)


def save_scene_pt(scene: GaussianScene, path: str) -> None:
    """gsplat-format torch checkpoint (reference ``save_to_ckpt``,
    segment.py:243-258)."""
    import torch

    sp = {
        "means": torch.from_numpy(np.array(scene.means)),
        "quats": torch.from_numpy(np.array(scene.quats)),
        "scales": torch.from_numpy(np.array(scene.log_scales)),
        "opacities": torch.from_numpy(np.array(scene.logit_opacities)),
        "sh0": torch.from_numpy(np.array(scene.sh0)),
        "shN": torch.from_numpy(np.array(scene.shN)),
    }
    if scene.features is not None:
        sp["features"] = torch.from_numpy(np.array(scene.features))
    if scene.feature_proj is not None:
        sp["conv"] = torch.from_numpy(np.array(scene.feature_proj))
    torch.save({"splats": sp}, path)


def load_checkpoint(
    checkpoint: str,
    data_dir: str,
    format: str = "gsplat",
    data_factor: int = 1,
) -> Tuple[GaussianScene, Camera, SceneManager]:
    """Full load: scene + COLMAP cameras, mirroring the reference's
    ``load_checkpoint`` (utils.py:20-109). Returns (scene, cameras,
    colmap SceneManager). Cameras sorted by image name (the reference's
    iteration order, backproject.py:74)."""
    colmap = SceneManager(os.path.join(data_dir, "sparse/0")).load_all()

    if format in ("gsplat", "inria"):
        scene = load_scene_pt(checkpoint, format)
    elif format == "ply":
        scene = load_scene_ply(checkpoint)
    elif format == "npz":
        scene = load_scene_npz(checkpoint)
    else:
        raise ValueError("Invalid Gaussian splatting format")

    cam = next(iter(colmap.cameras.values()))
    K = cam.K.astype(np.float32)
    K[:2, :] /= data_factor
    # int() truncation, not round(): the reference derives the render
    # size as int(cx*2)/int(cy*2) (backproject.py:85-86) and the two
    # disagree by one pixel for non-integer cx/cy after data_factor
    width = int(K[0, 2] * 2)
    height = int(K[1, 2] * 2)
    images = sorted(colmap.images.values(), key=lambda im: im.name)
    cameras = cameras_from_colmap(images, K, width, height)
    if len(colmap.cameras) > 1:
        # Multi-camera rigs: the reference assumes a single camera
        # (utils.py:93-105 reads the first); here each image gets its
        # OWN camera's pinhole K (distortion handled by the training
        # Parser, not this render-only path) as long as every camera
        # shares the render size.
        sizes = {
            (int(c.K[0, 2] * 2 / data_factor), int(c.K[1, 2] * 2 / data_factor))
            for c in colmap.cameras.values()
        }
        if len(sizes) == 1:
            Ks = np.stack([
                colmap.cameras[im.camera_id].K.astype(np.float32)
                for im in images
            ])
            Ks[:, :2, :] /= data_factor
            import dataclasses as _dc

            cameras = _dc.replace(cameras, Ks=jnp.asarray(Ks))
    return scene, cameras, colmap


def save_checkpoint(scene: GaussianScene, path: str) -> None:
    """Format chosen by extension: .pt (gsplat), .ply, .npz."""
    if path.endswith(".pt"):
        save_scene_pt(scene, path)
    elif path.endswith(".ply"):
        save_scene_ply(scene, path)
    else:
        save_scene_npz(scene, path if path.endswith(".npz") else path + ".npz")
