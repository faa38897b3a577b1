"""Affordance label transfer + evaluation (reference
``affordance_transfer/demo_affordance_transfer.py``).

Pipeline: lift DINO features onto Gaussians (the shared back-projection
engine), load labeled 2D exemplars (labelme-style JSON with base64 PNG
masks, ``:1254-1375``), transfer labels by exact kNN majority vote
(``:1377-1396`` — faiss there, an MXU matmul + top_k here), render the
labeled scene with a palette blended into the DC SH (``:1399-1439``),
and score per-class IoU/recall against ground-truth masks over all
views (``:1445-1611``).

Also included: the three 2D-mask -> 3D lifting voting methods from the
legacy SAM2/YOLO path (``:276-426``) — gradient voting (exactly our
fused adjoint with the mask as the feature image), binary voting, and
projection voting via per-Gaussian screen centers."""

from __future__ import annotations

import base64
import io
import json
import os
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax.numpy as jnp

from tpugs.core.scene import GaussianScene

# 8-class palette (label 0 = background/none)
AFFORDANCE_CLASSES = (
    "none", "grasp", "cut", "scoop", "contain", "pound", "support", "wrap",
)
PALETTE = np.array(
    [
        [0.5, 0.5, 0.5],
        [0.9, 0.1, 0.1],
        [0.1, 0.9, 0.1],
        [0.1, 0.1, 0.9],
        [0.9, 0.9, 0.1],
        [0.9, 0.1, 0.9],
        [0.1, 0.9, 0.9],
        [0.9, 0.5, 0.1],
    ],
    np.float32,
)


@dataclass
class ExemplarBank:
    features: np.ndarray  # (M, D)
    labels: np.ndarray  # (M,) int


def decode_labelme_mask(b64png: str) -> np.ndarray:
    """base64 PNG -> bool mask (reference labelme payloads)."""
    import imageio.v2 as imageio

    raw = base64.b64decode(b64png)
    img = imageio.imread(io.BytesIO(raw))
    if img.ndim == 3:
        img = img[..., 0]
    return img > 127


def load_exemplars(
    json_dir: str,
    encoder,  # (H, W, 3) -> (H, W, D) feature encoder (DINO)
    image_loader=None,  # name -> (H, W, 3) float image
    patch: int = 14,
    class_names: Sequence[str] = AFFORDANCE_CLASSES,
) -> ExemplarBank:
    """Labelme-style exemplars -> per-patch feature/label bank
    (reference ``:1254-1375``): run the encoder on each exemplar image,
    pool features over each labeled mask's patches."""
    import imageio.v2 as imageio

    name_to_id = {n: i for i, n in enumerate(class_names)}
    feats: List[np.ndarray] = []
    labels: List[int] = []
    for fn in sorted(os.listdir(json_dir)):
        if not fn.endswith(".json"):
            continue
        meta = json.load(open(os.path.join(json_dir, fn)))
        img_name = meta.get("imagePath", fn.replace(".json", ".jpg"))
        if image_loader is not None:
            image = image_loader(img_name)
        else:
            image = (
                imageio.imread(os.path.join(json_dir, img_name)).astype(
                    np.float32
                )
                / 255.0
            )
        fmap = np.asarray(encoder(jnp.asarray(image[..., :3])))
        for shape in meta.get("shapes", []):
            label = shape.get("label", "none")
            if label not in name_to_id:
                continue
            if "mask" in shape and shape["mask"]:
                mask = decode_labelme_mask(shape["mask"])
            elif "points" in shape:
                mask = _polygon_mask(
                    shape["points"], image.shape[0], image.shape[1]
                )
            else:
                continue
            if mask.shape != fmap.shape[:2]:
                import cv2

                mask = (
                    cv2.resize(
                        mask.astype(np.uint8),
                        (fmap.shape[1], fmap.shape[0]),
                    )
                    > 0
                )
            if mask.sum() == 0:
                continue
            feats.append(fmap[mask].mean(axis=0))
            labels.append(name_to_id[label])
    if not feats:
        return ExemplarBank(np.zeros((0, 1), np.float32), np.zeros(0, np.int64))
    return ExemplarBank(
        np.stack(feats).astype(np.float32), np.array(labels, np.int64)
    )


def _polygon_mask(points, h, w) -> np.ndarray:
    import cv2

    mask = np.zeros((h, w), np.uint8)
    cv2.fillPoly(mask, [np.asarray(points, np.int32)], 1)
    return mask > 0


def transfer_affordance(
    gaussian_features: jnp.ndarray,  # (N, D) lifted DINO field
    bank: ExemplarBank,
    k: int = 5,
    min_similarity: Optional[float] = None,
) -> np.ndarray:
    """(N,) affordance labels by kNN majority vote (reference faiss
    IndexFlatIP 5-NN + vote, ``:1377-1396``)."""
    from tpugs.query.knn import knn_search, transfer_labels

    f = gaussian_features / (
        jnp.linalg.norm(gaussian_features, axis=-1, keepdims=True) + 1e-8
    )
    b = bank.features / (
        np.linalg.norm(bank.features, axis=-1, keepdims=True) + 1e-8
    )
    labels = transfer_labels(
        f, jnp.asarray(b), jnp.asarray(bank.labels.astype(np.int32)),
        k=min(k, len(bank.labels)), num_classes=len(AFFORDANCE_CLASSES),
    )
    labels = np.asarray(labels)
    if min_similarity is not None:
        scores, _ = knn_search(f, jnp.asarray(b), k=1)
        labels = np.where(
            np.asarray(scores)[:, 0] >= min_similarity, labels, 0
        )
    return labels


def colorize_by_labels(
    scene: GaussianScene, labels: np.ndarray, blend: float = 0.8
) -> GaussianScene:
    """Blend the palette into the DC SH (reference ``:1399-1439``)."""
    C0 = 0.28209479177387814
    colors = np.asarray(scene.sh0)[:, 0, :] * C0 + 0.5
    target = PALETTE[np.clip(labels, 0, len(PALETTE) - 1)]
    mixed = np.where(
        (labels > 0)[:, None], (1 - blend) * colors + blend * target, colors
    )
    sh0 = ((mixed - 0.5) / C0)[:, None, :]
    return scene.replace(
        sh0=jnp.asarray(sh0.astype(np.float32)),
        shN=jnp.zeros_like(scene.shN),
    )


def render_label_masks(
    scene: GaussianScene, labels: np.ndarray, viewmat, K,
    width: int, height: int, threshold: float = 0.5,
) -> np.ndarray:
    """(H, W) predicted label map: rasterize one-hot label colors and
    argmax per pixel (how the reference evaluates its 3D labels in 2D)."""
    from tpugs.raster.api import plan_render, rasterize_with_plan

    n_classes = len(AFFORDANCE_CLASSES)
    onehot = np.eye(n_classes, dtype=np.float32)[
        np.clip(labels, 0, n_classes - 1)
    ]
    plan = plan_render(
        scene.means, scene.quats, scene.scales, scene.opacities,
        jnp.asarray(viewmat), jnp.asarray(K), width, height,
    )
    img, alpha = rasterize_with_plan(
        scene.means, scene.quats, scene.scales, scene.opacities,
        jnp.asarray(onehot), jnp.asarray(viewmat), jnp.asarray(K), plan,
    )
    img = np.asarray(img)
    pred = img.argmax(axis=-1)
    pred[np.asarray(alpha) < threshold] = 0
    return pred


def load_mat_gt(gt_dir: str) -> List[Tuple[int, np.ndarray]]:
    """Load the reference's ``.mat`` ground-truth label maps
    (``demo_affordance_transfer.py:1445-1611``): files named
    ``*label.mat`` with keys ``gt_label`` ((H, W) int class map) and
    ``gt_type`` (``'manual'`` | ``'automatic'``; automatic GT is
    skipped, as in the reference). Files are sorted by name and zipped
    positionally with the scene's (name-sorted) cameras, exactly like
    the reference zips them with ``colmap_project.images``.

    Returns [(camera_index, gt_label), ...] for the manual views.
    """
    from scipy.io import loadmat

    files = sorted(
        f for f in os.listdir(gt_dir) if f.endswith("label.mat")
    )
    out: List[Tuple[int, np.ndarray]] = []
    for i, fname in enumerate(files):
        gt = loadmat(os.path.join(gt_dir, fname))
        gt_type = gt.get("gt_type")
        if gt_type is not None:
            flat = np.asarray(gt_type).ravel()
            if flat.size and str(flat[0]) == "automatic":
                continue
        out.append((i, np.asarray(gt["gt_label"]).astype(np.int64)))
    return out


def resize_nearest(label_map: np.ndarray, height: int, width: int):
    """Nearest-neighbor resize for integer label maps (what the
    reference does with cv2.INTER_NEAREST when prediction and GT
    resolutions differ)."""
    h, w = label_map.shape[:2]
    if (h, w) == (height, width):
        return label_map
    rows = (np.arange(height) * (h / height)).astype(np.int64)
    cols = (np.arange(width) * (w / width)).astype(np.int64)
    return label_map[rows[:, None], cols[None, :]]


def evaluate_iou(
    pred_masks: Sequence[np.ndarray],  # per-view (H, W) int label maps
    gt_masks: Sequence[np.ndarray],
    n_classes: int = len(AFFORDANCE_CLASSES),
) -> Dict[str, Dict[str, float]]:
    """Per-class IoU + recall over all views (reference ``:1445-1611``)."""
    inter = np.zeros(n_classes)
    union = np.zeros(n_classes)
    gt_count = np.zeros(n_classes)
    hit = np.zeros(n_classes)
    for pred, gt in zip(pred_masks, gt_masks):
        for c in range(1, n_classes):
            p = pred == c
            g = gt == c
            inter[c] += np.logical_and(p, g).sum()
            union[c] += np.logical_or(p, g).sum()
            gt_count[c] += g.sum()
            hit[c] += np.logical_and(p, g).sum()
    out = {}
    for c in range(1, n_classes):
        if union[c] == 0 and gt_count[c] == 0:
            continue
        out[AFFORDANCE_CLASSES[c]] = {
            "iou": float(inter[c] / union[c]) if union[c] else 0.0,
            "recall": float(hit[c] / gt_count[c]) if gt_count[c] else 0.0,
        }
    ious = [v["iou"] for v in out.values()]
    recalls = [v["recall"] for v in out.values()]
    out["mean"] = {
        "iou": float(np.mean(ious)) if ious else 0.0,
        "recall": float(np.mean(recalls)) if recalls else 0.0,
    }
    return out


# ------------------------------------------------- 2D-mask voting methods


def vote_gradient(
    scene: GaussianScene, viewmat, K, width: int, height: int,
    mask2d: np.ndarray,
) -> np.ndarray:
    """Gradient voting (reference ``:383-399``): the blend-weighted mask
    integral per Gaussian — one fused adjoint pass here instead of a
    zero-color render + backward."""
    from tpugs.lift.ops import accumulate_view

    m = jnp.asarray(mask2d.astype(np.float32))[..., None]
    num, den = accumulate_view(
        scene, jnp.asarray(viewmat), jnp.asarray(K), width, height,
        feat_image=m,
    )
    return np.asarray(num[:, 0] / (den + 1e-12))


def vote_binary(scene, viewmat, K, width, height, mask2d) -> np.ndarray:
    """Binary voting (reference ``:400-410``): 1 if the Gaussian's mask
    integral dominates its visible weight."""
    scores = vote_gradient(scene, viewmat, K, width, height, mask2d)
    return (scores > 0.5).astype(np.float32)


def vote_projection(
    scene, viewmat, K, width: int, height: int, mask2d
) -> np.ndarray:
    """Projection voting (reference ``:411-421``, using meta means2d /
    gaussian_ids): vote by each visible Gaussian's projected center."""
    from tpugs.raster.api import _project_jit
    from tpugs.raster.projection import ProjectionConfig

    proj = _project_jit(
        scene.means, scene.quats, scene.scales, scene.opacities,
        jnp.asarray(viewmat), jnp.asarray(K), width, height,
        ProjectionConfig(),
    )
    xy = np.asarray(proj.means2d)
    valid = np.asarray(proj.valid)
    x = np.clip(xy[:, 0].astype(int), 0, width - 1)
    y = np.clip(xy[:, 1].astype(int), 0, height - 1)
    votes = mask2d[y, x].astype(np.float32)
    votes[~valid] = 0.0
    return votes
