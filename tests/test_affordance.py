"""Affordance transfer: exemplar loading, label transfer, colorized
rendering, IoU eval, and the three 2D-mask voting methods."""

import base64
import io
import json
import os

import numpy as np
import jax.numpy as jnp

from tpugs.encoders.base import LinearRGBEncoder
from tpugs.lift.backproject import create_feature_field
from tpugs.query.affordance import (
    AFFORDANCE_CLASSES,
    ExemplarBank,
    colorize_by_labels,
    evaluate_iou,
    load_exemplars,
    render_label_masks,
    transfer_affordance,
    vote_binary,
    vote_gradient,
    vote_projection,
)
from tpugs.utils.synthetic import orbit_cameras, random_scene

W, H = 48, 32


def _lifted():
    scene = random_scene(80, seed=0, extent=0.8, scale_range=(0.02, 0.1))
    cams = orbit_cameras(3, W, H, radius=2.5)
    enc = LinearRGBEncoder(feature_dim=8)
    feats = create_feature_field(scene, cams, enc, verbose=False)
    return scene, cams, feats


def test_transfer_affordance_labels():
    scene, cams, feats = _lifted()
    f = np.asarray(feats)
    # bank: exemplars copied from two Gaussians' features
    bank = ExemplarBank(
        features=np.concatenate(
            [np.tile(f[0], (6, 1)), np.tile(f[40], (6, 1))]
        ).astype(np.float32),
        labels=np.array([1] * 6 + [4] * 6, np.int64),
    )
    labels = transfer_affordance(feats, bank, k=3)
    assert labels.shape == (80,)
    assert labels[0] == 1 and labels[40] == 4
    assert set(np.unique(labels)) <= {1, 4}


def test_colorize_and_render_masks():
    scene, cams, feats = _lifted()
    labels = np.zeros(80, np.int64)
    labels[:20] = 2
    colored = colorize_by_labels(scene, labels)
    assert not np.allclose(np.asarray(colored.sh0), np.asarray(scene.sh0))
    pred = render_label_masks(
        scene, labels, np.asarray(cams.viewmats[0]), np.asarray(cams.Ks[0]),
        W, H,
    )
    assert pred.shape == (H, W)
    assert set(np.unique(pred)) <= set(range(len(AFFORDANCE_CLASSES)))


def test_evaluate_iou_perfect_and_disjoint():
    a = np.zeros((8, 8), int)
    a[:4] = 1
    out = evaluate_iou([a], [a])
    assert out["grasp"]["iou"] == 1.0 and out["grasp"]["recall"] == 1.0
    b = np.zeros((8, 8), int)
    b[4:] = 1
    out2 = evaluate_iou([a], [b])
    assert out2["grasp"]["iou"] == 0.0


def test_load_exemplars_labelme(tmp_path):
    import imageio.v2 as imageio

    img = (np.random.default_rng(0).uniform(0, 1, (16, 16, 3)) * 255).astype(
        np.uint8
    )
    imageio.imwrite(str(tmp_path / "ex.jpg"), img)
    mask = np.zeros((16, 16), np.uint8)
    mask[:8, :8] = 255
    buf = io.BytesIO()
    imageio.imwrite(buf, mask, format="png")
    meta = {
        "imagePath": "ex.jpg",
        "shapes": [
            {"label": "grasp", "mask": base64.b64encode(buf.getvalue()).decode()},
            {"label": "contain", "points": [[8, 8], [15, 8], [15, 15], [8, 15]]},
        ],
    }
    (tmp_path / "ex.json").write_text(json.dumps(meta))
    bank = load_exemplars(str(tmp_path), LinearRGBEncoder(feature_dim=5))
    assert bank.features.shape == (2, 5)
    assert bank.labels.tolist() == [
        AFFORDANCE_CLASSES.index("grasp"),
        AFFORDANCE_CLASSES.index("contain"),
    ]


def test_voting_methods():
    scene, cams, _ = _lifted()
    vm = np.asarray(cams.viewmats[0])
    K = np.asarray(cams.Ks[0])
    mask = np.zeros((H, W), bool)
    mask[:, : W // 2] = True  # left half
    g = vote_gradient(scene, vm, K, W, H, mask)
    assert g.shape == (80,)
    assert (g >= -1e-5).all() and (g <= 1 + 1e-5).all()
    b = vote_binary(scene, vm, K, W, H, mask)
    assert set(np.unique(b)) <= {0.0, 1.0}
    p = vote_projection(scene, vm, K, W, H, mask)
    assert p.shape == (80,)
    # gradient and projection votes should broadly agree on strong cases
    strong = (g > 0.9) | (g < 0.1)
    agree = (p[strong] > 0.5) == (g[strong] > 0.5)
    assert agree.mean() > 0.7
