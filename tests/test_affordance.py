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


def test_affordance_app_mat_gt_eval(tmp_path):
    """End-to-end app eval against the reference's ``.mat`` GT format
    (``demo_affordance_transfer.py:1445-1611``): synthesized
    ``*label.mat`` files (gt_label + gt_type) drive the IoU/recall
    path; an ``automatic`` GT view must be skipped; GT rendered from
    the app's own transferred labels scores IoU 1.0."""
    import imageio.v2 as imageio
    from scipy.io import savemat

    from tpugs.apps.affordance import main as affordance_main
    from tpugs.io.checkpoints import save_scene_pt
    from tpugs.utils.synthetic import write_synthetic_colmap

    scene = random_scene(80, seed=0, extent=0.8, scale_range=(0.02, 0.1))
    cams = orbit_cameras(3, W, H, radius=2.5)
    data_dir = str(tmp_path / "data")
    os.makedirs(data_dir, exist_ok=True)
    write_synthetic_colmap(data_dir, cams)
    ckpt = os.path.join(data_dir, "ckpt.pt")
    save_scene_pt(scene, ckpt)

    # Exemplar bank (labelme-style, as in test_load_exemplars_labelme).
    ex_dir = tmp_path / "exemplars"
    ex_dir.mkdir()
    img = (np.random.default_rng(0).uniform(0, 1, (16, 16, 3)) * 255).astype(
        np.uint8
    )
    imageio.imwrite(str(ex_dir / "ex.jpg"), img)
    meta = {
        "imagePath": "ex.jpg",
        "shapes": [
            {"label": "grasp",
             "points": [[0, 0], [15, 0], [15, 15], [0, 15]]},
        ],
    }
    (ex_dir / "ex.json").write_text(json.dumps(meta))

    results = str(tmp_path / "results")
    kw = dict(
        data_dir=data_dir, checkpoint=ckpt, results_dir=results,
        exemplar_dir=str(ex_dir), format="gsplat", data_factor=1,
        encoder_name="linear:8", skip_prune=True,
    )
    labels, _ = affordance_main(**kw)

    # Synthesize reference-format GT from the transferred labels: the
    # manual views' GT equals the prediction (IoU 1.0); view 1 is
    # marked 'automatic' and must be skipped by the adapter.
    gt_dir = tmp_path / "gt"
    gt_dir.mkdir()
    for c in range(cams.num_cameras):
        pred = render_label_masks(
            scene, labels, np.asarray(cams.viewmats[c]),
            np.asarray(cams.Ks[c]), W, H,
        )
        gt_label = (
            np.roll(pred, W // 2, axis=1) if c == 1 else pred
        )  # the skipped view gets WRONG GT — it must not hurt the score
        savemat(
            str(gt_dir / f"frame_{c:04d}_label.mat"),
            {"gt_label": gt_label,
             "gt_type": "automatic" if c == 1 else "manual"},
        )

    labels2, metrics = affordance_main(gt_dir=str(gt_dir), **kw)
    np.testing.assert_array_equal(labels2, labels)
    assert metrics is not None and "mean" in metrics
    assert metrics["mean"]["iou"] == 1.0
    assert metrics["mean"]["recall"] == 1.0
    assert os.path.exists(os.path.join(results, "affordance_eval.json"))


def test_mat_gt_loader_and_resize(tmp_path):
    """Unit: load_mat_gt sorting/skip semantics + nearest resize."""
    from scipy.io import savemat

    from tpugs.query.affordance import load_mat_gt, resize_nearest

    a = np.arange(12, dtype=np.int64).reshape(3, 4) % 3
    savemat(str(tmp_path / "b_label.mat"),
            {"gt_label": a, "gt_type": "manual"})
    savemat(str(tmp_path / "a_label.mat"),
            {"gt_label": a * 0, "gt_type": "automatic"})
    savemat(str(tmp_path / "c_label.mat"), {"gt_label": a + 1})
    (tmp_path / "notes.txt").write_text("ignored")
    got = load_mat_gt(str(tmp_path))
    # a_ (idx 0) skipped; b_ -> camera 1; c_ (no gt_type) -> camera 2
    assert [i for i, _ in got] == [1, 2]
    np.testing.assert_array_equal(got[0][1], a)
    np.testing.assert_array_equal(got[1][1], a + 1)

    up = resize_nearest(a, 6, 8)
    assert up.shape == (6, 8)
    np.testing.assert_array_equal(up[::2, ::2], a)
    assert resize_nearest(a, 3, 4) is a


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
