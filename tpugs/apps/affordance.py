"""CLI: affordance transfer demo (reference
``affordance_transfer/demo_affordance_transfer.py:1614-1663`` and
``affordance.sh``): DINO back-projection -> exemplar kNN label transfer
-> colored rendering -> per-class IoU/recall evaluation."""

from __future__ import annotations

import json
import os
import time

import numpy as np
import jax.numpy as jnp


def main(
    data_dir: str = "./data/scene",
    checkpoint: str = "./data/scene/ckpts/ckpt.pt",
    results_dir: str = "./results/scene",
    exemplar_dir: str = "./data/affordance_exemplars",
    gt_dir: str = "",
    format: str = "gsplat",
    data_factor: int = 1,
    encoder_name: str = "dino",
    encoder_ckpt: str = "",
    knn: int = 5,
    skip_prune: bool = False,
):
    from tpugs.encoders import get_encoder
    from tpugs.io.checkpoints import load_checkpoint
    from tpugs.lift.backproject import create_feature_field
    from tpugs.lift.prune import prune_by_gradients
    from tpugs.query.affordance import (
        colorize_by_labels,
        evaluate_iou,
        load_exemplars,
        render_label_masks,
        transfer_affordance,
    )
    from tpugs.viz.gif import render_to_gif

    os.makedirs(results_dir, exist_ok=True)
    scene, cams, _ = load_checkpoint(checkpoint, data_dir, format, data_factor)
    if not skip_prune:
        scene = prune_by_gradients(scene, cams)

    encoder = get_encoder(encoder_name, encoder_ckpt or None)
    feat_path = os.path.join(results_dir, f"features_{encoder_name}.npz")
    if os.path.exists(feat_path):
        features = jnp.asarray(np.load(feat_path)["features"])
    else:
        features = create_feature_field(scene, cams, encoder)
        np.savez(feat_path, features=np.asarray(features))

    bank = load_exemplars(exemplar_dir, encoder)
    print(f"exemplar bank: {len(bank.labels)} patches")
    t0 = time.time()
    labels = transfer_affordance(features, bank, k=knn)
    print("kNN transfer:", time.time() - t0, "s")

    colored = colorize_by_labels(scene, labels)
    render_to_gif(
        os.path.join(results_dir, "affordance.gif"), colored, cams
    )
    np.savez(os.path.join(results_dir, "affordance_labels.npz"), labels=labels)

    if gt_dir:
        from tpugs.query.affordance import load_mat_gt, resize_nearest

        preds, gts = [], []
        has_mat = any(
            f.endswith("label.mat") for f in os.listdir(gt_dir)
        )
        if has_mat:
            # Reference GT format: per-view `*label.mat` files
            # (gt_label class map + gt_type manual/automatic), sorted
            # and zipped positionally with the cameras
            # (demo_affordance_transfer.py:1445-1611).
            for c, gt_label in load_mat_gt(gt_dir):
                if c >= cams.num_cameras:
                    break
                pred = render_label_masks(
                    scene, labels, np.asarray(cams.viewmats[c]),
                    np.asarray(cams.Ks[c]), cams.width, cams.height,
                )
                preds.append(
                    resize_nearest(pred, *gt_label.shape[:2])
                )
                gts.append(gt_label)
        else:
            import imageio.v2 as imageio

            for c in range(cams.num_cameras):
                gt_path = os.path.join(gt_dir, f"frame_{c:04d}.png")
                if not os.path.exists(gt_path):
                    continue
                pred = render_label_masks(
                    scene, labels, np.asarray(cams.viewmats[c]),
                    np.asarray(cams.Ks[c]), cams.width, cams.height,
                )
                gts.append(imageio.imread(gt_path))
                preds.append(pred)
        metrics = evaluate_iou(preds, gts)
        print(json.dumps(metrics, indent=2))
        with open(os.path.join(results_dir, "affordance_eval.json"), "w") as fh:
            json.dump(metrics, fh)
        return labels, metrics
    return labels, None


if __name__ == "__main__":
    from tpugs.utils.cli import cli

    cli(main)
