"""End-to-end integration on a HETEROGENEOUS synthetic COLMAP scene.

The reference's canonical workload is one real capture (Mip-NeRF 360
garden) driven through parse -> train -> backproject -> segment; this
environment has no datasets, so this test builds the hardest synthetic
equivalent the COLMAP writer can express — a multi-camera rig mixing
PINHOLE + OPENCV + OPENCV_FISHEYE models with nontrivial orbit poses
and images actually rendered from a Gaussian scene (distorted per
model) — and runs the FULL user-facing chain in one go:

    Parser (per-camera undistortion)
      -> short training run (apps.train: eval, ckpt, traj gif)
      -> feature back-projection (apps.backproject: prune + verify +
         lift)
      -> segmentation + edit + gifs (apps.segment)

Reference semantics: f3dgs/datasets/colmap.py:82-107 (six distortion
models), backproject.py:301-337, segment.py:261-311.
"""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax.numpy as jnp

from tpugs.io.checkpoints import save_scene_pt
from tpugs.io.colmap import (
    ColmapCamera,
    ColmapImage,
    ColmapPoint3D,
    rotmat_to_qvec,
    write_sparse_model,
)
from tpugs.utils.synthetic import orbit_cameras, random_scene
from tpugs.viz.gif import render_to_gif

W, H = 64, 48


def _distort_image(ideal, K, dist, fisheye):
    """Inverse-warp an ideal pinhole image into a distorted one (same
    construction as tests/test_undistort.py)."""
    h, w = ideal.shape[:2]
    u, v = np.meshgrid(np.arange(w, dtype=np.float64),
                       np.arange(h, dtype=np.float64))
    pts = np.stack([u.ravel(), v.ravel()], axis=-1)[:, None, :]
    if fisheye:
        src = cv2.fisheye.undistortPoints(pts, K, dist.reshape(-1, 1), P=K)
    else:
        src = cv2.undistortPoints(pts, K, dist, P=K)
    sx = src[:, 0, 0].reshape(h, w).astype(np.float32)
    sy = src[:, 0, 1].reshape(h, w).astype(np.float32)
    return cv2.remap(ideal, sx, sy, cv2.INTER_LINEAR)


def _build_dataset(tmp_path):
    import imageio.v2 as imageio

    data_dir = str(tmp_path / "data")
    os.makedirs(os.path.join(data_dir, "images"), exist_ok=True)
    scene = random_scene(150, seed=0, extent=0.8, scale_range=(0.02, 0.1))
    cams = orbit_cameras(6, W, H, radius=2.5)
    K = np.asarray(cams.Ks[0], np.float64)
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]

    # Three camera models sharing the render size: two views each.
    d_cv = np.array([-0.10, 0.02, 0.001, -0.001])
    d_fe = np.array([-0.05, 0.01, 0.0, 0.0])
    cameras = {
        1: ColmapCamera(1, "PINHOLE", W, H,
                        np.array([fx, fy, cx, cy], np.float64)),
        2: ColmapCamera(2, "OPENCV", W, H,
                        np.array([fx, fy, cx, cy, *d_cv], np.float64)),
        3: ColmapCamera(3, "OPENCV_FISHEYE", W, H,
                        np.array([fx, fy, cx, cy, *d_fe], np.float64)),
    }
    cam_of_view = [1, 1, 2, 2, 3, 3]

    frames = render_to_gif(None, scene, cams, save_frames=False)
    images = {}
    for i, frame in enumerate(frames):
        cid = cam_of_view[i]
        if cid == 2:
            frame = _distort_image(frame, K, d_cv, fisheye=False)
        elif cid == 3:
            frame = _distort_image(frame, K, d_fe, fisheye=True)
        name = f"frame_{i:04d}.png"
        imageio.imwrite(os.path.join(data_dir, "images", name), frame)
        vm = np.asarray(cams.viewmats[i])
        images[i + 1] = ColmapImage(
            i + 1, rotmat_to_qvec(vm[:3, :3]), vm[:3, 3].astype(np.float64),
            cid, name, np.zeros((0, 2)), np.zeros((0,), np.int64),
        )

    # SfM points correlated with the scene (sfm init + depth loss path).
    means = np.asarray(scene.means, np.float64)
    rgb = np.full((len(means), 3), 128, np.uint8)
    pts3d = {
        int(j + 1): ColmapPoint3D(
            int(j + 1), means[j], rgb[j], 0.5,
            np.array([1], np.int64), np.array([0], np.int64),
        )
        for j in range(len(means))
    }
    write_sparse_model(
        os.path.join(data_dir, "sparse/0"), cameras, images, pts3d
    )
    save_scene_pt(scene, os.path.join(data_dir, "ckpt.pt"))
    return data_dir, scene


def test_full_chain_heterogeneous_colmap(tmp_path):
    data_dir, scene = _build_dataset(tmp_path)

    # --- Parser: all three models parsed, undistortion maps only for
    # the distorted ones, per-camera rectified K/size.
    from tpugs.train.dataset import Dataset, Parser

    parser = Parser(data_dir, factor=1)
    assert set(parser.Ks_dict) == {1, 2, 3}
    assert 1 not in parser.mapx_dict  # pinhole needs no remap
    assert 2 in parser.mapx_dict and 3 in parser.mapx_dict
    parser.test_every = 6
    trainset = Dataset(parser, split="train")
    assert len(trainset) >= 4
    sample = trainset[0]
    assert np.isfinite(np.asarray(sample["image"])).all()

    # --- Short training run through the real CLI main (Parser ->
    # Trainer -> eval -> ckpt -> traj gif).
    from tpugs.apps.train import main as train_main

    out_dir = str(tmp_path / "out")
    train_main(
        data_dir=data_dir, result_dir=out_dir, data_factor=1,
        max_steps=4, feature_dim=4, feature_out_dim=4, teacher="linear:4",
        strategy="none", test_every=6, eval_every=0, save_every=0,
        sh_degree=1, init_type="sfm", seed=0,
    )
    assert os.path.exists(os.path.join(out_dir, "ckpts", "ckpt_3.npz"))
    assert os.path.exists(os.path.join(out_dir, "traj.gif"))

    # --- Back-projection through the CLI main: prune -> render-
    # equivalence verify -> lift (per-image Ks from the mixed rig).
    from tpugs.apps.backproject import main as bp_main

    res_dir = str(tmp_path / "results")
    bp_main(
        data_dir=data_dir, checkpoint=os.path.join(data_dir, "ckpt.pt"),
        results_dir=res_dir, data_factor=1, feature="linear:8",
        batch=False,
    )
    fpath = os.path.join(res_dir, "features_linear:8.npz")
    feats = np.load(fpath)["features"]
    assert feats.shape[1] == 8
    assert np.isfinite(feats).all()
    # some feature mass actually landed (the scene is visible)
    assert float(np.abs(feats).sum()) > 0

    # --- Segment + edit + gifs through the CLI main.
    from tpugs.apps.segment import main as seg_main

    seg_main(
        data_dir=data_dir, checkpoint=os.path.join(data_dir, "ckpt.pt"),
        results_dir=res_dir, data_factor=1, feature="linear:8",
        pos_idx="0,1", neg_idx="5,6", export_checkpoint=True,
        skip_prune=True,
    )
    for name in ("mask2d.gif", "extracted.gif", "deleted.gif"):
        assert os.path.exists(os.path.join(res_dir, name)), name
    assert os.path.exists(os.path.join(res_dir, "extracted.pt"))
