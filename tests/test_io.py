"""I/O: COLMAP binary/text round-trips, checkpoint formats, full
load_checkpoint path on a synthetic on-disk dataset."""

import os

import jax.numpy as jnp
import numpy as np

from tpugs.io.checkpoints import (
    load_checkpoint,
    load_scene_npz,
    load_scene_ply,
    load_scene_pt,
    save_scene_npz,
    save_scene_ply,
    save_scene_pt,
)
from tpugs.io.colmap import (
    ColmapCamera,
    SceneManager,
    qvec_to_rotmat,
    rotmat_to_qvec,
)
from tpugs.io.ply import read_ply, write_ply
from tpugs.utils.synthetic import (
    orbit_cameras,
    random_scene,
    write_synthetic_colmap,
)


def test_qvec_rotmat_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(10):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        R = qvec_to_rotmat(q)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-10)
        q2 = rotmat_to_qvec(R)
        np.testing.assert_allclose(q2, q, atol=1e-8)


def test_colmap_bin_roundtrip(tmp_path):
    cams = orbit_cameras(3, 64, 48)
    data_dir = str(tmp_path)
    write_synthetic_colmap(data_dir, cams, n_points=17)
    sm = SceneManager(os.path.join(data_dir, "sparse/0")).load_all()
    assert len(sm.cameras) == 1
    assert len(sm.images) == 3
    assert len(sm.points3D) == 17
    cam = sm.cameras[1]
    assert cam.model == "PINHOLE"
    assert cam.width == 64 and cam.height == 48
    # Recovered extrinsics match the source viewmats.
    for i, im in sorted(sm.images.items()):
        vm = np.asarray(cams.viewmats[i - 1])
        np.testing.assert_allclose(im.R(), vm[:3, :3], atol=1e-6)
        np.testing.assert_allclose(im.t, vm[:3, 3], atol=1e-6)
    xyz, rgb = sm.points_array()
    assert xyz.shape == (17, 3)


def test_colmap_txt_reader(tmp_path):
    d = tmp_path / "sparse" / "0"
    d.mkdir(parents=True)
    (d / "cameras.txt").write_text(
        "# comment\n1 PINHOLE 640 480 500 500 320 240\n"
    )
    (d / "images.txt").write_text(
        "# hdr\n1 1 0 0 0 0.5 -0.2 3.0 1 img0.jpg\n"
        "10.0 20.0 5 30.0 40.0 -1\n"
    )
    (d / "points3D.txt").write_text("5 1 2 3 200 100 50 0.5 1 0\n")
    sm = SceneManager(str(d)).load_all()
    assert sm.cameras[1].fx == 500
    im = sm.images[1]
    np.testing.assert_allclose(im.t, [0.5, -0.2, 3.0])
    assert im.name == "img0.jpg"
    assert len(im.xys) == 2
    np.testing.assert_allclose(sm.points3D[5].xyz, [1, 2, 3])


def test_ply_roundtrip(tmp_path):
    p = str(tmp_path / "x.ply")
    fields = {
        "x": np.arange(5, dtype=np.float32),
        "y": np.ones(5, np.float32),
        "nx": np.linspace(0, 1, 5).astype(np.float32),
    }
    write_ply(p, fields)
    back = read_ply(p)
    for k in fields:
        np.testing.assert_allclose(back[k], fields[k])


def _scene_allclose(a, b, atol=1e-6):
    np.testing.assert_allclose(np.asarray(a.means), np.asarray(b.means), atol=atol)
    np.testing.assert_allclose(np.asarray(a.quats), np.asarray(b.quats), atol=atol)
    np.testing.assert_allclose(
        np.asarray(a.log_scales), np.asarray(b.log_scales), atol=atol
    )
    np.testing.assert_allclose(
        np.asarray(a.logit_opacities), np.asarray(b.logit_opacities), atol=atol
    )
    np.testing.assert_allclose(np.asarray(a.sh0), np.asarray(b.sh0), atol=atol)
    np.testing.assert_allclose(np.asarray(a.shN), np.asarray(b.shN), atol=atol)


def test_pt_gsplat_roundtrip(tmp_path):
    scene = random_scene(20, seed=0, feature_dim=8)
    p = str(tmp_path / "ckpt.pt")
    save_scene_pt(scene, p)
    back = load_scene_pt(p, "gsplat")
    _scene_allclose(scene, back)
    np.testing.assert_allclose(
        np.asarray(scene.features), np.asarray(back.features)
    )


def test_ply_scene_roundtrip(tmp_path):
    scene = random_scene(15, seed=1)
    p = str(tmp_path / "scene.ply")
    save_scene_ply(scene, p)
    back = load_scene_ply(p)
    _scene_allclose(scene, back)


def test_npz_roundtrip(tmp_path):
    scene = random_scene(10, seed=2)
    p = str(tmp_path / "scene.npz")
    save_scene_npz(scene, p)
    back = load_scene_npz(p)
    _scene_allclose(scene, back)


def test_load_checkpoint_end_to_end(tmp_path):
    """Reference load_checkpoint parity: ckpt + COLMAP dir -> scene +
    sorted camera batch with data_factor-scaled K (utils.py:93-105)."""
    scene = random_scene(30, seed=3)
    cams = orbit_cameras(4, 128, 96)
    data_dir = str(tmp_path)
    write_synthetic_colmap(data_dir, cams)
    ckpt = str(tmp_path / "ckpt.pt")
    save_scene_pt(scene, ckpt)

    s2, cams2, colmap = load_checkpoint(ckpt, data_dir, "gsplat", data_factor=2)
    _scene_allclose(scene, s2)
    assert cams2.width == 64 and cams2.height == 48  # 128/2, 96/2
    np.testing.assert_allclose(
        np.asarray(cams2.Ks[0]), np.asarray(cams.Ks[0]) / 2 + np.diag([0, 0, 0.5]),
        atol=1e-5,
    )
    assert cams2.num_cameras == 4
    np.testing.assert_allclose(
        np.asarray(cams2.viewmats), np.asarray(cams.viewmats), atol=1e-6
    )


def test_load_checkpoint_renders(tmp_path):
    """Loaded scene must render identically to the in-memory scene."""
    from tpugs.raster.api import rasterize

    scene = random_scene(50, seed=4, extent=0.8)
    cams = orbit_cameras(2, 64, 48, radius=2.5)
    write_synthetic_colmap(str(tmp_path), cams)
    ckpt = str(tmp_path / "c.pt")
    save_scene_pt(scene, ckpt)
    s2, cams2, _ = load_checkpoint(ckpt, str(tmp_path), "gsplat")

    img1, _, _ = rasterize(
        scene.means, scene.quats, scene.scales, scene.opacities,
        scene.colors_all, cams.viewmats[:1], cams.Ks[:1], 64, 48, sh_degree=3,
    )
    img2, _, _ = rasterize(
        s2.means, s2.quats, s2.scales, s2.opacities,
        s2.colors_all, cams2.viewmats[:1], cams2.Ks[:1],
        cams2.width, cams2.height, sh_degree=3,
    )
    np.testing.assert_allclose(np.asarray(img1), np.asarray(img2), atol=1e-4)
