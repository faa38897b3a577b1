"""Native C++ scene-I/O runtime (tpugs/native): the compiled COLMAP
parser must agree field-for-field with the pure-Python reader on
synthetic models (shuffled ids, variable-length tracks, unicode
names), fail loudly on truncated buffers, and fall back cleanly when
the library is unavailable."""

import os
import struct

import numpy as np
import pytest

import tpugs.native as native
from tpugs.io import colmap as C

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def _synthetic_model(rng, n_cams=2, n_images=5, n_points=137):
    cams = {
        i + 1: C.ColmapCamera(
            i + 1, "PINHOLE", 640, 480,
            np.array([500.0 + i, 501.0, 320.0, 240.0]),
        )
        for i in range(n_cams)
    }
    images = {}
    for i in range(n_images):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        m = int(rng.integers(0, 9))
        images[i + 1] = C.ColmapImage(
            i + 1, q, rng.normal(size=3), 1 + i % n_cams,
            f"frame_é{i:04d}.png",
            rng.normal(size=(m, 2)),
            rng.integers(-1, n_points, size=m).astype(np.int64),
        )
    points = {}
    # Deliberately non-contiguous, shuffled ids.
    ids = rng.permutation(np.arange(1, n_points * 3, 3))
    for pid in ids:
        t = int(rng.integers(0, 6))
        points[int(pid)] = C.ColmapPoint3D(
            int(pid), rng.normal(size=3),
            rng.integers(0, 256, size=3).astype(np.uint8),
            float(rng.uniform()),
            rng.integers(1, n_images + 1, size=t).astype(np.int64),
            rng.integers(0, 50, size=t).astype(np.int64),
        )
    return cams, images, points


@pytest.fixture
def model_dir(tmp_path):
    rng = np.random.default_rng(7)
    cams, images, points = _synthetic_model(rng)
    sparse = str(tmp_path / "sparse" / "0")
    C.write_sparse_model(sparse, cams, images, points)
    return sparse, cams, images, points


def _read_images_pure(path):
    """Pure-Python reference result (native path disabled)."""
    from unittest import mock
    with mock.patch.object(C, "_read_images_bin_native",
                           return_value=None):
        return C.read_images_bin(path)


def _read_points_pure(path):
    from unittest import mock
    with mock.patch.object(C, "read_points3d_bin_columnar",
                           return_value=None):
        return C.read_points3d_bin(path)


def test_images_native_matches_pure(model_dir):
    sparse, _, src, _ = model_dir
    path = os.path.join(sparse, "images.bin")
    nat = C._read_images_bin_native(path)
    assert nat is not None, "native parse did not engage"
    pure = _read_images_pure(path)
    assert set(nat) == set(pure) == set(src)
    for iid in src:
        a, b = nat[iid], pure[iid]
        assert a.name == b.name == src[iid].name
        assert a.camera_id == b.camera_id
        np.testing.assert_allclose(a.qvec, b.qvec)
        np.testing.assert_allclose(a.tvec, b.tvec)
        np.testing.assert_allclose(a.xys, b.xys)
        np.testing.assert_array_equal(a.point3D_ids, b.point3D_ids)


def test_points_native_matches_pure(model_dir):
    sparse, _, _, src = model_dir
    path = os.path.join(sparse, "points3D.bin")
    cols = C.read_points3d_bin_columnar(path)
    assert cols is not None, "native parse did not engage"
    # Columns sorted by id even though the file was written shuffled.
    assert np.all(np.diff(cols["pid"]) > 0)
    pure = _read_points_pure(path)
    nat = C.read_points3d_bin(path)
    assert set(nat) == set(pure) == set(src)
    for pid in src:
        a, b = nat[pid], pure[pid]
        np.testing.assert_allclose(a.xyz, b.xyz)
        np.testing.assert_array_equal(a.rgb, b.rgb)
        assert a.error == pytest.approx(b.error)
        np.testing.assert_array_equal(a.image_ids, b.image_ids)
        np.testing.assert_array_equal(a.point2D_idxs, b.point2D_idxs)


def test_scene_manager_lazy_columnar(model_dir):
    sparse, _, _, src = model_dir
    sm = C.SceneManager(sparse).load_all()
    # Bulk accessors serve straight from columns ...
    xyz, rgb = sm.points_array()
    err = sm.points_err_array()
    pids = sm.point_ids_array()
    assert sm._points3D is None, "dict materialized too eagerly"
    assert xyz.shape == (len(src), 3) and err.shape == (len(src),)
    order = np.argsort(list(src))
    want_xyz = np.stack([src[p].xyz for p in sorted(src)])
    np.testing.assert_allclose(xyz, want_xyz)
    np.testing.assert_array_equal(pids, np.sort(list(src)))
    del order
    # ... and the object dict still materializes on demand.
    assert len(sm.points3D) == len(src)
    np.testing.assert_allclose(sm.points3D[pids[0]].xyz, xyz[0])


def test_truncated_points_raises(model_dir, tmp_path):
    sparse, *_ = model_dir
    with open(os.path.join(sparse, "points3D.bin"), "rb") as fh:
        data = fh.read()
    from tpugs.native import scene_io
    with pytest.raises(ValueError):
        scene_io.parse_points3d(data[: len(data) - 3])
    with pytest.raises(ValueError):
        scene_io.parse_images(b"\x01" + b"\x00" * 7)  # claims 1, empty


def test_native_points_writer_roundtrip(model_dir):
    sparse, *_ = model_dir
    path = os.path.join(sparse, "points3D.bin")
    from tpugs.native import scene_io
    cols = C.read_points3d_bin_columnar(path)
    blob = scene_io.write_points3d(
        cols["pid"], cols["xyz"], cols["rgb"], cols["err"],
        cols["track_offsets"], cols["track_image_ids"], cols["track_p2d"])
    back = scene_io.parse_points3d(blob)
    for k in cols:
        np.testing.assert_array_equal(back[k], cols[k])


def test_dataset_point_indices_native(tmp_path):
    """End-to-end: the trainer's Parser builds identical point-index
    maps through the native and pure paths."""
    from tpugs.utils.synthetic import orbit_cameras, write_synthetic_colmap
    from tpugs.train.dataset import Parser
    cams = orbit_cameras(4, 64, 48)
    write_synthetic_colmap(str(tmp_path), cams, n_points=33)
    p_native = Parser(str(tmp_path), factor=1, normalize=False)
    from unittest import mock
    with mock.patch.object(C, "read_points3d_bin_columnar",
                           return_value=None), \
         mock.patch.object(C, "_read_images_bin_native",
                           return_value=None):
        p_pure = Parser(str(tmp_path), factor=1, normalize=False)
    np.testing.assert_allclose(p_native.points, p_pure.points)
    np.testing.assert_allclose(p_native.points_err, p_pure.points_err)
    assert set(p_native.point_indices) == set(p_pure.point_indices)
    for k in p_native.point_indices:
        np.testing.assert_array_equal(
            p_native.point_indices[k], p_pure.point_indices[k]
        )
