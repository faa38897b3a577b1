"""Live training viewer: HTTP surface + orbit camera math (headless).

Reference analog: the viser/nerfview live viewer the trainer runs
alongside training (`f3dgs/simple_trainer_feature_3dgs.py:403-409,
928-947`). Here the viewer is a dependency-free HTTP server, so the
whole surface is testable without a browser.
"""

import json
import urllib.request

import numpy as np

from tpugs.train.viewer import LiveViewer, orbit_viewmat


def _get(port, path):
    with urllib.request.urlopen(
        f"http://127.0.0.1:{port}{path}", timeout=10
    ) as r:
        return r.status, r.headers.get("Content-Type"), r.read()


def test_viewer_http_surface():
    v = LiveViewer(port=0, host="127.0.0.1")
    try:
        # before any update: page OK, frame 404, stats empty
        status, ctype, body = _get(v.port, "/")
        assert status == 200 and "text/html" in ctype
        assert b"tpugs" in body
        try:
            status, _, _ = _get(v.port, "/frame.png")
            assert False, "expected 404 before first frame"
        except urllib.error.HTTPError as e:
            assert e.code == 404

        frame = np.zeros((24, 32, 3), np.uint8)
        frame[:, :16] = (255, 0, 0)
        v.update(100, {"loss": 0.5, "l1": 0.25}, frame,
                 num_rays_per_step=32 * 24)

        status, ctype, body = _get(v.port, "/frame.png")
        assert status == 200 and ctype == "image/png"
        assert body[:8] == b"\x89PNG\r\n\x1a\n"

        status, ctype, body = _get(v.port, "/stats.json")
        stats = json.loads(body)
        assert stats["step"] == 100
        assert stats["loss"] == 0.5
        assert "steps_per_s" in stats and "elapsed_s" in stats

        # second update computes a steps/s rate
        v.update(200, {"loss": 0.4}, None, num_rays_per_step=32 * 24)
        _, _, body = _get(v.port, "/stats.json")
        stats = json.loads(body)
        assert stats["steps_per_s"] > 0
        assert stats["rays_per_s"] > 0
        # frame from the previous update is retained
        status, _, _ = _get(v.port, "/frame.png")
        assert status == 200
    finally:
        v.close()


def test_viewer_camera_roundtrip():
    v = LiveViewer(port=0, host="127.0.0.1")
    try:
        assert v.render_request() is None
        req = urllib.request.Request(
            f"http://127.0.0.1:{v.port}/camera",
            data=json.dumps(
                {"yaw": 1.5, "pitch": -0.2, "radius": 4.0}
            ).encode(),
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=10) as r:
            assert r.status == 200
        cam = v.render_request()
        assert cam == {"yaw": 1.5, "pitch": -0.2, "radius": 4.0}

        # malformed body -> 400, camera unchanged
        bad = urllib.request.Request(
            f"http://127.0.0.1:{v.port}/camera", data=b"not json",
            method="POST",
        )
        try:
            urllib.request.urlopen(bad, timeout=10)
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
        assert v.render_request() == cam
    finally:
        v.close()


def test_orbit_viewmat_looks_at_center():
    center = np.array([0.3, -0.2, 1.1])
    for yaw, pitch, radius in [(0.0, 0.0, 2.0), (1.2, 0.7, 3.5),
                               (-2.1, -1.3, 1.0)]:
        vm = orbit_viewmat(center, yaw, pitch, radius)
        assert vm.shape == (4, 4)
        # center projects onto the +z camera axis at distance radius
        pc = vm[:3, :3] @ center + vm[:3, 3]
        assert np.allclose(pc[:2], 0.0, atol=1e-5)
        assert np.isclose(pc[2], radius, atol=1e-5)
        # rotation is orthonormal
        assert np.allclose(vm[:3, :3] @ vm[:3, :3].T, np.eye(3), atol=1e-5)
