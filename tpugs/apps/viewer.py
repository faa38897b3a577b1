"""Interactive OpenCV scene viewer (reference ``viewer.py:55-471``).

Features mirrored: RPY/XYZ/scale trackbars, WASD dolly, canonical
top/front/right views from an estimated scene world-frame, turntable
mouse orbit about the ground-plane intersection, anaglyph stereo
(second render with an eye offset, channel-masked merge), and an axes
overlay. The render core is the fused Pallas path when on TPU, the
pure-JAX tiled path otherwise.

All view-state math lives in ``ViewerState`` (headless, unit-tested);
the cv2 event loop is a thin shell around it.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import numpy as np
import jax.numpy as jnp

from tpugs.core.camera import rpy_matrix
from tpugs.core.scene import GaussianScene


def estimate_scene_frame(viewmats: np.ndarray) -> np.ndarray:
    """World-frame guess from averaged camera poses (reference
    ``viewer.py:249-289``): mean camera "down" becomes +y, mean forward
    projected orthogonal becomes +z."""
    R = viewmats[:, :3, :3]  # world-to-cam
    down = R[:, 1, :].mean(axis=0)  # camera +y rows in world coords
    down /= np.linalg.norm(down) + 1e-12
    fwd = R[:, 2, :].mean(axis=0)
    fwd = fwd - down * (fwd @ down)
    if np.linalg.norm(fwd) < 1e-6:
        # symmetric orbit: mean forward is parallel to mean down — fall
        # back to the first camera's forward, then any perpendicular.
        fwd = R[0, 2, :] - down * (R[0, 2, :] @ down)
    if np.linalg.norm(fwd) < 1e-6:
        ref = np.array([1.0, 0.0, 0.0])
        if abs(down @ ref) > 0.9:
            ref = np.array([0.0, 0.0, 1.0])
        fwd = ref - down * (ref @ down)
    fwd /= np.linalg.norm(fwd) + 1e-12
    right = np.cross(down, fwd)
    return np.stack([right, down, fwd], axis=0)  # rows: world axes


@dataclasses.dataclass
class ViewerState:
    """Trackbar-style view state -> 4x4 viewmat (reference
    ``viewer.py:187-206``)."""

    roll: float = 0.0
    pitch: float = 0.0
    yaw: float = 0.0
    x: float = 0.0
    y: float = 0.0
    z: float = 0.0
    scale: float = 1.0
    base: np.ndarray = dataclasses.field(
        default_factory=lambda: np.eye(4)
    )

    def viewmat(self) -> np.ndarray:
        m = rpy_matrix(self.roll, self.pitch, self.yaw)
        m[:3, 3] = [self.x, self.y, self.z]
        out = m @ self.base
        out[:3, :] *= self.scale  # uniform scene scale
        out[3, 3] = 1.0
        return out.astype(np.float32)

    # -- canonical views (reference viewer.py:129-185)
    def set_canonical(self, which: str, frame: np.ndarray, dist: float = 3.0):
        base = np.eye(4)
        if which == "front":
            R = frame
        elif which == "top":
            R = np.stack([frame[0], frame[2], -frame[1]])
        elif which == "right":
            R = np.stack([-frame[2], frame[1], frame[0]])
        else:
            raise ValueError(which)
        base[:3, :3] = R
        base[:3, 3] = [0, 0, dist]
        self.base = base
        self.roll = self.pitch = self.yaw = 0.0
        self.x = self.y = self.z = 0.0

    # -- WASD dolly (reference viewer.py:345-356)
    def dolly(self, key: str, step: float = 0.1):
        if key == "w":
            self.z -= step
        elif key == "s":
            self.z += step
        elif key == "a":
            self.x += step
        elif key == "d":
            self.x -= step

    # -- turntable orbit (reference viewer.py:368-450)
    def orbit(self, dx_pixels: float, dy_pixels: float, pivot_depth: float = 3.0):
        """Rotate about the point ``pivot_depth`` in front of the camera."""
        yaw_delta = dx_pixels * 0.01
        pitch_delta = dy_pixels * 0.01
        vm = self.viewmat()
        pivot_cam = np.array([0, 0, pivot_depth, 1.0])
        rot = rpy_matrix(pitch_delta, yaw_delta, 0.0)
        t = np.eye(4)
        t[:3, 3] = -pivot_cam[:3]
        t_inv = np.eye(4)
        t_inv[:3, 3] = pivot_cam[:3]
        new_vm = t_inv @ rot @ t @ vm
        self.base = new_vm
        self.roll = self.pitch = self.yaw = 0.0
        self.x = self.y = self.z = 0.0
        self.scale = 1.0


def render_frame(
    scene: GaussianScene,
    viewmat: np.ndarray,
    K: np.ndarray,
    width: int,
    height: int,
    anaglyph: bool = False,
    eye_offset: float = 0.05,
    axes_overlay: bool = False,
    engine: str = "auto",
) -> np.ndarray:
    """One viewer frame as uint8 RGB (optionally anaglyph stereo,
    reference viewer.py:221-247). ``engine``: "pallas" renders through
    the fused TPU kernel (interactive rates at real scene sizes),
    "tiled" through the pure-JAX renderer; "auto" picks pallas on
    accelerators."""
    import jax

    from tpugs.raster.api import plan_render, rasterize_with_plan
    from tpugs.viz.common import to_uint8

    on_cpu = jax.devices()[0].platform == "cpu"
    if engine == "auto":
        engine = "tiled" if on_cpu else "pallas"

    def render(vm):
        if engine == "pallas":
            from tpugs.raster.pallas_train import render_scene_pallas

            img, _ = render_scene_pallas(
                scene, vm, K, width, height, interpret=on_cpu
            )
            return to_uint8(img)
        plan = plan_render(
            scene.means, scene.quats, scene.scales, scene.opacities,
            jnp.asarray(vm), jnp.asarray(K), width, height,
        )
        img, _ = rasterize_with_plan(
            scene.means, scene.quats, scene.scales, scene.opacities,
            scene.colors_all, jnp.asarray(vm), jnp.asarray(K), plan,
            sh_degree=scene.sh_degree,
        )
        return to_uint8(img)

    frame = render(viewmat)
    if anaglyph:
        vm2 = viewmat.copy()
        vm2[0, 3] += eye_offset
        right = render(vm2)
        # red from left eye, green/blue from right (reference :239-247)
        frame = np.stack(
            [frame[..., 0], right[..., 1], right[..., 2]], axis=-1
        )
    if axes_overlay:
        frame = draw_axes(frame, viewmat, K)
    return frame


def draw_axes(frame: np.ndarray, viewmat: np.ndarray, K: np.ndarray):
    """Project world axes at the origin into the frame (reference
    viewer.py:291-310)."""
    import cv2

    frame = np.ascontiguousarray(frame)
    pts = np.array(
        [[0, 0, 0], [0.3, 0, 0], [0, 0.3, 0], [0, 0, 0.3]], np.float64
    )
    cam = pts @ viewmat[:3, :3].T + viewmat[:3, 3]
    if np.any(cam[:, 2] <= 0.01):
        return frame
    uv = (cam @ np.asarray(K).T)
    uv = (uv[:, :2] / uv[:, 2:3]).astype(int)
    colors = [(255, 0, 0), (0, 255, 0), (0, 0, 255)]
    for i, c in enumerate(colors):
        cv2.line(frame, tuple(uv[0]), tuple(uv[i + 1]), c, 2)
    return frame


class Viewer:
    """cv2 event loop (reference ``Viewer.run``, viewer.py:312-337)."""

    def __init__(
        self,
        scene: GaussianScene,
        K,
        width: int,
        height: int,
        viewmats: Optional[np.ndarray] = None,
        anaglyph: bool = False,
    ):
        self.scene = scene
        self.K = np.asarray(K)
        self.width, self.height = width, height
        self.anaglyph = anaglyph
        self.state = ViewerState()
        if viewmats is not None and len(viewmats):
            self.frame = estimate_scene_frame(np.asarray(viewmats))
            self.state.base = np.asarray(viewmats[0]).copy()
        else:
            self.frame = np.eye(3)
        self._drag_start = None

    def handle_key(self, key: str) -> bool:
        """Returns False when the viewer should exit."""
        if key in "wasd":
            self.state.dolly(key)
        elif key == "1":
            self.state.set_canonical("top", self.frame)
        elif key == "2":
            self.state.set_canonical("front", self.frame)
        elif key == "3":
            self.state.set_canonical("right", self.frame)
        elif key == "g":
            self.anaglyph = not self.anaglyph
        elif key in ("q", "\x1b"):
            return False
        return True

    def handle_mouse(self, event: str, x: int, y: int):
        if event == "down":
            self._drag_start = (x, y)
        elif event == "move" and self._drag_start is not None:
            dx = x - self._drag_start[0]
            dy = y - self._drag_start[1]
            self.state.orbit(dx, dy)
            self._drag_start = (x, y)
        elif event == "up":
            self._drag_start = None

    def render(self) -> np.ndarray:
        return render_frame(
            self.scene,
            self.state.viewmat(),
            self.K,
            self.width,
            self.height,
            anaglyph=self.anaglyph,
        )

    def run(self):  # pragma: no cover - needs a display
        import cv2

        win = "tpugs viewer"
        cv2.namedWindow(win, cv2.WINDOW_NORMAL)
        for name, lo, hi, init in [
            ("roll", -180, 180, 0), ("pitch", -180, 180, 0),
            ("yaw", -180, 180, 0), ("x", -100, 100, 0),
            ("y", -100, 100, 0), ("z", -100, 100, 0),
            ("scale", 1, 200, 100),
        ]:
            cv2.createTrackbar(name, win, init - lo, hi - lo, lambda v: None)

        def mouse_cb(event, x, y, flags, param):
            if event == cv2.EVENT_LBUTTONDOWN:
                self.handle_mouse("down", x, y)
            elif event == cv2.EVENT_MOUSEMOVE:
                self.handle_mouse("move", x, y)
            elif event == cv2.EVENT_LBUTTONUP:
                self.handle_mouse("up", x, y)

        cv2.setMouseCallback(win, mouse_cb)
        while True:
            s = self.state
            s.roll = math.radians(cv2.getTrackbarPos("roll", win) - 180)
            s.pitch = math.radians(cv2.getTrackbarPos("pitch", win) - 180)
            s.yaw = math.radians(cv2.getTrackbarPos("yaw", win) - 180)
            s.x = (cv2.getTrackbarPos("x", win) - 100) / 10
            s.y = (cv2.getTrackbarPos("y", win) - 100) / 10
            s.z = (cv2.getTrackbarPos("z", win) - 100) / 10
            s.scale = cv2.getTrackbarPos("scale", win) / 100
            frame = self.render()
            cv2.imshow(win, frame[..., ::-1])
            key = cv2.waitKeyEx(30)
            if key >= 0 and not self.handle_key(chr(key & 0xFF)):
                break
        cv2.destroyAllWindows()


def main(
    data_dir: str = "./data/garden",
    checkpoint: str = "./data/garden/ckpts/ckpt_29999_rank0.pt",
    format: str = "gsplat",
    data_factor: int = 4,
    anaglyph: bool = False,
    skip_prune: bool = False,
):
    from tpugs.io.checkpoints import load_checkpoint
    from tpugs.lift.prune import prune_by_gradients

    scene, cams, _ = load_checkpoint(checkpoint, data_dir, format, data_factor)
    if not skip_prune:
        scene = prune_by_gradients(scene, cams)
    viewer = Viewer(
        scene, np.asarray(cams.Ks[0]), cams.width, cams.height,
        viewmats=np.asarray(cams.viewmats), anaglyph=anaglyph,
    )
    viewer.run()


if __name__ == "__main__":
    from tpugs.utils.cli import cli

    cli(main)
