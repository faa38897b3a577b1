"""Click-prompt 3D segmentation app (reference ``click_and_segment.py``).

Core mechanics (headless-testable ``PromptSession``):
  * render ``RGB+D`` once per view; a click unprojects the pixel depth
    to a 3D anchor (reference ``:260-273``);
  * the prompt feature is the rendered per-pixel feature at the click
    (``:287-290``) — here taken from the lifted per-Gaussian field
    rendered as a feature image;
  * mask3d = max positive similarity > max negative similarity
    (``:313-321``);
  * markers re-project into any view with ``project_point``
    (``calculate_3d_to_2d``, ``:24-34``);
  * UI shows original | extracted | deleted panes, deletion done by
    opacity zeroing (``:360-393``).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from tpugs.core.scene import GaussianScene


def unproject_pixel(
    x: float, y: float, depth: float, viewmat: np.ndarray, K: np.ndarray
) -> np.ndarray:
    """Pixel + rendered depth -> world point (reference ``:260-273``)."""
    K = np.asarray(K)
    d = np.array(
        [(x - K[0, 2]) / K[0, 0], (y - K[1, 2]) / K[1, 1], 1.0]
    ) * depth
    R = viewmat[:3, :3]
    t = viewmat[:3, 3]
    return R.T @ (d - t)


def project_point(
    p_world: np.ndarray, viewmat: np.ndarray, K: np.ndarray
) -> Optional[Tuple[int, int]]:
    """World point -> pixel or None if behind the camera
    (reference ``calculate_3d_to_2d``, ``:24-34``)."""
    cam = viewmat[:3, :3] @ p_world + viewmat[:3, 3]
    if cam[2] <= 1e-6:
        return None
    uv = np.asarray(K) @ cam
    return int(round(uv[0] / uv[2])), int(round(uv[1] / uv[2]))


@dataclasses.dataclass
class Prompt:
    anchor: np.ndarray  # (3,) world-space
    feature: np.ndarray  # (D,)
    positive: bool


class PromptSession:
    """Click-prompt state + mask computation."""

    def __init__(
        self,
        scene: GaussianScene,
        features: jnp.ndarray,  # (N, D) lifted field
        other_feature: Optional[np.ndarray] = None,  # CLIP "other" anchor
    ):
        self.scene = scene
        self.features = features
        self.prompts: List[Prompt] = []
        self.other_feature = other_feature

    # -- rendering helpers -------------------------------------------------
    def render_rgbd_features(self, viewmat, K, width, height):
        """(rgb+depth image, feature image) for one view — the on-click
        lookup source (reference renders RGB+D with the N×512 colors,
        ``:241-254``)."""
        from tpugs.raster.api import plan_render, rasterize_with_plan

        vm = jnp.asarray(viewmat)
        Kj = jnp.asarray(K)
        plan = plan_render(
            self.scene.means, self.scene.quats, self.scene.scales,
            self.scene.opacities, vm, Kj, width, height,
        )
        rgbd, _ = rasterize_with_plan(
            self.scene.means, self.scene.quats, self.scene.scales,
            self.scene.opacities, self.scene.colors_all, vm, Kj, plan,
            sh_degree=self.scene.sh_degree, render_mode="RGB+ED",
        )
        feat_img, _ = rasterize_with_plan(
            self.scene.means, self.scene.quats, self.scene.scales,
            self.scene.opacities, self.features, vm, Kj, plan,
        )
        return np.asarray(rgbd), np.asarray(feat_img)

    # -- prompt management -------------------------------------------------
    def add_click(
        self, x: int, y: int, rgbd, feat_img, viewmat, K,
        positive: bool = True,
    ) -> Prompt:
        depth = float(rgbd[y, x, 3])
        anchor = unproject_pixel(x, y, depth, np.asarray(viewmat), K)
        feature = np.asarray(feat_img[y, x])
        p = Prompt(anchor=anchor, feature=feature, positive=positive)
        self.prompts.append(p)
        return p

    def remove_nearest(self, x: int, y: int, viewmat, K, max_px: float = 30.0):
        """ctrl-click deletion of the closest marker (reference
        ``:291-312``)."""
        best, best_d = None, max_px
        for i, p in enumerate(self.prompts):
            uv = project_point(p.anchor, np.asarray(viewmat), K)
            if uv is None:
                continue
            d = float(np.hypot(uv[0] - x, uv[1] - y))
            if d < best_d:
                best, best_d = i, d
        if best is not None:
            self.prompts.pop(best)
        return best

    # -- mask --------------------------------------------------------------
    def mask3d(self) -> Optional[np.ndarray]:
        pos = [p.feature for p in self.prompts if p.positive]
        neg = [p.feature for p in self.prompts if not p.positive]
        if self.other_feature is not None:
            neg = neg + [self.other_feature]
        if not pos or not neg:
            return None
        from tpugs.query.text import get_mask3d

        mask, _ = get_mask3d(
            self.features,
            jnp.asarray(np.stack(pos).astype(np.float32)),
            jnp.asarray(np.stack(neg).astype(np.float32)),
        )
        return np.asarray(mask)

    def three_pane(self, viewmat, K, width, height) -> np.ndarray:
        """original | extracted | deleted panes (opacity-split renders,
        reference ``:360-393``)."""
        from tpugs.query.masks import segment_by_opacity
        from tpugs.raster.api import plan_render, rasterize_with_plan
        from tpugs.viz.common import to_uint8

        mask = self.mask3d()

        def render(scene):
            vm = jnp.asarray(viewmat)
            Kj = jnp.asarray(K)
            plan = plan_render(
                scene.means, scene.quats, scene.scales, scene.opacities,
                vm, Kj, width, height,
            )
            img, _ = rasterize_with_plan(
                scene.means, scene.quats, scene.scales, scene.opacities,
                scene.colors_all, vm, Kj, plan, sh_degree=scene.sh_degree,
            )
            return to_uint8(img)

        original = render(self.scene)
        if mask is None:
            extracted = np.zeros_like(original)
            deleted = original.copy()
        else:
            extracted = render(segment_by_opacity(self.scene, mask))
            deleted = render(segment_by_opacity(self.scene, ~mask))
        frame = np.concatenate([original, extracted, deleted], axis=1)
        # draw prompt markers on the first pane
        for p in self.prompts:
            uv = project_point(p.anchor, np.asarray(viewmat), K)
            if uv is None:
                continue
            u, v = uv
            if 0 <= u < width and 0 <= v < height:
                color = (
                    np.array([0, 255, 0]) if p.positive else np.array([255, 0, 0])
                )
                frame[
                    max(v - 2, 0) : v + 3, max(u - 2, 0) : u + 3
                ] = color
        return frame


def main(
    data_dir: str = "./data/garden",
    checkpoint: str = "./data/garden/ckpts/ckpt_29999_rank0.pt",
    results_dir: str = "./results/garden",
    format: str = "gsplat",
    data_factor: int = 4,
    feature: str = "lseg",
    skip_prune: bool = False,
):  # pragma: no cover - interactive
    import os

    import cv2

    from tpugs.io.checkpoints import load_checkpoint
    from tpugs.lift.prune import prune_by_gradients

    scene, cams, _ = load_checkpoint(checkpoint, data_dir, format, data_factor)
    if not skip_prune:
        scene = prune_by_gradients(scene, cams)
    feats = np.load(os.path.join(results_dir, f"features_{feature}.npz"))[
        "features"
    ]
    session = PromptSession(scene, jnp.asarray(feats))

    idx = 0
    vm = np.asarray(cams.viewmats[idx])
    K = np.asarray(cams.Ks[idx])
    rgbd, feat_img = session.render_rgbd_features(
        vm, K, cams.width, cams.height
    )

    def on_mouse(event, x, y, flags, param):
        nonlocal rgbd, feat_img
        if x >= cams.width:
            return
        if event == cv2.EVENT_LBUTTONDOWN:
            if flags & cv2.EVENT_FLAG_CTRLKEY:
                session.remove_nearest(x, y, vm, K)
            else:
                session.add_click(
                    x, y, rgbd, feat_img, vm, K,
                    positive=not (flags & cv2.EVENT_FLAG_SHIFTKEY),
                )

    win = "click-and-segment"
    cv2.namedWindow(win, cv2.WINDOW_NORMAL)
    cv2.setMouseCallback(win, on_mouse)
    while True:
        frame = session.three_pane(vm, K, cams.width, cams.height)
        cv2.imshow(win, frame[..., ::-1])
        key = cv2.waitKey(50) & 0xFF
        if key in (ord("q"), 27):
            break
        if key == ord("n"):
            idx = (idx + 1) % cams.num_cameras
            vm = np.asarray(cams.viewmats[idx])
            K = np.asarray(cams.Ks[idx])
            rgbd, feat_img = session.render_rgbd_features(
                vm, K, cams.width, cams.height
            )
    cv2.destroyAllWindows()


if __name__ == "__main__":
    from tpugs.utils.cli import cli

    cli(main)
