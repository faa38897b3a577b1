"""Visualization pipelines: gif frames, checkerboard, PCA modes."""

import os

import jax.numpy as jnp
import numpy as np

from tpugs.encoders.base import LinearRGBEncoder
from tpugs.lift.backproject import create_feature_field
from tpugs.utils.synthetic import orbit_cameras, random_scene
from tpugs.viz.common import create_checkerboard
from tpugs.viz.gif import render_mask_2d_to_gif, render_to_gif
from tpugs.viz.pca import feature_pca, pca_colors, render_pca

W, H = 48, 32


def _setup(n=80):
    scene = random_scene(n, seed=0, extent=0.8, scale_range=(0.02, 0.1))
    cams = orbit_cameras(2, W, H, radius=2.5)
    return scene, cams


def test_checkerboard_pattern():
    b = create_checkerboard(128, 128, size=64)
    assert b.shape == (128, 128, 3)
    assert b[0, 0, 0] == 255 and b[0, 64, 0] == 128
    assert b[64, 0, 0] == 128 and b[64, 64, 0] == 255


def test_render_to_gif_writes(tmp_path):
    scene, cams = _setup()
    out = str(tmp_path / "render.gif")
    frames = render_to_gif(out, scene, cams)
    assert len(frames) == 2
    assert frames[0].shape == (H, W, 3)
    assert frames[0].dtype == np.uint8
    assert os.path.exists(out)
    assert os.path.exists(out + ".images/frame_0000.png")


def test_render_to_gif_checkerboard(tmp_path):
    scene, cams = _setup(n=5)
    frames = render_to_gif(
        None, scene, cams, use_checkerboard_background=True
    )
    # Mostly empty scene: background must show through
    f = frames[0]
    assert (f == 255).any() or (f == 128).any()


def test_render_mask_2d_to_gif(tmp_path):
    scene, cams = _setup()
    enc = LinearRGBEncoder(feature_dim=6)
    feats = create_feature_field(scene, cams, enc, verbose=False)
    pos = feats[:1]
    neg = -feats[:1]
    out = str(tmp_path / "mask.gif")
    frames = render_mask_2d_to_gif(scene, feats, pos, neg, cams, out)
    assert len(frames) == 2 and os.path.exists(out)


def test_feature_pca_reconstruction():
    rng = np.random.default_rng(0)
    basis = rng.normal(size=(3, 16))
    x = rng.normal(size=(200, 3)) @ basis
    mean, comps = feature_pca(x, 3)
    proj = (x - mean) @ comps
    recon = proj @ comps.T + mean
    np.testing.assert_allclose(recon, x, atol=1e-8)


def test_pca_colors_in_range():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(100, 8))
    mean, comps = feature_pca(x)
    colors, lo, hi = pca_colors(x, mean, comps)
    assert colors.shape == (100, 3)
    assert colors.min() >= 0 and colors.max() <= 1


def test_render_pca_both_modes(tmp_path):
    scene, cams = _setup()
    enc = LinearRGBEncoder(feature_dim=6)
    feats = create_feature_field(scene, cams, enc, verbose=False)
    fg = render_pca(scene, feats, cams, str(tmp_path / "g.gif"), "gaussian")
    ff = render_pca(scene, feats, cams, str(tmp_path / "f.gif"), "frame")
    assert len(fg) == 2 and len(ff) == 2
    assert fg[0].shape == (H, W, 3) and ff[0].shape == (H, W, 3)


def test_overlay_mask_red_alpha_blend_semantics():
    # Masked pixel = 0.75*image + 0.25*red; unmasked = unchanged
    # (reference segment.py:225-231).
    from tpugs.viz.gif import overlay_mask_red

    frame = np.full((2, 2, 3), 100, np.uint8)
    mask = np.array([[1, 0], [0, 1]], np.float64)
    out = overlay_mask_red(frame, mask)
    np.testing.assert_array_equal(out[0, 1], [100, 100, 100])
    np.testing.assert_array_equal(out[1, 0], [100, 100, 100])
    expect = np.clip(0.75 * 100 + 0.25 * np.array([255.0, 0, 0]), 0, 255)
    np.testing.assert_array_equal(out[0, 0], expect.astype(np.uint8))
    np.testing.assert_array_equal(out[1, 1], expect.astype(np.uint8))
