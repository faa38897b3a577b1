"""End-to-end app tests on a synthetic on-disk dataset: the reference's
demo flow (backproject CLI -> segment CLI) with a synthetic encoder."""

import os

import pytest

import numpy as np

from tpugs.io.checkpoints import save_scene_pt
from tpugs.utils.synthetic import (
    orbit_cameras,
    random_scene,
    write_synthetic_colmap,
)


def _make_dataset(tmp_path, n=80, n_cams=3, wh=(64, 48)):
    scene = random_scene(n, seed=0, extent=0.8, scale_range=(0.02, 0.1))
    cams = orbit_cameras(n_cams, *wh, radius=2.5)
    data_dir = str(tmp_path / "data")
    os.makedirs(data_dir, exist_ok=True)
    write_synthetic_colmap(data_dir, cams)
    ckpt = os.path.join(data_dir, "ckpt.pt")
    save_scene_pt(scene, ckpt)
    return data_dir, ckpt


def test_backproject_morton_matches_default(tmp_path):
    """--morton (Z-curve scene reordering for gather locality) must
    produce the same saved feature field, unpermuted."""
    from tpugs.apps.backproject import main as backproject_main

    data_dir, ckpt = _make_dataset(tmp_path)
    kw = dict(
        data_dir=data_dir, checkpoint=ckpt, format="gsplat",
        data_factor=1, feature="linear:8", engine="scan",
        skip_prune=True,
    )
    f0 = np.asarray(backproject_main(
        results_dir=str(tmp_path / "r0"), **kw
    ))
    f0_saved = np.load(
        os.path.join(str(tmp_path / "r0"), "features_linear:8.npz")
    )["features"]
    backproject_main(results_dir=str(tmp_path / "r1"), morton=True, **kw)
    f1 = np.load(
        os.path.join(str(tmp_path / "r1"), "features_linear:8.npz")
    )["features"]
    np.testing.assert_allclose(f1, f0_saved, atol=2e-5)
    np.testing.assert_allclose(f0, f0_saved, atol=0)


def test_backproject_then_segment_cli(tmp_path):
    from tpugs.apps.backproject import main as backproject_main
    from tpugs.apps.segment import main as segment_main

    data_dir, ckpt = _make_dataset(tmp_path)
    results = str(tmp_path / "results")

    features = backproject_main(
        data_dir=data_dir,
        checkpoint=ckpt,
        results_dir=results,
        format="gsplat",
        data_factor=1,
        feature="linear:8",
        batch=False,
    )
    assert os.path.exists(os.path.join(results, "features_linear:8.npz"))
    assert np.isfinite(np.asarray(features)).all()

    mask = segment_main(
        data_dir=data_dir,
        checkpoint=ckpt,
        results_dir=results,
        format="gsplat",
        pos_idx="0,1",
        neg_idx="5,6",
        data_factor=1,
        feature="linear:8",
        export_checkpoint=True,
    )
    assert os.path.exists(os.path.join(results, "mask2d.gif"))
    assert os.path.exists(os.path.join(results, "extracted.gif"))
    assert os.path.exists(os.path.join(results, "deleted.gif"))
    assert os.path.exists(os.path.join(results, "extracted.pt"))
    m = np.asarray(mask)
    assert m.dtype == bool and 0 < m.sum() < len(m)


def test_backproject_batch_mode(tmp_path):
    from tpugs.apps.backproject import main as backproject_main

    data_dir, ckpt = _make_dataset(tmp_path, n=60, n_cams=2)
    results = str(tmp_path / "results")
    f_batch = backproject_main(
        data_dir=data_dir, checkpoint=ckpt, results_dir=results,
        format="gsplat", data_factor=1, feature="linear:8",
        batch=True, skip_prune=True,
    )
    f_loop = backproject_main(
        data_dir=data_dir, checkpoint=ckpt, results_dir=results,
        format="gsplat", data_factor=1, feature="linear:8",
        batch=False, skip_prune=True,
    )
    np.testing.assert_allclose(
        np.asarray(f_batch), np.asarray(f_loop), atol=1e-4
    )
    # The production engine (Pallas kernels, interpret-mode on CPU)
    # must agree with the scan engine through the same CLI, within the
    # bf16 contribution tolerance.
    f_pallas = backproject_main(
        data_dir=data_dir, checkpoint=ckpt, results_dir=results,
        format="gsplat", data_factor=1, feature="linear:8",
        skip_prune=True, engine="pallas",
    )
    np.testing.assert_allclose(
        np.asarray(f_pallas), np.asarray(f_loop), atol=5e-3
    )
    with pytest.raises(ValueError, match="unknown engine"):
        backproject_main(
            data_dir=data_dir, checkpoint=ckpt, results_dir=results,
            format="gsplat", data_factor=1, feature="linear:8",
            skip_prune=True, engine="bogus",
        )


def test_cli_parser():
    from tpugs.utils.cli import cli

    def fn(a: int = 3, name: str = "x", flag: bool = False):
        return a, name, flag

    assert cli(fn, []) == (3, "x", False)
    assert cli(fn, ["--a", "7", "--flag"]) == (7, "x", True)
    assert cli(fn, ["--name", "hi", "--no-flag"]) == (3, "hi", False)


def test_train_cli_end_to_end(tmp_path):
    """Tiny end-to-end training run through the CLI entry."""
    import imageio.v2 as imageio

    from tpugs.apps.train import main as train_main
    from tpugs.utils.synthetic import (
        orbit_cameras,
        random_scene,
        write_synthetic_colmap,
    )
    from tpugs.viz.gif import render_to_gif

    scene = random_scene(100, seed=0, extent=0.8, scale_range=(0.02, 0.1))
    cams = orbit_cameras(5, 48, 32, radius=2.5)
    data_dir = str(tmp_path / "data")
    os.makedirs(data_dir + "/images", exist_ok=True)
    write_synthetic_colmap(data_dir, cams)
    frames = render_to_gif(None, scene, cams, save_frames=False)
    for i, f in enumerate(frames):
        imageio.imwrite(f"{data_dir}/images/frame_{i:04d}.jpg", f)

    trainer = train_main(
        data_dir=data_dir,
        result_dir=str(tmp_path / "out"),
        data_factor=1,
        max_steps=8,
        feature_dim=8,
        feature_out_dim=4,
        teacher="linear:4",
        strategy="none",
        test_every=4,
        eval_every=0,
        save_every=0,
    )
    assert trainer.step == 8
    assert os.path.exists(str(tmp_path / "out" / "ckpts" / "ckpt_7.npz"))
    assert os.path.exists(str(tmp_path / "out" / "stats" / "val_final.json"))


def test_compressed_backproject_cli(tmp_path):
    """Codec-compressed lifting (reference backproject_compressed.py):
    train a tiny codec, lift through it, verify 16-d output."""
    import jax.numpy as jnp

    from tpugs.apps.backproject_compressed import main as compressed_main
    from tpugs.codec.linear import save_codec, train_codec

    data_dir, ckpt = _make_dataset(tmp_path, n=60, n_cams=2)
    results = str(tmp_path / "results")
    os.makedirs(results, exist_ok=True)
    rng = np.random.default_rng(0)
    emb = rng.normal(size=(30, 16)).astype(np.float32)
    codec, _ = train_codec(jnp.asarray(emb), d_lat=4, steps=200, lr=1e-2)
    codec_path = os.path.join(results, "codec.npz")
    save_codec(codec, codec_path)

    feats = compressed_main(
        data_dir=data_dir, checkpoint=ckpt, results_dir=results,
        codec_path=codec_path, format="gsplat", data_factor=1,
        feature="linear:16", skip_prune=True,
    )
    assert feats.shape[1] == 4
    assert os.path.exists(
        os.path.join(results, "features_linear:16_compressed.npz")
    )


def test_segment_compressed_text_query_matches_uncompressed(
    tmp_path, monkeypatch
):
    """Text queries against a compressed (latent) feature field must be
    projected through the codec encoder before scoring (reference
    segment_compressed.py:73-74): with features living exactly in the
    codec's latent subspace, the compressed segmentation equals the
    uncompressed one."""
    import jax.numpy as jnp

    import tpugs.encoders.lseg as lseg_mod
    from tpugs.apps.segment import main as segment_main
    from tpugs.codec.linear import LinearCodec, save_codec

    data_dir, ckpt = _make_dataset(tmp_path, n=60, n_cams=2)
    results = str(tmp_path / "results")
    os.makedirs(results, exist_ok=True)

    rng = np.random.default_rng(3)
    d_in, d_lat, n = 64, 8, 60
    # Orthonormal projection: compress is exactly invertible on the
    # subspace, so cosine scores (and hence masks) are preserved.
    basis, _ = np.linalg.qr(rng.normal(size=(d_in, d_lat)))
    z = rng.normal(size=(n, d_lat)).astype(np.float32)
    z[: n // 2, 0] += 3.0  # two separable clusters
    z[n // 2 :, 1] += 3.0
    feats512 = (z @ basis.T).astype(np.float32)
    np.savez(os.path.join(results, "features_linear:8.npz"),
             features=feats512)
    np.savez(os.path.join(results, "features_linear:8_compressed.npz"),
             features=z)
    codec_path = os.path.join(results, "codec.npz")
    save_codec(
        LinearCodec(
            encoder=jnp.asarray(basis, jnp.float32),
            decoder=jnp.asarray(basis.T, jnp.float32),
        ),
        codec_path,
    )

    # Synthetic "CLIP" text queries in the 512-d space, aligned with the
    # two clusters (encode_text needs real weights, absent offline).
    q_pos = (np.eye(d_lat)[:1] @ basis.T).astype(np.float32)
    q_neg = (np.eye(d_lat)[1:2] @ basis.T).astype(np.float32)

    def fake_encode_text(prompts, ckpt=None, bpe_path=None):
        return jnp.asarray(q_pos if prompts == ["obj"] else q_neg)

    monkeypatch.setattr(lseg_mod, "encode_text", fake_encode_text)

    kw = dict(
        data_dir=data_dir, checkpoint=ckpt, results_dir=results,
        format="gsplat", data_factor=1, feature="linear:8",
        prompt="obj", neg_prompt="bg", skip_prune=True,
    )
    mask_full = np.asarray(segment_main(**kw))
    mask_comp = np.asarray(
        segment_main(compressed=True, codec_path=codec_path, **kw)
    )
    assert mask_full.sum() == n // 2  # the query actually selects cluster 1
    np.testing.assert_array_equal(mask_comp, mask_full)


def test_visualize_pca_cli(tmp_path):
    from tpugs.apps.backproject import main as backproject_main
    from tpugs.apps.visualize_pca import main as pca_main

    data_dir, ckpt = _make_dataset(tmp_path, n=60, n_cams=2)
    results = str(tmp_path / "results")
    backproject_main(
        data_dir=data_dir, checkpoint=ckpt, results_dir=results,
        format="gsplat", data_factor=1, feature="linear:8",
        skip_prune=True, batch=False,
    )
    pca_main(
        data_dir=data_dir, checkpoint=ckpt, results_dir=results,
        format="gsplat", data_factor=1, feature="linear:8", skip_prune=True,
    )
    assert os.path.exists(os.path.join(results, "pca_gaussian.gif"))
    assert os.path.exists(os.path.join(results, "pca_frame.gif"))
