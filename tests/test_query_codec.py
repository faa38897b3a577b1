"""Query layer + codec tests."""

import jax.numpy as jnp
import numpy as np

from tpugs.codec.linear import LinearCodec, codec_loss, train_codec
from tpugs.query.knn import knn_search, transfer_labels
from tpugs.query.masks import apply_mask3d, recolor, segment_by_opacity
from tpugs.query.text import get_mask3d, get_mask2d, score_features
from tpugs.utils.synthetic import random_scene


def test_score_features_cosine():
    f = jnp.array([[1.0, 0.0], [0.0, 2.0], [1.0, 1.0]])
    q = jnp.array([[1.0, 0.0]])
    s = np.asarray(score_features(f, q))
    np.testing.assert_allclose(s[:, 0], [1.0, 0.0, np.sqrt(0.5)], atol=1e-6)


def test_get_mask3d_pos_vs_neg():
    rng = np.random.default_rng(0)
    pos_dir = np.array([1.0, 0, 0, 0])
    neg_dir = np.array([0, 1.0, 0, 0])
    feats = np.stack([pos_dir] * 5 + [neg_dir] * 7).astype(np.float32)
    feats += 0.01 * rng.normal(size=feats.shape).astype(np.float32)
    mask, inv = get_mask3d(
        jnp.asarray(feats),
        jnp.asarray(pos_dir[None].astype(np.float32)),
        jnp.asarray(neg_dir[None].astype(np.float32)),
    )
    assert np.asarray(mask).tolist() == [True] * 5 + [False] * 7
    assert np.array_equal(np.asarray(inv), ~np.asarray(mask))


def test_get_mask3d_threshold():
    feats = jnp.array([[1.0, 0.0], [0.6, 0.8]])
    pos = jnp.array([[1.0, 0.0]])
    neg = jnp.array([[0.0, 1.0]])
    mask, _ = get_mask3d(feats, pos, neg, threshold=0.9)
    assert np.asarray(mask).tolist() == [True, False]


def test_get_mask2d_shape():
    img = jnp.asarray(
        np.random.default_rng(0).normal(size=(8, 10, 4)).astype(np.float32)
    )
    m = get_mask2d(img, img[0, :1], img[1, :1])
    assert m.shape == (8, 10)


def test_apply_mask3d_partitions():
    scene = random_scene(20, seed=1)
    mask = np.zeros(20, bool)
    mask[:8] = True
    ext, dele, masked = apply_mask3d(scene, mask)
    assert ext.num_gaussians == 8
    assert dele.num_gaussians == 12
    assert masked.num_gaussians == 20
    np.testing.assert_allclose(np.asarray(masked.sh0[:8]), 1.0)
    np.testing.assert_allclose(np.asarray(masked.sh0[8:]), 0.0)
    np.testing.assert_allclose(np.asarray(masked.shN[8:]), 0.0)


def test_segment_by_opacity_hides_unmasked():
    scene = random_scene(10, seed=2)
    mask = np.array([True] * 4 + [False] * 6)
    out = segment_by_opacity(scene, mask)
    assert np.all(np.asarray(out.opacities[4:]) < 1e-10)
    np.testing.assert_allclose(
        np.asarray(out.opacities[:4]), np.asarray(scene.opacities[:4])
    )


def test_recolor_tints_masked():
    scene = random_scene(6, seed=3)
    mask = np.array([True, False] * 3)
    out = recolor(scene, mask, (1.0, 0.0, 0.0))
    C0 = 0.2820947917738781
    colors = np.asarray(out.sh0[:, 0, :]) * C0 + 0.5
    # masked entries: green/blue forced to 0
    np.testing.assert_allclose(colors[mask][:, 1:], 0.0, atol=1e-6)
    # unmasked unchanged
    np.testing.assert_allclose(
        np.asarray(out.sh0[~mask]), np.asarray(scene.sh0[~mask]), atol=1e-6
    )


def test_knn_exact():
    bank = jnp.eye(5)
    q = jnp.array([[0.9, 0.1, 0, 0, 0.0]])
    scores, idx = knn_search(q, bank, k=2)
    assert idx[0, 0] == 0 and idx[0, 1] == 1
    np.testing.assert_allclose(np.asarray(scores[0]), [0.9, 0.1], atol=1e-6)


def test_transfer_labels_majority():
    rng = np.random.default_rng(0)
    # bank: two clusters in feature space with labels 0 / 3
    c0 = rng.normal(size=(20, 8)) * 0.05 + np.eye(8)[0]
    c1 = rng.normal(size=(20, 8)) * 0.05 + np.eye(8)[3]
    bank = jnp.asarray(np.concatenate([c0, c1]).astype(np.float32))
    labels = jnp.asarray(np.array([0] * 20 + [3] * 20, np.int32))
    q = jnp.asarray(np.stack([np.eye(8)[0], np.eye(8)[3]]).astype(np.float32))
    out = transfer_labels(q, bank, labels, k=5, num_classes=8)
    assert np.asarray(out).tolist() == [0, 3]


def test_codec_learns_reconstruction():
    rng = np.random.default_rng(0)
    # 40 embeddings on a 10-d subspace of 64-d space: a 16-d codec can
    # reconstruct nearly perfectly.
    basis = rng.normal(size=(10, 64))
    emb = rng.normal(size=(40, 10)) @ basis
    codec, loss = train_codec(
        jnp.asarray(emb.astype(np.float32)), d_lat=16, steps=3000, lr=1e-2
    )
    assert loss < 0.01
    x = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    z = np.asarray(codec.compress(jnp.asarray(x.astype(np.float32))))
    y = np.asarray(codec.decompress(jnp.asarray(z)))
    y = y / np.linalg.norm(y, axis=1, keepdims=True)
    cos = np.sum(x * y, axis=1)
    assert cos.mean() > 0.95


def test_codec_roundtrip_io(tmp_path):
    from tpugs.codec.linear import load_codec, save_codec

    codec = LinearCodec.init(32, 4, seed=1)
    p = str(tmp_path / "codec.npz")
    save_codec(codec, p)
    back = load_codec(p)
    np.testing.assert_allclose(
        np.asarray(codec.encoder), np.asarray(back.encoder)
    )
    x = jnp.asarray(np.random.default_rng(0).normal(size=(3, 32)), jnp.float32)
    assert float(codec_loss(back, x / jnp.linalg.norm(x, axis=1, keepdims=True))) >= 0
