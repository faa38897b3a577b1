"""Open-vocabulary 3D segmentation by feature scoring (reference L4).

``get_mask3d_lseg`` in the reference (``segment.py:26-61``, duplicated in
``segment_compressed.py``, ``segment_f3dgs.py``, ``viewer_with_llm.py``)
tokenizes "pos;neg" prompts through the CLIP text tower and compares
cosine scores against per-Gaussian features. Here the scoring core is
decoupled from the text encoder: any (P, D) query matrix works — CLIP
text embeddings, clicked-pixel features (``click_and_segment.py:313-321``),
or exemplar vectors. The N×P score is a single MXU matmul.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _l2norm(x: jax.Array, axis: int = -1) -> jax.Array:
    return x / (jnp.linalg.norm(x, axis=axis, keepdims=True) + 1e-12)


def score_features(features: jax.Array, queries: jax.Array) -> jax.Array:
    """Cosine scores (N, P) between per-Gaussian features (N, D) and
    query vectors (P, D) — reference ``segment.py:54-55``."""
    f = _l2norm(features)
    q = _l2norm(queries)
    return jnp.einsum(
        "nd,pd->np", f, q, precision=jax.lax.Precision.HIGHEST
    )


def get_mask3d(
    features: jax.Array,
    pos_queries: jax.Array,  # (P+, D)
    neg_queries: jax.Array,  # (P-, D)
    threshold: Optional[float] = None,
) -> Tuple[jax.Array, jax.Array]:
    """mask = max over positive scores > max over negative scores,
    optionally AND score vs the first positive query > threshold
    (reference ``segment.py:56-59``). Returns (mask, ~mask)."""
    queries = jnp.concatenate([pos_queries, neg_queries], axis=0)
    score = score_features(features, queries)
    p = pos_queries.shape[0]
    mask = jnp.max(score[:, :p], axis=1) > jnp.max(score[:, p:], axis=1)
    if threshold is not None:
        mask = mask & (score[:, 0] > threshold)
    return mask, jnp.logical_not(mask)


def get_mask2d(
    feat_image: jax.Array,  # (H, W, D) rendered feature image
    pos_queries: jax.Array,
    neg_queries: jax.Array,
) -> jax.Array:
    """Per-pixel mask from a rendered feature image (reference
    ``segment.py:221-224``)."""
    H, W, D = feat_image.shape
    m, _ = get_mask3d(feat_image.reshape(-1, D), pos_queries, neg_queries)
    return m.reshape(H, W)
