"""Exact inner-product k-NN + label transfer.

The reference uses faiss ``IndexFlatIP`` (C++, CPU) for exact 5-NN /
20-NN over 1024-d DINO features plus a majority vote per Gaussian
(``affordance_transfer/demo_affordance_transfer.py:1377-1396``). On TPU,
exact IP search over a dense exemplar bank is just a matmul feeding
``jax.lax.top_k`` — MXU-native, batched, no external library.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("k",))
def knn_search(
    queries: jax.Array,  # (Q, D)
    bank: jax.Array,  # (M, D)
    k: int = 5,
) -> Tuple[jax.Array, jax.Array]:
    """Exact inner-product top-k. Returns (scores (Q, k), idx (Q, k))."""
    sims = jnp.einsum(
        "qd,md->qm", queries, bank, precision=jax.lax.Precision.HIGHEST
    )
    return jax.lax.top_k(sims, k)


@functools.partial(jax.jit, static_argnames=("k", "num_classes"))
def transfer_labels(
    queries: jax.Array,  # (Q, D)
    bank: jax.Array,  # (M, D)
    bank_labels: jax.Array,  # (M,) int
    k: int = 5,
    num_classes: int = 8,
) -> jax.Array:
    """k-NN majority vote label transfer (reference faiss+vote loop,
    demo_affordance_transfer.py:1377-1396). Returns (Q,) labels."""
    _, idx = knn_search(queries, bank, k)
    votes = bank_labels[idx]  # (Q, k)
    one_hot = jax.nn.one_hot(votes, num_classes, dtype=jnp.float32)
    counts = jnp.sum(one_hot, axis=1)  # (Q, C)
    return jnp.argmax(counts, axis=-1)
