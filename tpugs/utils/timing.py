"""Robust TPU timing under the remote (axon) backend.

Two hazards make naive timing wrong here:
  * ``block_until_ready`` does not reliably force execution — only a
    device-to-host read does;
  * repeated dispatch of an identical (executable, inputs) pair can be
    served from a result cache, and the tunnel occasionally stalls for
    seconds on a transfer.

``measure`` therefore perturbs a dummy scalar input each iteration,
forces a one-element read per iteration, and reports the MEDIAN over
several iterations (robust to stall outliers).
"""

from __future__ import annotations

import statistics
import time
from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp


def measure(
    fn: Callable,
    *args,
    iters: int = 5,
    warmup: int = 1,
    name: str = "",
    verbose: bool = False,
) -> float:
    """Median seconds per call of ``fn(epsilon, *args)``.

    ``fn`` must accept a leading scalar (uint32) it folds into the
    computation in a non-constant-foldable way (e.g. xor into an int
    input or add-as-float-zero), so every dispatch is unique.
    """
    jfn = jax.jit(fn)

    def run(i):
        out = jfn(jnp.uint32(i), *args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(jax.device_get(leaf.ravel()[:1]))  # force execution

    for i in range(warmup):
        run(i + 1)
    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        run(i + 100)
        times.append(time.perf_counter() - t0)
    med = statistics.median(times)
    if verbose:
        print(
            f"{name}: median {med*1000:.1f} ms over {iters} "
            f"(min {min(times)*1000:.1f}, max {max(times)*1000:.1f})",
            flush=True,
        )
    return med
