"""Map the TPU random-row gather rate vs row width at garden scale.

Round-4 measured two points (64-B rows: 62 M rows/s; 1.28-KB rows:
34 M rows/s) — consistent with EITHER a per-row engine approaching
bandwidth saturation OR a latency wall that wider rows would amortize
further. This sweeps row widths at constant total bytes to find where
the gather becomes bandwidth-bound; if 2.5-KB rows run materially
faster per byte, pairing/wider-row layouts become worth designing for.

Run on TPU:  timeout 1800 python scripts/exp_gather_width.py
"""

import os as _os
import sys as _sys

_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO_ROOT not in _sys.path:
    _sys.path.insert(0, _REPO_ROOT)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from tpugs.utils.timing import measure


def main():
    print(f"device: {jax.devices()[0].platform}", flush=True)
    total_bytes = 2.0e9  # ~ the reduce's gathered volume at garden scale
    rng = np.random.default_rng(0)
    for cols, dtype in (
        (32, jnp.bfloat16),     # 64 B
        (320, jnp.bfloat16),    # 640 B
        (640, jnp.bfloat16),    # 1.28 KB (the production row)
        (1280, jnp.bfloat16),   # 2.56 KB
        (2560, jnp.bfloat16),   # 5.12 KB
        (640, jnp.float32),     # 2.56 KB via dtype
    ):
        itemsize = 2 if dtype == jnp.bfloat16 else 4
        row_b = cols * itemsize
        rows = int(total_bytes / row_b)
        # source sized for out-of-cache random access but bounded so
        # src + gathered + idx stay well under the 15.75-GB HBM
        src_rows = min(max(rows, 1 << 20), int(4.0e9 / row_b))
        src = jnp.asarray(
            rng.standard_normal((8, cols)).astype(np.float32)
        ).astype(dtype)
        src = jnp.tile(src, (src_rows // 8 + 1, 1))[:src_rows]
        idx = jnp.asarray(
            rng.integers(0, src_rows, rows).astype(np.int32)
        )

        def f(eps, s, i):
            ii = i + (eps * jnp.uint32(0)).astype(jnp.int32)
            g = s[ii]
            return g[::997, :8].astype(jnp.float32).sum()

        def wrap(eps, args):
            return f(eps, *args)

        t = measure(wrap, (src, idx), iters=3,
                    name=f"gather[{row_b}B x {rows}]", verbose=True)
        print(
            f"  -> {rows / t / 1e6:.1f} M rows/s, "
            f"{rows * row_b / t / 1e9:.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
