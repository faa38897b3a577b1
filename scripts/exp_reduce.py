"""Diagnose the slot-table reduce: what does an XLA row gather cost on
this TPU, and what structure makes it fast?

Run: PYTHONPATH="/root/repo:$PYTHONPATH" timeout 1500 python scripts/exp_reduce.py
"""

import os as _os
import sys as _sys

_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO_ROOT not in _sys.path:
    _sys.path.insert(0, _REPO_ROOT)


import numpy as np
import jax
import jax.numpy as jnp

from tpugs.utils.timing import measure

T = 2883584 + 128   # contrib rows (garden-scale T_padded + dummy block)
R = 2 * 1024 * 1024 + 512 * 1024  # gathered rows (~sum of caps)
D = 640

rng = np.random.default_rng(0)
contribs = jnp.asarray(
    rng.standard_normal((T, D), np.float32).astype(np.float16)
).astype(jnp.bfloat16)
flat = jnp.asarray(rng.integers(0, T, R).astype(np.int32))
flat_sorted = jnp.sort(flat)

print(f"T={T} R={R} D={D} bytes_gathered={R*D*2/1e9:.2f} GB", flush=True)


def f_gather(eps, c, idx):
    i = idx ^ (eps * 0)
    rows = c[i]
    return jnp.sum(rows.astype(jnp.float32), axis=0)


t = measure(f_gather, contribs, flat, iters=3, name="gather 640-wide bf16",
            verbose=True)
print(f"  -> {R/t/1e6:.1f} M rows/s, {R*D*2/t/1e9:.1f} GB/s", flush=True)

t = measure(f_gather, contribs, flat_sorted, iters=3,
            name="gather 640-wide bf16 SORTED idx", verbose=True)
print(f"  -> {R/t/1e6:.1f} M rows/s, {R*D*2/t/1e9:.1f} GB/s", flush=True)

# narrow rows: same elements, 5x rows of 128
c_narrow = contribs.reshape(T * 5, 128)
flat5 = (flat[:, None] * 5 + jnp.arange(5, dtype=jnp.int32)[None, :]).reshape(-1)
t = measure(f_gather, c_narrow, flat5, iters=3,
            name="gather 128-wide bf16 (5x rows)", verbose=True)
print(f"  -> {5*R/t/1e6:.1f} M rows/s, {R*D*2/t/1e9:.1f} GB/s", flush=True)

# f32 wide
c32 = contribs.astype(jnp.float32)
t = measure(f_gather, c32, flat, iters=3, name="gather 640-wide f32",
            verbose=True)
print(f"  -> {R/t/1e6:.1f} M rows/s, {R*D*4/t/1e9:.1f} GB/s", flush=True)

# gather + accumulate into (N, D) like the real reduce: 1 big col group
N = 524288
def f_reduce_like(eps, c, idx):
    i = idx ^ (eps * 0)
    rows = c[i].astype(jnp.float32)
    acc = jnp.zeros((N, D), jnp.float32)
    # 5 slices of N-ish rows emulate per-column adds
    per = R // 5
    off = 0
    for j in range(5):
        take = min(per, N)
        acc = acc.at[:take].add(
            jax.lax.dynamic_slice_in_dim(rows, off, take, axis=0)
        )
        off += per
    return acc


t = measure(f_reduce_like, contribs, flat, iters=3,
            name="gather + 5 slice-adds", verbose=True)

# tiny-row gather at the pack scale: (N+1, 8) table, 2.88M rows
table = jnp.asarray(rng.standard_normal((N + 1, 8)).astype(np.float32))
gid = jnp.asarray(rng.integers(0, N, T).astype(np.int32))
def f_pack(eps, tb, idx):
    i = idx ^ (eps * 0)
    return jnp.transpose(tb[i])
t = measure(f_pack, table, gid, iters=3, name="pack-like gather (T, 8) f32",
            verbose=True)
print(f"  -> {T/t/1e6:.1f} M rows/s", flush=True)

# pack-like with 128-wide padded table (is it row-bound or element-bound?)
table128 = jnp.asarray(rng.standard_normal((N + 1, 128)).astype(np.float32))
def f_pack128(eps, tb, idx):
    i = idx ^ (eps * 0)
    return jnp.sum(tb[i], axis=0)
t = measure(f_pack128, table128, gid, iters=3,
            name="gather (T, 128) f32 from small table", verbose=True)
print(f"  -> {T/t/1e6:.1f} M rows/s, {T*128*4/t/1e9:.1f} GB/s", flush=True)
