"""Does index locality change the TPU row-gather rate?

The fused pipeline pays the random-row wall twice per view: the pack
gather (T rows of 64 B from the (N, 16) param table) and the reduce
gather (slot rows of ~1.3 KB from the contribution buffer). Round 3
measured both at ~43-53 M rows/s "regardless of row bytes" — but all
measurements used the default scene ordering. A Gaussian's tile
neighbours are spatial neighbours, so MORTON-ORDERING the scene makes
each tile's gather indices cluster. If the gather engine / HBM row
buffer rewards clustered addresses, re-ordering the scene once per
scene (free: it is a permutation of the checkpoint) buys back part of
the two largest wall-bound stages.

Measures, at garden scale:
  1. pack-shaped gather (64-B rows): uniform-random vs real-plan
     indices (default scene) vs real-plan indices (Morton scene)
     vs sorted.
  2. reduce-shaped gather (1.3-KB rows): same four index patterns.

Run on TPU:  timeout 1200 python scripts/exp_gather_locality.py
"""

import os as _os
import sys as _sys

_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO_ROOT not in _sys.path:
    _sys.path.insert(0, _REPO_ROOT)

import functools
import json

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from tpugs.raster.pallas_tiled import PallasSizes, build_plan_pure
from tpugs.raster.projection import ProjectionConfig
from tpugs.utils.synthetic import orbit_cameras, random_scene
from tpugs.utils.order import morton_permutation, permute_scene
from tpugs.utils.timing import measure

import argparse

_ap = argparse.ArgumentParser()
_ap.add_argument("--num-gaussians", type=int, default=2**19)
_ap.add_argument("--width", type=int, default=1296)
_ap.add_argument("--height", type=int, default=840)
_args = _ap.parse_args()
N, W, H = _args.num_gaussians, _args.width, _args.height
TS = 32


def load_sizes(scene, cams):
    key = f"n{N}_w{W}_h{H}_t{TS}_v4_s3_e3"
    try:
        d = json.load(open(_os.path.join(_REPO_ROOT, "bench_sizes.json")))
        e = dict(d[key])
        e["cover_caps"] = tuple(e["cover_caps"])
        e["classes"] = tuple(tuple(c) for c in e["classes"])
        return PallasSizes(**e)
    except (OSError, KeyError):
        from tpugs.lift.pallas_batch import estimate_sizes_pallas

        return estimate_sizes_pallas(scene, cams, tile_size=TS)


@functools.partial(jax.jit, static_argnames=("rows", "width"))
def gather_rows(table, idx, rows, width):
    return jnp.sum(table[idx], axis=0, dtype=jnp.float32)


def time_gather(table, idx, label):
    rows = int(idx.shape[0])
    width = int(table.shape[1])

    def g(eps, t):
        # fold eps into the indices (dtype-preserving) so each dispatch
        # is unique without widening the gathered table
        i = idx ^ (eps * jnp.uint32(0)).astype(jnp.int32)
        return gather_rows(t, i, rows, width)

    t = measure(g, table, iters=3, name=label, verbose=True)
    bytes_ = rows * width * table.dtype.itemsize
    print(
        f"  -> {rows / t / 1e6:.1f} M rows/s, {bytes_ / t / 1e9:.1f} GB/s",
        flush=True,
    )
    return rows / t


def main():
    print(f"device: {jax.devices()[0].platform}", flush=True)
    pc = ProjectionConfig()
    cams = orbit_cameras(4, W, H, radius=3.0)
    rng = np.random.default_rng(0)

    scene = random_scene(N, seed=0, extent=1.0, scale_range=(0.004, 0.02))
    sizes = load_sizes(scene, cams)
    scene_m = permute_scene(scene, morton_permutation(scene))

    plans = {}
    for name, sc in (("default", scene), ("morton", scene_m)):
        plans[name] = jax.jit(
            lambda m, q, s, o: build_plan_pure(
                m, q, s, o, cams.viewmats[0], cams.Ks[0], W, H, sizes, pc, TS
            )
        )(sc.means, sc.quats, sc.scales, sc.opacities)

    T = sizes.T_padded
    # ---- pack-shaped gather: 16 f32 (64 B) rows from an (N+1)-table
    print("\n== pack-shaped gather: (N,16) f32 table, T indices ==")
    table_s = jnp.asarray(rng.normal(size=(N + 1, 16)).astype(np.float32))
    idx_rand = jnp.asarray(rng.integers(0, N, (T,)).astype(np.int32))
    idx_sort = jnp.sort(idx_rand)
    time_gather(table_s, idx_rand, "pack[uniform-random]")
    time_gather(table_s, idx_sort, "pack[sorted]")
    for name in ("default", "morton"):
        plan = plans[name]
        # the composed pack index (pack_isect_all): slot -> ORIGINAL id
        order_ext = jnp.concatenate(
            [plan.order.astype(jnp.int32), jnp.full((1,), N, jnp.int32)]
        )
        idx = order_ext[jnp.minimum(plan.padded_gid, N)]
        time_gather(table_s, idx, f"pack[plan-{name}]")

    # ---- reduce-shaped gather: 640 bf16 (1.28 KB) rows from a T-table
    print("\n== reduce-shaped gather: (T+128, 640) bf16 table ==")
    table_b = jnp.asarray(
        rng.normal(size=(T + 128, 640)).astype(np.float32)
    ).astype(jnp.bfloat16)
    for name in ("default", "morton"):
        plan = plans[name]
        caps = plan.cover_caps
        cover, n = plan.slots.shape

        def cap_of(j):
            c = caps[j] if j < len(caps) else n
            return min(max(int(c), 1), n)

        parts = [
            jax.lax.slice_in_dim(plan.slots[j : j + 1], 0, cap_of(j), axis=1
                                 ).reshape(-1)
            for j in range(cover)
        ]
        flat = jnp.concatenate(parts)
        time_gather(table_b, flat, f"reduce[slots-{name}]")
    r = int(sum(cap_of(j) for j in range(cover)))
    idx_rand_b = jnp.asarray(rng.integers(0, T, (r,)).astype(np.int32))
    time_gather(table_b, idx_rand_b, "reduce[uniform-random]")
    time_gather(table_b, jnp.sort(idx_rand_b), "reduce[sorted]")


if __name__ == "__main__":
    main()
