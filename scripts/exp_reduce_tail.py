"""Attribute the in-situ reduce cost (ablate_full r5: ~94 ms/view vs
the ~57 ms gather floor) between its three passes — the slot-prefix row
gather, the stripe-sum kernel, and the inverse-permutation back to
original Gaussian order — and A/B cheaper tails:

  gather-only     contribs[flat] + a 1-row touch (the irreducible pass)
  stripe          gather + stripe-sum kernel, NO unpermute (scrambled out)
  full            the production reduce_contribs_pallas
  slice-unperm    slice acc to D+1=513 cols BEFORE the unpermute gather
  bf16-unperm     unpermute in bf16 (halves the scattered-read bytes)
  scatter-acc     accumulate into the (N, D) output with a unique-indices
                  scatter-add instead of gather-unpermute + add (models
                  the grouped loop's `num += fs`)

Run on TPU:  timeout 2400 python scripts/exp_reduce_tail.py
"""

import os as _os
import sys as _sys

_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO_ROOT not in _sys.path:
    _sys.path.insert(0, _REPO_ROOT)

import json

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpugs.raster.binning import cdiv
from tpugs.raster.pallas_tiled import (
    BLOCK,
    PallasSizes,
    _make_stripe_sum_kernel,
    _reduce_groups,
    build_plan_pure,
    reduce_contribs_pallas,
)
from tpugs.lift.pallas_batch import DEFAULT_TILE, estimate_sizes_pallas
from tpugs.raster.projection import ProjectionConfig
from tpugs.utils.synthetic import orbit_cameras, random_scene
from tpugs.utils.timing import measure


def _gather_and_stripe(contribs, plan, interpret=False):
    """The production reduce minus the unpermute: returns acc in
    cover-rank (scrambled) order plus the pieces the tails need."""
    slots = plan.slots
    cover, n = slots.shape
    D = contribs.shape[-1]
    n_pad = cdiv(max(n, 1), BLOCK) * BLOCK
    if n_pad != n:
        slots = jnp.pad(
            slots, ((0, 0), (0, n_pad - n)), constant_values=plan.T_padded
        )
    n_blocks = n_pad // BLOCK
    cover_caps = plan.cover_caps

    def cap_of(j):
        cap = cover_caps[j] if j < len(cover_caps) else n
        return min(max(int(cap), 1), n)

    groups = _reduce_groups([cap_of(j) for j in range(cover)], cover, n_pad)
    idx_parts = []
    base = 0
    stripe_offs = []
    for (j0, j1, cap) in groups:
        k = j1 - j0
        idx_parts.append(
            jax.lax.slice_in_dim(slots[j0:j1], 0, cap, axis=1).reshape(-1)
        )
        for j in range(k):
            stripe_offs.append((base + j * cap, cap))
        base += k * cap
    flat = jnp.concatenate(idx_parts) if len(idx_parts) > 1 else idx_parts[0]
    gathered = contribs[flat]
    acc = pl.pallas_call(
        _make_stripe_sum_kernel(D, tuple(stripe_offs)),
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((BLOCK, D), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad, D), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, BLOCK, D), contribs.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(gathered)
    return acc[:n], flat


def main():
    N, W, H, D = 2**19, 1296, 840, 640
    Dk = 513  # D_feat + ones channel actually consumed downstream
    print(f"device: {jax.devices()[0].platform}", flush=True)
    scene = random_scene(N, seed=0, extent=1.0, scale_range=(0.004, 0.02))
    cams = orbit_cameras(4, W, H, radius=3.0)
    pc = ProjectionConfig()
    key = f"n{N}_w{W}_h{H}_t{DEFAULT_TILE}_v4_s3_e3"
    cache = _os.path.join(_REPO_ROOT, "bench_sizes.json")
    sizes = None
    if _os.path.exists(cache):
        d = json.load(open(cache))
        if key in d:
            e = dict(d[key])
            e["cover_caps"] = tuple(e["cover_caps"])
            e["classes"] = tuple(tuple(c) for c in e["classes"])
            sizes = PallasSizes(**e)
    if sizes is None:
        sizes = estimate_sizes_pallas(scene, cams, probe_stride=2,
                                      tile_size=DEFAULT_TILE)

    plan = jax.jit(
        build_plan_pure,
        static_argnames=("width", "height", "sizes", "proj_config",
                         "tile_size"),
    )(
        scene.means, scene.quats, scene.scales, scene.opacities,
        cams.viewmats[0], cams.Ks[0], width=W, height=H, sizes=sizes,
        proj_config=pc, tile_size=DEFAULT_TILE,
    )
    jax.block_until_ready(plan.slots)
    n = plan.slots.shape[1]

    rng = np.random.default_rng(0)
    contribs = jnp.asarray(
        rng.standard_normal((sizes.T_padded + 128, D)).astype(np.float32)
    ).astype(jnp.bfloat16)
    rows = int(np.sum([c * s for c, s in sizes.classes]))
    caps_rows = 0
    cover, _ = plan.slots.shape
    caps = [
        min(max(int(plan.cover_caps[j]), 1), n)
        if j < len(plan.cover_caps) else n
        for j in range(cover)
    ]
    for (j0, j1, cap) in _reduce_groups(caps, cover, cdiv(n, BLOCK) * BLOCK):
        caps_rows += (j1 - j0) * cap
    print(
        f"T_padded={sizes.T_padded} gathered_rows={caps_rows} "
        f"({caps_rows * D * 2 / 1e9:.2f} GB bf16) unperm_bytes="
        f"{n * D * 4 / 1e9:.2f} GB f32", flush=True)

    def wrap(f):
        def g(eps, c):
            cc = c + (eps * jnp.uint32(0)).astype(c.dtype)
            out = f(cc)
            return out
        return g

    inv = jnp.zeros((n,), jnp.int32).at[plan.slot_order].set(
        jnp.arange(n, dtype=jnp.int32)
    )

    def f_gather_only(cc):
        _, flat = None, None
        # indices identical to production; touch one row per stripe so
        # the gather isn't DCE'd but no reduction happens
        acc, flat = None, None
        slots = plan.slots
        cover, nn = slots.shape
        caps_l = [
            min(max(int(plan.cover_caps[j]), 1), nn)
            if j < len(plan.cover_caps) else nn
            for j in range(cover)
        ]
        groups = _reduce_groups(caps_l, cover, cdiv(nn, BLOCK) * BLOCK)
        idx_parts = []
        for (j0, j1, cap) in groups:
            idx_parts.append(
                jax.lax.slice_in_dim(
                    jnp.pad(slots, ((0, 0), (0, cdiv(nn, BLOCK) * BLOCK - nn)),
                            constant_values=plan.T_padded)[j0:j1],
                    0, cap, axis=1,
                ).reshape(-1)
            )
        flat = jnp.concatenate(idx_parts)
        g = cc[flat]
        return g[::997, :8].astype(jnp.float32).sum()

    def f_stripe(cc):
        acc, _ = _gather_and_stripe(cc, plan)
        return acc

    def f_full(cc):
        return reduce_contribs_pallas(cc, plan)

    def f_slice_unperm(cc):
        acc, _ = _gather_and_stripe(cc, plan)
        return jax.lax.slice_in_dim(acc, 0, Dk, axis=1)[inv]

    def f_bf16_unperm(cc):
        acc, _ = _gather_and_stripe(cc, plan)
        return jax.lax.slice_in_dim(acc, 0, Dk, axis=1).astype(
            jnp.bfloat16
        )[inv].astype(jnp.float32)

    def f_scatter_acc(cc):
        acc, _ = _gather_and_stripe(cc, plan)
        out = jnp.zeros((n, Dk), jnp.float32)
        return out.at[plan.slot_order].add(
            jax.lax.slice_in_dim(acc, 0, Dk, axis=1), unique_indices=True
        )

    for name, f in (
        ("gather-only", f_gather_only),
        ("stripe", f_stripe),
        ("full", f_full),
        ("slice-unperm", f_slice_unperm),
        ("bf16-unperm", f_bf16_unperm),
        ("scatter-acc", f_scatter_acc),
    ):
        t = measure(wrap(f), contribs, iters=3, name=name, verbose=True)
        print(f"  -> {t * 1e3:.1f} ms", flush=True)

    # numeric check: slice-unperm == full[:, :Dk]
    a = np.asarray(jax.jit(f_full)(contribs)[:, :Dk])
    b = np.asarray(jax.jit(f_slice_unperm)(contribs))
    print(f"slice-unperm max err: {np.abs(a - b).max():.3e}", flush=True)
    c = np.asarray(jax.jit(f_scatter_acc)(contribs))
    print(f"scatter-acc  max err: {np.abs(a - c).max():.3e}", flush=True)


if __name__ == "__main__":
    main()
