"""In-situ stage costs of the fused back-projection: time the REAL
grouped dispatch with one stage ablated at a time. Standalone stage
timings (profile_stages.py) over-estimate recoverable time because XLA
fuses/overlaps stages inside the full program; an ablation measures
what actually disappears.

Run on TPU:  timeout 1800 python scripts/ablate_full.py
"""

import os as _os
import sys as _sys

_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO_ROOT not in _sys.path:
    _sys.path.insert(0, _REPO_ROOT)

import functools
import json

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from tpugs.encoders.base import LinearRGBEncoder
from tpugs.lift.pallas_batch import DEFAULT_TILE
from tpugs.raster.api import _prepare_colors
from tpugs.raster.pallas_tiled import (
    PallasSizes,
    backproject_view_pallas,
    build_plan_pure,
    pack_isect_all,
    render_pallas_raw,
    reduce_contribs_pallas,
    adjoint_pallas_raw,
)
from tpugs.raster.projection import ProjectionConfig, project
from tpugs.utils.synthetic import orbit_cameras, random_scene
from tpugs.utils.timing import measure

N, W, H, D, G = 2**19, 1296, 840, 512, 4
TS = DEFAULT_TILE


def load_sizes():
    key = f"n{N}_w{W}_h{H}_t{TS}_v4_s3_e3"
    d = json.load(open(_os.path.join(_REPO_ROOT, "bench_sizes.json")))
    e = dict(d[key])
    e["cover_caps"] = tuple(e["cover_caps"])
    e["classes"] = tuple(tuple(c) for c in e["classes"])
    return PallasSizes(**e)


def main():
    print(f"device: {jax.devices()[0].platform}", flush=True)
    scene = random_scene(N, seed=0, extent=1.0, scale_range=(0.004, 0.02))
    cams = orbit_cameras(G, W, H, radius=3.0)
    encoder = LinearRGBEncoder(feature_dim=D)
    sizes = load_sizes()
    pc = ProjectionConfig()
    vms, Ks = cams.viewmats, cams.Ks

    def one_view(sc_means, scene, i, skip):
        """One view of the group with the selected stage ablated."""
        vm, K = vms[i], Ks[i]
        pm = sc_means
        if skip == "plan":
            # identical (un-barriered) plan inputs for every view ->
            # XLA CSEs the four plan subgraphs into one; the timing
            # delta is ~3/4 of the in-situ plan cost.
            vm, K, pm = vms[0], Ks[0], scene.means
        plan = build_plan_pure(
            pm, scene.quats, scene.scales, scene.opacities,
            vm, K, W, H, sizes, pc, TS,
        )
        if skip == "projection":
            # constant-view projection (CSEd across the 4 views like the
            # plan skip) — isolates the pack's SECOND projection pass
            proj = project(scene.means, scene.quats, scene.scales,
                           scene.opacities, vms[0], Ks[0], W, H, pc)
        else:
            proj = project(sc_means, scene.quats, scene.scales,
                           scene.opacities, vms[i], Ks[i], W, H, pc)
        if skip == "sh":
            cols3 = jnp.zeros((N, 3), jnp.float32) + sc_means[0, 0]
        else:
            cols3 = _prepare_colors(sc_means, scene.colors_all, vms[i],
                                    scene.sh_degree)
        if skip == "pack":
            # constant packed table (wrong values, right shapes/layout)
            packed = jnp.zeros((16, sizes.T_padded), jnp.float32) + cols3[0, 0]
        else:
            packed = pack_isect_all(proj, cols3, plan)
        if skip == "render":
            ntx, nty = (W + TS - 1) // TS, (H + TS - 1) // TS
            tiles = (
                jnp.zeros((ntx * nty, TS * TS, 5), jnp.float32)
                + packed[0, 0]
            )
        else:
            tiles = render_pallas_raw(packed, plan, 4, False)
        if skip == "encoder":
            ft = jnp.broadcast_to(
                tiles[..., :1], tiles.shape[:2] + (D,)
            ).astype(jnp.bfloat16)
        else:
            ft = encoder(tiles[..., :3])
        if skip == "adjoint+reduce":
            # stand-in with the right shapes, no adjoint/reduce work
            fs = jnp.zeros((N, D), jnp.float32) + jnp.sum(ft[0, 0, :])
            ws = jnp.zeros((N,), jnp.float32) + plan.padded_gid[0]
            return fs, ws
        fs, ws = backproject_view_pallas(
            sc_means, scene.quats, scene.scales, scene.opacities,
            viewmat=vms[i], K=Ks[i], plan=plan, d_chunk=640,
            proj_config=pc, contrib_dtype=jnp.bfloat16,
            reduce_engine="xla" if skip == "pallas-reduce" else "pallas",
            feat_image=None, feat_tiles=ft,
        ) if skip != "reduce" else _adjoint_only(packed, ft, plan)
        return fs, ws

    def _adjoint_only(packed, ft, plan):
        from tpugs.raster.binning import cdiv
        ones = jnp.ones(ft.shape[:2] + (1,), jnp.bfloat16)
        pad = jnp.zeros(ft.shape[:2] + (640 - D - 1,), jnp.bfloat16)
        chunk = jnp.concatenate([ones, ft.astype(jnp.bfloat16), pad], -1)
        contribs = adjoint_pallas_raw(packed, chunk, plan,
                                      out_dtype=jnp.bfloat16)
        # cheap stand-in for the reduce: one row broadcast
        fs = jnp.zeros((N, D), jnp.float32) + contribs[0, 1:D + 1]
        ws = jnp.zeros((N,), jnp.float32) + contribs[0, 0]
        return fs, ws

    @functools.partial(jax.jit, static_argnames=("skip",))
    def group(eps, scene, skip):
        m0 = scene.means + (eps * jnp.uint32(0)).astype(jnp.float32)
        num = den = None
        for i in range(G):
            if den is not None:
                m0, num, den = jax.lax.optimization_barrier((m0, num, den))
            fs, ws = one_view(m0, scene, i, skip)
            fs = jax.lax.optimization_barrier(fs)
            ws = jax.lax.optimization_barrier(ws)
            num = fs if num is None else num + fs
            den = ws if den is None else den + ws
        return num, den

    # Pure dispatch overhead: a trivial program with the same input
    # (scene pytree) and a scalar output, through the same transport.
    @jax.jit
    def nop(eps, sc):
        return sc.means[0, 0] + eps

    t_nop = measure(nop, scene, iters=3, name="dispatch[nop]", verbose=True)
    print(f"  -> {t_nop * 1e3:.1f} ms/dispatch ({t_nop / G * 1e3:.1f} "
          f"ms/view at G={G})", flush=True)

    results = {}
    for skip in ("none", "pallas-reduce", "plan", "encoder", "reduce",
                 "adjoint+reduce", "pack", "render", "projection", "sh"):
        def f(eps, sc, skip=skip):
            return group(eps, sc, skip)[1]

        t = measure(f, scene, iters=3, name=f"group4[skip={skip}]",
                    verbose=True)
        results[skip] = t / G
        print(f"  -> {t / G * 1e3:.1f} ms/view", flush=True)

    base = results["none"]
    print("\nIn-situ cost (ms/view, vs full pipeline):")
    for k, v in results.items():
        if k == "none":
            continue
        print(f"  {k:16s}: {1e3 * (base - v):7.1f}")


if __name__ == "__main__":
    main()
