"""Standalone adjoint-kernel A/B: VPU lane-cumprod prefix vs the
log-space MXU triangular-matmul prefix (``mxu_prefix``), both bf16, at
the canonical garden shape. Also times the render kernel both ways.

Round-4 context: the fused headline barely moved when the MXU prefix
landed; this isolates whether the adjoint kernel itself got faster and
how far it sits from its floor.

Run on TPU:  timeout 1200 python scripts/exp_adjoint_ab.py
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

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from tpugs.lift.pallas_batch import DEFAULT_TILE
from tpugs.raster.api import _prepare_colors
from tpugs.raster.pallas_tiled import (
    PallasSizes,
    adjoint_pallas_raw,
    build_plan_pure,
    pack_isect_all,
    render_pallas_raw,
)
from tpugs.raster.projection import ProjectionConfig, project
from tpugs.utils.synthetic import orbit_cameras, random_scene
from tpugs.utils.timing import measure

N, W, H, D = 2**19, 1296, 840, 512
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
    cams = orbit_cameras(4, W, H, radius=3.0)
    sizes = load_sizes()
    pc = ProjectionConfig()
    vm, K = cams.viewmats[0], cams.Ks[0]

    @jax.jit
    def prep(sc):
        plan = build_plan_pure(
            sc.means, sc.quats, sc.scales, sc.opacities, vm, K, W, H,
            sizes, pc, TS,
        )
        proj = project(sc.means, sc.quats, sc.scales, sc.opacities,
                       vm, K, W, H, pc)
        cols3 = _prepare_colors(sc.means, sc.colors_all, vm, sc.sh_degree)
        packed = pack_isect_all(proj, cols3, plan)
        return plan, packed

    plan, packed = jax.block_until_ready(prep(scene))
    ntx = (W + TS - 1) // TS
    nty = (H + TS - 1) // TS
    n_tiles = ntx * nty
    tspx = TS * TS
    key = jax.random.PRNGKey(0)
    ft = jax.random.normal(key, (n_tiles, tspx, D), jnp.bfloat16) * 0.1
    print(f"T_padded={plan.T_padded} n_tiles={n_tiles}", flush=True)

    # adjoint A/B (production shape: feat_cols path, d_chunk=640)
    for mxu in (False, True):
        @functools.partial(jax.jit, static_argnames=())
        def adj(eps, packed, ft, mxu=mxu):
            p = packed + (eps * jnp.uint32(0)).astype(jnp.float32)
            out = adjoint_pallas_raw(
                p, ft, plan, out_dtype=jnp.bfloat16, d_chunk=640,
                feat_cols=D, mxu_prefix=mxu,
            )
            return out[0, 0]

        t = measure(lambda e, a, b: adj(e, a, b), packed, ft, iters=5,
                    name=f"adjoint[mxu_prefix={mxu}]", verbose=True)
        gb = (plan.T_padded + 128) * 640 * 2 / 1e9
        fl = 2 * plan.T_padded * tspx * 640 / 1e12
        print(f"  -> {t*1e3:.1f} ms; contrib-write {gb:.2f} GB "
              f"({gb/t:.0f} GB/s); matmul {fl:.2f} TFLOP "
              f"({fl/t:.0f} TFLOP/s)", flush=True)

    # render A/B
    for mxu in (False, True):
        @jax.jit
        def ren(eps, packed, mxu=mxu):
            p = packed + (eps * jnp.uint32(0)).astype(jnp.float32)
            tiles = render_pallas_raw(p, plan, 4, False, mxu_prefix=mxu)
            return tiles[0, 0, 0]

        t = measure(lambda e, a: ren(e, a), packed, iters=5,
                    name=f"render[mxu_prefix={mxu}]", verbose=True)
        print(f"  -> {t*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
