"""A/B the fused Pallas gather-reduce kernel vs the XLA slot-table
reduce at the canonical garden shape.

Run on TPU:  timeout 1800 python scripts/exp_reduce_pallas.py
"""

import os as _os
import sys as _sys

_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO_ROOT not in _sys.path:
    _sys.path.insert(0, _REPO_ROOT)

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from tpugs.lift.pallas_batch import DEFAULT_TILE, estimate_sizes_pallas
from tpugs.raster.pallas_tiled import (
    PallasSizes,
    build_plan_pure,
    reduce_contribs,
    reduce_contribs_pallas,
)
from tpugs.raster.projection import ProjectionConfig
from tpugs.utils.synthetic import orbit_cameras, random_scene
from tpugs.utils.timing import measure


def main():
    N, W, H, D = 2**19, 1296, 840, 640
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
    print(f"sizes: {sizes}", flush=True)

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

    rng = np.random.default_rng(0)
    contribs = jnp.asarray(
        rng.standard_normal((sizes.T_padded + 128, D)).astype(np.float32)
    ).astype(jnp.bfloat16)
    rows = int(np.sum([c * s for c, s in sizes.classes]))
    print(f"T_padded={sizes.T_padded} rows_to_gather~{rows} "
          f"bytes~{rows * D * 2 / 1e9:.2f} GB", flush=True)

    def f_xla(eps, c):
        cc = c + (eps * jnp.uint32(0)).astype(c.dtype)
        return reduce_contribs(cc, plan)

    def f_pallas(eps, c):
        cc = c + (eps * jnp.uint32(0)).astype(c.dtype)
        return reduce_contribs_pallas(cc, plan)

    t0 = time.time()
    a = jax.block_until_ready(jax.jit(f_pallas)(jnp.uint32(0), contribs))
    print(f"pallas first call (compile): {time.time()-t0:.1f}s", flush=True)
    b = jax.block_until_ready(jax.jit(f_xla)(jnp.uint32(0), contribs))
    err = float(jnp.max(jnp.abs(a - b)))
    denom = float(jnp.max(jnp.abs(b))) + 1e-9
    print(f"max abs diff vs XLA reduce: {err:.4g} (rel {err/denom:.2e})",
          flush=True)

    t = measure(f_xla, contribs, iters=3, name="reduce XLA", verbose=True)
    print(f"  -> {rows / t / 1e6:.1f} M rows/s, "
          f"{rows * D * 2 / t / 1e9:.1f} GB/s", flush=True)
    t = measure(f_pallas, contribs, iters=3, name="reduce PALLAS",
                verbose=True)
    print(f"  -> {rows / t / 1e6:.1f} M rows/s, "
          f"{rows * D * 2 / t / 1e9:.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
