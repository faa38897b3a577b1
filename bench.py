"""Benchmark: full fused feature back-projection throughput on TPU.

Workload mirrors the reference's headline pipeline (backproject.py on
Mip-NeRF 360 garden @ data_factor=4): garden-resolution images
(1296x840), 512-d per-pixel features, hundreds of thousands of
Gaussians. Per view, the measured unit of work is the complete fused
step: SH render -> 2D encoder -> adjoint accumulation of the 512-d
feature numerator + weight denominator (which the reference implements
as 3 CUDA rasterizations + 2 autograd backwards per view).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is measured views/s over a nominal 2.0 views/s for the
reference CUDA pipeline per-view cost (the repo publishes no numbers —
BASELINE.md; 2 views/s is a generous estimate for an A100 running 3
rasterizations of a ~0.5M-Gaussian scene plus grads at this resolution).

Robustness (round-2, after BENCH_r01 timed out): a watchdog thread
prints the best measurement available when the time budget
(BENCH_BUDGET_S, default 420s) expires, the Pallas size buckets for the
canonical config are loaded from a committed cache (zero probe
dispatches), and a provisional number is recorded right after the first
timed dispatch so even a single completed group produces a valid line.
"""

import argparse
import json
import os
import sys
import threading
import time

import numpy as np

NOMINAL_BASELINE_VIEWS_PER_S = 2.0
_SIZES_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "bench_sizes.json")

_result_lock = threading.Lock()
_best = {"views_per_s": None, "printed": False, "note": "watchdog"}


def _emit(note=""):
    """Print the contract line exactly once."""
    with _result_lock:
        if _best["printed"] or _best["views_per_s"] is None:
            return False
        _best["printed"] = True
        v = _best["views_per_s"]
        print(json.dumps({
            "metric": "fused_lseg512_backprojection_views_per_s",
            "value": round(v, 4),
            "unit": "views/s",
            "vs_baseline": round(v / NOMINAL_BASELINE_VIEWS_PER_S, 4),
        }), flush=True)
        if note:
            print(f"# {note}", flush=True)
        return True


def _record(views_per_s):
    with _result_lock:
        if _best["views_per_s"] is None or views_per_s > _best["views_per_s"]:
            _best["views_per_s"] = views_per_s


def _watchdog(budget_s):
    def fire():
        if _emit(note="watchdog: budget expired, best-so-far emitted"):
            os._exit(0)
        else:
            # No measurement landed at all — exit nonzero so the record
            # shows a failure rather than a silent hang past the driver
            # timeout.
            print("# watchdog: no measurement completed in budget",
                  flush=True)
            os._exit(3)

    t = threading.Timer(budget_s, fire)
    t.daemon = True
    t.start()
    return t


def _sizes_cache_key(args, tile):
    # _e3: ellipse cull + culled-cover caps estimator; margin suffix
    # only for non-default margins (the committed _e3 entries were
    # estimated at the old 1.05 default).
    m = "" if abs(args.margin - 1.05) < 1e-9 else f"_m{args.margin:g}"
    return (f"n{args.num_gaussians}_w{args.width}_h{args.height}"
            f"_t{tile}_v{args.views}_s3_e3{m}")


def _load_or_estimate_sizes(args, scene, cams, tile):
    from tpugs.raster.pallas_tiled import PallasSizes
    from tpugs.lift.pallas_batch import estimate_sizes_pallas

    key = _sizes_cache_key(args, tile)
    try:
        with open(_SIZES_CACHE) as fh:
            cache = json.load(fh)
        if key in cache:
            d = dict(cache[key])
            d["cover_caps"] = tuple(d["cover_caps"])
            d["classes"] = tuple(
                (int(c), int(s)) for c, s in d.get("classes", ())
            )
            # Cached entries were audited when first estimated; skip the
            # (compile-heavy) re-audit inside the driver's timed budget.
            return PallasSizes(**d)
    except (OSError, ValueError, TypeError):
        cache = {}
    sizes = estimate_sizes_pallas(scene, cams, probe_stride=1,
                                  margin=args.margin, tile_size=tile)
    # Freshly estimated buckets at a thin margin: audit every view
    # loudly before anything runs (the kernels clamp DMA bounds, so an
    # undersized bucket would otherwise truncate splats silently —
    # ADVICE r4).
    from tpugs.raster.pallas_tiled import check_pallas_sizes

    check_pallas_sizes(
        scene.means, scene.quats, scene.scales, scene.opacities,
        cams.viewmats, cams.Ks, args.width, args.height, sizes,
        tile_size=tile, raise_on_overflow=True,
    )
    try:
        cache[key] = {**sizes._asdict(),
                      "cover_caps": list(sizes.cover_caps),
                      "classes": [list(cs) for cs in sizes.classes]}
        with open(_SIZES_CACHE, "w") as fh:
            json.dump(cache, fh)
    except OSError:
        pass
    return sizes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-gaussians", type=int, default=2**19)
    ap.add_argument("--width", type=int, default=1296)
    ap.add_argument("--height", type=int, default=840)
    ap.add_argument("--feature-dim", type=int, default=512)
    ap.add_argument("--views", type=int, default=8, help="timed views")
    ap.add_argument("--group", type=int, default=8,
                    help="views per jitted dispatch (amortizes the "
                         "remote transport latency: the ~26 ms nop "
                         "dispatch costs 3.3 ms/view at G=8 vs 6.6 at "
                         "G=4, measured r5)")
    ap.add_argument("--margin", type=float, default=1.01,
                    help="size-bucket margin. The bench probes ALL "
                         "views (probe_stride=1) on a static scene, so "
                         "the probe maxes over exactly the views that "
                         "run and the margin only absorbs compile "
                         "nondeterminism; both row-rate-bound gathers "
                         "scale with it (caps/T also carry 1K/128K "
                         "rounding headroom). The overflow audit still "
                         "raises loudly on any under-sizing.")
    ap.add_argument("--morton", action="store_true",
                    help="Z-curve-sort the scene before lifting "
                         "(clusters the pack/reduce gather indices; "
                         "outputs are unpermuted, so results are "
                         "identical up to float reassociation)")
    ap.add_argument("--encoder", default="linear",
                    choices=("linear", "lseg-random", "lseg-random-f32"),
                    help="2D teacher in the fused loop: the default "
                         "linear map, or the REAL LSeg ViT-L/16 "
                         "architecture with random weights and the "
                         "reference's 480^2 crop protocol "
                         "(backproject.py:102-113), bf16 or f32")
    ap.add_argument("--split-encoder", choices=("auto", "on", "off"),
                    default="auto",
                    help="run the 2D encoder in its own XLA program "
                         "(render / encode / adjoint split) instead of "
                         "one fused program. auto: on for the LSeg "
                         "ViT (the fused garden-scale program kills "
                         "the remote compile service), off for linear")
    ap.add_argument("--reduce-engine", default="pallas",
                    choices=("pallas", "scatter", "xla"),
                    help="adjoint+reduce structure: 'pallas' gathers "
                         "contribution rows through the slot table then "
                         "stripe-sums; 'scatter' has the adjoint kernel "
                         "write rows directly in slot order (per-row "
                         "DMAs) and reduces with a gather-free masked "
                         "stripe sum")
    ap.add_argument("--budget-s", type=float,
                    default=float(os.environ.get("BENCH_BUDGET_S", 420)))
    ap.add_argument("--quick", action="store_true", help="tiny smoke config")
    args = ap.parse_args()

    if args.quick:
        args.num_gaussians, args.width, args.height = 4096, 128, 96
        args.feature_dim, args.views = 32, 2

    _watchdog(args.budget_s)

    import jax

    # Persistent compilation cache: the garden-scale pipeline costs
    # minutes to compile; cached executables survive across processes
    # (builder runs prime the cache for the driver's timed run).
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass  # older jax without these flags

    import jax.numpy as jnp

    from tpugs.encoders.base import LinearRGBEncoder
    from tpugs.lift.batch import normalize_field
    from tpugs.lift.pallas_batch import (
        DEFAULT_TILE,
        backproject_views_grouped,
        backproject_views_grouped_split,
    )
    from tpugs.utils.synthetic import orbit_cameras, random_scene

    scene = random_scene(
        args.num_gaussians, seed=0, extent=1.0,
        scale_range=(0.004, 0.02),
    )
    cams = orbit_cameras(args.views, args.width, args.height, radius=3.0)
    if args.encoder.startswith("lseg-random"):
        import warnings

        from tpugs.encoders.lseg import LSegEncoder

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")  # random-weights notice
            encoder = LSegEncoder(
                ckpt=None,
                dtype=None if args.encoder.endswith("f32") else jnp.bfloat16,
            )
        args.feature_dim = encoder.feature_dim
    else:
        encoder = LinearRGBEncoder(feature_dim=args.feature_dim)
    interpret = jax.devices()[0].platform == "cpu"
    if args.morton:
        from tpugs.utils.order import morton_permutation, permute_scene

        scene = permute_scene(scene, morton_permutation(scene))
    sizes = _load_or_estimate_sizes(args, scene, cams, DEFAULT_TILE)

    group = min(args.group, args.views)
    split = (
        args.split_encoder == "on"
        or (args.split_encoder == "auto"
            and args.encoder.startswith("lseg-random"))
    )
    backend = (
        backproject_views_grouped_split if split
        else backproject_views_grouped
    )

    def run(sc):
        kw = {}
        if not split:
            kw["reduce_engine"] = args.reduce_engine
        return backend(
            sc, cams.viewmats, cams.Ks, args.width, args.height,
            encoder, sizes, group_size=group, interpret=interpret, **kw,
        )

    # (block_until_ready is unreliable on the remote TPU backend —
    # force a device-to-host read to sync.) Returns the sampled scalar
    # so callers can sanity-check finiteness before recording.
    def sync(x):
        return float(np.asarray(jax.device_get(x.ravel()[:1]))[0])

    # Warmup / compile.
    out = run(scene)
    sync(out[1])

    # Timed runs on minutely perturbed scenes: the remote backend caches
    # results for identical (executable, inputs) pairs, which would make
    # a repeat of the warmup dispatch free. Record after EVERY timed
    # group so the watchdog always has the freshest number.
    best_dt = None
    for rep in range(2):
        scene_t = scene.replace(means=scene.means + 1e-6 * (rep + 1))
        t0 = time.perf_counter()
        num, den = run(scene_t)
        probe = sync(den)
        dt = time.perf_counter() - t0
        best_dt = dt if best_dt is None else min(best_dt, dt)
        # Only offer the watchdog numbers whose output sample is sane.
        if np.isfinite(probe):
            _record(args.views / dt)

    feats = normalize_field(num, den)
    finite = bool(jnp.isfinite(feats).all())
    if not finite:
        # Invalidate the provisional measurements: a NaN run must not
        # publish a success line (the watchdog would otherwise emit the
        # recorded number on its own).
        with _result_lock:
            _best["views_per_s"] = None
        print("# non-finite features — no measurement published",
              flush=True)
        sys.exit(4)
    views_per_s = args.views / best_dt
    gaussians_per_s = views_per_s * scene.num_gaussians
    _emit(note=(
        f"device={jax.devices()[0].platform} N={scene.num_gaussians} "
        f"{args.width}x{args.height} D={args.feature_dim} "
        f"encoder={args.encoder} "
        f"gaussian-splats/s={gaussians_per_s:.3e} finite={finite} "
        f"best_group_s={best_dt:.3f}"
    ))
    # Speed-of-light accounting (BASELINE.json north-star): analytic
    # per-stage floors at this shape; reduce at the measured gather
    # floor, compute stages at the bf16 peak; a real ViT encoder is
    # priced by its own flop/byte model.
    from tpugs.utils.profiling import (
        GATHER_FLOOR_GBPS,
        lseg_encoder_model,
        sol_estimate,
    )

    slot_rows = None
    if sizes.classes:
        slot_rows = sum(int(c) * int(s) for c, s in sizes.classes)
    sol = sol_estimate(
        sizes.T_padded, args.width * args.height, args.feature_dim,
        slot_rows=slot_rows,
        encode_model=(
            lseg_encoder_model()
            if args.encoder.startswith("lseg-random") else None
        ),
    )
    meas_ms = 1e3 / views_per_s
    print(
        "# SOL: per-view floor={:.1f} ms (render {:.1f}, encode {:.1f}, "
        "adjoint {:.1f}, plan {:.1f}, reduce {:.1f} @ {:.0f} GB/s gather "
        "floor); measured {:.1f} ms/view -> {:.0f}% of speed-of-light".format(
            sol["total"] * 1e3, sol["render"] * 1e3, sol["encode"] * 1e3,
            sol["adjoint"] * 1e3, sol["plan"] * 1e3, sol["reduce"] * 1e3,
            GATHER_FLOOR_GBPS, meas_ms, 100.0 * sol["total"] * 1e3 / meas_ms,
        ),
        flush=True,
    )
    sys.exit(0)


if __name__ == "__main__":
    main()
