"""Tracing + roofline accounting for the TPU pipeline.

The reference's profiling is wall-clock prints (`backproject.py:65,
170-171`) plus `torch.cuda.max_memory_allocated` in the trainer
(`f3dgs/simple_trainer_feature_3dgs.py:668,684`). SURVEY §5 names the
TPU-side equivalent: `jax.profiler` traces + per-kernel roofline
counters. This module provides both:

* :func:`trace` — context manager around ``jax.profiler.trace`` that
  degrades to a no-op (with a note) on backends that cannot trace
  (the remote axon tunnel sometimes cannot).
* :class:`StageTimer` — annotates host-side stage timings with
  ``jax.profiler.TraceAnnotation`` so they appear in the trace, and
  keeps a host-side table for the roofline report.
* :func:`kernel_stats` / :func:`roofline_report` — analytic roofline:
  given a stage's FLOPs and HBM bytes (from the workload model) and
  its measured seconds, report achieved TFLOP/s, GB/s, percent of
  peak, and whether the stage is compute- or memory-bound at the
  hardware's ridge point. Peaks default to TPU v5e
  (197 bf16 TFLOP/s, 819 GB/s HBM) and are overridable.
* :func:`device_memory_stats` — allocator live/peak bytes where the
  backend exposes them (the `max_memory_allocated` analog).
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

# TPU v5e single-chip peaks (public spec: 197 TFLOP/s bf16, 394 int8;
# 16 GiB HBM2 @ 819 GB/s). fp32 on the MXU runs at ~1/4 bf16 rate.
PEAKS_V5E = {
    "tflops_bf16": 197.0,
    "tflops_f32": 49.0,
    "hbm_gbps": 819.0,
}


@contextlib.contextmanager
def trace(logdir: Optional[str]):
    """``with trace("/tmp/trace"):`` — capture a jax.profiler trace of
    the body. ``logdir=None``/empty disables. Never raises: remote
    backends that cannot trace degrade to a timed no-op."""
    if not logdir:
        yield
        return
    import jax

    try:
        jax.profiler.start_trace(logdir)
        started = True
    except Exception as e:  # axon tunnel may refuse
        print(f"# trace disabled ({type(e).__name__}: {e})", flush=True)
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
                print(f"# trace written to {logdir}", flush=True)
            except Exception as e:
                print(f"# trace stop failed ({e})", flush=True)


def annotation(name: str):
    """TraceAnnotation ctx manager (no-op fallback)."""
    import jax

    try:
        return jax.profiler.TraceAnnotation(name)
    except Exception:
        return contextlib.nullcontext()


def kernel_stats(
    name: str,
    seconds: float,
    flops: float = 0.0,
    hbm_bytes: float = 0.0,
    dtype: str = "bf16",
    peaks: Dict[str, float] = PEAKS_V5E,
) -> dict:
    """Roofline numbers for one stage.

    ``bound`` compares the stage's arithmetic intensity (FLOPs/byte)
    against the hardware ridge point peak_flops/peak_bw; ``pct_peak``
    is achieved/peak on the binding resource — the per-kernel roofline
    counter SURVEY §5 calls for, computed analytically."""
    peak_tf = peaks["tflops_bf16" if dtype == "bf16" else "tflops_f32"]
    peak_bw = peaks["hbm_gbps"]
    tflops = flops / seconds / 1e12 if seconds > 0 else 0.0
    gbps = hbm_bytes / seconds / 1e9 if seconds > 0 else 0.0
    intensity = flops / hbm_bytes if hbm_bytes > 0 else float("inf")
    ridge = peak_tf * 1e12 / (peak_bw * 1e9)  # FLOPs/byte
    bound = "compute" if intensity >= ridge else "memory"
    pct = (
        100.0 * tflops / peak_tf if bound == "compute"
        else 100.0 * gbps / peak_bw
    )
    return {
        "name": name,
        "seconds": seconds,
        "tflops": tflops,
        "gbps": gbps,
        "intensity": intensity,
        "bound": bound,
        "pct_peak": pct,
    }


def roofline_report(stages: List[dict]) -> str:
    """Fixed-width table of :func:`kernel_stats` rows."""
    head = (
        f"{'stage':<28}{'ms':>9}{'TFLOP/s':>9}{'GB/s':>8}"
        f"{'FLOP/B':>8}{'bound':>9}{'%peak':>7}"
    )
    lines = [head, "-" * len(head)]
    for s in stages:
        inten = (
            f"{s['intensity']:.1f}" if s["intensity"] != float("inf")
            else "inf"
        )
        lines.append(
            f"{s['name']:<28}{s['seconds'] * 1e3:>9.2f}"
            f"{s['tflops']:>9.2f}{s['gbps']:>8.1f}{inten:>8}"
            f"{s['bound']:>9}{s['pct_peak']:>6.1f}%"
        )
    return "\n".join(lines)


# ----------------------------------------------------------- workload models
def render_model(n_isect: int, n_pix: int, d_chan: int = 3) -> dict:
    """FLOPs/bytes of the tiled forward composite: per intersection x
    pixel-in-tile, a conic eval (~10 flop) + blend (~2*d). Bytes: one
    read of each packed intersection row (~64 B) + tile image traffic."""
    tile_pix = 256  # 16x16
    flops = float(n_isect) * tile_pix * (10 + 2 * d_chan)
    hbm = float(n_isect) * 64 + float(n_pix) * 4 * (d_chan + 1)
    return {"flops": flops, "hbm_bytes": hbm}


def adjoint_model(n_isect: int, d_chan: int) -> dict:
    """Scatter-free adjoint: per intersection, d-dim feature MAC against
    the tile's pixel block + weight row write (d+1 floats bf16)."""
    tile_pix = 256
    flops = float(n_isect) * tile_pix * (2 * d_chan + 8)
    hbm = float(n_isect) * (2 * (d_chan + 1) + 64)
    return {"flops": flops, "hbm_bytes": hbm}


def reduce_model(n_slots: int, d_chan: int) -> dict:
    """Slot-table gather/sum: memory bound — read every slot row once."""
    flops = float(n_slots) * d_chan
    hbm = float(n_slots) * 2 * (d_chan + 1)
    return {"flops": flops, "hbm_bytes": hbm}


def lseg_encoder_model(
    crop: int = 480,
    patch: int = 16,
    width: int = 1024,
    layers: int = 24,
    head_features: int = 256,
    out_dim: int = 512,
    bytes_per_param: float = 2.0,
) -> dict:
    """FLOPs/bytes of one LSeg ViT-L/16 forward at the reference's
    480x480 crop protocol (``backproject.py:102-113``) — the teacher the
    reference runs per view, priced so the SOL line can include a real
    encoder instead of the toy linear map.

    ViT: per layer ~24*T*w^2 matmul FLOPs + 4*T^2*w attention FLOPs
    (T tokens). Head: 4 fusion levels of 3x3 conv pairs at doubling
    resolutions + the out_dim projection at half-crop resolution.
    Bytes: one pass over the parameters (~0.3 GParams) + crop image
    traffic — activations assumed resident."""
    t = (crop // patch) ** 2 + 1
    vit_flops = layers * (24.0 * t * width**2 + 4.0 * t * t * width)
    g = crop // patch
    head_flops = 0.0
    for k in range(4):
        hw = float(g * 2**k) ** 2
        head_flops += 4 * (2 * hw * 9 * head_features * head_features)
    half = float(crop // 2) ** 2
    head_flops += 2 * half * head_features * out_dim
    n_params = layers * 12 * width**2 + 4 * 9 * head_features**2 * 4
    hbm = n_params * bytes_per_param + crop * crop * 4.0 * (3 + out_dim)
    return {"flops": vit_flops + head_flops, "hbm_bytes": hbm}


# Empirical floor for strided row gathers on this chip/transport,
# measured by scripts/exp_reduce.py in round 2 (the HBM spec rate is
# unreachable for gather-shaped traffic; this is the honest denominator
# for the reduce stage's %-of-speed-of-light).
GATHER_FLOOR_GBPS = 46.0


def sol_estimate(
    n_isect: int,
    n_pix: int,
    d_feat: int,
    slot_rows: Optional[int] = None,
    gather_gbps: float = GATHER_FLOOR_GBPS,
    peaks: Dict[str, float] = PEAKS_V5E,
    encode_model: Optional[dict] = None,
) -> dict:
    """Aggregate per-view speed-of-light for the fused back-projection.

    For each stage, SOL seconds = max(flops / bf16 peak, bytes / the
    binding bandwidth) from the analytic models above; the reduce uses
    the measured gather floor instead of the HBM spec (row gathers
    cannot stream). Returns per-stage seconds + ``total`` — the honest
    denominator for the bench's "% of speed-of-light" line
    (BASELINE.json's north-star is per-chip speed-of-light)."""
    peak_f = peaks["tflops_bf16"] * 1e12
    peak_b = peaks["hbm_gbps"] * 1e9

    def sol(m, bw=None):
        b = (bw or peaks["hbm_gbps"]) * 1e9
        return max(m["flops"] / peak_f, m["hbm_bytes"] / b)

    d = d_feat + 1  # ones-channel denominator rides along
    stages = {
        "render": sol(render_model(n_isect, n_pix, 3)),
        # encoder: pass encode_model (e.g. lseg_encoder_model()) to
        # price a real ViT; the default prices the toy linear map
        # (one n_pix x 3 @ 3 x d_feat matmul + image traffic)
        "encode": sol(encode_model or {
            "flops": 2.0 * n_pix * 3 * d_feat,
            "hbm_bytes": n_pix * 2.0 * (3 + d_feat),
        }),
        "adjoint": sol(adjoint_model(n_isect, d)),
        # plan: expand + one uint32 key sort + scatter over the
        # intersection list (~6 HBM passes of key+payload)
        "plan": sol({"flops": 0.0, "hbm_bytes": n_isect * 48.0}),
        "reduce": sol(
            reduce_model(slot_rows or n_isect, d), bw=gather_gbps
        ),
    }
    stages["total"] = sum(stages.values())
    return stages


@dataclass
class StageTimer:
    """Accumulates (stage, seconds [, flops, bytes]) rows; ``report()``
    prints the roofline table. Use with the analytic models above or
    raw seconds only."""

    dtype: str = "bf16"
    rows: List[dict] = field(default_factory=list)

    @contextlib.contextmanager
    def stage(self, name: str, flops: float = 0.0, hbm_bytes: float = 0.0):
        with annotation(name):
            t0 = time.perf_counter()
            yield
            dt = time.perf_counter() - t0
        self.add(name, dt, flops, hbm_bytes)

    def add(self, name, seconds, flops=0.0, hbm_bytes=0.0):
        self.rows.append(
            kernel_stats(name, seconds, flops, hbm_bytes, dtype=self.dtype)
        )

    def report(self) -> str:
        return roofline_report(self.rows)


def device_memory_stats() -> Optional[dict]:
    """Live/peak allocator bytes (`max_memory_allocated` analog), None
    if the backend doesn't expose memory_stats."""
    import jax

    try:
        stats = jax.devices()[0].memory_stats()
    except Exception:
        return None
    if not stats:
        return None
    return {
        "bytes_in_use": stats.get("bytes_in_use"),
        "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
        "bytes_limit": stats.get("bytes_limit"),
    }
