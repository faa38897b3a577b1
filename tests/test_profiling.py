"""Roofline accounting + trace plumbing (SURVEY §5: jax.profiler traces
and per-kernel roofline counters)."""

import os

import numpy as np

from tpugs.utils.profiling import (
    PEAKS_V5E,
    StageTimer,
    adjoint_model,
    device_memory_stats,
    kernel_stats,
    reduce_model,
    render_model,
    roofline_report,
    trace,
)


def test_kernel_stats_bounds():
    # pure streaming stage: 1 GB in 10 ms -> 100 GB/s, memory bound
    s = kernel_stats("stream", 0.01, flops=1e6, hbm_bytes=1e9)
    assert s["bound"] == "memory"
    assert np.isclose(s["gbps"], 100.0)
    assert np.isclose(s["pct_peak"], 100.0 * 100.0 / PEAKS_V5E["hbm_gbps"])

    # dense matmul-like stage: high intensity -> compute bound
    s = kernel_stats("mxu", 0.01, flops=1e12, hbm_bytes=1e9)
    assert s["bound"] == "compute"
    assert np.isclose(s["tflops"], 100.0)

    # ridge point consistency: intensity exactly at ridge is compute
    ridge = PEAKS_V5E["tflops_bf16"] * 1e12 / (PEAKS_V5E["hbm_gbps"] * 1e9)
    s = kernel_stats("ridge", 1.0, flops=ridge, hbm_bytes=1.0)
    assert s["bound"] == "compute"


def test_workload_models_scale_linearly():
    a, b = render_model(1000, 10000, 3), render_model(2000, 10000, 3)
    assert b["flops"] == 2 * a["flops"]
    a = adjoint_model(1000, 512)
    b = adjoint_model(1000, 128)
    assert a["flops"] > b["flops"]
    r = reduce_model(5_000_000, 513)
    # the reduce is memory bound by construction
    s = kernel_stats("reduce", 0.25, **{"flops": r["flops"],
                                        "hbm_bytes": r["hbm_bytes"]})
    assert s["bound"] == "memory"


def test_stage_timer_and_report():
    t = StageTimer()
    with t.stage("warm", flops=1e9, hbm_bytes=1e6):
        np.dot(np.ones((100, 100)), np.ones((100, 100)))
    t.add("manual", 0.005, flops=0.0, hbm_bytes=5e8)
    rep = t.report()
    assert "warm" in rep and "manual" in rep
    assert "bound" in rep and "%peak" in rep
    assert len(rep.splitlines()) == 4  # header + rule + 2 rows


def test_trace_noop_and_capture(tmp_path):
    # disabled: no-op
    with trace(None):
        pass
    with trace(""):
        pass
    # enabled on CPU backend: should produce a trace dir (or degrade
    # gracefully with a note — either way, no exception)
    logdir = os.path.join(tmp_path, "tr")
    import jax
    import jax.numpy as jnp

    with trace(logdir):
        jnp.ones((8, 8)).sum().block_until_ready()
    # jax writes plugins/profile/... under logdir when tracing worked
    if os.path.isdir(logdir):
        assert any(True for _ in os.walk(logdir))


def test_device_memory_stats_shape():
    s = device_memory_stats()
    if s is not None:
        assert set(s) == {"bytes_in_use", "peak_bytes_in_use",
                          "bytes_limit"}
