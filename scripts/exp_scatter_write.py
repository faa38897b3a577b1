"""Can the adjoint hide slot-ordered per-row SCATTER WRITES under its
compute, eliminating the reduce's 68-ms random-row gather?

The reduce's gather is issue-rate-bound (~29-47 M rows/s regardless of
locality), and per-row DMA READS measured slower than XLA's gather
(29.4 M rows/s, round 3). But a gather's issue time is exposed; a
kernel that scatter-writes its OUTPUT rows can overlap DMA issue with
the next block's compute. If a compute-loaded kernel sustains close to
the bare issue rate, the adjoint can write contributions directly in
slot-table order and the reduce collapses to the (sequential-read)
stripe-sum kernel.

Rows are (8, 128) bf16 tiles (2 KB) — the minimum Mosaic-legal
scattered-row unit (2D HBM slices need 8-sublane granularity).

Variants, each at several synthetic compute loads:
  contig   one (128, 8, 128) block DMA per grid step (the current
           adjoint's write pattern, rows contiguous in plan order)
  scatter  128 per-row DMAs to a random permutation (slot order)

Run on TPU:  timeout 2400 python scripts/exp_scatter_write.py
"""

import os as _os
import sys as _sys

_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO_ROOT not in _sys.path:
    _sys.path.insert(0, _REPO_ROOT)

import functools

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpugs.utils.timing import measure

BLOCK = 128


def make_kernel(scatter: bool, compute_iters: int, t_rows: int):
    def kernel(pos_ref, out_hbm, obuf, sem, acc):
        i = pl.program_id(0)
        slot = jax.lax.rem(i, 2)
        # pos_ref is an (8, 128) SMEM block covering grid steps
        # 8*(i//8)..8*(i//8)+7 (Mosaic SMEM blocks need (8,128)
        # divisibility); this step's row:
        prow = jax.lax.rem(i, 8)

        # Synthetic compute standing in for the adjoint's per-block
        # VPU work: a serial multiply-add chain over a (512, 128) f32
        # scratch (64 vregs -> ~64 VPU ops per iteration).
        x = acc[...]
        for _ in range(compute_iters):
            x = x * 1.000001 + 0.5
        acc[...] = x

        # Wait for this slot's previous writes before overwriting obuf.
        @pl.when(i >= 2)
        def _():
            if scatter:
                for r in range(BLOCK):
                    pltpu.make_async_copy(
                        obuf.at[slot, r], out_hbm.at[0], sem.at[slot]
                    ).wait()
            else:
                pltpu.make_async_copy(
                    obuf.at[slot], out_hbm.at[pl.ds(0, BLOCK)], sem.at[slot]
                ).wait()

        obuf[slot] = jnp.broadcast_to(
            x[:8].astype(jnp.bfloat16)[None], (BLOCK, 8, 128)
        )

        if scatter:
            for r in range(BLOCK):
                pltpu.make_async_copy(
                    obuf.at[slot, r],
                    out_hbm.at[pos_ref[prow, r]],
                    sem.at[slot],
                ).start()
        else:
            pltpu.make_async_copy(
                obuf.at[slot],
                out_hbm.at[pl.ds(i * BLOCK, BLOCK)],
                sem.at[slot],
            ).start()

        # Drain on the last two steps.
        nb = pl.num_programs(0)

        @pl.when(i == nb - 1)
        def _():
            for s in range(2):
                if scatter:
                    for r in range(BLOCK):
                        pltpu.make_async_copy(
                            obuf.at[s, r], out_hbm.at[0], sem.at[s]
                        ).wait()
                else:
                    pltpu.make_async_copy(
                        obuf.at[s], out_hbm.at[pl.ds(0, BLOCK)], sem.at[s]
                    ).wait()

    return kernel


INTERPRET = bool(int(_os.environ.get("INTERPRET", "0")))


@functools.partial(jax.jit, static_argnames=("scatter", "compute_iters"))
def run(eps, pos, scatter, compute_iters):
    nb = pos.shape[0]
    t_rows = nb * BLOCK
    p = pos + (eps * jnp.uint32(0)).astype(jnp.int32)
    return pl.pallas_call(
        make_kernel(scatter, compute_iters, t_rows),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((8, BLOCK), lambda i: (i // 8, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((t_rows, 8, 128), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((2, BLOCK, 8, 128), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((512, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=INTERPRET,
    )(p)


def smem_dma_legal():
    """Is a dynamic-offset HBM -> SMEM async copy legal on this Mosaic?
    (The real adjoint's rank blocks sit at data-dependent offsets, so
    destination indices must be DMA'd per block, not BlockSpec-mapped.)"""

    def kernel(off_ref, idx_hbm, out_ref, smem, sem):
        pltpu.make_async_copy(
            idx_hbm.at[pl.ds(off_ref[0] * 8, 8)], smem, sem
        ).start()
        pltpu.make_async_copy(
            idx_hbm.at[pl.ds(off_ref[0] * 8, 8)], smem, sem
        ).wait()
        out_ref[0, 0] = smem[3]

    try:
        out = pl.pallas_call(
            kernel,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
            scratch_shapes=[
                pltpu.SMEM((8,), jnp.int32),
                pltpu.SemaphoreType.DMA,
            ],
            interpret=INTERPRET,
        )(jnp.asarray([2], jnp.int32), jnp.arange(64, dtype=jnp.int32))
        return int(np.asarray(out)[0, 0]) == 19
    except Exception as e:  # noqa: BLE001 — legality probe
        print(f"  smem-dma failed: {type(e).__name__}: {e}", flush=True)
        return False


def main():
    print(f"device: {jax.devices()[0].platform}", flush=True)
    print(f"dynamic HBM->SMEM DMA legal: {smem_dma_legal()}", flush=True)
    nb = int(_os.environ.get("NB", "15360"))  # garden T_padded / 128
    t_rows = nb * BLOCK
    rng = np.random.default_rng(0)
    pos = jnp.asarray(
        rng.permutation(t_rows).astype(np.int32).reshape(nb, BLOCK)
    )
    print(f"rows={t_rows} ({t_rows * 2048 / 1e9:.2f} GB of 2-KB rows)",
          flush=True)

    for compute_iters in (0, 16, 48):
        for scatter in (False, True):
            name = f"{'scatter' if scatter else 'contig '}[it={compute_iters}]"

            def f(eps, p, s=scatter, c=compute_iters):
                out = run(eps, p, s, c)
                return out[:1, 0, :8]

            t = measure(f, pos, iters=3, name=name, verbose=True)
            print(
                f"  -> {t * 1e3:7.1f} ms  "
                f"{t_rows / t / 1e6:5.1f} M rows/s  "
                f"{t_rows * 2048 / t / 1e9:5.1f} GB/s",
                flush=True,
            )


if __name__ == "__main__":
    main()
