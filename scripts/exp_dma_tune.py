"""Tune the manual-DMA pipeline (single grid step, make_async_copy +
fori_loop): chunk size × slot count. Finds the peak achievable HBM→VMEM
streaming rate for a wire-density decode kernel.

Measurement: one 64 MB pass takes ~85 us at HBM speed — far below the
~20-36 ms per-dispatch noise of this runtime, so per-call slope timing
reads garbage (measured: "335544320 GB/s"). Instead the kernel itself
loops P passes over the buffer (the DMAs are explicit; Mosaic cannot CSE
them) and the slope is taken over P: Δt/(ΔP · bytes) cancels both the
dispatch cost and the pipeline warm-up.
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ggml_gfx906_tpu.utils.perf import device_sync, measure_hbm_bw


def make_multipass(m, n, chunk, slots, passes, dtype=jnp.int8):
    num_chunks = m // chunk
    total = passes * num_chunks

    def kernel(x_hbm, o_ref):
        def body(scratch, sem):
            def get_dma(slot, t):
                ci = t % num_chunks
                return pltpu.make_async_copy(
                    x_hbm.at[pl.ds(ci * chunk, chunk)],
                    scratch.at[slot], sem.at[slot])

            for s in range(slots - 1):
                get_dma(s, s).start()

            def loop(t, acc):
                slot = t % slots

                @pl.when(t + slots - 1 < total)
                def _():
                    get_dma((t + slots - 1) % slots, t + slots - 1).start()

                get_dma(slot, t).wait()
                return acc ^ scratch[slot]

            acc0 = jnp.zeros((chunk, n), dtype)
            o_ref[...] = jax.lax.fori_loop(0, total, loop, acc0)

        pl.run_scoped(body,
                      scratch=pltpu.VMEM((slots, chunk, n), dtype),
                      sem=pltpu.SemaphoreType.DMA((slots,)))

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((chunk, n), lambda: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((chunk, n), dtype),
        )(x)
    return run


def time_config(xs, m, n, chunk, slots, p_lo=32, p_hi=160, rounds=3):
    """GB/s via slope over in-kernel pass count.

    Δ must dwarf the multi-ms dispatch jitter: 128 extra passes over 64 MB
    = 8 GB ≈ 11 ms at HBM speed (a 24-pass Δ read ±1000% noise). Slope is
    diff-of-mins, not min-of-diffs (the latter biases negative)."""
    f_lo = make_multipass(m, n, chunk, slots, p_lo)
    f_hi = make_multipass(m, n, chunk, slots, p_hi)
    device_sync(f_lo(xs[0]))
    device_sync(f_hi(xs[0]))
    best_lo = best_hi = float("inf")
    for r in range(1, rounds + 1):
        t0 = time.perf_counter()
        device_sync(f_lo(xs[r]))
        best_lo = min(best_lo, time.perf_counter() - t0)
        t0 = time.perf_counter()
        device_sync(f_hi(xs[r]))
        best_hi = min(best_hi, time.perf_counter() - t0)
    nbytes = m * n * (p_hi - p_lo)
    return nbytes / max(best_hi - best_lo, 1e-9) / 1e9


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    hbm = measure_hbm_bw() / 1e9
    print(f"measured HBM: {hbm:.0f} GB/s", flush=True)

    n = 4096
    m = (64 << 20) // n          # 64 MB of int8
    key = jax.random.PRNGKey(0)
    xs = jax.random.randint(key, (4, m, n), -100, 100, jnp.int8)
    device_sync(xs)

    for chunk_kb in (512, 1024, 2048):
        chunk = (chunk_kb << 10) // n
        if m % chunk:
            continue
        for slots in (2, 3, 4):
            if (slots + 2) * (chunk_kb << 10) > 15 << 20:
                continue
            try:
                gbs = time_config(xs, m, n, chunk, slots)
                print(f"chunk={chunk_kb:4d}KB slots={slots}: {gbs:6.0f} GB/s"
                      f" ({100*gbs/hbm:3.0f}% HBM)", flush=True)
            except Exception as e:
                print(f"chunk={chunk_kb}KB slots={slots}: FAIL "
                      f"{str(e)[:150]}", flush=True)


if __name__ == "__main__":
    main()
