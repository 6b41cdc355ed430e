"""Round-3 bytes-per-token experiments (VERDICT item 3) — run on real TPU.

The reference fork's whole point is streaming packed 4-bit weights
(ref: src/ggml-cuda/vecdotq.cuh:590-674, q4_0-gfx906.cuh:14-21, 4.5-4.75
bpw); our production decode streams 8.25 bpw (int8 execution layout)
because round-2 measured (a) jnp.int4 dot_general UNIMPLEMENTED, (b) XLA
materializing nibble-unpacks instead of fusing them, (c) Pallas grid steps
carrying 10-35 us fixed overhead. Each is re-tested here on the current
runtime build; results are recorded in docs/PERFORMANCE.md.

New this round: a single-grid-step Pallas kernel with a MANUAL
double-buffered DMA pipeline (make_async_copy + fori_loop) — if the
per-grid-step overhead lives in the outer Mosaic grid machinery, the inner
loop avoids it and wire-density streaming becomes reachable.

Usage: python scripts/exp_bytes.py [--quick]
"""
from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ggml_gfx906_tpu.utils.perf import _time_fn, device_sync, measure_hbm_bw


def exp_int4_dot():
    """(a) jnp.int4 dot_general — re-test per runtime upgrade."""
    try:
        w = jnp.zeros((256, 256), jnp.int4)
        x = jnp.zeros((8, 256), jnp.int4)
        out = jax.jit(lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32))(x, w)
        device_sync(out)
        return "WORKS"
    except Exception as e:
        return f"unimplemented ({type(e).__name__}: {str(e)[:120]})"


def _decode_shapes(quick):
    # 7B-ish single matmul: N=4096 out rows, K=11008 (ffn down-proj shape)
    n, k = (2048, 4096) if quick else (4096, 11008)
    return n, k


def exp_packed_nibble(quick):
    """(b) uint8-packed nibbles, shift/mask unpack before an int8 dot.

    If XLA fuses the unpack into the contraction the weight stream is
    ~4.25 bpw; if it materializes the unpacked operand it's worse than
    int8. Reported as effective GB/s over the PACKED bytes."""
    n, k = _decode_shapes(quick)
    rng = np.random.default_rng(0)
    packed = jnp.asarray(rng.integers(0, 256, (k // 256, n, 128),
                                      dtype=np.uint8))  # tile-major halves
    scales = jnp.asarray(rng.random((k // 256, n), dtype=np.float32) * .01)
    iters = 8
    xs = jnp.asarray(rng.standard_normal((3 * iters, 1, k)).astype(np.float32))

    def mv(x, w_packed, dw):
        kt = w_packed.shape[0]
        x2 = x.reshape(kt, 256)
        lo = (w_packed & 0xF).astype(jnp.int8) - 8
        hi = (w_packed >> 4).astype(jnp.int8) - 8
        w8 = jnp.concatenate([lo, hi], axis=-1)          # (kt, n, 256)
        amax = jnp.max(jnp.abs(x2), axis=-1)
        inv = jnp.where(amax > 0, 127.0 / jnp.where(amax > 0, amax, 1.0), 0.)
        qx = jnp.clip(jnp.round(x2 * inv[:, None]), -127., 127.) \
            .astype(jnp.int8)
        prod = jax.lax.dot_general(qx[:, None], w8,
                                   (((2,), (2,)), ((0,), (0,))),
                                   preferred_element_type=jnp.int32)
        return (prod.astype(jnp.float32) * (amax / 127.)[:, None, None]
                * dw[:, None]).sum(0)

    t = _time_fn(mv, xs, packed, scales, iters=iters, rounds=2)
    return packed.nbytes / t / 1e9, t


def exp_int8_baseline(quick):
    """Current production path: tile-major int8 segmented dot (8.25 bpw)."""
    n, k = _decode_shapes(quick)
    rng = np.random.default_rng(1)
    w8t = jnp.asarray(rng.integers(-127, 128, (k // 256, n, 256),
                                   dtype=np.int8))
    dwt = jnp.asarray(rng.random((k // 256, n), dtype=np.float32) * .01)
    iters = 8
    xs = jnp.asarray(rng.standard_normal((3 * iters, 1, k)).astype(np.float32))

    def mv(x, w, dw):
        kt = w.shape[0]
        x2 = x.reshape(kt, 256)
        amax = jnp.max(jnp.abs(x2), axis=-1)
        inv = jnp.where(amax > 0, 127.0 / jnp.where(amax > 0, amax, 1.0), 0.)
        qx = jnp.clip(jnp.round(x2 * inv[:, None]), -127., 127.) \
            .astype(jnp.int8)
        prod = jax.lax.dot_general(qx[:, None], w,
                                   (((2,), (2,)), ((0,), (0,))),
                                   preferred_element_type=jnp.int32)
        return (prod.astype(jnp.float32) * (amax / 127.)[:, None, None]
                * dw[:, None]).sum(0)

    t = _time_fn(mv, xs, w8t, dwt, iters=iters, rounds=2)
    return w8t.nbytes / t / 1e9, t


def _outer_grid_copy(m, n, bm):
    def copy_kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...]

    @jax.jit
    def run(x):
        return pl.pallas_call(
            copy_kernel,
            grid=(m // bm,),
            in_specs=[pl.BlockSpec((bm, n), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((bm, n), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        )(x)
    return run


def _manual_dma_reduce(m, n, chunk):
    """Single grid step; inner fori_loop double-buffers HBM→VMEM DMAs and
    accumulates, so per-grid-step overhead is paid ONCE per call."""
    num_chunks = m // chunk

    def kernel(x_hbm, o_ref):
        def body(scratch, sem):
            def get_dma(slot, ci):
                return pltpu.make_async_copy(
                    x_hbm.at[pl.ds(ci * chunk, chunk)],
                    scratch.at[slot], sem.at[slot])

            get_dma(0, 0).start()

            def loop(ci, acc):
                slot = ci % 2

                @pl.when(ci + 1 < num_chunks)
                def _():
                    get_dma((ci + 1) % 2, ci + 1).start()

                get_dma(slot, ci).wait()
                return acc + scratch[slot]

            o_ref[...] = jax.lax.fori_loop(
                0, num_chunks, loop, jnp.zeros((chunk, n), jnp.float32))

        pl.run_scoped(body,
                      scratch=pltpu.VMEM((2, chunk, n), jnp.float32),
                      sem=pltpu.SemaphoreType.DMA((2,)))

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((chunk, n), lambda: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((chunk, n), jnp.float32),
        )(x)
    return run


def exp_pallas_dma(quick):
    """(c) outer-grid vs manual-inner-pipeline Pallas streaming rate."""
    m, n = (2048, 4096) if quick else (4096, 4096)
    rng = np.random.default_rng(2)
    iters = 6
    xs = jnp.asarray(rng.standard_normal((3 * iters, m, n)).astype(np.float32))
    nbytes = m * n * 4

    outer = _outer_grid_copy(m, n, 128)
    t_outer = _time_fn(lambda x: outer(x), xs, iters=iters, rounds=2)

    # chunk=128: 2x2MB scratch + 2MB carry + 2MB out fits the 16MB scoped
    # VMEM limit (chunk=256 OOMed at compile: 19.78M > 16M)
    manual = _manual_dma_reduce(m, n, 128)
    t_manual = _time_fn(lambda x: manual(x), xs, iters=iters, rounds=2)

    return (2 * nbytes / t_outer / 1e9,     # read+write
            nbytes / t_manual / 1e9)        # read-dominated


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args(argv)

    print(f"backend: {jax.default_backend()} {jax.devices()}", flush=True)
    hbm = measure_hbm_bw() / 1e9
    print(f"measured HBM read bw: {hbm:.0f} GB/s", flush=True)

    print(f"[a] jnp.int4 dot_general: {exp_int4_dot()}", flush=True)

    t8 = None
    try:
        gbs8, t8 = exp_int8_baseline(args.quick)
        print(f"[base] int8 segmented matvec: {gbs8:.0f} GB/s weights "
              f"({t8*1e3:.3f} ms) = {100*gbs8/hbm:.0f}% of measured HBM",
              flush=True)
    except Exception as e:
        print(f"[base] FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)

    try:
        gbsn, tn = exp_packed_nibble(args.quick)
        fused = t8 is not None and tn < t8 * 0.8
        print(f"[b] packed-nibble unpack+dot: {gbsn:.0f} GB/s packed bytes "
              f"({tn*1e3:.3f} ms → "
              f"{'FUSED (wire-density!)' if fused else 'materialized'})",
              flush=True)
    except Exception as e:
        print(f"[b] FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)

    try:
        outer_gbs, manual_gbs = exp_pallas_dma(args.quick)
        print(f"[c] pallas copy outer-grid: {outer_gbs:.0f} GB/s (r+w)  |  "
              f"manual inner DMA pipeline: {manual_gbs:.0f} GB/s (read)",
              flush=True)
        verdict = ("HEALTHY — wire-density kernels reachable via manual "
                   "pipelines" if manual_gbs > 0.5 * hbm else
                   "still pathological — int8 XLA path stands")
        print(f"[c] verdict: {verdict}", flush=True)
    except Exception as e:
        print(f"[c] FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
