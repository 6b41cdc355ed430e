"""Decompose the pipelined wire-density kernel's cost on real hardware.

exp_pipe_model.py measured the v1 pipelined kernel at 8 GB/s — the DMA
pipeline itself streams at 700+ GB/s (exp_dma_tune.py), so the loss is in
compute: per-superblock (1,128)x(128,128) dots and per-weight VPU unpack.
This sweep isolates each stage on a decode-shaped matvec (N=4096, K=4096):

  [dma]    chunk DMA + xor-consume only             (upper bound)
  [unpack] + nibble unpack to f32 + scale multiply   (VPU ceiling)
  [dotbig] + one (m,K/2)x(128,K/2) dot per 128-row sub-tile (v2 design)
  [v1]     current per-superblock small dots         (the 8 GB/s path)

All timed with the in-kernel pass-loop slope (per-dispatch noise cancels).
"""
from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ggml_gfx906_tpu.ops.pallas.qmm import _dot_nt, _nibbles
from ggml_gfx906_tpu.utils.perf import device_sync, measure_hbm_bw

N, K = 4096, 4096
KT = K // 256
TN = 256            # rows per DMA chunk
SLOTS = 3


def make_variant(mode, passes, m=1):
    num_chunks = N // TN
    total = passes * num_chunks

    def kernel(xlo_ref, xhi_ref, scm_ref, dd_ref, qs_hbm, out_ref):
        def body(qs_s, wlo_s, whi_s, sem):
            def dma(slot, t):
                ci = t % num_chunks
                return pltpu.make_async_copy(
                    qs_hbm.at[pl.ds(ci * TN, TN)], qs_s.at[slot],
                    sem.at[slot])

            for s in range(SLOTS - 1):
                dma(s, s).start()

            def loop(t, acc):
                slot = t % SLOTS

                @pl.when(t + SLOTS - 1 < total)
                def _():
                    dma((t + SLOTS - 1) % SLOTS, t + SLOTS - 1).start()

                dma(slot, t).wait()
                ci = t % num_chunks
                if mode == "dma":
                    q = qs_s[slot][:, :128].astype(jnp.int32)
                    return acc + jnp.sum(q.astype(jnp.float32),
                                         dtype=jnp.float32)
                # hoist the dynamic slot read ONCE per chunk: slicing
                # qs_s[slot] per superblock makes Mosaic materialize a
                # full chunk copy per sb (62 MB stack OOM)
                qsl = qs_s[slot]
                add = jnp.float32(0)
                for r0 in range(0, TN, 128):
                    rows = pl.ds(ci * TN + r0, 128)
                    if mode in ("unpack", "dotbig"):
                        for i in range(KT):
                            lo, hi = _nibbles(
                                qsl[r0:r0 + 128,
                                    i * 128:(i + 1) * 128])
                            s_ = scm_ref[rows, i * 16:(i + 1) * 16] \
                                .astype(jnp.int32).astype(jnp.float32)
                            d = dd_ref[rows, 2 * i:2 * i + 1]
                            dm = dd_ref[rows, 2 * i + 1:2 * i + 2]
                            wlo = lo * pltpu.repeat(s_[:, 0:4] * d, 32,
                                                    axis=1) \
                                - pltpu.repeat(s_[:, 8:12] * dm, 32, axis=1)
                            whi = hi * pltpu.repeat(s_[:, 4:8] * d, 32,
                                                    axis=1) \
                                - pltpu.repeat(s_[:, 12:16] * dm, 32,
                                               axis=1)
                            if mode == "unpack":
                                # full-tensor reduce: a [0,0] probe lets
                                # Mosaic DCE the whole expansion (927
                                # "GB/s" measured = pure DMA)
                                add += jnp.sum(wlo, dtype=jnp.float32) \
                                    + jnp.sum(whi, dtype=jnp.float32)
                            else:
                                wlo_s[:, i * 128:(i + 1) * 128] = wlo
                                whi_s[:, i * 128:(i + 1) * 128] = whi
                        if mode == "dotbig":
                            acc2 = _dot_nt(xlo_ref[...], wlo_s[...]) \
                                + _dot_nt(xhi_ref[...], whi_s[...])
                            add += acc2[0, 0]
                    else:   # v1: per-superblock small dots
                        acc2 = jnp.zeros((m, 128), jnp.float32)
                        for i in range(KT):
                            lo, hi = _nibbles(
                                qsl[r0:r0 + 128,
                                    i * 128:(i + 1) * 128])
                            s_ = scm_ref[rows, i * 16:(i + 1) * 16] \
                                .astype(jnp.int32).astype(jnp.float32)
                            d = dd_ref[rows, 2 * i:2 * i + 1]
                            dm = dd_ref[rows, 2 * i + 1:2 * i + 2]
                            wlo = lo * pltpu.repeat(s_[:, 0:4] * d, 32,
                                                    axis=1) \
                                - pltpu.repeat(s_[:, 8:12] * dm, 32, axis=1)
                            whi = hi * pltpu.repeat(s_[:, 4:8] * d, 32,
                                                    axis=1) \
                                - pltpu.repeat(s_[:, 12:16] * dm, 32,
                                               axis=1)
                            acc2 += _dot_nt(
                                xlo_ref[:, i * 128:(i + 1) * 128], wlo)
                            acc2 += _dot_nt(
                                xhi_ref[:, i * 128:(i + 1) * 128], whi)
                        add += acc2[0, 0]
                return acc + add

            out_ref[0, 0] = jax.lax.fori_loop(0, total, loop,
                                              jnp.float32(0))

        pl.run_scoped(
            body,
            qs_s=pltpu.VMEM((SLOTS, TN, KT * 128), jnp.uint8),
            wlo_s=pltpu.VMEM((128, KT * 128), jnp.float32),
            whi_s=pltpu.VMEM((128, KT * 128), jnp.float32),
            sem=pltpu.SemaphoreType.DMA((SLOTS,)))

    @jax.jit
    def run(xlo, xhi, scm, dd, qs):
        return pl.pallas_call(
            kernel,
            in_specs=[
                pl.BlockSpec((m, KT * 128), lambda: (0, 0)),
                pl.BlockSpec((m, KT * 128), lambda: (0, 0)),
                pl.BlockSpec((N, KT * 16), lambda: (0, 0)),
                pl.BlockSpec((N, KT * 2), lambda: (0, 0)),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec((1, 1), lambda: (0, 0),
                                   memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        )(xlo, xhi, scm, dd, qs)
    return run


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    hbm = measure_hbm_bw() / 1e9
    print(f"HBM: {hbm:.0f} GB/s", flush=True)
    rng = np.random.default_rng(0)
    qs = jnp.asarray(rng.integers(0, 256, (N, KT * 128), dtype=np.uint8))
    scm = jnp.asarray(rng.integers(0, 64, (N, KT * 16), dtype=np.uint8))
    dd = jnp.asarray((rng.random((N, KT * 2)) * 0.01).astype(np.float32))
    xlo = jnp.asarray(rng.standard_normal((1, KT * 128)).astype(np.float32))
    xhi = jnp.asarray(rng.standard_normal((1, KT * 128)).astype(np.float32))
    wire = qs.nbytes + scm.nbytes + dd.nbytes

    for mode in ("dma", "unpack", "dotbig", "v1"):
        try:
            p_lo, p_hi = (8, 40) if mode in ("dma",) else (2, 10)
            f_lo = make_variant(mode, p_lo)
            f_hi = make_variant(mode, p_hi)
            device_sync(f_lo(xlo, xhi, scm, dd, qs))
            device_sync(f_hi(xlo, xhi, scm, dd, qs))
            bl = bh = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                device_sync(f_lo(xlo, xhi, scm, dd, qs))
                bl = min(bl, time.perf_counter() - t0)
                t0 = time.perf_counter()
                device_sync(f_hi(xlo, xhi, scm, dd, qs))
                bh = min(bh, time.perf_counter() - t0)
            per_pass = max(bh - bl, 1e-9) / (p_hi - p_lo)
            gbs = wire / per_pass / 1e9
            print(f"[{mode:6s}] {per_pass*1e3:7.3f} ms/pass = {gbs:6.0f} "
                  f"GB/s wire ({100*gbs/hbm:4.0f}% HBM)", flush=True)
        except Exception as e:
            print(f"[{mode}] FAIL {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
