"""Which primitive makes the in-kernel Q4_K expansion run at 8 GB/s?

Variants over a resident VMEM (256, 2048) u8 buffer (no DMA — compute
only), timed by in-kernel pass-loop slope:

  sum_u8    widen u8→i32 + f32 sum only          (baseline read+reduce)
  nib_i32   nibble extract, stay i32, i32 sum
  nib_f32   nibble extract + astype f32 + f32 sum
  rep       nib_f32 + pltpu.repeat(scale, 32) multiply   (the full path)
  rowscale  nib_f32 + per-row scalar multiply (no repeat)
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

from ggml_gfx906_tpu.utils.perf import device_sync

R, C = 256, 2048      # 512 KB of packed nibbles = 1M weights
KT = C // 128


def make(mode, passes):
    def kernel(qs_ref, scm_ref, dd_ref, out_ref):
        def loop(t, acc):
            add = jnp.float32(0)
            for r0 in range(0, R, 128):
                for i in range(KT):
                    blk = qs_ref[r0:r0 + 128, i * 128:(i + 1) * 128]
                    q = blk.astype(jnp.int32) + t  # t: defeat CSE per pass
                    if mode == "sum_u8":
                        add += jnp.sum(q.astype(jnp.float32),
                                       dtype=jnp.float32)
                        continue
                    lo32, hi32 = q & 0xF, (q >> 4) & 0xF
                    if mode == "nib_i32":
                        add += jnp.sum(lo32 + hi32,
                                       dtype=jnp.int32).astype(jnp.float32)
                        continue
                    lo = lo32.astype(jnp.float32)
                    hi = hi32.astype(jnp.float32)
                    if mode == "nib_f32":
                        add += jnp.sum(lo, dtype=jnp.float32) \
                            + jnp.sum(hi, dtype=jnp.float32)
                        continue
                    rows = pl.ds(r0, 128)
                    if mode == "rep":
                        s_ = scm_ref[rows, i * 16:(i + 1) * 16] \
                            .astype(jnp.int32).astype(jnp.float32)
                        d = dd_ref[rows, 2 * i:2 * i + 1]
                        dm = dd_ref[rows, 2 * i + 1:2 * i + 2]
                        wlo = lo * pltpu.repeat(s_[:, 0:4] * d, 32, axis=1) \
                            - pltpu.repeat(s_[:, 8:12] * dm, 32, axis=1)
                        whi = hi * pltpu.repeat(s_[:, 4:8] * d, 32, axis=1) \
                            - pltpu.repeat(s_[:, 12:16] * dm, 32, axis=1)
                    else:     # rowscale
                        d = dd_ref[rows, 2 * i:2 * i + 1]
                        dm = dd_ref[rows, 2 * i + 1:2 * i + 2]
                        wlo = lo * d - dm
                        whi = hi * d - dm
                    add += jnp.sum(wlo, dtype=jnp.float32) \
                        + jnp.sum(whi, dtype=jnp.float32)
            return acc + add

        out_ref[0, 0] = jax.lax.fori_loop(0, passes, loop, jnp.float32(0))

    @jax.jit
    def run(qs, scm, dd):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec((R, C), lambda: (0, 0)),
                      pl.BlockSpec((R, KT * 16), lambda: (0, 0)),
                      pl.BlockSpec((R, KT * 2), lambda: (0, 0))],
            out_specs=pl.BlockSpec((1, 1), lambda: (0, 0),
                                   memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        )(qs, scm, dd)
    return run


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    qs = jnp.asarray(rng.integers(0, 256, (R, C), dtype=np.uint8))
    scm = jnp.asarray(rng.integers(0, 64, (R, KT * 16), dtype=np.uint8))
    dd = jnp.asarray((rng.random((R, KT * 2)) * 0.01).astype(np.float32))
    for mode in ("sum_u8", "nib_i32", "nib_f32", "rowscale", "rep"):
        try:
            p_lo, p_hi = 4, 20
            f_lo, f_hi = make(mode, p_lo), make(mode, p_hi)
            device_sync(f_lo(qs, scm, dd))
            device_sync(f_hi(qs, scm, dd))
            bl = bh = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                device_sync(f_lo(qs, scm, dd))
                bl = min(bl, time.perf_counter() - t0)
                t0 = time.perf_counter()
                device_sync(f_hi(qs, scm, dd))
                bh = min(bh, time.perf_counter() - t0)
            per = max(bh - bl, 1e-9) / (p_hi - p_lo)
            gbs = qs.nbytes / per / 1e9
            print(f"[{mode:8s}] {per*1e6:8.1f} us/pass = {gbs:6.1f} GB/s "
                  f"packed", flush=True)
        except Exception as e:
            print(f"[{mode}] FAIL {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
