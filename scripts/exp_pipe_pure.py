"""Localization probe for the pipelined-kernel model-step gap.

exp_fused_layer.py measured: per-call the manual-DMA Q4_K kernel streams
386-413 GB/s of wire, but a full decode step runs at ~185 GB/s aggregate —
and fusing 7 calls/layer into 4 plus alignment padding changed nothing
(1.01x), refuting the per-call-fixed-cost theory. This probe strips the
step to JUST the chained matmuls (no attention / rope / KV writes): if the
pure chain recovers per-call rate, the loss is XLA<->Mosaic interleaving;
if not, back-to-back pallas calls themselves run below isolated rate.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ggml_gfx906_tpu.ops.quantized import QuantTensor, qmatmul
from ggml_gfx906_tpu.quant.types import GGMLType
from ggml_gfx906_tpu.utils import config
from ggml_gfx906_tpu.utils.perf import device_sync, measure_hbm_bw

D, FF = 4096, 11264
N_LAYER = 8


def qk(n, k, seed):
    sb = k // 256
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)

    @jax.jit
    def gen(k0, k1, k2):
        return {
            "qs": jax.random.randint(k0, (n, sb * 128), 0, 256, jnp.uint8),
            "scm": jax.random.randint(k1, (n, sb * 16), 0, 64, jnp.uint8),
            "dd": jax.random.uniform(k2, (n, sb * 2)) * (0.02 / 8),
        }

    return QuantTensor(GGMLType.Q4_K, (n, k), gen(*ks), "kernel")


def main():
    config.set("attn_impl", "xla")
    config.set("qmm_pipeline", "auto")
    print(f"backend: {jax.default_backend()}", flush=True)
    hbm = measure_hbm_bw() / 1e9
    print(f"HBM: {hbm:.0f} GB/s", flush=True)

    blocks = []
    s = iter(range(1, 100))
    for _ in range(N_LAYER):
        blocks.append({
            "wqkv": qk(3 * D, D, next(s)),
            "wo": qk(D, D, next(s)),
            "wgu": qk(2 * FF, D, next(s)),
            "w_down": qk(D, FF, next(s)),
        })
    wire = sum(t.nbytes
               for b in blocks for t in b.values())

    @jax.jit
    def step(x, blocks):
        for blk in blocks:
            qkv = qmatmul(x, blk["wqkv"])
            x = qmatmul(qkv[:, :D] * 1e-3, blk["wo"]) * 1e-3 + x
            gu = qmatmul(x, blk["wgu"])
            act = (gu[:, :FF] * gu[:, FF:]) * 1e-3
            x = qmatmul(act.astype(x.dtype), blk["w_down"]) * 1e-3 + x
        return x

    rng = np.random.default_rng(0)
    xs = [jnp.asarray(rng.standard_normal((1, D)).astype(np.float32))
          for _ in range(5)]
    device_sync(step(xs[0], blocks))
    best = float("inf")
    STEPS = 24
    for _ in range(2):
        x = xs[1]
        t0 = time.time()
        for i in range(STEPS):
            x = step(x * (1.0 + i * 1e-9), blocks)
        device_sync(x)
        best = min(best, (time.time() - t0) / STEPS)
    gbs = wire / best / 1e9
    print(f"pure matmul chain (4 calls/layer, no attn): "
          f"{best*1e3:.3f} ms/step | {gbs:.0f} GB/s wire "
          f"({100*gbs/hbm:.0f}% HBM, {wire/1e9:.2f} GB)", flush=True)


if __name__ == "__main__":
    main()
