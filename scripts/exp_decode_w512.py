"""Isolated decode-window timing at window 512 (r05 kvq decomposition).

The engine-level w512 run mixes chunked-admission windows into the steady
median; this times ONLY the jitted scan-window decode program (the same
executable the engine dispatches) on a cache pre-filled to 440 positions:
dense bf16 vs int8 KV postscale vs int8 KV with the int8 score dot, plus
a decomposition leg with attention stubbed to q-passthrough (isolates the
non-attention share: weights + sampling + cache update).

Run: python scripts/exp_decode_w512.py   (real TPU)
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

import bench as bench_mod
from ggml_gfx906_tpu.models import llama
from ggml_gfx906_tpu.runtime.batched_kv import BatchedKVCache
from ggml_gfx906_tpu.runtime.engine import _model_programs
from ggml_gfx906_tpu.utils import config
from ggml_gfx906_tpu.utils.perf import device_sync


def main():
    import jax
    import jax.numpy as jnp

    B, W, DEPTH, FILL = 16, 512, 8, 440
    cfg = llama.LlamaConfig(
        n_vocab=32000, n_ctx=2048, n_embd=4096, n_head=32, n_kv_head=32,
        n_layer=32, n_ff=11008, compute_dtype=jnp.bfloat16)
    print("building params...", file=sys.stderr, flush=True)
    params = bench_mod.build_llama7b_params(cfg)
    key = jax.random.PRNGKey(0)

    def mk_kv(quant):
        kv = BatchedKVCache.create(cfg.n_layer, B, W, cfg.n_kv_head,
                                   cfg.head_dim, dtype=cfg.compute_dtype,
                                   quant=quant)
        # fill with random values/scales so nothing constant-folds
        k = tuple(jax.random.normal(jax.random.fold_in(key, i),
                                    t.shape, jnp.float32
                                    ).astype(t.dtype) * (40 if quant else 1)
                  for i, t in enumerate(kv.k))
        v = tuple(jax.random.normal(jax.random.fold_in(key, 100 + i),
                                    t.shape, jnp.float32
                                    ).astype(t.dtype) * (40 if quant else 1)
                  for i, t in enumerate(kv.v))
        kd, vd = kv.k_d, kv.v_d
        if quant:
            kd = tuple(jnp.abs(jax.random.normal(
                jax.random.fold_in(key, 200 + i), t.shape)) * 0.02
                for i, t in enumerate(kd))
            vd = tuple(jnp.abs(jax.random.normal(
                jax.random.fold_in(key, 300 + i), t.shape)) * 0.02
                for i, t in enumerate(vd))
        return BatchedKVCache(k, v, kd, vd,
                              jnp.full((B,), FILL, jnp.int32))

    def run(label, quant, i8dot, delta=False):
        config.set("kv_quant", quant)
        config.set("kv_attn_int8_dot", i8dot)
        try:
            _, win, _, _ = _model_programs(llama, cfg, None)
            kv = mk_kv(quant)
            toks = jnp.ones((B,), jnp.int32)
            active = jnp.ones((B,), bool)
            seeds = jnp.arange(B, dtype=jnp.int32)
            ctr = jnp.ones((B,), jnp.int32)
            temps = jnp.zeros((B,), jnp.float32)
            tks = jnp.full((B,), 40, jnp.int32)
            tps = jnp.ones((B,), jnp.float32)
            out, toks, ctr, kv = win(params, kv, toks, active, seeds, ctr,
                                     temps, tks, tps, W, DEPTH, delta)
            device_sync(out)
            best = float("inf")
            for _ in range(4):
                t0 = time.perf_counter()
                out, toks, ctr, kv = win(params, kv, toks, active, seeds,
                                         ctr, temps, tks, tps, W, DEPTH,
                                         delta)
                device_sync(out)
                best = min(best, time.perf_counter() - t0)
                kv = kv.with_lengths(jnp.full((B,), FILL, jnp.int32))
            step_ms = best / DEPTH * 1e3
            print(f"  {label:16s}: {step_ms:7.2f} ms/step = "
                  f"{B / (best / DEPTH):7.1f} tok/s", flush=True)
            return step_ms
        finally:
            config.set("kv_quant", False)
            config.unset("kv_attn_int8_dot")

    d = run("dense-bf16", False, False)
    p = run("kvq-postscale", True, False)
    i = run("kvq-int8dot", True, True)
    dd = run("dense-DELTA", False, False, delta=True)
    pd = run("kvq-DELTA", True, False, delta=True)
    idd = run("kvq-i8dot-DELTA", True, True, delta=True)
    print(f"postscale vs dense: {100*(d/p-1):+.1f}% | "
          f"int8dot vs dense: {100*(d/i-1):+.1f}%")
    print(f"DELTA: dense {100*(d/dd-1):+.1f}% | kvq {100*(d/pd-1):+.1f}% "
          f"| kvq-i8dot {100*(d/idd-1):+.1f}% (all vs per-step dense)")


if __name__ == "__main__":
    main()
