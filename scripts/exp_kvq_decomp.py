"""Where do the halved KV bytes go? (r05, VERDICT r04 weak #2 follow-up)

The isolated w512 decode window still runs ~8% SLOWER with the int8 KV
cache although the attention op alone is 1.7-2.4x faster standalone
(scripts/exp_kv_long.py). This ablates the decode-window program itself
(2-layer 7B-shape model so compiles are fast; per-layer costs scale):

  dense / kvq            — full program
  *-noupd                — update_layer stubbed to a no-op (isolates the
                           cache-write path: quantize_rows + 2 or 6
                           dynamic_update_slices per layer)
  kvq-noqrows            — quantize_rows stubbed (writes zeros + unit
                           scales; isolates the row-quant arithmetic)

Run: python scripts/exp_kvq_decomp.py   (real TPU)
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

import bench as bench_mod
from ggml_gfx906_tpu.models import llama
from ggml_gfx906_tpu.runtime import batched_kv
from ggml_gfx906_tpu.runtime.batched_kv import BatchedKVCache
from ggml_gfx906_tpu.runtime.engine import _MODEL_PROGRAMS, _model_programs
from ggml_gfx906_tpu.utils import config
from ggml_gfx906_tpu.utils.perf import device_sync


def main():
    import jax
    import jax.numpy as jnp

    B, W, DEPTH, FILL, L = 16, 512, 8, 440, int(__import__("os").environ.get("EXP_L", 2))
    cfg = llama.LlamaConfig(
        n_vocab=32000, n_ctx=2048, n_embd=4096, n_head=32, n_kv_head=32,
        n_layer=L, n_ff=11008, compute_dtype=jnp.bfloat16)
    print("building params...", file=sys.stderr, flush=True)
    params = bench_mod.build_llama7b_params(cfg)
    key = jax.random.PRNGKey(0)

    def mk_kv(quant):
        kv = BatchedKVCache.create(cfg.n_layer, B, W, cfg.n_kv_head,
                                   cfg.head_dim, dtype=cfg.compute_dtype,
                                   quant=quant)
        k = tuple(jax.random.normal(jax.random.fold_in(key, i), t.shape,
                                    jnp.float32).astype(t.dtype)
                  * (40 if quant else 1) for i, t in enumerate(kv.k))
        v = tuple(jax.random.normal(jax.random.fold_in(key, 99 + i),
                                    t.shape, jnp.float32).astype(t.dtype)
                  * (40 if quant else 1) for i, t in enumerate(kv.v))
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

    orig_update = BatchedKVCache.update_layer
    orig_qrows = batched_kv.quantize_rows

    def run(label, quant, i8dot, noupd=False, noqrows=False):
        config.set("kv_quant", quant)
        config.set("kv_attn_int8_dot", i8dot)
        if noupd:
            BatchedKVCache.update_layer = (
                lambda self, layer, k_new, v_new, start: self)
        if noqrows:
            batched_kv.quantize_rows = (
                lambda x: (jnp.zeros(x.shape, jnp.int8),
                           jnp.ones(x.shape[:-1], jnp.float32)))
        _MODEL_PROGRAMS.clear()
        try:
            _, win, _, _ = _model_programs(llama, cfg, None)
            kv = mk_kv(quant)
            toks = jnp.ones((B,), jnp.int32)
            args = (jnp.ones((B,), bool), jnp.arange(B, dtype=jnp.int32),
                    jnp.ones((B,), jnp.int32), jnp.zeros((B,), jnp.float32),
                    jnp.full((B,), 40, jnp.int32), jnp.ones((B,), jnp.float32))
            out, toks, ctr, kv = win(params, kv, toks, *args, W, DEPTH)
            device_sync(out)
            best = float("inf")
            for _ in range(4):
                t0 = time.perf_counter()
                out, toks, ctr, kv = win(params, kv, toks, args[0], args[1],
                                         ctr, args[3], args[4], args[5],
                                         W, DEPTH)
                device_sync(out)
                best = min(best, time.perf_counter() - t0)
                kv = kv.with_lengths(jnp.full((B,), FILL, jnp.int32))
            print(f"  {label:14s}: {best / DEPTH * 1e3:7.2f} ms/step",
                  flush=True)
            return best / DEPTH
        finally:
            BatchedKVCache.update_layer = orig_update
            batched_kv.quantize_rows = orig_qrows
            config.set("kv_quant", False)
            config.unset("kv_attn_int8_dot")
            _MODEL_PROGRAMS.clear()

    run("dense", False, False)
    run("dense-noupd", False, False, noupd=True)
    run("kvq", True, False)
    run("kvq-noupd", True, False, noupd=True)
    run("kvq-noqrows", True, False, noqrows=True)
    run("kvq-i8dot", True, True)
    run("kvq-i8dot-noupd", True, True, noupd=True)


if __name__ == "__main__":
    main()
