"""Attention's share of the w512 decode-window step (r05 kvq follow-up).

exp_decode_w512.py: dense 26.5 ms/step, kvq −7% despite halved KV bytes.
This isolates WHERE the time goes:

  full            — the window program as dispatched (dense / kvq)
  attn-stub       — causal_flash_attn monkeypatched to a q-passthrough
                    (same shapes, no cache read): non-attention share =
                    weights + qkv/mlp matmuls + rope + sampling + update
  op-only         — the attention op alone at the exact decode shape
                    (B,H,1,D) x (B,H,W,D), chained with a data dependence

Run: python scripts/exp_attn_share.py   (real TPU)
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
    from ggml_gfx906_tpu import ops

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

    def run(label, quant, stub=False):
        config.set("kv_quant", quant)
        orig = ops.causal_flash_attn
        if stub:
            def fake(q, k, v, start, scale=None, k_scale=None,
                     v_scale=None, **kw):
                # same output shape/dtype, no cache read
                return (q * jnp.float32(scale if scale else 1.0)
                        ).astype(q.dtype)
            ops.causal_flash_attn = fake
        try:
            import importlib
            _model_programs.cache_clear() if hasattr(
                _model_programs, "cache_clear") else None
            from ggml_gfx906_tpu.runtime import engine as eng_mod
            eng_mod._MODEL_PROGRAMS.clear()
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
                                     temps, tks, tps, W, DEPTH)
            device_sync(out)
            best = float("inf")
            for _ in range(4):
                t0 = time.perf_counter()
                out, toks, ctr, kv = win(params, kv, toks, active, seeds,
                                         ctr, temps, tks, tps, W, DEPTH)
                device_sync(out)
                best = min(best, time.perf_counter() - t0)
                kv = kv.with_lengths(jnp.full((B,), FILL, jnp.int32))
            step_ms = best / DEPTH * 1e3
            print(f"  {label:18s}: {step_ms:7.2f} ms/step", flush=True)
            return step_ms
        finally:
            ops.causal_flash_attn = orig
            config.set("kv_quant", False)

    full_d = run("full dense", False)
    stub_d = run("attn-stub dense", False, stub=True)
    full_q = run("full kvq", True)
    stub_q = run("attn-stub kvq", True, stub=True)
    print(f"attention share: dense {full_d-stub_d:.2f} ms "
          f"({100*(full_d-stub_d)/full_d:.0f}%), "
          f"kvq {full_q-stub_q:.2f} ms", flush=True)

    # op-only at the exact decode shape, chained
    H, D = cfg.n_head, cfg.head_dim
    kc = jax.random.normal(key, (B, H, W, D), jnp.float32).astype(jnp.bfloat16)
    vc = jax.random.normal(jax.random.fold_in(key, 1), (B, H, W, D),
                           jnp.float32).astype(jnp.bfloat16)
    k8 = (kc.astype(jnp.float32) * 40).astype(jnp.int8)
    v8 = (vc.astype(jnp.float32) * 40).astype(jnp.int8)
    kd = jnp.abs(jax.random.normal(jax.random.fold_in(key, 2), (B, H, W))) * .02
    vd = jnp.abs(jax.random.normal(jax.random.fold_in(key, 3), (B, H, W))) * .02
    start = jnp.full((B,), FILL, jnp.int32)

    def op_chain(quant):
        @jax.jit
        def f(q, kc, vc, kd, vd):
            def body(i, q):
                o = ops.causal_flash_attn(
                    q, kc, vc, start, scale=0.088,
                    k_scale=kd if quant else None,
                    v_scale=vd if quant else None)
                return (q + o * 1e-3).astype(q.dtype)
            return jax.lax.fori_loop(0, 64, body, q)
        return f

    for label, quant, args in (
            ("op dense", False, (kc, vc, None, None)),
            ("op kvq", True, (k8, v8, kd, vd))):
        config.set("kv_quant", quant)
        try:
            q = jax.random.normal(jax.random.fold_in(key, 9),
                                  (B, H, 1, D), jnp.float32
                                  ).astype(jnp.bfloat16)
            f = op_chain(quant)
            device_sync(f(q, *args))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                device_sync(f(q, *args))
                best = min(best, time.perf_counter() - t0)
            per = best / 64
            gb = (args[0].nbytes + args[1].nbytes
                  + (args[2].nbytes + args[3].nbytes if quant else 0)) / 1e9
            print(f"  {label:18s}: {per*1e3*cfg.n_layer:7.2f} ms/step-equiv "
                  f"({per*1e3:6.3f} ms/op, {gb/per:6.0f} GB/s)", flush=True)
        finally:
            config.set("kv_quant", False)


if __name__ == "__main__":
    main()
