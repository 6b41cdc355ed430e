"""Decompose the batched engine step's 18.5 ms (vs 9.8 ms single-stream).

Suspects (VERDICT r02 weak #3): per-step sampling (top-k over (B, 32000)),
attention-window re-bucketing, dense-KV padded reads, host work between
dispatches. Times each stage separately on an 8-layer 7B-shaped model
(weights stream scales linearly in layers, so stage ratios transfer).

Run on the real TPU.
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

from ggml_gfx906_tpu.utils import config
from ggml_gfx906_tpu.utils.perf import device_sync, measure_hbm_bw

N_LAYER = 8
B = 8
STEPS = 128


def main():
    from ggml_gfx906_tpu.models import llama
    from ggml_gfx906_tpu.ops.quantized import QuantTensor, to_int8_layout
    from ggml_gfx906_tpu.runtime.batched_kv import BatchedKVCache
    from ggml_gfx906_tpu.runtime.sampling import sample_batch

    sys.path.insert(0, ".")
    from scripts.exp_pipe_model import build_params

    config.set("attn_impl", "xla")
    config.set("qmm_pipeline", "off")
    print(f"backend: {jax.default_backend()}", flush=True)

    cfg = llama.LlamaConfig(
        n_vocab=32000, n_ctx=2048, n_embd=4096, n_head=32, n_kv_head=32,
        n_layer=N_LAYER, n_ff=11008, compute_dtype=jnp.bfloat16)
    t0 = time.time()
    pk = build_params(cfg)
    p8 = jax.tree.map(
        lambda t: to_int8_layout(t) if isinstance(t, QuantTensor) else t,
        pk, is_leaf=lambda t: isinstance(t, QuantTensor))
    del pk
    print(f"params built in {time.time()-t0:.0f}s", flush=True)

    max_seq = 1024
    rng = np.random.default_rng(0)

    def timed_chain(label, step_fn, carry, warm=2):
        # chained dispatches; one value fetch at the end (the bench's own
        # measurement discipline)
        for _ in range(warm):
            carry = step_fn(carry)
        device_sync(carry[0])
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            c = carry
            for _ in range(STEPS):
                c = step_fn(c)
            device_sync(c[0])
            best = min(best, (time.time() - t0) / STEPS)
            carry = c
        print(f"{label}: {best*1e3:7.3f} ms/step", flush=True)
        return best

    # 1. single-stream decode (the 9.8 ms baseline shape, 8 layers)
    kv1 = llama.make_cache(cfg, max_seq)
    prompt = jnp.asarray(np.arange(64, dtype=np.int32) % 1000)
    lg, kv1 = llama.forward_jit(cfg, p8, prompt, kv1, jnp.int32(0))
    tok = jnp.argmax(lg[-1]).astype(jnp.int32)[None]
    pos_holder = [65]

    def step1(c):
        tok, kv = c
        t, kv = llama.decode_step(cfg, p8, tok, kv, jnp.int32(pos_holder[0]))
        pos_holder[0] += 1
        return (t, kv)

    t_single = timed_chain("single-stream           ", step1, (tok, kv1))

    # 2. batched forward only (B=8, window 256, greedy argmax in-program)
    for kv_quant in (False, True):
        kvb = BatchedKVCache.create(cfg.n_layer, B, max_seq, cfg.n_kv_head,
                                    cfg.head_dim, dtype=cfg.compute_dtype,
                                    quant=kv_quant)
        lens0 = jnp.asarray(rng.integers(60, 200, B).astype(np.int32))
        kvb = kvb.with_lengths(lens0)
        toks = jnp.asarray(rng.integers(1, 1000, B).astype(np.int32))

        @jax.jit
        def fwd_only(toks, kv):
            logits, kv = llama.forward_batch(cfg, p8, toks[:, None], kv,
                                             kv.lengths, attn_window=256)
            nxt = jnp.argmax(logits[:, 0, :], axis=-1).astype(jnp.int32)
            return nxt, kv.with_lengths(kv.lengths + 1)

        t_fwd = timed_chain(
            f"B=8 fwd+argmax kv_quant={int(kv_quant)}", lambda c:
            fwd_only(c[0], c[1]), (toks, kvb))

    # 3. batched forward + full sampling pipeline (the engine's program)
    kvb = BatchedKVCache.create(cfg.n_layer, B, max_seq, cfg.n_kv_head,
                                cfg.head_dim, dtype=cfg.compute_dtype)
    kvb = kvb.with_lengths(lens0)
    seeds = jnp.asarray(rng.integers(0, 1 << 30, B).astype(np.int32))
    temps = jnp.full((B,), 0.8, jnp.float32)
    tks = jnp.full((B,), 40, jnp.int32)
    tps = jnp.full((B,), 0.9, jnp.float32)

    @jax.jit
    def fwd_sample(toks, kv, ctr):
        logits, kv = llama.forward_batch(cfg, p8, toks[:, None], kv,
                                         kv.lengths, attn_window=256)
        keys = jax.vmap(lambda s, c: jax.random.fold_in(
            jax.random.PRNGKey(s), c))(seeds, ctr)
        nxt = sample_batch(logits[:, 0, :], keys, temps, tks, tps)
        return nxt, kv.with_lengths(kv.lengths + 1), ctr + 1

    t_samp = timed_chain("B=8 fwd+top-k sampling  ", lambda c:
                         fwd_sample(c[0], c[1], c[2]),
                         (toks, kvb, jnp.zeros(B, jnp.int32)))

    # 4. sampling alone (isolated)
    logits_s = jnp.asarray(rng.standard_normal(
        (3 * 16, B, cfg.n_vocab)).astype(np.float32))
    from ggml_gfx906_tpu.utils.perf import _time_fn
    t_s = _time_fn(lambda lg: sample_batch(
        lg, jax.vmap(jax.random.PRNGKey)(jnp.arange(B, dtype=jnp.uint32)),
        temps, tks, tps), logits_s, iters=16, rounds=2)
    print(f"sampling alone          : {t_s*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
