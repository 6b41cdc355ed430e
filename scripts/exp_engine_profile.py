"""Decompose the batched engine step's 18.5 ms (vs 9.8 ms single-stream).

Suspects (VERDICT r02 weak #3): per-step sampling (top-k over (B, 32000)),
attention-window re-bucketing, dense-KV padded reads, host work between
dispatches. Times each stage separately on an 8-layer 7B-shaped model
(weights stream scales linearly in layers, so stage ratios transfer).

Run on the real TPU.
"""
from __future__ import annotations

import functools
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

    import os
    if os.environ.get("SKIP12"):
        t_single = None
    else:
        t_single = timed_chain("single-stream           ", step1,
                               (tok, kv1))

    # 2. batched forward only (B=8, window 256, greedy argmax in-program)
    for kv_quant in (() if os.environ.get("SKIP12") else (False, True)):
        kvb = BatchedKVCache.create(cfg.n_layer, B, max_seq, cfg.n_kv_head,
                                    cfg.head_dim, dtype=cfg.compute_dtype,
                                    quant=kv_quant)
        lens0 = jnp.asarray(rng.integers(60, 200, B).astype(np.int32))
        kvb = kvb.with_lengths(lens0)
        toks = jnp.asarray(rng.integers(1, 1000, B).astype(np.int32))

        @functools.partial(jax.jit, donate_argnums=2)
        def fwd_only(p, toks, kv):
            # params as ARGUMENT: a 1.77 GB closure becomes program
            # constants — the compile helper never returns
            logits, kv = llama.forward_batch(cfg, p, toks[:, None], kv,
                                             kv.lengths, attn_window=256)
            nxt = jnp.argmax(logits[:, 0, :], axis=-1).astype(jnp.int32)
            return nxt, kv.with_lengths(kv.lengths + 1)

        t_fwd = timed_chain(
            f"B=8 fwd+argmax kv_quant={int(kv_quant)}", lambda c:
            fwd_only(p8, c[0], c[1])[:2], (toks, kvb))

    # 3. batched forward + full sampling pipeline (the engine's program)
    kvb = BatchedKVCache.create(cfg.n_layer, B, max_seq, cfg.n_kv_head,
                                cfg.head_dim, dtype=cfg.compute_dtype)
    # lens0 was donated away inside the kv_quant loop — fresh copies
    kvb = kvb.with_lengths(jnp.asarray(
        rng.integers(60, 200, B).astype(np.int32)))
    toks = jnp.asarray(rng.integers(1, 1000, B).astype(np.int32))
    # np (not jnp): closure DEVICE arrays re-upload per call on this
    # runtime; np closures embed as program literals
    seeds = rng.integers(0, 1 << 30, B).astype(np.int32)
    temps = np.full((B,), 0.8, np.float32)
    tks = np.full((B,), 40, np.int32)
    tps = np.full((B,), 0.9, np.float32)

    @functools.partial(jax.jit, donate_argnums=2)
    def fwd_sample(p, toks, kv, ctr):
        logits, kv = llama.forward_batch(cfg, p, toks[:, None], kv,
                                         kv.lengths, attn_window=256)
        keys = jax.vmap(lambda s, c: jax.random.fold_in(
            jax.random.PRNGKey(s), c))(seeds, ctr)
        nxt = sample_batch(logits[:, 0, :], keys, temps, tks, tps)
        return nxt, kv.with_lengths(kv.lengths + 1), ctr + 1

    t_samp = timed_chain("B=8 fwd+top-k sampling  ", lambda c:
                         fwd_sample(p8, c[0], c[1], c[2]),
                         (toks, kvb, jnp.zeros(B, jnp.int32)))

    # 3b. HOST enqueue rate of the batched program (no sync): if the
    # per-dispatch marshaling of the ~600-buffer params pytree exceeds
    # the device step, the ENGINE is host-bound — the r02 18.5 ms mystery
    kvb2 = BatchedKVCache.create(cfg.n_layer, B, max_seq, cfg.n_kv_head,
                                 cfg.head_dim, dtype=cfg.compute_dtype)
    kvb2 = kvb2.with_lengths(jnp.asarray(
        rng.integers(60, 200, B).astype(np.int32)))
    t0 = time.time()
    c = (jnp.asarray(rng.integers(1, 1000, B).astype(np.int32)), kvb2,
         jnp.zeros(B, jnp.int32))
    for _ in range(64):
        c = fwd_sample(p8, c[0], c[1], c[2])
    t_enq = (time.time() - t0) / 64
    device_sync(c[0])
    print(f"B=8 enqueue-only rate   : {t_enq*1e3:7.3f} ms/dispatch",
          flush=True)

    # 3c. two decode steps unrolled in ONE program (halves dispatches)
    @functools.partial(jax.jit, donate_argnums=2)
    def fwd_sample2(p, toks, kv, ctr):
        outs = []
        for _ in range(2):
            logits, kv = llama.forward_batch(cfg, p, toks[:, None], kv,
                                             kv.lengths, attn_window=256)
            keys = jax.vmap(lambda s, c: jax.random.fold_in(
                jax.random.PRNGKey(s), c))(jnp.asarray(seeds), ctr)
            toks = sample_batch(logits[:, 0, :], keys, jnp.asarray(temps),
                                jnp.asarray(tks), jnp.asarray(tps))
            kv = kv.with_lengths(kv.lengths + 1)
            ctr = ctr + 1
            outs.append(toks)
        return jnp.stack(outs), toks, kv, ctr

    def step2(c):
        outs, t, kv, ctr = fwd_sample2(p8, c[0], c[1], c[2])
        return (t, kv, ctr)

    t_2 = timed_chain("B=8 2-step-unrolled     ", step2,
                      (c[0], c[1], c[2]))
    print(f"  → per decode step     : {t_2/2*1e3:7.3f} ms", flush=True)

    # 4. sampling alone (isolated)
    logits_s = jnp.asarray(rng.standard_normal(
        (3 * 16, B, cfg.n_vocab)).astype(np.float32))
    from ggml_gfx906_tpu.utils.perf import _time_fn
    t_s = _time_fn(lambda lg: sample_batch(
        lg, jax.vmap(jax.random.PRNGKey)(jnp.arange(B, dtype=jnp.uint32)),
        jnp.asarray(temps), jnp.asarray(tks), jnp.asarray(tps)),
        logits_s, iters=16, rounds=2)
    print(f"sampling alone          : {t_s*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
