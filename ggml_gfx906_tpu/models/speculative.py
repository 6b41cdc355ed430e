"""Speculative decoding with exact greedy verification (TPU-native).

Single-stream decode is weight-stream-bound (docs/PERFORMANCE.md): one
token costs one full read of the weights. Verifying k drafted tokens in
ONE forward costs nearly the same HBM traffic as one decode step (the
weight stream is shared across the k+1 positions; flash attention reads
the cache once), so every accepted draft token is almost free. This
module implements the llama.cpp-family "lookup decoding" idea for this
framework (beyond the ggml reference, which has no speculative path —
its single-stream decode loop is examples/gpt-2/main-backend.cpp:732):

- **Exactness**: the emitted stream is bit-identical to plain greedy
  decode regardless of draft quality. The verify forward computes the
  full model's argmax at every drafted position; the accepted prefix is
  exactly the greedy chain, and the first mismatch is replaced by the
  full model's own argmax (which is the correct greedy token because its
  query attends only to correct-prefix cache rows).
- **No rollback**: K/V rows written past the accepted prefix are stale
  but never read — attention masks by query position, and the next
  verify window rewrites positions [start', start'+k] which always
  covers the stale tail (start' = start+m+1, tail ends at start+k,
  and start+m+1+k >= start+k). Same invariant the serving engine relies
  on for post-completion in-flight steps (docs/SERVING.md).
- **Device-resident drafting**: the prompt-lookup (n-gram) proposal runs
  INSIDE the jitted step against a device-resident token history — the
  whole speculate→verify→accept→append step is one program whose carry
  (history, length, cache) chains device-side, so steps dispatch without
  host round trips and tokens are harvested in windows (the engine's
  pipelined-harvest pattern; a host fetch per step would cost a ~20-36 ms
  round trip each on this runtime, utils/perf.py).

A model-draft variant (layer-skip self-draft or any smaller model) is
provided for completeness; it runs the draft's own cache with the same
overwrite-safe semantics.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import llama
from ..runtime.kv_cache import KVCache


def _propose_ngram(hist: jax.Array, L: jax.Array, k: int) -> jax.Array:
    """Prompt-lookup proposal: find the most recent earlier occurrence of
    the current bigram (hist[L-2], hist[L-1]) in the device-resident
    history and propose the k tokens that followed it. Falls back to
    repeating the current token when no bigram recurs (harmless: rejected
    proposals cost nothing extra — the verify step runs either way).

    hist (maxlen,) int32; L scalar int32 (valid prefix length, >= 2 after
    prompt+first token). Returns (k,) int32."""
    maxlen = hist.shape[0]
    idx = jnp.arange(maxlen, dtype=jnp.int32)
    t1 = hist[L - 1]
    t2 = hist[L - 2]
    prev = jnp.roll(hist, 1)
    cand = (hist == t1) & (prev == t2) & (idx >= 1) & (idx < L - 1)
    j = jnp.max(jnp.where(cand, idx, -1))
    # continue MODULO the detected period p = L-1-j: a plain slice past
    # the match would run into rows beyond the valid history exactly in
    # the most valuable case (a short repetition cycle, p < k); for a
    # far-back match (p >= k) the modulo is the identity and this is the
    # classic following-tokens proposal. Indices stay < L-1 — never the
    # stale candidate tail.
    p = jnp.maximum(L - 1 - j, 1)
    offs = jnp.maximum(j, 0) + 1 + jnp.arange(k, dtype=jnp.int32) % p
    cont = jnp.take(hist, offs)
    return jnp.where(j >= 0, cont, jnp.broadcast_to(t1, (k,)))


@functools.partial(jax.jit, static_argnums=(0, 1), donate_argnums=(3,))
def spec_step(cfg, k: int, params, carry):
    """One speculative step: propose k tokens by prompt-lookup, verify all
    k+1 positions in one forward, accept the greedy prefix, append to the
    device history. carry = (hist (maxlen,) i32, L scalar i32, kv);
    positions: hist[L-1] is the current token, written at cache row L-1.

    Returns (carry', (greedy (k+1,), m)): greedy[i] is the full model's
    argmax after position L-1+i; m is the number of accepted draft tokens,
    so greedy[:m+1] are the emitted tokens (exactly the plain greedy
    chain) and the carry advances by m+1."""
    hist, L, kv = carry
    cur = jax.lax.dynamic_slice(hist, (L - 1,), (1,))
    draft = jnp.concatenate([cur, _propose_ngram(hist, L, k)])
    logits, kv = llama.forward(cfg, params, draft, kv, L - 1)
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)      # (k+1,)
    ok = jnp.concatenate([draft[1:] == greedy[:-1],
                          jnp.zeros((1,), bool)])               # sentinel
    m = jnp.argmin(ok).astype(jnp.int32)       # first mismatch index
    # append all k+1 candidates; only L advances by m+1 — the stale tail
    # is overwritten by the next window before it can ever be proposed
    # (idx < L-1 guards the n-gram search; dynamic_update_slice clamps,
    # so size the history with >= k+1 slack past the last live token)
    hist = jax.lax.dynamic_update_slice(hist, greedy, (L,))
    # cache length is bookkeeping (masks ride on start); keep it truthful
    kv = KVCache(kv.k, kv.v, kv.k_d, kv.v_d, L + m + 1)
    return (hist, L + m + 1, kv), (greedy, m)


@functools.partial(jax.jit, static_argnums=0)
def _stack_outs(n: int, outs):
    """Stack n per-step (greedy, m) handles in ONE program (eager stacking
    dispatches per element on this runtime — utils/perf.py)."""
    return (jnp.stack([g for g, _ in outs]),
            jnp.stack([m for _, m in outs]))


def spec_generate(cfg, params, prompt_tokens, n_predict: int, k: int = 8,
                  max_seq: int | None = None, window: int = 8,
                  return_stats: bool = False):
    """Greedy decode accelerated by self-lookup speculation; the token
    stream is IDENTICAL to llama.generate(greedy) by construction.

    k: drafted tokens per verify step (static — one compiled program).
    window: spec steps dispatched per harvest fetch (device-chained)."""
    prompt = list(map(int, prompt_tokens))
    if n_predict < 1:
        return (list(prompt), {"spec_steps": 0, "accepted_per_step": [],
                               "accept_rate": 0.0, "tokens_per_step": 0}
                ) if return_stats else list(prompt)
    P = len(prompt)
    cap = max_seq or cfg.n_ctx
    if P + n_predict + k + 1 > cap:
        raise ValueError(f"need max_seq >= {P + n_predict + k + 1}")
    kv = llama.make_cache(cfg, cap)
    toks = jnp.asarray(np.asarray(prompt, np.int32))
    logits, kv = llama.forward_jit(cfg, params, toks, kv, jnp.int32(0))
    first = jnp.argmax(logits[-1]).astype(jnp.int32)
    # device-resident history: prompt + first token, with k+1 slack rows
    # so the unconditional (k+1)-token append never clamps mid-window
    hist = jnp.zeros((cap + k + 1,), jnp.int32)
    hist = hist.at[:P].set(toks).at[P].set(first)
    carry = (hist, jnp.int32(P + 1), kv)

    out: list[int] = []
    steps = 0
    accepts: list[int] = []
    while len(out) < n_predict - 1:
        # a step is safe while L <= cap-k (its writes reach row L-1+k);
        # clamp the window so even all-accept steps stay inside the cache
        L_now = P + 1 + len(out)
        w = min(window, max(1, (cap - k - L_now) // (k + 1) + 1))
        handles = []
        for _ in range(w):
            carry, gm = spec_step(cfg, k, params, carry)
            handles.append(gm)
        steps += w
        gs, ms = jax.device_get(_stack_outs(w, handles))
        for g, m in zip(np.asarray(gs), np.asarray(ms)):
            accepts.append(int(m))
            out.extend(int(t) for t in g[:m + 1])
    stream = prompt + [int(jax.device_get(first))] + out[:n_predict - 1]
    if return_stats:
        return stream, {
            "spec_steps": steps,
            "accepted_per_step": accepts,
            "accept_rate": float(np.mean(accepts)) / k if steps else 0.0,
            "tokens_per_step": (1 + float(np.mean(accepts))) if steps else 0,
        }
    return stream


# ---------------------------------------------------------------------------
# model-draft variant (layer-skip self-draft or an independent small model)


def make_layer_draft(cfg, params, n_layers: int):
    """Layer-skip self-draft: the first n_layers blocks of the same model
    (weights shared — zero extra HBM). The classic early-exit draft."""
    dcfg = dataclasses.replace(cfg, n_layer=n_layers)
    dparams = dict(params)
    dparams["blocks"] = params["blocks"][:n_layers]
    return dcfg, dparams


@functools.partial(jax.jit, static_argnums=(0, 1, 2), donate_argnums=(4, 6))
def model_spec_step(cfg, dcfg, k: int, params, kv, dparams, dkv, tok, start):
    """One speculative step with a MODEL draft: k greedy draft steps (the
    draft's own cache), then one full-model verify of all k+1 positions.
    Returns (greedy, m, kv, dkv, next_tok, next_start); emitted tokens are
    greedy[:m+1], exactly the full model's greedy chain. Both caches rely
    on the same overwrite-safe stale-tail invariant as spec_step."""
    def dstep(c, i):
        t, dkv = c
        lg, dkv = llama.forward(dcfg, dparams, t, dkv, start + i)
        return (jnp.argmax(lg[-1]).astype(jnp.int32)[None], dkv), t[0]

    # drafted (k,) = the scan's INPUT tokens [tok, d1..d_{k-1}]; the final
    # carry is d_k — together the k+1 positions the verify forward covers
    (last, dkv), drafted = jax.lax.scan(
        dstep, (tok, dkv), jnp.arange(k, dtype=jnp.int32))
    draft = jnp.concatenate([drafted, last])
    logits, kv = llama.forward(cfg, params, draft, kv, start)
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    ok = jnp.concatenate([draft[1:] == greedy[:-1], jnp.zeros((1,), bool)])
    m = jnp.argmin(ok).astype(jnp.int32)
    nxt = jax.lax.dynamic_slice(greedy, (m,), (1,))
    kv = KVCache(kv.k, kv.v, kv.k_d, kv.v_d, start + m + 1)
    return greedy, m, kv, dkv, nxt, start + m + 1


def model_spec_generate(cfg, params, prompt_tokens, n_predict: int,
                        draft: tuple | None = None, draft_layers: int = 4,
                        k: int = 4, max_seq: int | None = None,
                        return_stats: bool = False):
    """Greedy decode with a MODEL draft (default: layer-skip self-draft of
    the first `draft_layers` blocks, weights shared). Token stream is
    identical to llama.generate(greedy). draft: optional (dcfg, dparams)
    for an independent draft model sharing the tokenizer/vocab."""
    dcfg, dparams = draft or make_layer_draft(cfg, params, draft_layers)
    prompt = list(map(int, prompt_tokens))
    P = len(prompt)
    cap = max_seq or cfg.n_ctx
    if P + n_predict + k + 1 > cap:
        raise ValueError(f"need max_seq >= {P + n_predict + k + 1}")
    kv = llama.make_cache(cfg, cap)
    dkv = llama.make_cache(dcfg, cap)
    toks = jnp.asarray(np.asarray(prompt, np.int32))
    logits, kv = llama.forward_jit(cfg, params, toks, kv, jnp.int32(0))
    _, dkv = llama.forward_jit(dcfg, dparams, toks, dkv, jnp.int32(0))
    tok = jnp.argmax(logits[-1]).astype(jnp.int32)[None]
    out = [int(tok[0])]
    start = jnp.int32(P)
    accepts = []
    while len(out) < n_predict:
        greedy, m, kv, dkv, tok, start = model_spec_step(
            cfg, dcfg, k, params, kv, dparams, dkv, tok, start)
        mi = int(m)
        accepts.append(mi)
        out.extend(int(t) for t in np.asarray(greedy)[:mi + 1])
    stream = prompt + out[:n_predict]
    if return_stats:
        return stream, {"spec_steps": len(accepts),
                        "accepted_per_step": accepts,
                        "accept_rate": (float(np.mean(accepts)) / k
                                        if accepts else 0.0)}
    return stream
