"""Token sampling: greedy + top-k/top-p with temperature.

ref: gpt_sample_top_k_top_p examples/common.cpp:113-121 (and its impl in
examples/common.cpp) — logits are scaled by 1/temp, restricted to the top-k,
renormalized, then nucleus-filtered by cumulative probability top_p.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def greedy(logits: jax.Array) -> jax.Array:
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def sample_top_k_top_p(logits: jax.Array, key: jax.Array, top_k: int = 40,
                       top_p: float = 0.9, temp: float = 1.0) -> jax.Array:
    """logits: (n_vocab,) → scalar int32 token id."""
    lf = logits.astype(jnp.float32)
    if temp != 1.0:
        lf = lf / temp
    k = min(top_k, lf.shape[-1]) if top_k > 0 else lf.shape[-1]
    vals, idx = jax.lax.top_k(lf, k)
    probs = jax.nn.softmax(vals)
    if top_p < 1.0:
        csum = jnp.cumsum(probs)
        # keep tokens until cumulative prob exceeds top_p (always keep first)
        keep = jnp.concatenate([jnp.ones((1,), bool), csum[:-1] < top_p])
        probs = jnp.where(keep, probs, 0.0)
        probs = probs / probs.sum()
    choice = jax.random.categorical(key, jnp.log(jnp.maximum(probs, 1e-30)))
    return idx[choice].astype(jnp.int32)


def sample_batch(logits, keys, temp, top_k, top_p, max_k: int = 64):
    """Batched per-slot sampling for the serving engine.

    logits (B, V); keys (B, 2) uint32 PRNG keys; temp/top_p (B,) f32;
    top_k (B,) int32 in [1, max_k]. temp == 0 selects greedy for that slot.
    All sampling parameters are traced, so one compiled program serves any
    mix of per-request settings (ref: per-sequence sampler state in
    examples/common.cpp gpt_sample_top_k_top_p).
    """
    b, v = logits.shape
    max_k = min(max_k, v)
    lf = logits.astype(jnp.float32)
    safe_t = jnp.where(temp > 0, temp, 1.0)
    vals, idx = jax.lax.top_k(lf / safe_t[:, None], max_k)   # (B, max_k)
    kk = jnp.clip(top_k, 1, max_k)
    in_k = jnp.arange(max_k)[None, :] < kk[:, None]
    probs = jax.nn.softmax(jnp.where(in_k, vals, -jnp.inf), axis=-1)
    csum = jnp.cumsum(probs, axis=-1)
    keep = jnp.concatenate(
        [jnp.ones((b, 1), bool), csum[:, :-1] < top_p[:, None]], axis=1)
    probs = jnp.where(keep & in_k, probs, 0.0)
    logp = jnp.log(jnp.maximum(probs / probs.sum(-1, keepdims=True), 1e-30))
    choice = jax.vmap(jax.random.categorical)(keys, logp)    # (B,)
    sampled = jnp.take_along_axis(idx, choice[:, None], axis=1)[:, 0]
    return jnp.where(temp > 0, sampled,
                     jnp.argmax(lf, axis=-1)).astype(jnp.int32)
