"""Attention: reference semantics of GGML_OP_FLASH_ATTN_EXT in jax.

ref: ggml_flash_attn_ext include/ggml.h:2107-2127 (scale, max_bias/ALiBi,
logit_softcap, optional sinks); CPU kernel src/ggml-cpu/ops.cpp
flash_attn_ext; CUDA dispatch src/ggml-cuda/fattn.cu:271-338.

Array convention (numpy order): q (B, H, N, D), k/v (B, H_kv, M, D) with
grouped-query broadcast when H > H_kv, additive mask (..., N, M).
Output (B, H, N, D). XLA fuses this reasonably; the Pallas flash kernel
(ops/pallas/flash_attn.py) replaces it on the hot path with identical
semantics.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .basic import alibi_slopes


def attention_ref(q, k, v, mask=None, scale: float | None = None,
                  max_bias: float = 0.0, logit_softcap: float = 0.0,
                  sinks=None):
    """Naive reference attention (the oracle for kernels)."""
    B, H, N, D = q.shape
    Hkv = k.shape[1]
    if scale is None:
        scale = 1.0 / (D ** 0.5)
    if Hkv != H:
        assert H % Hkv == 0
        rep = H // Hkv
        k = jnp.repeat(k, rep, axis=1)
        v = jnp.repeat(v, rep, axis=1)
    prec = (jax.lax.Precision.HIGHEST if q.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    s = jnp.einsum("bhnd,bhmd->bhnm", q.astype(jnp.float32),
                   k.astype(jnp.float32), precision=prec) * jnp.float32(scale)
    if logit_softcap != 0.0:
        s = jnp.tanh(s * (1.0 / logit_softcap)) * logit_softcap
    if mask is not None:
        slope = alibi_slopes(H, max_bias).reshape(1, H, 1, 1)
        s = s + slope * mask.astype(jnp.float32)
    m = s.max(axis=-1, keepdims=True)
    if sinks is not None:
        sk = sinks.astype(jnp.float32).reshape(1, H, 1, 1)
        m = jnp.maximum(m, sk)
    e = jnp.exp(s - m)
    denom = e.sum(axis=-1, keepdims=True)
    if sinks is not None:
        denom = denom + jnp.exp(sk - m)
    p = e / denom
    out = jnp.einsum("bhnm,bhmd->bhnd", p, v.astype(jnp.float32),
                     precision=prec)
    return out.astype(q.dtype)


def flash_attn_ext(q, k, v, mask=None, scale: float | None = None,
                   max_bias: float = 0.0, logit_softcap: float = 0.0,
                   sinks=None):
    """Public entry — currently the XLA path; swapped to Pallas when the
    shapes qualify (see ops/pallas)."""
    from .pallas import flash_attn as _fa

    if _fa.supported(q, k, v, mask, max_bias, logit_softcap, sinks):
        return _fa.flash_attention(q, k, v, mask, scale, logit_softcap)
    return attention_ref(q, k, v, mask, scale, max_bias, logit_softcap, sinks)
