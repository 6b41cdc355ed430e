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

import functools

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
    """Public entry with ggml's explicit-mask semantics. Arbitrary masks run
    the XLA path; the causal hot path is `causal_flash_attn` (the Pallas
    kernel), which models call directly with positions instead of a mask."""
    return attention_ref(q, k, v, mask, scale, max_bias, logit_softcap, sinks)


def _causal_ref(q, k, v, pos, scale, logit_softcap, k_scale=None,
                v_scale=None):
    """Materialized-mask XLA path with pos-based causal semantics."""
    B, _, N, _ = q.shape
    M = k.shape[2]
    if k_scale is not None:
        return _causal_postscale(q, k, v, k_scale, v_scale, pos, scale,
                                 logit_softcap)
    pos = jnp.broadcast_to(jnp.asarray(pos, jnp.int32).reshape(-1), (B,))
    qpos = pos[:, None, None] + jnp.arange(N, dtype=jnp.int32)[None, :, None]
    mask = jnp.where(jnp.arange(M, dtype=jnp.int32)[None, None, :] <= qpos,
                     0.0, -jnp.inf).astype(jnp.float32)[:, None]  # (B,1,N,M)
    return attention_ref(q, k, v, mask, scale, 0.0, logit_softcap, None)


def _int8_score_dot(qg, k8, kd, scale):
    """Scores against an int8 K segment with the q rows activation-
    quantized per (b, h, n) — ggml's Q8_1 analogue (ref vecdotq.cuh):
    the dot runs int8×int8→int32 on the MXU with no int8→bf16 convert in
    the K stream. Shared by the postscale and window-delta paths, which
    must stay numerically identical. Returns (B, KVH, n, M) f32."""
    qa = jnp.max(jnp.abs(qg.astype(jnp.float32)), axis=-1, keepdims=True)
    qd = qa / 127.0
    q8 = jnp.round(qg.astype(jnp.float32)
                   / jnp.maximum(qd, 1e-30)).astype(jnp.int8)
    s = jnp.einsum("bhnd,bhmd->bhnm", q8, k8,
                   preferred_element_type=jnp.int32).astype(jnp.float32)
    return s * (qd * kd[:, :, None, :] * jnp.float32(scale))


def _causal_postscale(q, k8, v8, kd, vd, pos, scale, softcap):
    """Quantized-KV causal attention WITHOUT materializing the dequantized
    cache: the int8 K/V stream straight into the attention dots (XLA fuses
    the int8→bf16 convert into the contraction operand) and the per-position
    scales apply to the dot OUTPUTS — kd on the scores, vd folded into the
    probabilities. Dequantize-first lets XLA write the expanded bf16 cache
    to HBM, turning the halved read into write+read; measured at the b=32
    serving shape this formulation is 2.2x faster and 1.16x dense bf16
    (scripts/exp_kv_attn.py). The XLA analogue of the reference's in-kernel
    quantized-KV FlashAttention (src/ggml-cuda/fattn.cu:180-270).

    q (B, H, N, D); k8/v8 (B, KVH, M, D) int8; kd/vd (B, KVH, M) f32."""
    B, H, N, D = q.shape
    KVH, M = k8.shape[1], k8.shape[2]
    rep = H // KVH
    dot_t = jnp.float32 if q.dtype == jnp.float32 else jnp.bfloat16
    # f32 compute must not silently truncate q to bf16 in the MXU dots —
    # attention_ref runs HIGHEST for f32 and the parity thresholds assume
    # it (ADVICE r04; CPU tests pass either way, TPU default is bf16)
    prec = (jax.lax.Precision.HIGHEST if q.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    # group query heads by their kv head instead of repeating the int8
    # cache (a repeat would materialize the expanded cache to HBM):
    # q head h uses kv head h // rep, so the (H, N) axes flatten to
    # (KVH, rep*N) rows with row j of group kvh at query offset j % N
    qg = q.reshape(B, KVH, rep * N, D)
    from ..utils import config

    if (N == 1 and q.dtype != jnp.float32
            and bool(config.get("kv_attn_int8_dot"))):
        # _int8_score_dot: measured (scripts/exp_kv_long.py, B=32 H=32
        # D=128 M=1024) 0.252 ms/step vs postscale 0.361 vs dense bf16
        # 0.607. DECODE ONLY (N == 1): the chunked-prefill shape measured
        # a regression with quantized q rows (scripts/exp_engine_w512.py),
        # and prefill is MXU-bound, not KV-read-bound. Adds a bounded
        # |q|/127-per-row rounding to the scores; f32 compute paths keep
        # the exact dots.
        s = _int8_score_dot(qg, k8, kd, scale)
    else:
        s = jnp.einsum("bhnd,bhmd->bhnm", qg.astype(dot_t),
                       k8.astype(dot_t),
                       preferred_element_type=jnp.float32, precision=prec)
        s = s * (kd[:, :, None, :] * jnp.float32(scale))
    if softcap != 0.0:
        s = jnp.tanh(s * (1.0 / softcap)) * softcap
    pos = jnp.broadcast_to(jnp.asarray(pos, jnp.int32).reshape(-1), (B,))
    qpos = (pos[:, None]
            + (jnp.arange(rep * N, dtype=jnp.int32) % N)[None])  # (B, rN)
    mask = jnp.where(
        jnp.arange(M, dtype=jnp.int32)[None, None, :] <= qpos[:, :, None],
        0.0, -jnp.inf).astype(jnp.float32)[:, None]              # (B,1,rN,M)
    p = jax.nn.softmax(s + mask, axis=-1)
    pv = (p * vd[:, :, None, :]).astype(dot_t)
    out = jnp.einsum("bhnm,bhmd->bhnd", pv, v8.astype(dot_t),
                     preferred_element_type=jnp.float32, precision=prec)
    return out.reshape(B, H, N, D).astype(q.dtype)


def causal_attn_delta(q, kc, vc, kd, vd, len0, dk, dv, step,
                      scale: float | None = None):
    """Decode attention over a BIG cache segment plus a small per-window
    DELTA segment, merged at score level (runtime/engine.py window-delta
    flow; see config `engine_window_delta`).

    q (B, H, 1, D) at per-slot positions len0(B,)+step; big cache kc/vc
    (B, KVH, W, D) bf16 — or int8 with kd/vd (B, KVH, W) postscale
    scales — holds rows [0, len0); delta dk/dv (B, KVH, DEPTH, D) bf16
    holds the window's fresh rows at positions len0+j, valid for j <=
    step. Scores for both segments concatenate (tiny at decode: (B, H,
    W+DEPTH) f32) into ONE softmax, then out = P_big.V_big +
    P_delta.V_delta — the big cache is never copied or concatenated.
    Equivalent to writing the rows into the big cache and attending
    [0, len0+step] (ulp-level: reduction order differs)."""
    B, H, N, D = q.shape
    assert N == 1, "delta attention is decode-only"
    KVH, W = kc.shape[1], kc.shape[2]
    DEPTH = dk.shape[2]
    rep = H // KVH
    # bf16 only when the model computes in bf16; f32/f64 (grad checks)
    # keep exact dots
    dot_t = jnp.bfloat16 if q.dtype == jnp.bfloat16 else jnp.float32
    prec = (jax.lax.Precision.DEFAULT if q.dtype == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)
    if scale is None:
        scale = 1.0 / (D ** 0.5)
    qg = q.reshape(B, KVH, rep, D)
    from ..utils import config

    quant = kd is not None
    if (quant and N == 1 and q.dtype == jnp.bfloat16
            and bool(config.get("kv_attn_int8_dot"))):
        s_big = _int8_score_dot(qg, kc, kd, scale)
    elif quant:
        s_big = jnp.einsum("bhnd,bhmd->bhnm", qg.astype(dot_t),
                           kc.astype(dot_t),
                           preferred_element_type=jnp.float32,
                           precision=prec)
        s_big = s_big * (kd[:, :, None, :] * jnp.float32(scale))
    else:
        s_big = jnp.einsum("bhnd,bhmd->bhnm", qg.astype(dot_t),
                           kc.astype(dot_t),
                           preferred_element_type=jnp.float32,
                           precision=prec) * jnp.float32(scale)
    s_dlt = jnp.einsum("bhnd,bhmd->bhnm", qg.astype(dot_t),
                       dk.astype(dot_t),
                       preferred_element_type=jnp.float32,
                       precision=prec) * jnp.float32(scale)
    len0 = jnp.asarray(len0, jnp.int32).reshape(-1)
    mask_big = jnp.where(
        jnp.arange(W, dtype=jnp.int32)[None, :] < len0[:, None],
        0.0, -jnp.inf).astype(jnp.float32)[:, None, None]    # (B,1,1,W)
    mask_dlt = jnp.where(
        jnp.arange(DEPTH, dtype=jnp.int32) <= jnp.int32(step),
        0.0, -jnp.inf).astype(jnp.float32)[None, None, None]
    p = jax.nn.softmax(
        jnp.concatenate([s_big + mask_big, s_dlt + mask_dlt], axis=-1),
        axis=-1)
    p_big, p_dlt = p[..., :W], p[..., W:]
    if quant:
        p_big = p_big * vd[:, :, None, :]
    out = jnp.einsum("bhnm,bhmd->bhnd", p_big.astype(dot_t),
                     vc.astype(dot_t),
                     preferred_element_type=jnp.float32, precision=prec)
    out = out + jnp.einsum("bhnm,bhmd->bhnd", p_dlt.astype(dot_t),
                           dv.astype(dot_t),
                           preferred_element_type=jnp.float32,
                           precision=prec)
    return out.reshape(B, H, N, D).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _causal_kernel(q, k, v, pos, scale, logit_softcap):
    from .pallas import flash_attn as _fa

    return _fa.causal_flash_attention(q, k, v, pos, scale, logit_softcap)


def _causal_kernel_fwd(q, k, v, pos, scale, logit_softcap):
    return _causal_kernel(q, k, v, pos, scale, logit_softcap), (q, k, v, pos)


def _causal_kernel_bwd(scale, logit_softcap, res, g):
    # Recompute through the XLA reference (identical math to the kernel).
    q, k, v, pos = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_: _causal_ref(q_, k_, v_, pos, scale, logit_softcap),
        q, k, v)
    dq, dk, dv = vjp(g)
    import numpy as np

    return dq, dk, dv, np.zeros(pos.shape, jax.dtypes.float0)


_causal_kernel.defvjp(_causal_kernel_fwd, _causal_kernel_bwd)


def causal_flash_attn(q, k, v, pos, scale: float | None = None,
                      logit_softcap: float = 0.0,
                      k_scale=None, v_scale=None, force_ref: bool = False):
    """Causal attention against a (possibly longer) KV cache.

    q (B, H, N, D) at absolute positions pos(B,)+n; k/v (B, KVH, M, D)
    (int8 with k_scale/v_scale (B, KVH, M) when the cache is quantized).
    Dispatches to the Pallas flash kernel (ops/pallas/flash_attn.py) and
    falls back to the materialized-mask XLA path otherwise. Differentiable:
    the backward pass recomputes through the XLA reference."""
    from ..utils import config
    from .pallas import flash_attn as _fa

    if scale is None:
        scale = 1.0 / (q.shape[-1] ** 0.5)
    if config.get("attn_impl") == "xla":
        force_ref = True
    if not force_ref and _fa.supported(q, k, v, pos, logit_softcap):
        pos = jnp.broadcast_to(jnp.asarray(pos, jnp.int32).reshape(-1),
                               (q.shape[0],))
        if k_scale is not None:  # inference-only quantized-KV path
            return _fa.causal_flash_attention(q, k, v, pos, scale,
                                              logit_softcap, k_scale, v_scale)
        return _causal_kernel(q, k, v, pos, float(scale),
                              float(logit_softcap))
    return _causal_ref(q, k, v, pos, scale, logit_softcap, k_scale, v_scale)
