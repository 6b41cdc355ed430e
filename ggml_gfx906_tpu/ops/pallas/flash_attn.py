"""Causal flash-attention Pallas kernel — tiled online softmax.

Replaces the XLA attention path (which materializes the full (B,H,N,M)
score matrix) on the decode/prefill hot path. This is the TPU-native
analogue of the reference's FlashAttention family:
  - dispatch + tile kernels: src/ggml-cuda/fattn.cu:271-338,
    fattn-tile-f32.cu / fattn-vec-f32.cuh (online softmax over KV tiles)
  - quantized K/V template instances: src/ggml-cuda/fattn.cu:180-270
    (here: int8 K/V with per-(head,position) scales folded into the score
    matrix columns — `s = (q·k_int) * k_scale`, `o = (p * v_scale) @ v_int`
    — so no transposed scale loads are ever needed)
  - logit softcap: ggml_flash_attn_ext_set_softcap (include/ggml.h:2107+)

Design notes (TPU):
  - GQA is handled by folding query heads into rows: q (B,H,N,D) →
    (B*KVH, N*G, D) with row = n*G + g, so every kernel invocation streams
    each K/V tile exactly once for all G query heads sharing it (the
    "commute the GQA group into the M dim" trick).
  - The causal mask is never materialized in HBM: per-batch start
    positions arrive via scalar prefetch and the mask is an in-kernel
    iota comparison. KV tiles entirely above the diagonal (or beyond the
    valid cache length) are skipped by clamping the BlockSpec index —
    repeated block indices issue no DMA, so decode with a short cache in
    a long buffer reads only the valid prefix.
  - Softmax stats (m, l) and the accumulator live in VMEM scratch, f32,
    carried across the innermost (KV) grid dimension; the output is
    normalized and written once on the last KV tile.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Finite "minus infinity": avoids exp(-inf - -inf) = NaN in fully-masked
# rows (same trick as the JAX flash kernels' DEFAULT_MASK_VALUE).
NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def _cdiv(a, b):
    return -(-a // b)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _kernel(pos_ref, *refs, g: int, bn: int, bk: int, n_kv: int, kv_heads: int,
            scale: float, softcap: float, quant: bool):
    if quant:
        q_ref, k_ref, v_ref, kd_ref, vd_ref, o_ref, m_ref, l_ref, acc_ref = refs
    else:
        q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref = refs
        kd_ref = vd_ref = None
    br = bn * g
    i = pl.program_id(0)
    j = pl.program_id(1)
    kk = pl.program_id(2)
    b = i // kv_heads
    pos = pos_ref[b]
    # last KV tile with any unmasked column for this Q tile
    kmax = (pos + (j + 1) * bn - 1) // bk

    @pl.when(kk == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(kk <= kmax)
    def _compute():
        q = q_ref[0].astype(jnp.float32)            # (br, D)
        k = k_ref[0].astype(jnp.float32)            # (bk, D)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if quant:
            s = s * kd_ref[0]                       # (1, bk) column scales
        s = s * scale
        if softcap:
            s = jnp.tanh(s * (1.0 / softcap)) * softcap
        rows = jax.lax.broadcasted_iota(jnp.int32, (br, bk), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (br, bk), 1)
        qpos = pos + j * bn + rows // g             # absolute query position
        s = jnp.where(kk * bk + cols <= qpos, s, NEG_INF)

        m_prev = m_ref[...]                          # (br, 1)
        m_next = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next)                      # (br, bk)
        l_ref[...] = l_ref[...] * alpha + jnp.sum(p, axis=1, keepdims=True)
        m_ref[...] = m_next
        if quant:
            p = p * vd_ref[0]                        # fold V scales into P
        v = v_ref[0].astype(jnp.float32)             # (bk, D)
        pv = jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        acc_ref[...] = acc_ref[...] * alpha + pv

    @pl.when(kk == n_kv - 1)
    def _finalize():
        l = l_ref[...]
        inv = 1.0 / jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_ref[...] * inv).astype(o_ref.dtype)


def _pick_bk(m: int) -> int | None:
    for bk in (512, 256, 128):
        if m % bk == 0:
            return bk
    return None


def supported(q, k, v, pos=None, logit_softcap: float = 0.0) -> bool:
    """Gate for the causal kernel: 4-D q/k/v, head grouping divides, cache
    length a multiple of 128, head_dim ≤ 512."""
    if q.ndim != 4 or k.ndim != 4 or v.ndim != 4:
        return False
    B, H, N, D = q.shape
    KVH, M = k.shape[1], k.shape[2]
    if H % KVH != 0 or k.shape != v.shape or k.shape[0] != B:
        return False
    if k.shape[3] != D or D > 512:
        return False
    return _pick_bk(M) is not None


def causal_flash_attention(q, k, v, pos, scale: float | None = None,
                           logit_softcap: float = 0.0,
                           k_scale=None, v_scale=None):
    """softmax(q·kᵀ·scale + causal_mask) · v with online softmax.

    q (B, H, N, D); k/v (B, KVH, M, D) — f32/bf16, or int8 when
    k_scale/v_scale (B, KVH, M) f32 are given (dequantized value =
    int8 * scale, per head/position row). pos (B,) int32 or scalar: the
    absolute position of each batch's first query row; query row n may
    attend to cache positions ≤ pos+n. Returns (B, H, N, D) in q.dtype.
    """
    B, H, N, D = q.shape
    KVH, M = k.shape[1], k.shape[2]
    g = H // KVH
    if scale is None:
        scale = 1.0 / (D ** 0.5)
    quant = k_scale is not None
    pos = jnp.broadcast_to(jnp.asarray(pos, jnp.int32).reshape(-1), (B,))

    bk = _pick_bk(M)
    n_kv = M // bk
    bn = max(1, min(N, max(1, 256 // g)))
    br = bn * g
    grid_r = _cdiv(N, bn)

    # fold GQA groups into rows: row = n*G + g
    qf = q.reshape(B, KVH, g, N, D).transpose(0, 1, 3, 2, 4)
    qf = qf.reshape(B * KVH, N * g, D)
    pad = grid_r * br - N * g
    if pad:
        qf = jnp.pad(qf, ((0, 0), (0, pad), (0, 0)))
    kf = k.reshape(B * KVH, M, D)
    vf = v.reshape(B * KVH, M, D)

    inputs = [qf, kf, vf]

    def _clamp_kv(i, j, kk, p):
        kmax = (p[i // KVH] + (j + 1) * bn - 1) // bk
        return jnp.minimum(kk, jnp.minimum(kmax, n_kv - 1))

    in_specs = [
        pl.BlockSpec((1, br, D), lambda i, j, kk, p: (i, j, 0)),
        pl.BlockSpec((1, bk, D),
                     lambda i, j, kk, p: (i, _clamp_kv(i, j, kk, p), 0)),
        pl.BlockSpec((1, bk, D),
                     lambda i, j, kk, p: (i, _clamp_kv(i, j, kk, p), 0)),
    ]
    if quant:
        # scales ride as (B*KVH, 1, M): a (1, 1, bk) block's trailing dims
        # match the array dims, which Mosaic requires (a (1, bk) block of a
        # (B*KVH, M) array is rejected — sublane dim 1 ∤ 8)
        in_specs += [
            pl.BlockSpec((1, 1, bk),
                         lambda i, j, kk, p: (i, 0, _clamp_kv(i, j, kk, p))),
            pl.BlockSpec((1, 1, bk),
                         lambda i, j, kk, p: (i, 0, _clamp_kv(i, j, kk, p))),
        ]
        inputs += [k_scale.reshape(B * KVH, 1, M), v_scale.reshape(B * KVH, 1, M)]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B * KVH, grid_r, n_kv),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, br, D), lambda i, j, kk, p: (i, j, 0)),
        scratch_shapes=[
            pltpu.VMEM((br, 1), jnp.float32),    # running max
            pltpu.VMEM((br, 1), jnp.float32),    # running sum
            pltpu.VMEM((br, D), jnp.float32),    # output accumulator
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, g=g, bn=bn, bk=bk, n_kv=n_kv,
                          kv_heads=KVH, scale=float(scale),
                          softcap=float(logit_softcap), quant=quant),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B * KVH, grid_r * br, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=_interpret(),
    )(pos, *inputs)
    out = out[:, :N * g].reshape(B, KVH, N, g, D).transpose(0, 1, 3, 2, 4)
    return out.reshape(B, H, N, D)
