"""Recurrent token-mixing ops: RWKV6/RWKV7 WKV, gated linear attention,
and MoE routing (MUL_MAT_ID).

ref: src/ggml-cpu/ops.cpp scalar kernels —
rwkv_wkv6 (state' = decay⊙state + k⊗v; out = r·(u⊙(k⊗v) + state)),
rwkv_wkv7 (state' = w⊙state + v⊗k + (state·a)⊗b; out = state·r),
gated_linear_attn (state' = g⊙state + k⊗v; out = scale·q·state');
ggml_mul_mat_id (per-token expert routing, include/ggml.h).

Token recurrences run as lax.scan (sequential per token, vectorized over
batch/heads/channels — the same fusion the reference comments describe).
State layout per head is [i, j] matching the reference indexing.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def rwkv_wkv6(k, v, r, time_faaaa, time_decay, state0):
    """k, v, r, time_decay: (B, T, H, D); time_faaaa: (H, D);
    state0: (B, H, D, D) indexed [i(k/r-dim), j(v-dim)].
    Returns (out (B, T, H, D), state (B, H, D, D))."""
    f32 = jnp.float32
    u = time_faaaa.astype(f32)

    def step(state, inp):
        kt, vt, rt, wt = inp  # (B, H, D) each
        kv = kt[..., :, None] * vt[..., None, :]          # (B, H, D, D) [i,j]
        out = jnp.einsum("bhi,bhij->bhj", rt,
                         u[None, :, :, None] * kv + state)
        state = state * wt[..., :, None] + kv
        return state, out

    xs = tuple(jnp.moveaxis(a.astype(f32), 1, 0) for a in (k, v, r, time_decay))
    state, outs = jax.lax.scan(step, state0.astype(f32), xs)
    return jnp.moveaxis(outs, 0, 1), state


def rwkv_wkv7(r, w, k, v, a, b, state0):
    """All of r/w/k/v/a/b: (B, T, H, D); state0: (B, H, D, D) indexed
    [i(v-dim), j(r/w/k-dim)]. Returns (out (B, T, H, D), state)."""
    f32 = jnp.float32

    def step(state, inp):
        rt, wt, kt, vt, at, bt = inp
        sa = jnp.einsum("bhj,bhij->bhi", at, state)       # (B, H, D_i)
        state = (state * wt[..., None, :]
                 + vt[..., :, None] * kt[..., None, :]
                 + sa[..., :, None] * bt[..., None, :])
        out = jnp.einsum("bhij,bhj->bhi", state, rt)
        return state, out

    xs = tuple(jnp.moveaxis(x.astype(f32), 1, 0) for x in (r, w, k, v, a, b))
    state, outs = jax.lax.scan(step, state0.astype(f32), xs)
    return jnp.moveaxis(outs, 0, 1), state


def gated_linear_attn(k, v, q, g, state0, scale: float = 1.0):
    """k, v, q, g: (B, T, H, D); state0 (B, H, D, D) [i(k/q-dim), j(v-dim)].
    Returns (out (B, T, H, D), state)."""
    f32 = jnp.float32

    def step(state, inp):
        kt, vt, qt, gt = inp
        kv = kt[..., :, None] * vt[..., None, :]
        state = state * gt[..., :, None] + kv
        out = jnp.einsum("bhi,bhij->bhj", qt * jnp.float32(scale), state)
        return state, out

    xs = tuple(jnp.moveaxis(x.astype(f32), 1, 0) for x in (k, v, q, g))
    state, outs = jax.lax.scan(step, state0.astype(f32), xs)
    return jnp.moveaxis(outs, 0, 1), state


def mul_mat_id(experts, x, ids, capacity: int | None = None):
    """MoE routed matmul (GGML_OP_MUL_MAT_ID).

    experts: (n_expert, N, K) array or a sequence of per-expert weights —
    each a dense (N, K) array or a kernel-layout QuantTensor (the fused
    Pallas kernels then serve each expert's matmul). x: (T, n_used, K);
    ids: (T, n_used) int32. Returns (T, n_used, N):
    out[t, u] = x[t, u] @ experts[ids[t, u]].T.

    TPU-native dispatch (GShard-style), replacing the reference's dynamic
    row grouping (src/ggml-cuda/ggml-cuda.cu MUL_MAT_ID path) which needs
    data-dependent shapes XLA forbids: tokens scatter into a static
    (n_expert, capacity, K) buffer by their position within their expert's
    queue, one matmul runs per expert, and results gather back. With the
    default capacity = T·n_used the result is exact for any routing; a
    smaller capacity (e.g. 2·T·n_used/E) trades the balanced-routing
    assumption for proportional compute, zeroing overflowing tokens —
    standard TPU serving practice.

    ids outside [0, n_expert) mark pre-dropped tokens (output zero, no
    queue slot consumed) — the expert-parallel dispatch (parallel/ep.py)
    uses this to exclude tokens routed to other devices' experts without
    perturbing local queue positions."""
    from .quantized import QuantTensor, qmatmul

    T, U, K = x.shape
    E = len(experts)
    C = T * U if capacity is None else min(capacity, T * U)
    xf = x.reshape(T * U, K)
    idf = ids.reshape(T * U)
    idc = jnp.clip(idf, 0, E - 1).astype(jnp.int32)
    onehot = idf[:, None] == jnp.arange(E, dtype=idf.dtype)[None, :]
    # position of each token within its expert's queue (out-of-range ids
    # have an all-false onehot row, so they never advance any queue)
    pos = jnp.take_along_axis(jnp.cumsum(onehot, axis=0) - 1,
                              idc[:, None], axis=1)[:, 0]
    keep = (pos < C) & (idf >= 0) & (idf < E)
    slot = jnp.where(keep, idc * C + pos, E * C)       # drops → scratch row
    buf = jnp.zeros((E * C + 1, K), jnp.float32)
    buf = buf.at[slot].set(xf.astype(jnp.float32))
    buf = buf[:E * C].reshape(E, C, K)

    if isinstance(experts, (list, tuple)):
        ys = [qmatmul(buf[e], experts[e]) if isinstance(experts[e], QuantTensor)
              else _dense_nt(buf[e], experts[e]) for e in range(E)]
        y = jnp.stack(ys)                              # (E, C, N)
    else:
        prec = (jax.lax.Precision.HIGHEST if x.dtype == jnp.float32
                else jax.lax.Precision.DEFAULT)
        y = jax.lax.dot_general(
            buf, experts.astype(jnp.float32),
            (((2,), (2,)), ((0,), (0,))), precision=prec)  # (E, C, N)
    n = y.shape[-1]
    yf = y.reshape(E * C, n)
    out = yf[jnp.where(keep, idc * C + pos, 0)]
    out = jnp.where(keep[:, None], out, 0.0)
    return out.reshape(T, U, n).astype(x.dtype)


def _dense_nt(a, w):
    return jax.lax.dot_general(
        a, w.astype(jnp.float32), (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST)
