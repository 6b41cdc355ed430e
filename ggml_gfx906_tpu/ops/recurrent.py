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


def mul_mat_id(experts, x, ids):
    """MoE routed matmul (GGML_OP_MUL_MAT_ID).

    experts: (n_expert, N, K) — or a kernel-layout QuantTensor stack is a
    planned extension; x: (T, n_used, K); ids: (T, n_used) int32.
    Returns (T, n_used, N): out[t, e] = x[t, e] @ experts[ids[t, e]].T."""
    w = experts[ids]  # (T, U, N, K) gather
    prec = (jax.lax.Precision.HIGHEST if x.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    return jnp.einsum("tuk,tunk->tun", x, w, precision=prec)
