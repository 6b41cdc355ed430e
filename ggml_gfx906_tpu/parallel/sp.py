"""Sequence (context) parallelism: ring attention over an 'sp' mesh axis.

The reference has NO sequence parallelism (SURVEY §5: long context is
single-device flash attention + quantized KV only) — this is the TPU-native
extension the survey calls out: shard the sequence dimension of Q/K/V over
the mesh and rotate K/V chunks around the ICI ring with `jax.lax.ppermute`,
merging per-chunk partial attention with the same online-softmax update the
flash kernel uses (ops/pallas/flash_attn.py). Every device streams each K/V
chunk exactly once, no device ever materializes more than (N/sp) query rows
x (M/sp) key columns of scores, and peak activation memory per device drops
by sp^2 for the score tile.

Semantics match `ops.attention_ref` with a causal mask (the prefill shape):
q/k/v (B, H|KVH, S, D) with GQA broadcast, scale, optional logit softcap.

    mesh = make_mesh(dp=2, tp=1, sp=4)
    out = ring_self_attention(mesh, q, k, v)     # == causal attention_ref
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

# Finite -inf: exp(NEG_INF - NEG_INF) = 1 would poison fully-masked rows if
# we used true -inf; matches the flash kernel's mask value.
NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def _chunk_attn(q, k, v, row0, col0, scale, softcap, m, l, acc):
    """One online-softmax update of (m, l, acc) with a K/V chunk.

    q (B,H,C,D) at global rows row0+arange(C); k/v (B,H,Ck,D) at global
    cols col0+arange(Ck). All f32."""
    C, Ck = q.shape[2], k.shape[2]
    s = jax.lax.dot_general(
        q, k, (((3,), (3,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32) * jnp.float32(scale)
    if softcap != 0.0:
        s = jnp.tanh(s * (1.0 / softcap)) * softcap
    rows = row0 + jnp.arange(C, dtype=jnp.int32)
    cols = col0 + jnp.arange(Ck, dtype=jnp.int32)
    causal = cols[None, :] <= rows[:, None]                  # (C, Ck)
    s = jnp.where(causal[None, None], s, NEG_INF)
    m_new = jnp.maximum(m, s.max(axis=-1))
    # corrected exp terms; fully-masked chunks contribute exactly zero
    p = jnp.exp(s - m_new[..., None])
    p = jnp.where(causal[None, None], p, 0.0)
    corr = jnp.exp(m - m_new)
    l_new = l * corr + p.sum(axis=-1)
    acc_new = acc * corr[..., None] + jax.lax.dot_general(
        p, v, (((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32)
    return m_new, l_new, acc_new


def _ring_body(q, k, v, *, axis, sp, scale, softcap):
    """shard_map body: local q chunk vs all K/V chunks, rotated over ICI.

    K/V travel the ring in their INPUT dtype and original KVH head count;
    the f32 cast and GQA head-repeat happen per chunk inside the update,
    so ring ICI traffic is B*KVH*Ck*D*itemsize per step instead of
    rep x (and 2x for bf16) more. Chunks with j > i are fully causally
    masked and contribute exactly zero — a zigzag chunk assignment would
    reclaim those FLOPs and is a known perf follow-up, not a correctness
    issue."""
    i = jax.lax.axis_index(axis)
    B, H, C, D = q.shape
    Hkv = k.shape[1]
    rep = H // Hkv
    q = q.astype(jnp.float32)
    Ck = k.shape[2]
    row0 = i * C
    m = jnp.full((B, H, C), NEG_INF, jnp.float32)
    l = jnp.zeros((B, H, C), jnp.float32)
    acc = jnp.zeros((B, H, C, D), jnp.float32)
    perm = [(s, (s + 1) % sp) for s in range(sp)]
    for t in range(sp):
        j = (i - t) % sp                  # chunk currently held
        kc = k.astype(jnp.float32)
        vc = v.astype(jnp.float32)
        if rep != 1:
            kc = jnp.repeat(kc, rep, axis=1)
            vc = jnp.repeat(vc, rep, axis=1)
        m, l, acc = _chunk_attn(q, kc, vc, row0, j * Ck, scale, softcap,
                                m, l, acc)
        if t + 1 < sp:
            k = jax.lax.ppermute(k, axis, perm)
            v = jax.lax.ppermute(v, axis, perm)
    return acc / l[..., None]


def ring_self_attention(mesh: Mesh, q, k, v, scale: float | None = None,
                        logit_softcap: float = 0.0, axis: str = "sp",
                        batch_axis: str | None = "dp"):
    """Causal self-attention with the sequence sharded over `axis`.

    q (B, H, S, D), k/v (B, KVH, S, D); S must divide by mesh.shape[axis]
    (and B by mesh.shape[batch_axis] when that axis is in the mesh).
    Returns (B, H, S, D) in q.dtype, sharded the same way."""
    if scale is None:
        scale = 1.0 / (q.shape[-1] ** 0.5)
    sp = mesh.shape[axis]
    bax = batch_axis if (batch_axis in mesh.shape
                         and mesh.shape[batch_axis] > 1) else None
    spec = P(bax, None, axis, None)
    body = functools.partial(_ring_body, axis=axis, sp=sp,
                             scale=float(scale), softcap=float(logit_softcap))
    out = jax.shard_map(body, mesh=mesh, in_specs=(spec, spec, spec),
                    out_specs=spec)(q, k, v)
    return out.astype(q.dtype)
