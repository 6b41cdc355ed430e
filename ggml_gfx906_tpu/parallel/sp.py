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

Two schedules: "contiguous" (device d owns rows [dC, (d+1)C) — simple, but
causality fully masks chunks j > i, so device 0 does 1 useful chunk while
device sp-1 does sp) and the default "zigzag" (device d owns half-chunks
{d, 2sp-1-d} — every device executes exactly 2sp+1 half-chunk updates, the
wasted FLOPs are reclaimed statically/via lax.cond, ~2x the worst-device
score work removed). Inputs/outputs stay in standard sequence order; the
zigzag layout permutation is applied (and inverted) on the S axis around
the shard_map — pipelines that call this repeatedly can pre-permute once
with `zigzag_perm` instead.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

# Finite -inf: exp(NEG_INF - NEG_INF) = 1 would poison fully-masked rows if
# we used true -inf; matches the flash kernel's mask value.
NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def _chunk_attn(q, k, v, row0, col0, scale, softcap, m, l, acc,
                masked=True):
    """One online-softmax update of (m, l, acc) with a K/V chunk.

    q (B,H,C,D) at global rows row0+arange(C); k/v (B,H,Ck,D) at global
    cols col0+arange(Ck). All f32. masked=False skips the causal mask for
    chunk pairs known (statically) to be fully visible."""
    C, Ck = q.shape[2], k.shape[2]
    s = jax.lax.dot_general(
        q, k, (((3,), (3,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32) * jnp.float32(scale)
    if softcap != 0.0:
        s = jnp.tanh(s * (1.0 / softcap)) * softcap
    if masked:
        rows = row0 + jnp.arange(C, dtype=jnp.int32)
        cols = col0 + jnp.arange(Ck, dtype=jnp.int32)
        causal = cols[None, :] <= rows[:, None]              # (C, Ck)
        s = jnp.where(causal[None, None], s, NEG_INF)
    m_new = jnp.maximum(m, s.max(axis=-1))
    # corrected exp terms; fully-masked chunks contribute exactly zero
    p = jnp.exp(s - m_new[..., None])
    if masked:
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
    masked and contribute exactly zero — the zigzag schedule
    (_zigzag_body, the default) reclaims those FLOPs."""
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


def _zigzag_body(q, k, v, *, axis, sp, scale, softcap):
    """shard_map body for the ZIGZAG schedule (VERDICT r04 #9).

    Device i's local rows are the two half-chunks {i, 2sp-1-i} of the
    zigzag layout (see zigzag_perm). Writing a for the early half and b
    for the late half, when device i holds device j's K/V at ring step t:

      - b x a is ALWAYS fully visible (row chunk 2sp-1-i >= sp > j) —
        computed unmasked every step;
      - a x b is ALWAYS fully causally masked (2sp-1-j >= sp > i) —
        statically skipped;
      - a x a runs iff j <= i, b x b iff j >= i (lax.cond; each a
        runtime-masked update that is diagonal only when j == i).

    So EVERY device executes 1 + (j<=i) + (j>=i) half-chunk updates per
    step = 2sp+1 total — balanced, vs the contiguous schedule where all
    devices pay sp full-chunk updates and the early devices' are almost
    entirely masked waste. Total score FLOPs drop ~2x.

    Returns (out, n_updates) with n_updates the per-device executed
    update count (the step-count proof the tests assert on)."""
    i = jax.lax.axis_index(axis)
    B, H, C, D = q.shape
    Ch = C // 2
    Hkv = k.shape[1]
    rep = H // Hkv
    q = q.astype(jnp.float32)
    qa, qb = q[:, :, :Ch], q[:, :, Ch:]
    row_a = i * Ch
    row_b = (2 * sp - 1 - i) * Ch

    def fresh():
        # derived from qa (not fresh constants) so the state carries the
        # same varying-manual-axes type as the lax.cond update branches
        z = qa[..., 0] * 0.0
        return (z + NEG_INF, z, qa * 0.0)

    sa, sb = fresh(), fresh()
    nwork = jnp.int32(0)
    perm = [(s, (s + 1) % sp) for s in range(sp)]
    for t in range(sp):
        j = (i - t) % sp
        kc = k.astype(jnp.float32)
        vc = v.astype(jnp.float32)
        if rep != 1:
            kc = jnp.repeat(kc, rep, axis=1)
            vc = jnp.repeat(vc, rep, axis=1)
        ka, kb = kc[:, :, :Ch], kc[:, :, Ch:]
        va, vb = vc[:, :, :Ch], vc[:, :, Ch:]
        col_a = j * Ch
        col_b = (2 * sp - 1 - j) * Ch
        sb = _chunk_attn(qb, ka, va, row_b, col_a, scale, softcap, *sb,
                         masked=False)
        sa = jax.lax.cond(
            j <= i,
            lambda st: _chunk_attn(qa, ka, va, row_a, col_a, scale,
                                   softcap, *st),
            lambda st: st, sa)
        sb = jax.lax.cond(
            j >= i,
            lambda st: _chunk_attn(qb, kb, vb, row_b, col_b, scale,
                                   softcap, *st),
            lambda st: st, sb)
        nwork = nwork + 1 + (j <= i).astype(jnp.int32) \
            + (j >= i).astype(jnp.int32)
        if t + 1 < sp:
            k = jax.lax.ppermute(k, axis, perm)
            v = jax.lax.ppermute(v, axis, perm)
    out = jnp.concatenate([sa[2] / sa[1][..., None],
                           sb[2] / sb[1][..., None]], axis=2)
    return out, jnp.broadcast_to(nwork, (1,))


def zigzag_perm(S: int, sp: int):
    """Standard->zigzag sequence permutation: split S into 2*sp half-chunks;
    device d owns half-chunks {d, 2sp-1-d}. Returns (perm, inv) index
    arrays; x_zig = x.take(perm, axis=seq), x = x_zig.take(inv, axis=seq)."""
    import numpy as np

    Ch = S // (2 * sp)
    parts = []
    for d in range(sp):
        parts.append(np.arange(d * Ch, (d + 1) * Ch))
        parts.append(np.arange((2 * sp - 1 - d) * Ch, (2 * sp - d) * Ch))
    perm = np.concatenate(parts)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(S)
    return perm, inv


def ring_self_attention(mesh: Mesh, q, k, v, scale: float | None = None,
                        logit_softcap: float = 0.0, axis: str = "sp",
                        batch_axis: str | None = "dp",
                        schedule: str = "zigzag",
                        return_work_counts: bool = False):
    """Causal self-attention with the sequence sharded over `axis`.

    q (B, H, S, D), k/v (B, KVH, S, D); S must divide by mesh.shape[axis]
    (2*shape[axis] for the zigzag schedule), and B by
    mesh.shape[batch_axis] when that axis is in the mesh.
    Returns (B, H, S, D) in q.dtype, sharded the same way.

    schedule: "zigzag" (default — causally load-balanced, ~2x the
    contiguous schedule's worst-device score FLOPs reclaimed) or
    "contiguous". return_work_counts (zigzag only) additionally returns
    the per-device executed-update counts for the balance proof."""
    if scale is None:
        scale = 1.0 / (q.shape[-1] ** 0.5)
    sp = mesh.shape[axis]
    bax = batch_axis if (batch_axis in mesh.shape
                         and mesh.shape[batch_axis] > 1) else None
    spec = P(bax, None, axis, None)
    if schedule == "contiguous":
        body = functools.partial(_ring_body, axis=axis, sp=sp,
                                 scale=float(scale),
                                 softcap=float(logit_softcap))
        out = jax.shard_map(body, mesh=mesh, in_specs=(spec, spec, spec),
                            out_specs=spec)(q, k, v)
        return out.astype(q.dtype)
    if schedule != "zigzag":
        raise ValueError(f"unknown ring schedule {schedule!r}")
    S = q.shape[2]
    if S % (2 * sp):
        # zigzag needs S % (2*sp) == 0 (two half-chunks per device);
        # shapes valid for the ring but not for zigzag keep the old
        # contract instead of failing — correctness first, balance when
        # the shape allows it
        if return_work_counts:
            raise ValueError(
                f"work counts need the zigzag schedule: S % (2*sp) == 0, "
                f"got {S} % {2 * sp}")
        return ring_self_attention(mesh, q, k, v, scale, logit_softcap,
                                   axis, batch_axis, "contiguous")
    perm, inv = zigzag_perm(S, sp)
    qz, kz, vz = (x.take(perm, axis=2) for x in (q, k, v))
    body = functools.partial(_zigzag_body, axis=axis, sp=sp,
                             scale=float(scale),
                             softcap=float(logit_softcap))
    out, counts = jax.shard_map(
        body, mesh=mesh, in_specs=(spec, spec, spec),
        out_specs=(spec, P(axis)))(qz, kz, vz)
    out = out.take(inv, axis=2).astype(q.dtype)
    if return_work_counts:
        return out, counts
    return out
