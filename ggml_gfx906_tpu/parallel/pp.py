"""Pipeline parallelism: layer stages over a 'pp' mesh axis with GPipe
microbatching.

The reference overlaps computation across backends with pipeline
parallelism and n_copies event-chained split inputs
(ref src/ggml-backend.cpp:1352-1430 ggml_backend_sched_compute_splits /
the n_copies double-buffering). The TPU-native counterpart: transformer
layers are partitioned into `pp` contiguous stages (block params stacked
along a leading layer axis and sharded on it), and a shard_map program
runs the classic pipeline schedule — at tick t, stage s processes
microbatch t−s while its neighbours work on adjacent microbatches, with
`jax.lax.ppermute` forwarding activations over ICI. Fill/drain bubbles
shrink as n_micro/pp grows, exactly as in GPipe.

Scope: dense (jnp-array) llama-style blocks, full-sequence forward (the
prefill/scoring shape — no KV carry across calls).

    stacked = stack_blocks(params)                # (L, ...) per field
    sharded = shard_pp(mesh, stacked)             # blocks on P('pp')
    logits = pp_forward(mesh, cfg, sharded, tokens, n_micro=4)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import ops


def make_pp_mesh(pp: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= pp, (len(devices), pp)
    return Mesh(np.asarray(devices[:pp]).reshape(pp), ("pp",))


def stack_blocks(params: dict) -> dict:
    """List-of-block-dicts → one dict of (L, ...)-stacked fields (the
    layer axis is what the pipeline shards and each stage scans over)."""
    blocks = params["blocks"]
    stacked = {k: jnp.stack([blk[k] for blk in blocks])
               for k in blocks[0]}
    out = {k: v for k, v in params.items() if k != "blocks"}
    out["blocks"] = stacked
    return out


def shard_pp(mesh: Mesh, stacked: dict) -> dict:
    """Blocks sharded on the layer axis over 'pp'; everything else
    replicated (wte/out_norm/lm_head are used only on the first/last
    stage, but replication keeps the program simple and they are small
    next to the blocks)."""
    def blk(v):
        return jax.device_put(
            v, NamedSharding(mesh, P("pp", *([None] * (v.ndim - 1)))))

    def rep(v):
        return jax.device_put(
            v, NamedSharding(mesh, P(*([None] * getattr(v, "ndim", 0)))))

    out = {k: rep(v) for k, v in stacked.items() if k != "blocks"}
    out["blocks"] = {k: blk(v) for k, v in stacked["blocks"].items()}
    return out


def _block_apply(cfg, blk, x):
    """One dense llama block on (MB, S, D) activations (full-seq causal)."""
    mb, S, _ = x.shape
    HD = cfg.head_dim
    H = blk["wq"].shape[0] // HD
    KVH = blk["wk"].shape[0] // HD
    pos = jnp.arange(S, dtype=jnp.int32)

    h = ops.rms_norm(x, cfg.rms_eps) * blk["attn_norm"]
    q = (h @ blk["wq"].T).reshape(mb, S, H, HD)
    k = (h @ blk["wk"].T).reshape(mb, S, KVH, HD)
    v = (h @ blk["wv"].T).reshape(mb, S, KVH, HD)
    q = ops.rope_ext(q, pos, cfg.n_rot, mode=ops.ROPE_TYPE_NEOX,
                     freq_base=cfg.rope_base)
    k = ops.rope_ext(k, pos, cfg.n_rot, mode=ops.ROPE_TYPE_NEOX,
                     freq_base=cfg.rope_base)
    att = ops.causal_flash_attn(
        jnp.transpose(q, (0, 2, 1, 3)), jnp.transpose(k, (0, 2, 1, 3)),
        jnp.transpose(v, (0, 2, 1, 3)), 0, scale=1.0 / (HD ** 0.5))
    att = jnp.transpose(att, (0, 2, 1, 3)).reshape(mb, S, H * HD)
    x = x + att @ blk["wo"].T
    h2 = ops.rms_norm(x, cfg.rms_eps) * blk["ffn_norm"]
    gate = ops.silu(h2 @ blk["w_gate"].T)
    up = h2 @ blk["w_up"].T
    return x + (gate * up) @ blk["w_down"].T


@functools.partial(jax.jit, static_argnums=(0, 1, 4))
def _pp_program(mesh, cfg, params, tokens_mb, n_micro):
    nstages = mesh.shape["pp"]
    specs_blocks = {k: P("pp", *([None] * (v.ndim - 1)))
                    for k, v in params["blocks"].items()}
    pspecs = {k: P(*([None] * getattr(v, "ndim", 0)))
              for k, v in params.items() if k != "blocks"}
    pspecs["blocks"] = specs_blocks

    def local(p, toks):
        idx = jax.lax.axis_index("pp")
        blocks = p["blocks"]                       # local (L/pp, ...)
        n_local = blocks["attn_norm"].shape[0]

        def apply_stage(x):
            def body(xc, layer):
                return _block_apply(cfg, layer, xc), None
            x, _ = jax.lax.scan(body, x, blocks)
            return x

        mb, S = toks.shape[1], toks.shape[2]
        D = p["wte"].shape[1]
        buf = jnp.zeros((mb, S, D), p["wte"].dtype)
        outs = jnp.zeros((n_micro, mb, S, D), p["wte"].dtype)
        fwd = [(i, (i + 1) % nstages) for i in range(nstages)]

        for t in range(n_micro + nstages - 1):     # static pipeline ticks
            m_in = min(t, n_micro - 1)
            inject = p["wte"][toks[m_in]]          # (mb, S, D)
            x_in = jnp.where(jax.lax.axis_index("pp") == 0, inject, buf)
            y = apply_stage(x_in)
            m_out = t - (nstages - 1)
            if 0 <= m_out < n_micro:
                outs = outs.at[m_out].set(y)       # valid on last stage
            buf = jax.lax.ppermute(y, "pp", fwd)

        # only the last stage's collected activations are real: zero the
        # rest and share via psum (activations, not logits — V is big)
        mask = (idx == nstages - 1).astype(outs.dtype)
        outs = jax.lax.psum(outs * mask, "pp")
        h = ops.rms_norm(outs, cfg.rms_eps) * p["out_norm"]
        head = p.get("lm_head", p["wte"])
        return h @ head.T

    f = jax.shard_map(local, mesh=mesh, in_specs=(pspecs, P()),
                      out_specs=P(), check_vma=False)
    return f(params, tokens_mb)


def pp_forward(mesh: Mesh, cfg, params: dict, tokens, n_micro: int):
    """tokens (B, S) with B % n_micro == 0 → logits (B, S, V); params from
    shard_pp(stack_blocks(...)). Total layer count must divide by pp."""
    B, S = tokens.shape
    assert B % n_micro == 0, (B, n_micro)
    toks_mb = tokens.reshape(n_micro, B // n_micro, S)
    out = _pp_program(mesh, cfg, params, toks_mb, n_micro)
    return out.reshape(B, S, -1)
