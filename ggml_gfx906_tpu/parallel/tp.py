"""Tensor-parallel llama inference — sharded QuantTensors under shard_map.

The CUDA split-buffer analogue (ref src/ggml-cuda/ggml-cuda.cu:799-1070:
row-ranges of each weight live on different devices, partial matmuls are
gathered by explicit peer copies): here the same Megatron placement is
expressed as PartitionSpecs and the fused Pallas qmm kernels run *inside*
shard_map on their per-device shard — GSPMD cannot partition an opaque
pallas_call, so the hot path is explicitly mapped and the two per-block
reductions are `jax.lax.psum` over the `tp` axis (riding ICI on hardware).

Placement (per transformer block):
  wq/wk/wv, w_gate/w_up : row-split   P('tp', None)  → local heads / local FF
  wo, w_down            : column-split P(None, 'tp') → partial sums, one psum
  norms, wte, lm_head   : replicated
  KV cache              : head axis on 'tp' (each shard attends its heads)

Kernel-layout QuantTensor fields are all 2-D (N, K·bytes-per-el) lane-dense
arrays whose axes are proportional to the logical (N, K), so the weight's
PartitionSpec applies verbatim to every field; column splits stay aligned
to superblock boundaries as long as (K / tp) % 256 == 0 (asserted).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.quantized import QuantTensor

ROW = P("tp", None)
COL = P(None, "tp")
REP = P()

_BLOCK_RULES = {"wq": ROW, "wk": ROW, "wv": ROW, "w_gate": ROW, "w_up": ROW,
                "wo": COL, "w_down": COL}


def _is_qt(x):
    return isinstance(x, QuantTensor)


def _weight_spec(x, wspec: P):
    """Spec subtree for one weight. Kernel/wire QuantTensor fields are
    axis-proportional to the logical (N, K), so the weight-level P applies
    to every field as a prefix; the tile-major int8 layout needs per-field
    specs (rows on axis 1), expressed as a QuantTensor of PartitionSpecs
    whose treedef matches the weight's."""
    if _is_qt(x) and x.layout == "int8":
        fs = _field_spec(x, wspec)
        return QuantTensor(x.qtype, x.shape,
                           {k: fs(v) for k, v in x.fields.items()},
                           x.layout)
    return wspec


def llama_param_specs(params: dict):
    """PartitionSpec pytree (prefix tree: one P per weight — or a
    field-level subtree where the layout demands it) for a llama param
    dict."""
    specs = {k: _weight_spec(v, REP)
             for k, v in params.items() if k != "blocks"}
    specs["blocks"] = [
        {k: _weight_spec(v, _BLOCK_RULES.get(k, REP)) for k, v in blk.items()}
        for blk in params["blocks"]]
    return specs


def _field_spec(x, spec: P):
    """Per-field spec for a QuantTensor under weight-level `spec` — kernel
    layout fields are 2-D and axis-proportional, so the spec passes through;
    the tile-major int8 execution layout keeps rows on axis 1 and K-tiles
    on axis 0 (w8t (Kt, N, 128) / dwt (Kt, N))."""
    if x.layout == "int8":
        if spec == ROW:
            return lambda a: P(None, "tp", *([None] * (a.ndim - 2)))
        if spec == COL:
            return lambda a: P("tp", *([None] * (a.ndim - 1)))
        return lambda a: P(*([None] * a.ndim))
    if spec == ROW:
        return lambda a: P("tp", *([None] * (a.ndim - 1)))
    if spec == COL:
        assert x.layout == "kernel", "column TP needs kernel layout"
        return lambda a: P(None, "tp")
    return lambda a: P(*([None] * a.ndim))


def shard_llama_params(mesh: Mesh, params: dict) -> dict:
    """Place a llama param pytree per llama_param_specs (device_put, no
    copy of replicated fields beyond what the runtime needs)."""
    specs = llama_param_specs(params)

    def place(x, spec):
        if _is_qt(x):
            tp = mesh.shape.get("tp", 1)
            if spec == COL:
                gran = (x.fields["w8t"].shape[2] if x.layout == "int8"
                        else 256)
                assert (x.shape[1] // tp) % gran == 0, (x.shape, tp)
            if spec == ROW:
                assert x.shape[0] % tp == 0, (x.shape, tp)
            fs = _field_spec(x, spec)
            fields = {k: jax.device_put(v, NamedSharding(mesh, fs(v)))
                      for k, v in x.fields.items()}
            return QuantTensor(x.qtype, x.shape, fields, x.layout)
        nd = getattr(x, "ndim", 0)
        s = spec if spec != REP else P(*([None] * nd))
        return jax.device_put(x, NamedSharding(mesh, s))

    out = {k: place(v, specs[k]) for k, v in params.items() if k != "blocks"}
    out["blocks"] = [
        {k: place(v, bs[k]) for k, v in blk.items()}
        for blk, bs in zip(params["blocks"], specs["blocks"])]
    return out


def _localize(params: dict) -> dict:
    """Rebind QuantTensor logical shapes to the per-device field shards
    (pytree aux still carries global shapes inside shard_map)."""
    return jax.tree.map(lambda x: x.localize() if _is_qt(x) else x, params,
                        is_leaf=_is_qt)


def _kv_specs(kv, batched: bool):
    from ..runtime.paged_kv import PagedKVCache

    if isinstance(kv, PagedKVCache):
        # pool axis 0 is dp groups of (pages_per_group + scratch) pages
        # (runtime/paged_kv.py) — each data-parallel shard owns one group;
        # heads shard over tp; page-table values are group-local so the
        # (B, max_pages) table shards with the slots
        def pspec(leaf):
            if leaf.ndim == 4:          # page pool (pages, KVH, ps, D)
                return P("dp", "tp", None, None)
            if leaf.ndim == 3:          # quant scale pool (pages, KVH, ps)
                return P("dp", "tp", None)
            if leaf.ndim == 2:          # page_table (B, max_pages)
                return P("dp", None)
            return P("dp")              # lengths (B,)
        return jax.tree.map(pspec, kv)

    def spec(leaf):
        if leaf.ndim == 4:   # (B, KVH, S, D)
            return P("dp" if batched else None, "tp", None, None)
        if leaf.ndim == 3:   # (KVH, S, D) — or batched quant scales (B, KVH, S)
            return P("dp", "tp", None) if batched else P("tp", None, None)
        if leaf.ndim == 2:   # quantized-KV scales (KVH, S)
            return P("tp", None)
        return P("dp") if batched and leaf.ndim == 1 else P()
    return jax.tree.map(spec, kv)


@functools.lru_cache(maxsize=8)
def _tp_forward_fn(mesh, cfg, kv_treedef, pspec_treedef):
    """Cached jitted shard_map program (kv/param tree structure in the key)."""
    from ..models import llama

    kvspecs = jax.tree_util.tree_unflatten(kv_treedef[0], kv_treedef[1])
    pspecs = jax.tree_util.tree_unflatten(pspec_treedef[0], pspec_treedef[1])

    def local(p, toks, kv, start):
        return llama.forward(cfg, _localize(p), toks, kv, start, tp_axis="tp")

    f = jax.shard_map(local, mesh=mesh,
                      in_specs=(pspecs, P(), kvspecs, P()),
                      out_specs=(P(), kvspecs), check_vma=False)
    return jax.jit(f, donate_argnums=2)


def _freeze(tree):
    leaves, treedef = jax.tree_util.tree_flatten(
        tree, is_leaf=lambda x: isinstance(x, P))
    return (treedef, tuple(leaves))


def tp_forward(mesh: Mesh, cfg, params: dict, tokens, kv, start):
    """Single-sequence TP forward: (logits, kv). params from
    shard_llama_params, kv head-sharded (KVH % tp == 0)."""
    fn = _tp_forward_fn(mesh, cfg, _freeze(_kv_specs(kv, False)),
                        _freeze(llama_param_specs(params)))
    return fn(params, tokens, kv, start)


def tp_decode_step(mesh: Mesh, cfg, params: dict, tok, kv, start):
    """Greedy TP decode step: (next_tok (1,), kv) — argmax in-program."""
    logits, kv = tp_forward(mesh, cfg, params, tok, kv, start)
    return jnp.argmax(logits[-1]).astype(jnp.int32)[None], kv


@functools.lru_cache(maxsize=8)
def _tp_forward_batch_fn(mesh, cfg, kv_treedef, pspec_treedef):
    from ..models import llama

    kvspecs = jax.tree_util.tree_unflatten(kv_treedef[0], kv_treedef[1])
    pspecs = jax.tree_util.tree_unflatten(pspec_treedef[0], pspec_treedef[1])

    def local(p, toks, kv, start):
        return llama.forward_batch(cfg, _localize(p), toks, kv, start,
                                   tp_axis="tp")

    f = jax.shard_map(local, mesh=mesh,
                      in_specs=(pspecs, P("dp", None), kvspecs, P("dp")),
                      out_specs=(P("dp", None, None), kvspecs), check_vma=False)
    return jax.jit(f, donate_argnums=2)


def tp_forward_batch(mesh: Mesh, cfg, params: dict, tokens, kv, start):
    """dp×tp batched serving forward: batch slots over 'dp', heads over
    'tp' — tokens (B, S), start (B,) → (logits (B, S, V), kv)."""
    fn = _tp_forward_batch_fn(mesh, cfg, _freeze(_kv_specs(kv, True)),
                              _freeze(llama_param_specs(params)))
    return fn(params, tokens, kv, start)


# -- serving-engine mesh programs (VERDICT r04 missing #1) -------------------
# The single-chip engine's two big serving optimizations — scan-window decode
# (one device program per harvest window) and batched admission (one
# forward_batch prefills a whole flood) — expressed under shard_map so a
# dp×tp deployment serves at the same cadence: batch slots shard over 'dp',
# heads over 'tp', and sampling runs per-shard on the local slots (logits
# keep the full vocab locally — out spec P('dp', None, None)). Host
# scheduling is identical to the single-chip engine (runtime/engine.py).
# Ref: the event-pipelined keep-devices-busy role of the scheduler,
# src/ggml-backend.cpp:1352-1430.


def _local_paged(kv):
    """Re-key a PagedKVCache for the LOCAL shard inside shard_map: each
    data-parallel shard sees exactly one pool group, so group-local
    page-table values are local pool indices and every derived quantity
    (scratch_page, pages_per_group) must come from the dp=1 view of the
    local shapes."""
    import dataclasses

    return dataclasses.replace(kv, dp=1)


def _restore_dp(kv, dp: int):
    import dataclasses

    return dataclasses.replace(kv, dp=dp)


@functools.lru_cache(maxsize=16)
def _tp_decode_window_fn(mesh, cfg, kv_treedef, pspec_treedef, window: int,
                         depth: int, paged_dp: int | None,
                         use_delta: bool = False):
    """One harvest window as ONE shard_map program: lax.scan over the
    batched decode step with in-program sampling (the mesh analogue of the
    single-chip _decode_window; engine.py:_model_programs). paged_dp: the
    pool's dp when kv is a PagedKVCache (the window-gather flow — pool →
    local dense view → scan → absorb — runs entirely per-shard, so no page
    traffic ever crosses ICI), None for the dense cache. use_delta: the
    window-delta flow (uniform-column writes + one wide absorb scatter per
    window — see the single-chip _decode_window), entirely shard-local."""
    from ..models import llama
    from ..runtime.sampling import sample_batch

    kvspecs = jax.tree_util.tree_unflatten(kv_treedef[0], kv_treedef[1])
    pspecs = jax.tree_util.tree_unflatten(pspec_treedef[0], pspec_treedef[1])

    def local(p, kv, toks, active, seeds, counters, temps, top_ks, top_ps,
              starts):
        lp = _localize(p)
        if paged_dp is not None:
            kv = _local_paged(kv)
            dense = kv.gather_window(window)
        else:
            dense = kv

        def sample(logits, counters):
            keys = jax.vmap(lambda s, ct: jax.random.fold_in(
                jax.random.PRNGKey(s), ct))(seeds, counters)
            return sample_batch(logits[:, 0, :], keys, temps, top_ks,
                                top_ps)

        if use_delta:
            len0 = dense.lengths

            def body(carry, i):
                toks, counters, delta = carry
                logits, delta = llama.forward_batch(
                    cfg, lp, toks[:, None], dense, len0 + i,
                    tp_axis="tp", attn_window=window,
                    window_delta=(delta, i, len0))
                nxt = sample(logits, counters)
                return (nxt, counters + 1, delta), nxt

            (toks, counters, delta), out = jax.lax.scan(
                body, (toks, counters, dense.make_delta(depth)),
                jnp.arange(depth, dtype=jnp.int32))
            dense = dense.absorb_delta(delta, len0, active, depth)
        else:
            def body(carry, _):
                toks, counters, dense = carry
                logits, dense = llama.forward_batch(
                    cfg, lp, toks[:, None], dense, dense.lengths,
                    tp_axis="tp", attn_window=window)
                nxt = sample(logits, counters)
                new_len = dense.lengths + active.astype(jnp.int32)
                return (nxt, counters + 1, dense.with_lengths(new_len)), nxt

            (toks, counters, dense), out = jax.lax.scan(
                body, (toks, counters, dense), None, length=depth)
        if paged_dp is not None:
            kv = _restore_dp(kv.absorb(dense, starts, depth), paged_dp)
            return out, toks, counters, kv
        return out, toks, counters, dense

    d = P("dp")
    f = jax.shard_map(
        local, mesh=mesh,
        in_specs=(pspecs, kvspecs, d, d, d, d, d, d, d, d),
        out_specs=(P(None, "dp"), d, d, kvspecs), check_vma=False)
    return jax.jit(f, donate_argnums=1)


def tp_decode_window(mesh: Mesh, cfg, params: dict, kv, toks, active, seeds,
                     counters, temps, top_ks, top_ps, window: int,
                     depth: int, starts=None, use_delta: bool = False):
    """Run one depth-step decode window on the mesh; returns
    (token stack (depth, B), next_toks, counters, kv). starts: per-slot
    write offsets for the paged absorb (the engine's host_len snapshot);
    ignored for dense caches. use_delta: window-delta flow (engine
    config `engine_window_delta`)."""
    from ..runtime.paged_kv import PagedKVCache

    paged_dp = kv.dp if isinstance(kv, PagedKVCache) else None
    if starts is None:
        starts = jnp.zeros(toks.shape[0], jnp.int32)
    fn = _tp_decode_window_fn(mesh, cfg, _freeze(_kv_specs(kv, True)),
                              _freeze(llama_param_specs(params)),
                              int(window), int(depth), paged_dp,
                              bool(use_delta))
    return fn(params, kv, toks, active, seeds, counters, temps, top_ks,
              top_ps, starts)


@functools.lru_cache(maxsize=16)
def _tp_prefill_batch_fn(mesh, cfg, kv_treedef, pspec_treedef):
    """Batched-admission flood prefill under shard_map (mesh analogue of the
    single-chip _prefill_batch): ONE forward_batch for every admitted slot's
    prompt into a fresh temp cache, first tokens sampled in-program at
    counter 0 — identical keys to the single-request path."""
    from ..models import llama
    from ..runtime.sampling import sample_batch

    kvspecs = jax.tree_util.tree_unflatten(kv_treedef[0], kv_treedef[1])
    pspecs = jax.tree_util.tree_unflatten(pspec_treedef[0], pspec_treedef[1])

    def local(p, toks, kv, starts, admitted, plens, seeds, temps, top_ks,
              top_ps):
        logits, kv = llama.forward_batch(cfg, _localize(p), toks, kv,
                                         starts, tp_axis="tp")
        new_len = jnp.where(admitted, plens, kv.lengths)
        rows = jnp.take_along_axis(
            logits, jnp.maximum(plens - 1, 0)[:, None, None], 1)[:, 0]
        keys = jax.vmap(
            lambda s: jax.random.fold_in(jax.random.PRNGKey(s), 0))(seeds)
        firsts = sample_batch(rows, keys, temps, top_ks, top_ps)
        return firsts, kv.with_lengths(new_len)

    d = P("dp")
    f = jax.shard_map(
        local, mesh=mesh,
        in_specs=(pspecs, P("dp", None), kvspecs, d, d, d, d, d, d, d),
        out_specs=(d, kvspecs), check_vma=False)
    return jax.jit(f, donate_argnums=2)


def tp_prefill_batch(mesh: Mesh, cfg, params: dict, toks, kv, starts,
                     admitted, plens, seeds, temps, top_ks, top_ps):
    fn = _tp_prefill_batch_fn(mesh, cfg, _freeze(_kv_specs(kv, True)),
                              _freeze(llama_param_specs(params)))
    return fn(params, toks, kv, starts, admitted, plens, seeds, temps,
              top_ks, top_ps)


@functools.lru_cache(maxsize=16)
def _tp_absorb_temp_paged_fn(mesh, kv_treedef, temp_treedef, s_pad: int,
                             dp: int):
    """Install a batched-admission temp cache through the page tables,
    per-shard (page-table values are group-local, so the scatter must run
    where the local pool shard lives — engine.py:_admit_batch)."""
    kvspecs = jax.tree_util.tree_unflatten(kv_treedef[0], kv_treedef[1])
    tempspecs = jax.tree_util.tree_unflatten(temp_treedef[0],
                                             temp_treedef[1])

    def local(kv, temp, admitted):
        kv = _local_paged(kv)
        starts = jnp.zeros(kv.page_table.shape[0], jnp.int32)
        return _restore_dp(kv.absorb(temp, starts, s_pad, mask=admitted), dp)

    f = jax.shard_map(local, mesh=mesh,
                      in_specs=(kvspecs, tempspecs, P("dp")),
                      out_specs=kvspecs, check_vma=False)
    return jax.jit(f, donate_argnums=0)


def tp_absorb_temp_paged(mesh: Mesh, kv, temp, admitted, s_pad: int):
    fn = _tp_absorb_temp_paged_fn(mesh, _freeze(_kv_specs(kv, True)),
                                  _freeze(_kv_specs(temp, True)),
                                  int(s_pad), kv.dp)
    return fn(kv, temp, admitted)
