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
