"""Layer offload split — the `-ngl` analogue.

ref: the reference's layer/offload split (`-ngl N`: the first layers run
on the accelerator, the rest on the host CPU, with one activation
transfer at the boundary; src/ggml-backend.cpp scheduler splits). On TPU
systems the same need appears when a model's weights exceed one device's
HBM: place layers [0, n_device_layers) on the accelerator and the tail on
the host CPU backend, run each side as its own jitted program, and ship
the hidden state across at the boundary.

    split = OffloadSplit.build(cfg, params, n_device_layers=24)
    logits, kvs = split.forward(tokens, kvs, start)   # kvs = (dev, host)
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from .. import ops
from ..ops.quantized import QuantTensor, qmatmul
from . import llama as llama_mod


def _place(tree, device):
    def put(x):
        if isinstance(x, QuantTensor):
            return QuantTensor(x.qtype, x.shape,
                               {k: jax.device_put(v, device)
                                for k, v in x.fields.items()}, x.layout)
        return jax.device_put(x, device)

    return jax.tree.map(put, tree, is_leaf=lambda x: isinstance(x, QuantTensor))


def _run_layers(cfg, blocks, x, kv, start, pos, first_layer: int):
    for li, blk in enumerate(blocks):
        HD = cfg.head_dim
        H = blk["wq"].shape[0] // HD
        KVH = blk["wk"].shape[0] // HD
        S = x.shape[0]
        h = llama_mod._rms(x, blk["attn_norm"], cfg.rms_eps)
        q = qmatmul(h, blk["wq"]).reshape(S, H, HD)
        k = qmatmul(h, blk["wk"]).reshape(S, KVH, HD)
        v = qmatmul(h, blk["wv"]).reshape(S, KVH, HD)
        q = llama_mod._rope(cfg, q, pos)
        k = llama_mod._rope(cfg, k, pos)
        kv = kv.update_layer(first_layer + li, k, v, start)
        kc, vc, kd, vd = kv.layer_kv(first_layer + li)
        att = ops.causal_flash_attn(
            jnp.transpose(q, (1, 0, 2))[None], kc[None], vc[None], start,
            scale=1.0 / (HD ** 0.5),
            k_scale=None if kd is None else kd[None],
            v_scale=None if vd is None else vd[None])
        att = jnp.transpose(att[0], (1, 0, 2)).reshape(S, H * HD)
        x = x + qmatmul(att, blk["wo"])
        h2 = llama_mod._rms(x, blk["ffn_norm"], cfg.rms_eps)
        gate = ops.silu(qmatmul(h2, blk["w_gate"]))
        up = qmatmul(h2, blk["w_up"])
        x = x + qmatmul(gate * up, blk["w_down"])
    return x, kv


@dataclass
class OffloadSplit:
    """Two-device llama split: layers [0, n_dev) + embedding on `device`,
    layers [n_dev, L) + head on `host_device` (KV caches live with their
    layers, sliced per segment so each side only carries its own)."""

    cfg: object
    n_dev: int
    dev_params: dict
    host_params: dict
    device: object
    host_device: object

    @classmethod
    def build(cls, cfg, params: dict, n_device_layers: int,
              device=None, host_device=None) -> "OffloadSplit":
        device = device or jax.devices()[0]
        host_device = host_device or (
            jax.devices("cpu")[0] if device.platform != "cpu"
            else jax.devices()[-1])
        n_dev = min(n_device_layers, cfg.n_layer)
        dev_p = _place({"wte": params["wte"],
                        "blocks": params["blocks"][:n_dev]}, device)
        host_p = _place({"out_norm": params["out_norm"],
                         "blocks": params["blocks"][n_dev:],
                         **({"lm_head": params["lm_head"]}
                            if "lm_head" in params else {})}, host_device)
        return cls(cfg, n_dev, dev_p, host_p, device, host_device)

    def make_caches(self, max_seq: int):
        cfg = self.cfg
        mk = lambda n, dev: _place(
            llama_mod.KVCache.create(n, max_seq, cfg.n_kv_head,
                                     cfg.head_dim, cfg.compute_dtype), dev)
        return mk(self.n_dev, self.device), \
            mk(cfg.n_layer - self.n_dev, self.host_device)

    def forward(self, tokens, kvs, start):
        """tokens (S,) → (logits (S, V), (kv_dev, kv_host)). One hidden-
        state transfer at the split boundary (the -ngl copy)."""
        cfg = self.cfg
        kv_dev, kv_host = kvs

        @jax.jit
        def front(p, toks, kv, st):
            S = toks.shape[0]
            pos = st + jnp.arange(S, dtype=jnp.int32)
            x = llama_mod._embed(p["wte"], toks).astype(cfg.compute_dtype)
            x, kv = _run_layers(cfg, p["blocks"], x, kv, st, pos, 0)
            return x, kv

        @jax.jit
        def back(p, x, kv, st):
            S = x.shape[0]
            pos = st + jnp.arange(S, dtype=jnp.int32)
            x, kv = _run_layers(cfg, p["blocks"], x, kv, st, pos, 0)
            x = llama_mod._rms(x, p["out_norm"], cfg.rms_eps)
            head = p.get("lm_head", None)
            if head is None:
                raise ValueError("tied embeddings need lm_head on the host "
                                 "side; pass params with lm_head")
            return qmatmul(x, head).astype(jnp.float32), kv

        x, kv_dev = front(self.dev_params, tokens, kv_dev, start)
        x = jax.device_put(x, self.host_device)      # the boundary copy
        logits, kv_host = back(self.host_params, x, kv_host, start)
        return logits, (kv_dev, kv_host)


def _tree_bytes(tree) -> int:
    leaves = jax.tree.leaves(
        tree, is_leaf=lambda x: isinstance(x, QuantTensor))
    total = 0
    for leaf in leaves:
        if isinstance(leaf, QuantTensor):
            total += leaf.nbytes
        else:
            total += leaf.size * leaf.dtype.itemsize
    return total


def auto_split(cfg, params: dict, max_seq: int, device=None,
               budget_bytes: int | None = None,
               headroom: float = 0.85) -> int:
    """Choose n_device_layers for OffloadSplit from the device's memory —
    the auto `-ngl` (the reference's scheduler places weights by memory
    gravity, src/ggml-backend.cpp:871-906; llama.cpp users tune -ngl until
    the model fits — this measures instead).

    Accounts per-layer weight bytes (packed QuantTensor fields at their
    true device footprint) plus that layer's KV slab at max_seq, against
    `headroom` × free device memory (memory_stats when the backend
    reports it, else `budget_bytes` must be given). Returns the largest
    layer count that fits, ≥ 0 (embedding table is charged to the device
    side, as OffloadSplit places it)."""
    device = device or jax.devices()[0]
    if budget_bytes is None:
        stats = device.memory_stats() or {}
        limit = stats.get("bytes_limit")
        in_use = stats.get("bytes_in_use", 0)
        if limit is None:
            raise ValueError("device reports no memory_stats; pass "
                             "budget_bytes")
        budget_bytes = limit - in_use
    budget = int(budget_bytes * headroom)
    kv_layer = (2 * max_seq * cfg.n_kv_head * cfg.head_dim
                * jnp.dtype(cfg.compute_dtype).itemsize)
    fixed = _tree_bytes(params["wte"])
    n = 0
    for blk in params["blocks"]:
        need = _tree_bytes(blk) + kv_layer
        if fixed + need > budget:
            break
        fixed += need
        n += 1
    return n
