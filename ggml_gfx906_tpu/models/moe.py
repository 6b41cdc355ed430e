"""Mixtral-class MoE llama: MUL_MAT_ID routing end-to-end.

ref: the reference keeps GGML_OP_MUL_MAT_ID for MoE routing
(include/ggml.h:450-581 op enum; CUDA path ggml-cuda.cu MUL_MAT_ID) and
llama.cpp serves Mixtral through it with stacked expert tensors
(blk.N.ffn_{gate,up,down}_exps.weight + ffn_gate_inp router, KV keys
llama.expert_count / llama.expert_used_count). This module is that model
family TPU-native: the attention stack is exactly models/llama.py's; the
FFN is a top-k softmax router + ops.mul_mat_id over per-expert weights
(dense or kernel-layout QuantTensors — the fused Pallas kernels then
serve each expert), GShard capacity dispatch inside.

Engine-compatible surface: forward / forward_batch / make_cache /
decode_step / generate, so continuous batching serves MoE unchanged.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .. import ops
from ..gguf import GGUFReader
from ..ops.quantized import QuantTensor, qmatmul
from ..ops.recurrent import mul_mat_id
from ..quant.types import GGMLType, TYPE_TRAITS
from ..runtime.kv_cache import KVCache
from . import llama as _llama

ARCH = "llama"    # llama.cpp convention: Mixtral is arch=llama + experts


@dataclass(frozen=True)
class MoEConfig:
    n_vocab: int
    n_ctx: int
    n_embd: int
    n_head: int
    n_kv_head: int
    n_layer: int
    n_ff: int
    n_expert: int
    n_expert_used: int
    rms_eps: float = 1e-5
    rope_base: float = 10000.0
    rope_freq_scale: float = 1.0
    compute_dtype: object = jnp.float32

    @property
    def head_dim(self) -> int:
        return self.n_embd // self.n_head

    @property
    def n_rot(self) -> int:
        return self.head_dim


def _moe_ffn(cfg: MoEConfig, blk: dict, h2: jax.Array) -> jax.Array:
    """h2 (T, D) → (T, D): softmax top-k router, normalized weights,
    silu(gate)·up → down per expert via mul_mat_id (HF Mixtral semantics
    with norm_topk_prob=True, matching llama.cpp's build_moe_ffn)."""
    T = h2.shape[0]
    U = cfg.n_expert_used
    router = qmatmul(h2, blk["gate_inp"]).astype(jnp.float32)   # (T, E)
    probs = jax.nn.softmax(router, axis=-1)
    w, idx = jax.lax.top_k(probs, U)                            # (T, U)
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    xr = jnp.broadcast_to(h2[:, None, :], (T, U, h2.shape[1]))
    g = mul_mat_id(blk["gate_exps"], xr, idx)                   # (T, U, FF)
    u = mul_mat_id(blk["up_exps"], xr, idx)
    act = (ops.silu(g) * u).astype(h2.dtype)
    d = mul_mat_id(blk["down_exps"], act, idx)                  # (T, U, D)
    return jnp.sum(d * w[..., None].astype(d.dtype), axis=1).astype(h2.dtype)


def forward(cfg: MoEConfig, params: dict, tokens: jax.Array,
            kv: KVCache, start) -> tuple[jax.Array, KVCache]:
    """tokens (S,) at positions [start, start+S) → (logits (S, V), kv)."""
    S = tokens.shape[0]
    HD = cfg.head_dim
    dt = cfg.compute_dtype
    pos = start + jnp.arange(S, dtype=jnp.int32)
    x = _llama._embed(params["wte"], tokens).astype(dt)

    for li, blk in enumerate(params["blocks"]):
        H = blk["wq"].shape[0] // HD
        KVH = blk["wk"].shape[0] // HD
        h = _llama._rms(x, blk["attn_norm"], cfg.rms_eps)
        q = _llama._rope(cfg, qmatmul(h, blk["wq"]).reshape(S, H, HD), pos)
        k = _llama._rope(cfg, qmatmul(h, blk["wk"]).reshape(S, KVH, HD), pos)
        v = qmatmul(h, blk["wv"]).reshape(S, KVH, HD)
        kv = kv.update_layer(li, k, v, start)
        kc, vc, kd, vd = kv.layer_kv(li)
        att = ops.causal_flash_attn(
            jnp.transpose(q, (1, 0, 2))[None], kc[None], vc[None], start,
            scale=1.0 / (HD ** 0.5),
            k_scale=None if kd is None else kd[None],
            v_scale=None if vd is None else vd[None])
        att = jnp.transpose(att[0], (1, 0, 2)).reshape(S, H * HD)
        x = x + qmatmul(att, blk["wo"])
        h2 = _llama._rms(x, blk["ffn_norm"], cfg.rms_eps)
        x = x + _moe_ffn(cfg, blk, h2)

    x = _llama._rms(x, params["out_norm"], cfg.rms_eps)
    head = params.get("lm_head", params["wte"])
    return qmatmul(x, head).astype(jnp.float32), kv.advance(S)


@functools.partial(jax.jit, static_argnums=0, donate_argnums=3)
def forward_jit(cfg, params, tokens, kv, start):
    return forward(cfg, params, tokens, kv, start)


@functools.partial(jax.jit, static_argnums=0, donate_argnums=3)
def decode_step(cfg, params, tok, kv, start):
    logits, kv = forward(cfg, params, tok, kv, start)
    return jnp.argmax(logits[-1]).astype(jnp.int32)[None], kv


def make_cache(cfg: MoEConfig, max_seq: int | None = None, dtype=None,
               quant: bool = False) -> KVCache:
    return KVCache.create(cfg.n_layer, max_seq or cfg.n_ctx, cfg.n_kv_head,
                          cfg.head_dim, dtype or cfg.compute_dtype,
                          quant=quant)


def forward_batch(cfg: MoEConfig, params: dict, tokens: jax.Array,
                  kv, start: jax.Array, tp_axis: str | None = None,
                  attn_window: int | None = None, window_delta=None):
    """Batched serving forward — same contract as llama.forward_batch,
    including the window-delta decode mode (engine_window_delta)."""
    B, S = tokens.shape
    HD = cfg.head_dim
    dt = cfg.compute_dtype
    pos = start[:, None] + jnp.arange(S, dtype=jnp.int32)[None, :]
    x = _llama._embed(params["wte"], tokens).astype(dt)
    delta = step = len0 = None
    if window_delta is not None:
        delta, step, len0 = window_delta

    for li, blk in enumerate(params["blocks"]):
        H = blk["wq"].shape[0] // HD
        KVH = blk["wk"].shape[0] // HD
        h = _llama._rms(x, blk["attn_norm"], cfg.rms_eps)
        q = _llama._rope(cfg, qmatmul(h, blk["wq"]).reshape(B, S, H, HD),
                         pos)
        k = _llama._rope(cfg, qmatmul(h, blk["wk"]).reshape(B, S, KVH, HD),
                         pos)
        v = qmatmul(h, blk["wv"]).reshape(B, S, KVH, HD)
        if window_delta is not None:
            delta = delta.write(li, k, v, step)
            kc, vc, kd, vd = kv.layer_kv(li, attn_window)
            att = ops.causal_attn_delta(
                jnp.transpose(q, (0, 2, 1, 3)), kc, vc, kd, vd, len0,
                delta.k[li], delta.v[li], step, scale=1.0 / (HD ** 0.5))
        else:
            kv = kv.update_layer(li, k, v, start)
            kc, vc, kd, vd = kv.layer_kv(li, attn_window)
            att = ops.causal_flash_attn(
                jnp.transpose(q, (0, 2, 1, 3)), kc, vc, start,
                scale=1.0 / (HD ** 0.5), k_scale=kd, v_scale=vd)
        att = jnp.transpose(att, (0, 2, 1, 3)).reshape(B, S, H * HD)
        x = x + qmatmul(att, blk["wo"])
        h2 = _llama._rms(x, blk["ffn_norm"], cfg.rms_eps)
        f = _moe_ffn(cfg, blk, h2.reshape(B * S, cfg.n_embd))
        x = x + f.reshape(B, S, cfg.n_embd)

    x = _llama._rms(x, params["out_norm"], cfg.rms_eps)
    head = params.get("lm_head", params["wte"])
    logits = qmatmul(x, head).astype(jnp.float32)
    return logits, (delta if window_delta is not None else kv)


def generate(cfg: MoEConfig, params: dict, prompt_tokens, n_predict: int,
             sampler=None, max_seq: int | None = None) -> list[int]:
    from ..runtime.sampling import greedy

    max_seq = max_seq or cfg.n_ctx
    kv = make_cache(cfg, max_seq)
    toks = jnp.asarray(np.asarray(prompt_tokens, dtype=np.int32))
    logits, kv = forward_jit(cfg, params, toks, kv, jnp.int32(0))
    out = list(map(int, prompt_tokens))
    sampler = sampler or greedy
    out.append(int(sampler(logits[-1])))
    pos = len(prompt_tokens)
    for _ in range(n_predict - 1):
        logits, kv = forward_jit(cfg, params,
                                 jnp.asarray([out[-1]], dtype=jnp.int32),
                                 kv, jnp.int32(pos))
        pos += 1
        out.append(int(sampler(logits[-1])))
    return out


# --------------------------------------------------------------- GGUF I/O

def load(path) -> tuple[MoEConfig, dict]:
    """Load a Mixtral-convention GGUF (arch=llama + expert_count > 0)."""
    r = GGUFReader(path)
    kv = r.kv
    if int(kv.get("llama.expert_count", 0)) < 2:
        raise ValueError("not an MoE GGUF (llama.expert_count < 2)")
    n_head = int(kv["llama.attention.head_count"])
    cfg = MoEConfig(
        n_vocab=int(kv.get("llama.vocab_size",
                           r.tensors["token_embd.weight"].shape[0])),
        n_ctx=int(kv["llama.context_length"]),
        n_embd=int(kv["llama.embedding_length"]),
        n_head=n_head,
        n_kv_head=int(kv.get("llama.attention.head_count_kv", n_head)),
        n_layer=int(kv["llama.block_count"]),
        n_ff=int(kv["llama.feed_forward_length"]),
        n_expert=int(kv["llama.expert_count"]),
        n_expert_used=int(kv["llama.expert_used_count"]),
        rms_eps=float(kv.get("llama.attention.layer_norm_rms_epsilon",
                             1e-5)),
        rope_base=float(kv.get("llama.rope.freq_base", 10000.0)),
    )

    def dense(name):
        return jnp.asarray(r.tensor_float(name))

    def weight(name):
        ti = r.tensors[name]
        if TYPE_TRAITS[ti.type].is_quantized:
            return QuantTensor.from_blocks(ti.type, r.tensor_blocks(name))
        return dense(name)

    def experts(name, n_out):
        """Stacked (E, n_out, K) tensor → per-expert weights list."""
        ti = r.tensors[name]
        if TYPE_TRAITS[ti.type].is_quantized:
            blocks = r.tensor_blocks(name)       # (E*n_out, nb)
            per = blocks.shape[0] // cfg.n_expert
            return [QuantTensor.from_blocks(ti.type,
                                            blocks[e * per:(e + 1) * per])
                    for e in range(cfg.n_expert)]
        a = r.tensor_float(name).reshape(cfg.n_expert, n_out, -1)
        return jnp.asarray(a)

    p = {"wte": weight("token_embd.weight"),
         "out_norm": dense("output_norm.weight"), "blocks": []}
    if "output.weight" in r.tensors:
        p["lm_head"] = weight("output.weight")
    for i in range(cfg.n_layer):
        g = f"blk.{i}."
        p["blocks"].append({
            "attn_norm": dense(g + "attn_norm.weight"),
            "wq": weight(g + "attn_q.weight"),
            "wk": weight(g + "attn_k.weight"),
            "wv": weight(g + "attn_v.weight"),
            "wo": weight(g + "attn_output.weight"),
            "ffn_norm": dense(g + "ffn_norm.weight"),
            "gate_inp": dense(g + "ffn_gate_inp.weight"),
            "gate_exps": experts(g + "ffn_gate_exps.weight", cfg.n_ff),
            "up_exps": experts(g + "ffn_up_exps.weight", cfg.n_ff),
            "down_exps": experts(g + "ffn_down_exps.weight", cfg.n_embd),
        })
    from ..ops.quantized import apply_weights_layout

    return cfg, apply_weights_layout(p)


def random_params(cfg: MoEConfig, seed: int = 0,
                  qtype: GGMLType | None = None) -> dict:
    rng = np.random.default_rng(seed)
    D, V, FF, E = cfg.n_embd, cfg.n_vocab, cfg.n_ff, cfg.n_expert
    KVD = cfg.n_kv_head * cfg.head_dim

    def mk(*shape):
        return (rng.standard_normal(shape) * 0.05).astype(np.float32)

    def w(*shape):
        a = mk(*shape)
        if (qtype is not None and len(shape) == 2
                and shape[-1] % TYPE_TRAITS[qtype].blck_size == 0):
            return QuantTensor.quantize(qtype, a)
        return jnp.asarray(a)

    def exps(n_out, k):
        if qtype is not None and k % TYPE_TRAITS[qtype].blck_size == 0:
            return [QuantTensor.quantize(qtype, mk(n_out, k))
                    for _ in range(E)]
        return jnp.asarray(mk(E, n_out, k))

    p = {"wte": w(V, D), "out_norm": jnp.ones((D,), jnp.float32),
         "blocks": []}
    for _ in range(cfg.n_layer):
        p["blocks"].append({
            "attn_norm": jnp.ones((D,), jnp.float32),
            "wq": w(D, D), "wk": w(KVD, D), "wv": w(KVD, D), "wo": w(D, D),
            "ffn_norm": jnp.ones((D,), jnp.float32),
            "gate_inp": jnp.asarray(mk(E, D)),
            "gate_exps": exps(FF, D), "up_exps": exps(FF, D),
            "down_exps": exps(D, FF),
        })
    return p
