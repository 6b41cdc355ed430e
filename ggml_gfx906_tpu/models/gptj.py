"""GPT-J 6B-class decoder.

ref: examples/gpt-j/main.cpp (gptj_model_load, gptj_eval) — parallel
residual (attention and MLP both read ln_1(x) and add into the same
residual), partial rotary (rotary_dim, ggml NORMAL interleaved mode),
no attention biases, lm_head with bias.

GGUF schema: llama.cpp gptj convention (kv `gptj.*`, tensors blk.N.attn_q|
attn_k|attn_v|attn_output|ffn_up|ffn_down, output with bias).
"""
from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .. import ops
from ..gguf import GGUFReader
from ..ops.quantized import QuantTensor, dequant, qmatmul
from ..quant.types import TYPE_TRAITS
from ..runtime.kv_cache import KVCache

ARCH = "gptj"


@dataclass(frozen=True)
class GPTJConfig:
    n_vocab: int
    n_ctx: int
    n_embd: int
    n_head: int
    n_layer: int
    n_rot: int
    ln_eps: float = 1e-5
    rope_base: float = 10000.0
    compute_dtype: object = jnp.float32

    @property
    def head_dim(self) -> int:
        return self.n_embd // self.n_head


def _to_param(reader, name):
    ti = reader.tensors[name]
    if TYPE_TRAITS[ti.type].is_quantized:
        return QuantTensor.from_blocks(ti.type, reader.tensor_blocks(name))
    return jnp.asarray(reader.tensor_float(name))


def load(path) -> tuple[GPTJConfig, dict]:
    r = GGUFReader(path)
    if r.kv.get("general.architecture") != ARCH:
        raise ValueError(f"not a gptj GGUF ({r.kv.get('general.architecture')!r})")
    kv = r.kv
    cfg = GPTJConfig(
        n_vocab=int(kv.get(f"{ARCH}.vocab_size",
                           r.tensors["token_embd.weight"].shape[0])),
        n_ctx=int(kv[f"{ARCH}.context_length"]),
        n_embd=int(kv[f"{ARCH}.embedding_length"]),
        n_head=int(kv[f"{ARCH}.attention.head_count"]),
        n_layer=int(kv[f"{ARCH}.block_count"]),
        n_rot=int(kv[f"{ARCH}.rope.dimension_count"]),
        ln_eps=float(kv.get(f"{ARCH}.attention.layer_norm_epsilon", 1e-5)),
    )
    p = {
        "wte": _to_param(r, "token_embd.weight"),
        "ln_f_g": _to_param(r, "output_norm.weight"),
        "ln_f_b": _to_param(r, "output_norm.bias"),
        "lm_head": _to_param(r, "output.weight"),
        "lm_head_b": _to_param(r, "output.bias"),
        "blocks": [],
    }
    for i in range(cfg.n_layer):
        b = {}
        for short, gname in [
            ("ln1_g", "attn_norm.weight"), ("ln1_b", "attn_norm.bias"),
            ("wq", "attn_q.weight"), ("wk", "attn_k.weight"),
            ("wv", "attn_v.weight"), ("wo", "attn_output.weight"),
            ("fc_in_w", "ffn_up.weight"), ("fc_in_b", "ffn_up.bias"),
            ("fc_out_w", "ffn_down.weight"), ("fc_out_b", "ffn_down.bias"),
        ]:
            b[short] = _to_param(r, f"blk.{i}.{gname}")
        p["blocks"].append(b)
    from ..ops.quantized import apply_weights_layout

    return cfg, apply_weights_layout(p)


def forward(cfg: GPTJConfig, params: dict, tokens: jax.Array,
            kv: KVCache, start) -> tuple[jax.Array, KVCache]:
    """tokens (S,) at positions [start, start+S) → (logits, kv).
    Parallel residual: x += attn(h) + mlp(h), h = ln_1(x)."""
    S = tokens.shape[0]
    H, HD = cfg.n_head, cfg.head_dim
    dt = cfg.compute_dtype
    pos = start + jnp.arange(S, dtype=jnp.int32)
    x = ops.get_rows(params["wte"], tokens).astype(dt) \
        if not isinstance(params["wte"], QuantTensor) else _embed_q(params["wte"], tokens).astype(dt)

    for li, blk in enumerate(params["blocks"]):
        h = ops.norm(x, cfg.ln_eps) * blk["ln1_g"] + blk["ln1_b"]
        q = qmatmul(h, blk["wq"]).reshape(S, H, HD)
        k = qmatmul(h, blk["wk"]).reshape(S, H, HD)
        v = qmatmul(h, blk["wv"]).reshape(S, H, HD)
        # GPT-J rotary: interleaved pairs (ggml ROPE normal mode) on n_rot dims
        q = ops.rope_ext(q, pos, cfg.n_rot, mode=ops.ROPE_TYPE_NORMAL,
                         freq_base=cfg.rope_base)
        k = ops.rope_ext(k, pos, cfg.n_rot, mode=ops.ROPE_TYPE_NORMAL,
                         freq_base=cfg.rope_base)
        kv = kv.update_layer(li, k, v, start)
        kc, vc, kd, vd = kv.layer_kv(li)  # cache already (H, max_seq, HD)
        att = ops.causal_flash_attn(
            jnp.transpose(q, (1, 0, 2))[None],
            kc[None], vc[None], start, scale=1.0 / (HD ** 0.5),
            k_scale=None if kd is None else kd[None],
            v_scale=None if vd is None else vd[None])
        att = jnp.transpose(att[0], (1, 0, 2)).reshape(S, cfg.n_embd)
        att_out = qmatmul(att, blk["wo"])
        ff = qmatmul(ops.gelu(qmatmul(h, blk["fc_in_w"]) + blk["fc_in_b"]),
                     blk["fc_out_w"]) + blk["fc_out_b"]
        x = x + att_out + ff  # parallel residual

    x = ops.norm(x, cfg.ln_eps) * params["ln_f_g"] + params["ln_f_b"]
    logits = qmatmul(x, params["lm_head"]) + params["lm_head_b"]
    return logits.astype(jnp.float32), kv.advance(S)


def _embed_q(table: QuantTensor, ids):
    from ..ops.quantized import embed_rows

    return embed_rows(table, ids)


@functools.partial(jax.jit, static_argnums=0, donate_argnums=3)
def forward_jit(cfg, params, tokens, kv, start):
    return forward(cfg, params, tokens, kv, start)


def make_cache(cfg: GPTJConfig, max_seq: int | None = None, dtype=None,
               quant: bool = False):
    return KVCache.create(cfg.n_layer, max_seq or cfg.n_ctx, cfg.n_head,
                          cfg.head_dim, dtype or cfg.compute_dtype,
                          quant=quant)


def generate(cfg, params, prompt_tokens, n_predict, sampler=None,
             max_seq=None) -> list[int]:
    from ..runtime.sampling import greedy

    kv = make_cache(cfg, max_seq)
    toks = jnp.asarray(np.asarray(prompt_tokens, dtype=np.int32))
    logits, kv = forward_jit(cfg, params, toks, kv, jnp.int32(0))
    out = list(map(int, prompt_tokens))
    sampler = sampler or (lambda lg: greedy(lg))
    out.append(int(sampler(logits[-1])))
    pos = len(prompt_tokens)
    for _ in range(n_predict - 1):
        logits, kv = forward_jit(cfg, params,
                                 jnp.asarray([out[-1]], dtype=jnp.int32),
                                 kv, jnp.int32(pos))
        pos += 1
        out.append(int(sampler(logits[-1])))
    return out
