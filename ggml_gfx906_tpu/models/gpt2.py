"""GPT-2: the reference's pedagogical minimum slice, TPU-native.

ref: examples/gpt-2/main-backend.cpp (gpt2_model_load:103, gpt2_graph:446,
gpt2_eval:732) — same architecture (LayerNorm → fused QKV → causal attention
→ projection → GELU MLP, learned positional embeddings, tied LM head), but
expressed as pure jax functions over a param pytree, jit-compiled with a
donated KV cache instead of a re-planned ggml graph per token.

GGUF schema follows llama.cpp's gpt2 convention: kv keys `gpt2.*`,
tensors token_embd / position_embd / blk.N.attn_norm|attn_qkv|attn_output|
ffn_norm|ffn_up|ffn_down / output_norm / output.
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
from ..quant.types import GGMLType, TYPE_TRAITS
from ..runtime.kv_cache import KVCache

ARCH = "gpt2"


@dataclass(frozen=True)
class GPT2Config:
    n_vocab: int
    n_ctx: int
    n_embd: int
    n_head: int
    n_layer: int
    ln_eps: float = 1e-5
    compute_dtype: object = jnp.float32

    @property
    def head_dim(self) -> int:
        return self.n_embd // self.n_head


def _to_param(reader: GGUFReader, name: str):
    ti = reader.tensors[name]
    if TYPE_TRAITS[ti.type].is_quantized:
        return QuantTensor.from_blocks(ti.type, reader.tensor_blocks(name))
    return jnp.asarray(reader.tensor_float(name))


def load(path) -> tuple[GPT2Config, dict]:
    """Load a gpt2-architecture GGUF into (config, params pytree)."""
    r = GGUFReader(path)
    arch = r.kv.get("general.architecture")
    if arch != ARCH:
        raise ValueError(f"not a gpt2 GGUF (architecture={arch!r})")
    cfg = GPT2Config(
        n_vocab=int(r.kv[f"{ARCH}.vocab_size"]),
        n_ctx=int(r.kv[f"{ARCH}.context_length"]),
        n_embd=int(r.kv[f"{ARCH}.embedding_length"]),
        n_head=int(r.kv[f"{ARCH}.attention.head_count"]),
        n_layer=int(r.kv[f"{ARCH}.block_count"]),
        ln_eps=float(r.kv.get(f"{ARCH}.attention.layer_norm_epsilon", 1e-5)),
    )
    p = {
        "wte": _to_param(r, "token_embd.weight"),
        "wpe": _to_param(r, "position_embd.weight"),
        "ln_f_g": _to_param(r, "output_norm.weight"),
        "ln_f_b": _to_param(r, "output_norm.bias"),
        "blocks": [],
    }
    if "output.weight" in r.tensors:
        p["lm_head"] = _to_param(r, "output.weight")
    for i in range(cfg.n_layer):
        b = {}
        for short, gname in [
            ("ln1_g", "attn_norm.weight"), ("ln1_b", "attn_norm.bias"),
            ("qkv_w", "attn_qkv.weight"), ("qkv_b", "attn_qkv.bias"),
            ("proj_w", "attn_output.weight"), ("proj_b", "attn_output.bias"),
            ("ln2_g", "ffn_norm.weight"), ("ln2_b", "ffn_norm.bias"),
            ("up_w", "ffn_up.weight"), ("up_b", "ffn_up.bias"),
            ("down_w", "ffn_down.weight"), ("down_b", "ffn_down.bias"),
        ]:
            b[short] = _to_param(r, f"blk.{i}.{gname}")
        p["blocks"].append(b)
    from ..ops.quantized import apply_weights_layout

    return cfg, apply_weights_layout(p)


def _ln(x, g, b, eps):
    return ops.norm(x, eps) * g + b


def _linear(x, w, b=None):
    y = qmatmul(x, w)
    return y + b if b is not None else y


def _embed(table, ids):
    # gather packed rows, dequantize only those (keeps HBM traffic low)
    from ..ops.quantized import embed_rows

    return embed_rows(table, ids)


def forward(cfg: GPT2Config, params: dict, tokens: jax.Array,
            kv: KVCache, start) -> tuple[jax.Array, KVCache]:
    """tokens: (S,) int32 placed at absolute positions [start, start+S).

    Returns (logits (S, n_vocab) f32, updated cache). Matches gpt2_graph
    (examples/gpt-2/main-backend.cpp:446) op-for-op.
    """
    S = tokens.shape[0]
    H, HD = cfg.n_head, cfg.head_dim
    dt = cfg.compute_dtype
    pos = start + jnp.arange(S, dtype=jnp.int32)
    x = (_embed(params["wte"], tokens) + _embed(params["wpe"], pos)).astype(dt)

    for li, blk in enumerate(params["blocks"]):
        h = _ln(x, blk["ln1_g"], blk["ln1_b"], cfg.ln_eps)
        qkv = _linear(h, blk["qkv_w"], blk["qkv_b"])
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(S, H, HD)
        kv = kv.update_layer(li, k.reshape(S, H, HD), v.reshape(S, H, HD), start)
        kc, vc, kd, vd = kv.layer_kv(li)  # cache already (H, max_seq, HD)
        att = ops.causal_flash_attn(
            jnp.transpose(q, (1, 0, 2))[None],
            kc[None], vc[None], start, scale=1.0 / (HD ** 0.5),
            k_scale=None if kd is None else kd[None],
            v_scale=None if vd is None else vd[None],
        )  # (1, H, S, HD)
        att = jnp.transpose(att[0], (1, 0, 2)).reshape(S, cfg.n_embd)
        x = x + _linear(att, blk["proj_w"], blk["proj_b"])
        h2 = _ln(x, blk["ln2_g"], blk["ln2_b"], cfg.ln_eps)
        ff = _linear(ops.gelu(_linear(h2, blk["up_w"], blk["up_b"])),
                     blk["down_w"], blk["down_b"])
        x = x + ff

    x = _ln(x, params["ln_f_g"], params["ln_f_b"], cfg.ln_eps)
    head = params.get("lm_head", params["wte"])
    logits = qmatmul(x, head).astype(jnp.float32)
    return logits, kv.advance(S)


@functools.partial(jax.jit, static_argnums=0, donate_argnums=3)
def forward_jit(cfg, params, tokens, kv, start):
    return forward(cfg, params, tokens, kv, start)


@functools.partial(jax.jit, static_argnums=0, donate_argnums=3)
def decode_step(cfg, params, tok, kv, start):
    """Greedy step with argmax in-program (see models/llama.py:decode_step:
    chained calls then carry the true autoregressive token dependence)."""
    logits, kv = forward(cfg, params, tok, kv, start)
    return jnp.argmax(logits[-1]).astype(jnp.int32)[None], kv


def make_cache(cfg: GPT2Config, max_seq: int | None = None, dtype=None,
               quant: bool = False) -> KVCache:
    return KVCache.create(cfg.n_layer, max_seq or cfg.n_ctx, cfg.n_head,
                          cfg.head_dim, dtype or cfg.compute_dtype,
                          quant=quant)


def forward_batch(cfg: GPT2Config, params: dict, tokens: jax.Array,
                  kv, start: jax.Array, attn_window: int | None = None,
                  window_delta=None):
    """Batched serving forward over a BatchedKVCache — the reference's
    gpt-2 seq_id batching (examples/gpt-2/main-batched.cpp): tokens (B, S)
    at per-slot positions start (B,) → (logits (B, S, V), kv).
    attn_window / window_delta: see models/llama.py::forward_batch."""
    B, S = tokens.shape
    H, HD = cfg.n_head, cfg.head_dim
    dt = cfg.compute_dtype
    pos = start[:, None] + jnp.arange(S, dtype=jnp.int32)[None, :]
    x = (_embed(params["wte"], tokens)
         + _embed(params["wpe"], pos)).astype(dt)
    delta = step = len0 = None
    if window_delta is not None:
        delta, step, len0 = window_delta

    for li, blk in enumerate(params["blocks"]):
        h = _ln(x, blk["ln1_g"], blk["ln1_b"], cfg.ln_eps)
        qkv = _linear(h, blk["qkv_w"], blk["qkv_b"])
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, S, H, HD)
        k = k.reshape(B, S, H, HD)
        v = v.reshape(B, S, H, HD)
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
        att = jnp.transpose(att, (0, 2, 1, 3)).reshape(B, S, cfg.n_embd)
        x = x + _linear(att, blk["proj_w"], blk["proj_b"])
        h2 = _ln(x, blk["ln2_g"], blk["ln2_b"], cfg.ln_eps)
        ff = _linear(ops.gelu(_linear(h2, blk["up_w"], blk["up_b"])),
                     blk["down_w"], blk["down_b"])
        x = x + ff

    x = _ln(x, params["ln_f_g"], params["ln_f_b"], cfg.ln_eps)
    head = params.get("lm_head", params["wte"])
    logits = qmatmul(x, head).astype(jnp.float32)
    return logits, (delta if window_delta is not None else kv)


def forward_train(cfg: GPT2Config, params: dict, tokens: jax.Array) -> jax.Array:
    """Batched full-sequence forward without a KV cache (training path).
    tokens: (B, S) int32 → logits (B, S, n_vocab) f32."""
    B, S = tokens.shape
    H, HD = cfg.n_head, cfg.head_dim
    dt = cfg.compute_dtype
    pos = jnp.arange(S, dtype=jnp.int32)
    x = (_embed(params["wte"], tokens) + _embed(params["wpe"], pos)[None]).astype(dt)
    mask = ops.causal_mask(S, S)
    for blk in params["blocks"]:
        h = _ln(x, blk["ln1_g"], blk["ln1_b"], cfg.ln_eps)
        qkv = _linear(h, blk["qkv_w"], blk["qkv_b"])
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = jnp.transpose(q.reshape(B, S, H, HD), (0, 2, 1, 3))
        k = jnp.transpose(k.reshape(B, S, H, HD), (0, 2, 1, 3))
        v = jnp.transpose(v.reshape(B, S, H, HD), (0, 2, 1, 3))
        att = ops.flash_attn_ext(q, k, v, mask=mask, scale=1.0 / (HD ** 0.5))
        att = jnp.transpose(att, (0, 2, 1, 3)).reshape(B, S, cfg.n_embd)
        x = x + _linear(att, blk["proj_w"], blk["proj_b"])
        h2 = _ln(x, blk["ln2_g"], blk["ln2_b"], cfg.ln_eps)
        x = x + _linear(ops.gelu(_linear(h2, blk["up_w"], blk["up_b"])),
                        blk["down_w"], blk["down_b"])
    x = _ln(x, params["ln_f_g"], params["ln_f_b"], cfg.ln_eps)
    head = params.get("lm_head", params["wte"])
    return qmatmul(x, head).astype(jnp.float32)


_GGUF_NAMES = [
    ("ln1_g", "attn_norm.weight"), ("ln1_b", "attn_norm.bias"),
    ("qkv_w", "attn_qkv.weight"), ("qkv_b", "attn_qkv.bias"),
    ("proj_w", "attn_output.weight"), ("proj_b", "attn_output.bias"),
    ("ln2_g", "ffn_norm.weight"), ("ln2_b", "ffn_norm.bias"),
    ("up_w", "ffn_up.weight"), ("up_b", "ffn_up.bias"),
    ("down_w", "ffn_down.weight"), ("down_b", "ffn_down.bias"),
]


def save_gguf(cfg: GPT2Config, params: dict, path, qtype: GGMLType | None = None):
    """Write a dense-float gpt2 params pytree to GGUF (inverse of `load`).

    With `qtype`, every 2-D weight whose row length divides the block size
    is quantized at write time; 1-D tensors stay f32, mirroring the
    reference quantize tool (examples/common-ggml.cpp:41 skips non-2D).
    The file is readable both by our GGUFReader and by the reference C
    reader (src/gguf.cpp:319) — enforced by tests/test_reference_runtime.py.
    """
    from ..gguf import GGUFValueType, GGUFWriter

    w = GGUFWriter()
    w.set("general.architecture", ARCH)
    for key, val in [
        ("vocab_size", cfg.n_vocab), ("context_length", cfg.n_ctx),
        ("embedding_length", cfg.n_embd), ("attention.head_count", cfg.n_head),
        ("block_count", cfg.n_layer),
    ]:
        w.set(f"{ARCH}.{key}", int(val), GGUFValueType.UINT32)
    w.set(f"{ARCH}.attention.layer_norm_epsilon", float(cfg.ln_eps),
          GGUFValueType.FLOAT32)

    def put(name, a):
        a = np.asarray(a, np.float32)
        tt = qtype
        if (tt is not None and a.ndim == 2
                and a.shape[1] % TYPE_TRAITS[tt].blck_size == 0):
            w.add_array_tensor(name, a, tt)
        else:
            w.add_array_tensor(name, a)

    put("token_embd.weight", params["wte"])
    put("position_embd.weight", params["wpe"])
    put("output_norm.weight", params["ln_f_g"])
    put("output_norm.bias", params["ln_f_b"])
    if "lm_head" in params:
        put("output.weight", params["lm_head"])
    for i, blk in enumerate(params["blocks"]):
        for short, gname in _GGUF_NAMES:
            put(f"blk.{i}.{gname}", blk[short])
    w.write(path)


def random_params(cfg: GPT2Config, seed: int = 0, qtype: GGMLType | None = None,
                  dtype=jnp.float32) -> dict:
    """Deterministic random param pytree (for tests/benchmarks; offline we
    cannot download real checkpoints)."""
    rng = np.random.default_rng(seed)
    D, V = cfg.n_embd, cfg.n_vocab

    def w(*shape, scale=0.02):
        a = (rng.standard_normal(shape) * scale).astype(np.float32)
        return a

    def mat(*shape):
        a = w(*shape)
        if qtype is not None and a.shape[-1] % TYPE_TRAITS[qtype].blck_size == 0:
            return QuantTensor.quantize(qtype, a)
        return jnp.asarray(a, dtype)

    p = {
        "wte": mat(V, D),
        "wpe": jnp.asarray(w(cfg.n_ctx, D), dtype),
        "ln_f_g": jnp.ones((D,), dtype), "ln_f_b": jnp.zeros((D,), dtype),
        "blocks": [],
    }
    for _ in range(cfg.n_layer):
        p["blocks"].append({
            "ln1_g": jnp.ones((D,), dtype), "ln1_b": jnp.zeros((D,), dtype),
            "qkv_w": mat(3 * D, D), "qkv_b": jnp.asarray(w(3 * D), dtype),
            "proj_w": mat(D, D), "proj_b": jnp.asarray(w(D), dtype),
            "ln2_g": jnp.ones((D,), dtype), "ln2_b": jnp.zeros((D,), dtype),
            "up_w": mat(4 * D, D), "up_b": jnp.asarray(w(4 * D), dtype),
            "down_w": mat(D, 4 * D), "down_b": jnp.asarray(w(D), dtype),
        })
    return p


def generate(cfg: GPT2Config, params: dict, prompt_tokens, n_predict: int,
             sampler=None, max_seq: int | None = None) -> list[int]:
    """Greedy/stochastic decode loop: one jit'd prefill + jit'd single-token
    steps with a donated cache (the re-plan-per-token ggml loop collapses to
    two compiled programs)."""
    from ..runtime.sampling import greedy

    max_seq = max_seq or cfg.n_ctx
    kv = KVCache.create(cfg.n_layer, max_seq, cfg.n_head, cfg.head_dim,
                        dtype=cfg.compute_dtype)
    toks = jnp.asarray(np.asarray(prompt_tokens, dtype=np.int32))
    logits, kv = forward_jit(cfg, params, toks, kv, jnp.int32(0))
    out = list(map(int, prompt_tokens))
    sampler = sampler or (lambda lg: greedy(lg))
    next_tok = sampler(logits[-1])
    out.append(int(next_tok))
    pos = len(prompt_tokens)
    for _ in range(n_predict - 1):
        logits, kv = forward_jit(cfg, params,
                                 jnp.asarray([out[-1]], dtype=jnp.int32),
                                 kv, jnp.int32(pos))
        pos += 1
        out.append(int(sampler(logits[-1])))
    return out
