"""Llama-family decoder — the north-star 7B Q4_K configuration.

The reference runs llama-class models through the same ggml op surface
(RMS_NORM + MUL_MAT + ROPE(NeoX) + FLASH_ATTN_EXT + SWIGLU); this module is
the TPU-native model: pure jax forward over GGUF-loaded params with GQA,
rope freq scaling (incl. YaRN), and a donated KV cache.

GGUF schema: llama.cpp conventions (kv `llama.*`; tensors blk.N.attn_q|
attn_k|attn_v|attn_output|ffn_gate|ffn_up|ffn_down|attn_norm|ffn_norm).
"""
from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .. import ops
from ..gguf import GGUFReader
from ..utils import observe
from ..ops.quantized import QuantTensor, dequant, qmatmul
from ..quant.types import GGMLType, TYPE_TRAITS
from ..runtime.kv_cache import KVCache

ARCH = "llama"


@dataclass(frozen=True)
class LlamaConfig:
    n_vocab: int
    n_ctx: int
    n_embd: int
    n_head: int
    n_kv_head: int
    n_layer: int
    n_ff: int
    rms_eps: float = 1e-5
    rope_base: float = 10000.0
    rope_dims: int | None = None  # defaults to head_dim
    rope_freq_scale: float = 1.0
    compute_dtype: object = jnp.float32

    @property
    def head_dim(self) -> int:
        return self.n_embd // self.n_head

    @property
    def n_rot(self) -> int:
        return self.rope_dims or self.head_dim


def _to_param(reader: GGUFReader, name: str):
    ti = reader.tensors[name]
    if TYPE_TRAITS[ti.type].is_quantized:
        return QuantTensor.from_blocks(ti.type, reader.tensor_blocks(name))
    return jnp.asarray(reader.tensor_float(name))


def load(path, layout: str | None = None) -> tuple[LlamaConfig, dict]:
    """layout: execution layout override — None consults config
    "weights_layout" ('auto' resolves via utils/autotune.choose). The
    'int8' path is the minimum-transfer production load: raw wire bytes of
    consecutive tensors concatenate into flat chunks (config
    "load_chunk_mb") uploaded as single 1-D transfers, then each tensor is
    sliced, dequantized, and requantized into the tile-major int8
    execution layout ON DEVICE (ops/quantized.wire_bytes_to_int8). The
    host→device tunnel caps at ~45-50 MB/s (measured, docs/PERFORMANCE.md)
    so TTFT is floored by uploaded bytes — raw wire (4.5 bpw for Q4_K) is
    the minimum possible payload. A persisted-int8 disk cache was measured
    SLOWER (8.25 bpw → 154 s warm vs this path's wire-bound floor): on
    this runtime the only thing worth caching is compiled programs
    (utils/xla_cache). Reference analogue: one mmap + per-tensor upload
    with repack-at-load (src/gguf.cpp:319, src/ggml-cpu/repack.cpp)."""
    r = GGUFReader(path)
    arch = r.kv.get("general.architecture")
    if arch != ARCH:
        raise ValueError(f"not a llama GGUF (architecture={arch!r})")
    kv = r.kv
    n_head = int(kv[f"{ARCH}.attention.head_count"])
    cfg = LlamaConfig(
        n_vocab=int(kv.get(f"{ARCH}.vocab_size",
                           r.tensors["token_embd.weight"].shape[0])),
        n_ctx=int(kv[f"{ARCH}.context_length"]),
        n_embd=int(kv[f"{ARCH}.embedding_length"]),
        n_head=n_head,
        n_kv_head=int(kv.get(f"{ARCH}.attention.head_count_kv", n_head)),
        n_layer=int(kv[f"{ARCH}.block_count"]),
        n_ff=int(kv[f"{ARCH}.feed_forward_length"]),
        rms_eps=float(kv.get(f"{ARCH}.attention.layer_norm_rms_epsilon", 1e-5)),
        rope_base=float(kv.get(f"{ARCH}.rope.freq_base", 10000.0)),
        rope_dims=int(kv[f"{ARCH}.rope.dimension_count"])
        if f"{ARCH}.rope.dimension_count" in kv else None,
        rope_freq_scale=float(kv.get(f"{ARCH}.rope.freq_scale", 1.0)),
    )
    # per-tensor wire→kernel re-layout is numpy-heavy and releases the GIL;
    # a thread pool overlaps it across tensors and with the device uploads
    # (measured on the 7B bench GGUF: 65 s serial → the pool cuts most of
    # the host-side share; the reference's analogue is repack-at-load,
    # src/ggml-cpu/repack.cpp)
    import os
    from concurrent.futures import ThreadPoolExecutor

    work: list[tuple] = [("wte", "token_embd.weight"),
                         ("out_norm", "output_norm.weight")]
    if "output.weight" in r.tensors:
        work.append(("lm_head", "output.weight"))
    per_blk = [
        ("attn_norm", "attn_norm.weight"),
        ("wq", "attn_q.weight"), ("wk", "attn_k.weight"),
        ("wv", "attn_v.weight"), ("wo", "attn_output.weight"),
        ("ffn_norm", "ffn_norm.weight"),
        ("w_gate", "ffn_gate.weight"), ("w_up", "ffn_up.weight"),
        ("w_down", "ffn_down.weight"),
    ]
    for i in range(cfg.n_layer):
        work += [((i, short), f"blk.{i}.{gname}")
                 for short, gname in per_blk]
    # initialize the device BEFORE fanning out: first jax use from eight
    # concurrent threads races client construction (observed hang)
    jax.device_put(np.zeros(1, np.float32))
    from ..utils import config as _config

    eff = layout or _config.get("weights_layout")
    if eff == "auto":
        from ..utils import autotune

        eff = autotune.choose()
    if eff == "int8":
        done = _load_int8_wire(r, work)

        def mk(nm):
            if nm in done:
                return done[nm]
            from ..ops.quantized import to_int8_layout

            v = _to_param(r, nm)
            return to_int8_layout(v) if isinstance(v, QuantTensor) else v
    else:
        def mk(nm):
            return _to_param(r, nm)

    with ThreadPoolExecutor(max_workers=min(8, os.cpu_count() or 1)) as ex:
        vals = list(ex.map(mk, [nm for _, nm in work]))
    p = {"blocks": [{} for _ in range(cfg.n_layer)]}
    for (dest, _), v in zip(work, vals):
        if isinstance(dest, tuple):
            p["blocks"][dest[0]][dest[1]] = v
        else:
            p[dest] = v
    if eff == "int8":
        return cfg, p
    from ..ops.quantized import apply_weights_layout

    return cfg, apply_weights_layout(p, layout=eff)


def _load_int8_wire(r: GGUFReader, work) -> dict:
    """Chunked minimum-transfer loader (see load() docstring): returns
    {gguf name → int8-layout QuantTensor} for every 2-D quantized tensor
    whose wire format has an on-device conversion program; the caller
    falls back per-tensor for the rest (norms, exotic formats)."""
    from ..ops.quantized import wire_bytes_supported, wire_bytes_to_int8
    from ..utils import config as _config

    plan = []                                  # (name, qtype, n, k, raw)
    for _, nm in work:
        ti = r.tensors.get(nm)
        if (ti is None or not TYPE_TRAITS[ti.type].is_quantized
                or not wire_bytes_supported(ti.type)
                or len(ti.shape) != 2):
            continue
        n, k = int(ti.shape[0]), int(ti.shape[1])
        if k % TYPE_TRAITS[ti.type].blck_size:
            continue
        plan.append((nm, ti.type, n, k, r.tensor_bytes(nm)))
    if not plan:
        return {}
    chunk_sz = int(_config.get("load_chunk_mb")) << 20
    chunk_sz = max(chunk_sz, max(raw.nbytes for *_, raw in plan))
    groups, cur = [[]], 0
    for item in plan:
        nb = item[4].nbytes
        if cur + nb > chunk_sz and groups[-1]:
            groups.append([])
            cur = 0
        groups[-1].append(item)
        cur += nb
    out = {}
    for group in groups:
        # fresh staging buffer per group (same shape, so any shape-keyed
        # upload fast path still hits): jnp.asarray's host→device copy
        # may be asynchronous or zero-copy-aliased, so refilling ONE
        # reused buffer while the previous group's transfer is in flight
        # would silently corrupt the loaded weights — jax holds a
        # reference to this buffer for as long as it needs it
        buf = np.empty(chunk_sz, np.uint8)
        off = 0
        metas = []
        for nm, qtype, n, k, raw in group:
            buf[off:off + raw.nbytes] = raw.reshape(-1)
            metas.append((nm, qtype, n, k, off))
            off += raw.nbytes
        dev = jnp.asarray(buf)           # ONE flat transfer per chunk
        for nm, qtype, n, k, o in metas:
            out[nm] = wire_bytes_to_int8(qtype, dev, o, n, k)
        del dev, buf   # conversions hold their outputs; the chunk can free
    return out


def _rms(x, g, eps):
    return ops.rms_norm(x, eps) * g


def _embed(table, ids):
    from ..ops.quantized import embed_rows

    return embed_rows(table, ids)


def _rope(cfg: LlamaConfig, x, pos):
    return ops.rope_ext(x, pos, cfg.n_rot, mode=ops.ROPE_TYPE_NEOX,
                        freq_base=cfg.rope_base,
                        freq_scale=cfg.rope_freq_scale)


def forward(cfg: LlamaConfig, params: dict, tokens: jax.Array,
            kv: KVCache, start, tp_axis: str | None = None
            ) -> tuple[jax.Array, KVCache]:
    """tokens (S,) at absolute positions [start, start+S) → (logits, kv).

    tp_axis: shard_map mesh-axis name for Megatron tensor parallelism —
    wq/wk/wv/w_gate/w_up hold only this shard's output rows (local heads),
    wo/w_down only this shard's input columns, and the two partial-sum
    matmuls are psum-reduced over the axis (the GSPMD/shard_map analogue of
    the CUDA split-buffer row sharding, ref ggml-cuda.cu:799-1070). Head
    counts are derived from the weight shards, not cfg."""
    S = tokens.shape[0]
    HD = cfg.head_dim
    dt = cfg.compute_dtype
    pos = start + jnp.arange(S, dtype=jnp.int32)
    x = _embed(params["wte"], tokens).astype(dt)

    for li, blk in enumerate(params["blocks"]):
        H = blk["wq"].shape[0] // HD     # local when row-sharded
        KVH = blk["wk"].shape[0] // HD
        h = _rms(x, blk["attn_norm"], cfg.rms_eps)
        q = qmatmul(h, blk["wq"]).reshape(S, H, HD)
        k = qmatmul(h, blk["wk"]).reshape(S, KVH, HD)
        v = qmatmul(h, blk["wv"]).reshape(S, KVH, HD)
        q = _rope(cfg, q, pos)
        k = _rope(cfg, k, pos)
        kv = kv.update_layer(li, k, v, start)
        kc, vc, kd, vd = kv.layer_kv(li)  # cache already (H, max_seq, HD)
        att = ops.causal_flash_attn(
            jnp.transpose(q, (1, 0, 2))[None],
            kc[None], vc[None], start, scale=1.0 / (HD ** 0.5),
            k_scale=None if kd is None else kd[None],
            v_scale=None if vd is None else vd[None])
        att = jnp.transpose(att[0], (1, 0, 2)).reshape(S, H * HD)
        a = qmatmul(att, blk["wo"])
        if tp_axis:
            a = jax.lax.psum(a, tp_axis)
        x = observe.tap(f"blk.{li}.attn_out", x + a)
        h2 = _rms(x, blk["ffn_norm"], cfg.rms_eps)
        gate = ops.silu(qmatmul(h2, blk["w_gate"]))
        up = qmatmul(h2, blk["w_up"])
        d = qmatmul(gate * up, blk["w_down"])
        if tp_axis:
            d = jax.lax.psum(d, tp_axis)
        x = observe.tap(f"blk.{li}.ffn_out", x + d)

    x = _rms(x, params["out_norm"], cfg.rms_eps)
    head = params.get("lm_head", params["wte"])
    logits = observe.tap("logits", qmatmul(x, head).astype(jnp.float32))
    return logits, kv.advance(S)


@functools.partial(jax.jit, static_argnums=0, donate_argnums=3)
def forward_jit(cfg, params, tokens, kv, start):
    return forward(cfg, params, tokens, kv, start)


@functools.partial(jax.jit, static_argnums=0, donate_argnums=3)
def decode_step(cfg, params, tok, kv, start):
    """One greedy decode step with the argmax folded into the program:
    (tok (1,), kv, start) → (next_tok (1,), kv). The returned token is the
    *input* of the next step, so chained calls carry the real autoregressive
    data dependence (a decode loop that re-dispatches a constant token lets
    dispatches pipeline in a way real decode cannot — measurement trap)."""
    logits, kv = forward(cfg, params, tok, kv, start)
    return jnp.argmax(logits[-1]).astype(jnp.int32)[None], kv


def make_cache(cfg: LlamaConfig, max_seq: int | None = None,
               dtype=None, quant: bool = False) -> KVCache:
    """quant=True stores K/V int8 with per-(head,pos) scales — the
    quantized-KV-cache analogue (ref fattn.cu:180-270), 4x less HBM/token."""
    return KVCache.create(cfg.n_layer, max_seq or cfg.n_ctx, cfg.n_kv_head,
                          cfg.head_dim, dtype or cfg.compute_dtype,
                          quant=quant)


def generate(cfg: LlamaConfig, params: dict, prompt_tokens, n_predict: int,
             sampler=None, max_seq: int | None = None,
             kv_quant: bool = False) -> list[int]:
    from ..runtime.sampling import greedy

    kv = make_cache(cfg, max_seq, quant=kv_quant)
    toks = jnp.asarray(np.asarray(prompt_tokens, dtype=np.int32))
    logits, kv = forward_jit(cfg, params, toks, kv, jnp.int32(0))
    out = list(map(int, prompt_tokens))
    sampler = sampler or (lambda lg: greedy(lg))
    out.append(int(sampler(logits[-1])))
    pos = len(prompt_tokens)
    from ..utils import abort

    for _ in range(n_predict - 1):
        abort.check()   # cooperative-cancel poll point between dispatches
        logits, kv = forward_jit(cfg, params,
                                 jnp.asarray([out[-1]], dtype=jnp.int32),
                                 kv, jnp.int32(pos))
        pos += 1
        out.append(int(sampler(logits[-1])))
    return out


def forward_batch(cfg: LlamaConfig, params: dict, tokens: jax.Array,
                  kv, start: jax.Array, tp_axis: str | None = None,
                  attn_window: int | None = None,
                  window_delta=None):
    """Batched serving forward: tokens (B, S) at per-slot positions
    start (B,) against a BatchedKVCache → (logits (B, S, V), kv).

    Slots are independent sequences (the reference's seq_id batching,
    examples/gpt-2/main-batched.cpp): each slot attends only to its own
    cache region below its current position. tp_axis: see forward().

    attn_window (static): attend only over cache positions [0, window) —
    the engine passes the smallest bucket covering the longest active slot,
    so a short serving batch does not pay HBM reads for the full padded
    max_seq cache (at B=8/max_seq=1024 the padded K/V read rivals the
    weight stream itself). Callers must guarantee every valid position is
    < attn_window; K/V writes still go to the full cache.

    window_delta (decode-only, S == 1): a (delta: WindowDelta, step, len0)
    triple — fresh K/V rows write into the delta at uniform column `step`
    (no per-slot scatter; the engine absorbs the window once at its end,
    BatchedKVCache.absorb_delta) and attention merges the big cache
    (rows [0, len0)) with the delta rows [0, step] at score level
    (ops.causal_attn_delta). Returns (logits, delta) instead of
    (logits, kv)."""
    B, S = tokens.shape
    HD = cfg.head_dim
    dt = cfg.compute_dtype
    pos = start[:, None] + jnp.arange(S, dtype=jnp.int32)[None, :]  # (B, S)
    x = _embed(params["wte"], tokens).astype(dt)
    delta = step = len0 = None
    if window_delta is not None:
        delta, step, len0 = window_delta

    for li, blk in enumerate(params["blocks"]):
        H = blk["wq"].shape[0] // HD     # local when row-sharded
        KVH = blk["wk"].shape[0] // HD
        h = _rms(x, blk["attn_norm"], cfg.rms_eps)
        q = qmatmul(h, blk["wq"]).reshape(B, S, H, HD)
        k = qmatmul(h, blk["wk"]).reshape(B, S, KVH, HD)
        v = qmatmul(h, blk["wv"]).reshape(B, S, KVH, HD)
        q = _rope(cfg, q, pos)
        k = _rope(cfg, k, pos)
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
                jnp.transpose(q, (0, 2, 1, 3)), kc, vc,
                start, scale=1.0 / (HD ** 0.5), k_scale=kd, v_scale=vd)
        att = jnp.transpose(att, (0, 2, 1, 3)).reshape(B, S, H * HD)
        a = qmatmul(att, blk["wo"])
        if tp_axis:
            a = jax.lax.psum(a, tp_axis)
        x = x + a
        h2 = _rms(x, blk["ffn_norm"], cfg.rms_eps)
        gate = ops.silu(qmatmul(h2, blk["w_gate"]))
        up = qmatmul(h2, blk["w_up"])
        d = qmatmul(gate * up, blk["w_down"])
        if tp_axis:
            d = jax.lax.psum(d, tp_axis)
        x = x + d

    x = _rms(x, params["out_norm"], cfg.rms_eps)
    head = params.get("lm_head", params["wte"])
    logits = qmatmul(x, head).astype(jnp.float32)
    return logits, (delta if window_delta is not None else kv)


def prefill_kv(cfg: LlamaConfig, params: dict, tokens: jax.Array,
               max_seq: int):
    """Single-sequence prefill producing (logits (S,V), k (L,max_seq,H,D), v)
    for slot installation (engine admission path). tokens may be padded to a
    bucket length; the caller reads the logits row of the true last token
    (padding K/V beyond it is overwritten by subsequent decode writes)."""
    kv = make_cache(cfg, max_seq)
    logits, kv = forward(cfg, params, tokens, kv, jnp.int32(0))
    return logits, kv.k, kv.v


@functools.partial(jax.jit, static_argnums=(0, 4), donate_argnums=2)
def decode_chunk(cfg: LlamaConfig, params: dict, kv: KVCache,
                 carry: jax.Array, n_steps: int):
    """Greedy-decode n_steps tokens in ONE dispatch via a statically
    unrolled chain (not lax.scan — scan copies the carried caches and
    degrades Pallas grids on this platform; unrolling keeps in-place cache
    updates and amortizes the per-dispatch host cost of flattening the
    ~1000-leaf param pytree).

    carry: [token, position] int32 (2,). Returns (tokens (n_steps,), kv,
    new carry)."""
    tok = carry[0]
    pos = carry[1]
    toks = []
    for _ in range(n_steps):
        logits, kv = forward(cfg, params, tok[None], kv, pos)
        tok = jnp.argmax(logits[-1]).astype(jnp.int32)
        pos = pos + 1
        toks.append(tok)
    return jnp.stack(toks), kv, jnp.stack([tok, pos])


@functools.partial(jax.jit, static_argnums=(0, 5), donate_argnums=2)
def decode_scan(cfg: LlamaConfig, params: dict, kv: KVCache,
                first_token: jax.Array, start, n_steps: int):
    """Greedy-decode n_steps tokens entirely on device via lax.scan.

    NOTE: measured ~12 ms/step SLOWER than re-dispatching forward_jit with a
    donated cache (XLA copies large scan carries; Pallas grids also degrade
    inside scan on this platform) — kept for single-dispatch use cases;
    generate()/bench/engine use the donated-loop path.

    Returns (tokens (n_steps,) int32, kv)."""

    def step(carry, _):
        tok, kv, pos = carry
        logits, kv = forward(cfg, params, tok[None], kv, pos)
        nxt = jnp.argmax(logits[-1]).astype(jnp.int32)
        return (nxt, kv, pos + 1), nxt

    (_, kv, _), toks = jax.lax.scan(
        step, (first_token, kv, jnp.int32(start)), length=n_steps)
    return toks, kv


def random_params(cfg: LlamaConfig, seed: int = 0,
                  qtype: GGMLType | None = None, dtype=jnp.float32) -> dict:
    rng = np.random.default_rng(seed)
    D, V, FF = cfg.n_embd, cfg.n_vocab, cfg.n_ff
    KVD = cfg.n_kv_head * cfg.head_dim

    def mat(r, c, scale=0.02):
        a = (rng.standard_normal((r, c)) * scale).astype(np.float32)
        if qtype is not None and c % TYPE_TRAITS[qtype].blck_size == 0:
            return QuantTensor.quantize(qtype, a)
        return jnp.asarray(a, dtype)

    p = {"wte": mat(V, D), "out_norm": jnp.ones((D,), dtype), "blocks": []}
    for _ in range(cfg.n_layer):
        p["blocks"].append({
            "attn_norm": jnp.ones((D,), dtype),
            "wq": mat(D, D), "wk": mat(KVD, D), "wv": mat(KVD, D),
            "wo": mat(D, D),
            "ffn_norm": jnp.ones((D,), dtype),
            "w_gate": mat(FF, D), "w_up": mat(FF, D), "w_down": mat(D, FF),
        })
    return p
