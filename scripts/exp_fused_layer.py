"""Wire-density decode experiment (VERDICT r03 #3): the two named moves.

(i)  kill the kt=43 cliff: pad FF 11008 → 11264 (2.3% extra wire bytes;
     gate/up pad rows get d=dmin=0 so they decode to exact zeros, w_down's
     padded K columns multiply exactly-zero activations) — every matmul
     then has K % 2048-friendly chunking and N % 128*8 tiling.
(ii) amortize the ~13 us per-pallas_call fixed cost: concatenate wq|wk|wv
     (one x) and w_gate|w_up (one x) so a layer runs 4 pipelined calls
     (qkv, wo, gate|up, down) instead of 7 — plus bigger calls stream
     longer between fixed costs.

Measures the 8-layer 7B-shape decode chain (same harness as
exp_pipe_model.py): int8-XLA baseline vs pipelined-as-is vs
pipelined+fused+padded. Run on the real TPU.

Ref anchor: the fork's fused dequant dot V_DOT8 hot path,
/root/reference/src/ggml-cuda/q4_0-gfx906.cuh:14-21.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ggml_gfx906_tpu import ops
from ggml_gfx906_tpu.ops.quantized import QuantTensor, qmatmul, to_int8_layout
from ggml_gfx906_tpu.quant.types import GGMLType
from ggml_gfx906_tpu.utils import config
from ggml_gfx906_tpu.utils.perf import measure_hbm_bw

N_LAYER = 8
STEPS = 192
D, V, FF, FF_PAD = 4096, 32000, 11008, 11264
HD, NH = 128, 32


def qk(n, k, seed, zero_rows: int = 0):
    """Random kernel-layout Q4_K; the last `zero_rows` rows decode to 0
    (d = dmin = 0)."""
    sb = k // 256
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 3)

    @jax.jit
    def gen(k0, k1, k2):
        dd = jax.random.uniform(k2, (n, sb * 2)) * (0.02 / 8)
        if zero_rows:
            dd = dd.at[n - zero_rows:].set(0.0)
        return {
            "qs": jax.random.randint(k0, (n, sb * 128), 0, 256, jnp.uint8),
            "scm": jax.random.randint(k1, (n, sb * 16), 0, 64, jnp.uint8),
            "dd": dd,
        }

    return QuantTensor(GGMLType.Q4_K, (n, k), gen(*ks), "kernel")


def build(fused: bool):
    s = iter(range(1, 1000))
    blocks = []
    for _ in range(N_LAYER):
        if fused:
            blocks.append({
                "wqkv": qk(3 * D, D, next(s)),
                "wo": qk(D, D, next(s)),
                # gate|up with the pad rows zero-decoding
                "wgu": qk(2 * FF_PAD, D, next(s),
                          zero_rows=0),   # perf-only: values unused
                "w_down": qk(D, FF_PAD, next(s)),
                "attn_norm": jnp.ones((D,), jnp.float32),
                "ffn_norm": jnp.ones((D,), jnp.float32),
            })
        else:
            blocks.append({
                "wq": qk(D, D, next(s)), "wk": qk(D, D, next(s)),
                "wv": qk(D, D, next(s)), "wo": qk(D, D, next(s)),
                "w_gate": qk(FF, D, next(s)), "w_up": qk(FF, D, next(s)),
                "w_down": qk(D, FF, next(s)),
                "attn_norm": jnp.ones((D,), jnp.float32),
                "ffn_norm": jnp.ones((D,), jnp.float32),
            })
    return {"blocks": blocks, "out_norm": jnp.ones((D,), jnp.float32),
            "wte": qk(V, D, 0)}


def forward(params, tok, kv, pos, fused: bool):
    from ggml_gfx906_tpu.ops.quantized import embed_rows

    x = embed_rows(params["wte"], tok).astype(jnp.bfloat16)
    S = tok.shape[0]
    for li, blk in enumerate(params["blocks"]):
        h = ops.rms_norm(x, 1e-5) * blk["attn_norm"]
        if fused:
            qkv = qmatmul(h, blk["wqkv"])
            q = qkv[:, :D].reshape(S, NH, HD)
            k = qkv[:, D:2 * D].reshape(S, NH, HD)
            v = qkv[:, 2 * D:].reshape(S, NH, HD)
        else:
            q = qmatmul(h, blk["wq"]).reshape(S, NH, HD)
            k = qmatmul(h, blk["wk"]).reshape(S, NH, HD)
            v = qmatmul(h, blk["wv"]).reshape(S, NH, HD)
        q = ops.rope_ext(q, pos + jnp.arange(S, dtype=jnp.int32), HD,
                         mode=ops.ROPE_TYPE_NEOX)
        k = ops.rope_ext(k, pos + jnp.arange(S, dtype=jnp.int32), HD,
                         mode=ops.ROPE_TYPE_NEOX)
        kv = kv.update_layer(li, k, v, pos)
        kc, vc, _, _ = kv.layer_kv(li)
        att = ops.causal_flash_attn(
            jnp.transpose(q, (1, 0, 2))[None], kc[None], vc[None], pos,
            scale=1.0 / (HD ** 0.5))
        att = jnp.transpose(att[0], (1, 0, 2)).reshape(S, D)
        x = x + qmatmul(att, blk["wo"])
        h2 = ops.rms_norm(x, 1e-5) * blk["ffn_norm"]
        if fused:
            gu = qmatmul(h2, blk["wgu"])
            act = ops.silu(gu[:, :FF_PAD]) * gu[:, FF_PAD:]
        else:
            act = ops.silu(qmatmul(h2, blk["w_gate"])) * qmatmul(
                h2, blk["w_up"])
        x = x + qmatmul(act.astype(jnp.bfloat16), blk["w_down"])
    x = ops.rms_norm(x, 1e-5) * params["out_norm"]
    return qmatmul(x, params["wte"]).astype(jnp.float32), kv


import functools


@functools.partial(jax.jit, static_argnums=3, donate_argnums=2)
def decode_step(params, tok, kv, fused, pos):
    logits, kv = forward(params, tok, kv, pos, fused)
    return jnp.argmax(logits[-1]).astype(jnp.int32)[None], kv


def chain(label, params, fused, hbm):
    from ggml_gfx906_tpu.runtime.kv_cache import KVCache

    wire = sum(t.nbytes for t in jax.tree.leaves(
        params, is_leaf=lambda x: isinstance(x, QuantTensor))
        if hasattr(t, "nbytes"))
    kv = KVCache.create(N_LAYER, 512, NH, HD, jnp.bfloat16)
    tok = jnp.asarray([1], jnp.int32)
    tok, kv = decode_step(params, tok, kv, fused, jnp.int32(0))
    int(tok[0])
    pos = 1
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        for i in range(STEPS):
            tok, kv = decode_step(params, tok, kv, fused, jnp.int32(pos + i))
        int(tok[0])
        best = min(best, (time.time() - t0) / STEPS)
        pos += STEPS
    gbs = wire / best / 1e9
    print(f"{label}: {best*1e3:.3f} ms/step | "
          f"{1/(best*32/N_LAYER):.1f} tok/s implied 32-layer | "
          f"{gbs:.0f} GB/s weights ({100*gbs/hbm:.0f}% HBM, "
          f"{wire/1e9:.2f} GB wire)", flush=True)
    return best


def main():
    config.set("attn_impl", "xla")
    print(f"backend: {jax.default_backend()}", flush=True)
    hbm = measure_hbm_bw() / 1e9
    print(f"HBM: {hbm:.0f} GB/s", flush=True)

    config.set("qmm_pipeline", "auto")
    pf = build(fused=True)
    t_fused = chain("pipelined FUSED+padded (4 calls/layer)", pf, True, hbm)
    del pf

    pk = build(fused=False)
    t_pipe = chain("pipelined as-is       (7 calls/layer)", pk, False, hbm)

    config.set("qmm_pipeline", "off")
    p8 = jax.tree.map(
        lambda t: to_int8_layout(t) if isinstance(t, QuantTensor) else t,
        pk, is_leaf=lambda t: isinstance(t, QuantTensor))
    del pk
    t_int8 = chain("int8-XLA              (8.25 bpw)", p8, False, hbm)
    print(f"fused vs int8: {t_int8/t_fused:.2f}x   "
          f"fused vs as-is: {t_pipe/t_fused:.2f}x", flush=True)


if __name__ == "__main__":
    main()
