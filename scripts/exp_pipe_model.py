"""Model-level wire-density experiment: 8-layer 7B-shaped llama decode
chain, Q4_K kernel layout through the manual-DMA pipelined kernels vs the
int8 execution layout (production r02 path). Prints ms/step, implied
32-layer tok/s, and effective weight GB/s for both.

Run on the real TPU: python scripts/exp_pipe_model.py
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

from ggml_gfx906_tpu.utils import config
from ggml_gfx906_tpu.utils.perf import device_sync, measure_hbm_bw

N_LAYER = 8
STEPS = 192


def build_params(cfg):
    from ggml_gfx906_tpu.ops.quantized import QuantTensor
    from ggml_gfx906_tpu.quant.types import GGMLType

    rng = np.random.default_rng(0)

    def qk(n, k, seed):
        sb = k // 256
        key = jax.random.PRNGKey(seed)
        ks = jax.random.split(key, 3)

        @jax.jit
        def gen(k0, k1, k2):
            return {
                "qs": jax.random.randint(k0, (n, sb * 128), 0, 256,
                                         jnp.uint8),
                "scm": jax.random.randint(k1, (n, sb * 16), 0, 64,
                                          jnp.uint8),
                "dd": jax.random.uniform(k2, (n, sb * 2)) * (0.02 / 8),
            }

        return QuantTensor(GGMLType.Q4_K, (n, k), gen(*ks), "kernel")

    D, V, FF = cfg.n_embd, cfg.n_vocab, cfg.n_ff
    s = iter(range(1000))
    p = {"wte": qk(V, D, next(s)),
         "out_norm": jnp.ones((D,), jnp.float32), "blocks": []}
    for _ in range(cfg.n_layer):
        p["blocks"].append({
            "attn_norm": jnp.ones((D,), jnp.float32),
            "wq": qk(D, D, next(s)), "wk": qk(D, D, next(s)),
            "wv": qk(D, D, next(s)), "wo": qk(D, D, next(s)),
            "ffn_norm": jnp.ones((D,), jnp.float32),
            "w_gate": qk(FF, D, next(s)), "w_up": qk(FF, D, next(s)),
            "w_down": qk(D, FF, next(s)),
        })
    return p


def decode_chain(llama, cfg, params, label, hbm, wire_bytes):
    # no prefill: decode-only chain from an empty cache (the prefill
    # program's compile is irrelevant to this measurement and the remote
    # compile helper intermittently dies on it)
    kv = llama.make_cache(cfg, 512)
    tok = jnp.asarray([1], jnp.int32)
    tok, kv = llama.decode_step(cfg, params, tok, kv, jnp.int32(0))
    int(tok[0])
    pos = 1
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        for i in range(STEPS):
            tok, kv = llama.decode_step(cfg, params, tok, kv,
                                        jnp.int32(pos + i))
        int(tok[0])
        best = min(best, (time.time() - t0) / STEPS)
        pos += STEPS
    gbs = wire_bytes / best / 1e9
    print(f"{label}: {best*1e3:.3f} ms/step | {1/ (best*32/N_LAYER):.1f} "
          f"tok/s implied 32-layer | {gbs:.0f} GB/s weights "
          f"({100*gbs/hbm:.0f}% HBM)", flush=True)
    return best


def main():
    from ggml_gfx906_tpu.models import llama
    from ggml_gfx906_tpu.ops.quantized import QuantTensor, to_int8_layout

    config.set("attn_impl", "xla")
    print(f"backend: {jax.default_backend()}", flush=True)
    hbm = measure_hbm_bw() / 1e9
    print(f"HBM: {hbm:.0f} GB/s", flush=True)

    cfg = llama.LlamaConfig(
        n_vocab=32000, n_ctx=2048, n_embd=4096, n_head=32, n_kv_head=32,
        n_layer=N_LAYER, n_ff=11008, compute_dtype=jnp.bfloat16)
    t0 = time.time()
    pk = build_params(cfg)
    wire = sum(t.nbytes for t in jax.tree.leaves(
        pk, is_leaf=lambda x: isinstance(x, QuantTensor))
        if hasattr(t, "nbytes"))
    print(f"built kernel-layout params ({wire/1e9:.2f} GB wire) "
          f"in {time.time()-t0:.0f}s", flush=True)

    # single-matmul sanity on the real shapes (pipelined vs outer-grid)
    from ggml_gfx906_tpu.ops.pallas import qmm
    f = pk["blocks"][0]["w_down"].fields
    x = jnp.asarray(np.random.default_rng(1)
                    .standard_normal((1, cfg.n_ff)).astype(np.float32))
    a = np.asarray(jax.jit(qmm.qmm_q4_K_pipelined)(x, f["qs"], f["scm"],
                                                   f["dd"]))
    b = np.asarray(jax.jit(qmm.qmm_q4_K)(x, f["qs"], f["scm"], f["dd"]))
    print(f"w_down pipelined vs outer-grid nmse: "
          f"{((a-b)**2).mean()/(b**2).mean():.2e}", flush=True)

    config.set("qmm_pipeline", "auto")
    t_pipe = decode_chain(llama, cfg, pk, "pipelined  (4.75 bpw)", hbm,
                          wire)

    t0 = time.time()
    p8 = jax.tree.map(
        lambda t: to_int8_layout(t) if isinstance(t, QuantTensor) else t,
        pk, is_leaf=lambda t: isinstance(t, QuantTensor))
    del pk
    int8_bytes = sum(t.nbytes for t in jax.tree.leaves(
        p8, is_leaf=lambda x: isinstance(x, QuantTensor))
        if hasattr(t, "nbytes"))
    print(f"int8 layout built ({int8_bytes/1e9:.2f} GB) "
          f"in {time.time()-t0:.0f}s", flush=True)
    config.set("qmm_pipeline", "off")
    t_int8 = decode_chain(llama, cfg, p8, "int8-XLA   (8.25 bpw)", hbm,
                          int8_bytes)
    print(f"speedup: {t_int8/t_pipe:.2f}x", flush=True)


if __name__ == "__main__":
    main()
