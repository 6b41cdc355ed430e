"""Benchmark driver: prints ONE JSON line with the headline metric.

Current headline: GPT-2 117M-class Q8_0 greedy decode tokens/sec on one TPU
chip, vs the reference MI50 baseline of 214 tok/s for Q8_0 decode
(BASELINE.md; docs/gfx906/ggml_fork_optimizations.md:341). The 7B Q4_K
north-star lands with the llama model family.

Usage: python bench.py  (runs on the real TPU; first compile ~20-40s)
"""
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

import numpy as np

BASELINE_TOKS = 214.0  # MI50 Q8_0 decode tok/s (BASELINE.md)

CACHE = Path(os.environ.get("BENCH_CACHE", "/tmp")) / "bench-gpt2-117m-q8_0.gguf"


def build_model(path: Path):
    """117M-shape GPT-2 with deterministic random weights, Q8_0."""
    from ggml_gfx906_tpu.gguf import GGUFWriter
    from ggml_gfx906_tpu.quant import GGMLType
    from ggml_gfx906_tpu.quant.registry import quantize_to_bytes

    rng = np.random.default_rng(0)
    V, D, L, CTX = 50257, 768, 12, 1024

    w = GGUFWriter()
    w.set("general.architecture", "gpt2")
    w.set("gpt2.vocab_size", V)
    w.set("gpt2.context_length", CTX)
    w.set("gpt2.embedding_length", D)
    w.set("gpt2.block_count", L)
    w.set("gpt2.attention.head_count", 12)
    w.set("gpt2.attention.layer_norm_epsilon", 1e-5)

    def mat(name, r, c):
        a = (rng.standard_normal((r, c)) * 0.02).astype(np.float32)
        w.add_tensor(name, (c, r), GGMLType.Q8_0,
                     quantize_to_bytes(GGMLType.Q8_0, a))

    def vec(name, n, ones=False):
        a = np.ones(n, np.float32) if ones else np.zeros(n, np.float32)
        w.add_array_tensor(name, a)

    mat("token_embd.weight", V, D)
    w.add_array_tensor("position_embd.weight",
                       (rng.standard_normal((CTX, D)) * 0.01).astype(np.float32))
    vec("output_norm.weight", D, ones=True)
    vec("output_norm.bias", D)
    for i in range(L):
        g = f"blk.{i}."
        vec(g + "attn_norm.weight", D, ones=True)
        vec(g + "attn_norm.bias", D)
        mat(g + "attn_qkv.weight", 3 * D, D)
        vec(g + "attn_qkv.bias", 3 * D)
        mat(g + "attn_output.weight", D, D)
        vec(g + "attn_output.bias", D)
        vec(g + "ffn_norm.weight", D, ones=True)
        vec(g + "ffn_norm.bias", D)
        mat(g + "ffn_up.weight", 4 * D, D)
        vec(g + "ffn_up.bias", 4 * D)
        mat(g + "ffn_down.weight", D, 4 * D)
        vec(g + "ffn_down.bias", D)
    w.write(path)


def main():
    import jax
    import jax.numpy as jnp
    from ggml_gfx906_tpu.models import gpt2
    from ggml_gfx906_tpu.runtime.kv_cache import KVCache

    if not CACHE.exists():
        print("building benchmark model...", file=sys.stderr)
        build_model(CACHE)

    cfg, params = gpt2.load(CACHE)
    max_seq = 1024
    kv = KVCache.create(cfg.n_layer, max_seq, cfg.n_head, cfg.head_dim)

    # prefill 64 tokens, then timed single-token decode steps
    prompt = jnp.asarray(np.arange(64, dtype=np.int32))
    logits, kv = gpt2.forward_jit(cfg, params, prompt, kv, jnp.int32(0))
    tok = jnp.argmax(logits[-1]).astype(jnp.int32)[None]

    # warmup decode step (compile)
    logits, kv = gpt2.forward_jit(cfg, params, tok, kv, jnp.int32(64))
    logits.block_until_ready()

    n_steps = 64
    t0 = time.time()
    pos = 65
    for i in range(n_steps):
        logits, kv = gpt2.forward_jit(cfg, params, tok, kv, jnp.int32(pos + i))
    logits.block_until_ready()
    dt = time.time() - t0
    toks = n_steps / dt

    print(json.dumps({
        "metric": "gpt2_117m_q8_0_decode_tok_s_per_chip",
        "value": round(toks, 2),
        "unit": "tok/s",
        "vs_baseline": round(toks / BASELINE_TOKS, 3),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
