"""int8 execution-layout disk cache (VERDICT r04 missing #4, TTFT):
first int8 load writes it, later loads mmap it back with identical
values; staleness (source change, tile change) invalidates."""
import json

import numpy as np
import jax.numpy as jnp

from ggml_gfx906_tpu.gguf.format import GGUFWriter
from ggml_gfx906_tpu.models import llama
from ggml_gfx906_tpu.ops.quantized import QuantTensor, dequant
from ggml_gfx906_tpu.quant.types import GGMLType
from ggml_gfx906_tpu.runtime import weight_cache
from ggml_gfx906_tpu.utils import config


def _write_tiny_gguf(path, seed=0):
    rng = np.random.default_rng(seed)
    cfg = llama.LlamaConfig(n_vocab=64, n_ctx=32, n_embd=256, n_head=2,
                            n_kv_head=2, n_layer=1, n_ff=256)
    w = GGUFWriter()
    A = "llama"
    w.set("general.architecture", A)
    w.set(f"{A}.context_length", cfg.n_ctx)
    w.set(f"{A}.embedding_length", cfg.n_embd)
    w.set(f"{A}.attention.head_count", cfg.n_head)
    w.set(f"{A}.attention.head_count_kv", cfg.n_kv_head)
    w.set(f"{A}.block_count", cfg.n_layer)
    w.set(f"{A}.feed_forward_length", cfg.n_ff)
    w.set(f"{A}.vocab_size", cfg.n_vocab)
    D, V, FF = cfg.n_embd, cfg.n_vocab, cfg.n_ff

    from ggml_gfx906_tpu.quant.kquants import quantize_q4_K

    def q4k(name, n, k):
        blocks = quantize_q4_K(
            (rng.standard_normal((n, k)) * 0.05).astype(np.float32).reshape(
                -1, 256))
        w.add_tensor(name, (k, n), GGMLType.Q4_K, blocks.tobytes())
    ones = np.ones(D, np.float32)
    q4k("token_embd.weight", V, D)
    w.add_array_tensor("output_norm.weight", ones)
    for i in range(cfg.n_layer):
        for nm, (n, k) in (("attn_q", (D, D)), ("attn_k", (D, D)),
                           ("attn_v", (D, D)), ("attn_output", (D, D)),
                           ("ffn_gate", (FF, D)), ("ffn_up", (FF, D)),
                           ("ffn_down", (D, FF))):
            q4k(f"blk.{i}.{nm}.weight", n, k)
        w.add_array_tensor(f"blk.{i}.attn_norm.weight", ones)
        w.add_array_tensor(f"blk.{i}.ffn_norm.weight", ones)
    w.write(path)
    return path


def test_int8_cache_roundtrip_and_invalidation(tmp_path):
    g = _write_tiny_gguf(tmp_path / "tiny.gguf")

    # miss → converts and writes the cache
    assert weight_cache.lookup(g) is None
    cfg, p1 = llama.load(g, layout="int8")
    assert p1["wte"].layout == "int8"
    d = weight_cache.cache_dir(g)
    assert (d / "manifest.json").exists()

    # hit → loaders present for every quant tensor, values identical
    cached = weight_cache.lookup(g)
    assert cached is not None and "token_embd.weight" in cached
    cfg2, p2 = llama.load(g, layout="int8")
    np.testing.assert_array_equal(np.asarray(dequant(p1["wte"])),
                                  np.asarray(dequant(p2["wte"])))
    np.testing.assert_array_equal(
        np.asarray(dequant(p1["blocks"][0]["w_down"])),
        np.asarray(dequant(p2["blocks"][0]["w_down"])))
    # and the cached-load model actually runs
    kv = llama.make_cache(cfg2, 32)
    logits, _ = llama.forward(cfg2, p2, jnp.asarray([1, 2, 3], jnp.int32),
                              kv, jnp.int32(0))
    assert np.isfinite(np.asarray(logits)).all()

    # tile change invalidates
    config.set("int8_tile", 64)
    try:
        assert weight_cache.lookup(g) is None
    finally:
        config.unset("int8_tile")
    assert weight_cache.lookup(g) is not None

    # source mutation invalidates (manifest records size+mtime_ns)
    m = json.loads((d / "manifest.json").read_text())
    with open(g, "ab") as f:
        f.write(b"\0")
    assert weight_cache.lookup(g) is None
    assert m["version"] == weight_cache.VERSION


def test_kernel_layout_load_unaffected(tmp_path):
    g = _write_tiny_gguf(tmp_path / "tiny2.gguf", seed=1)
    cfg, p = llama.load(g)                     # default kernel layout
    assert p["wte"].layout == "kernel"
    assert not weight_cache.cache_dir(g).exists()
