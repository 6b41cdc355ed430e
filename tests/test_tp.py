"""Sharded (tensor-parallel) quantized llama inference on the virtual mesh.

The split-buffer TP analogue (ref src/ggml-cuda/ggml-cuda.cu:799-1070) run
end-to-end: row/column-sharded Q4_K QuantTensors + the fused Pallas kernels
(interpret mode on CPU) inside shard_map, parity vs the single-device path.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ggml_gfx906_tpu.models import llama
from ggml_gfx906_tpu.ops.quantized import QuantTensor
from ggml_gfx906_tpu.parallel import make_mesh
from ggml_gfx906_tpu.parallel.tp import (
    shard_llama_params, tp_decode_step, tp_forward, tp_forward_batch)
from ggml_gfx906_tpu.quant import GGMLType
from ggml_gfx906_tpu.runtime.batched_kv import BatchedKVCache

CFG = llama.LlamaConfig(n_vocab=512, n_ctx=128, n_embd=512, n_head=4,
                        n_kv_head=2, n_layer=2, n_ff=1024)


@pytest.fixture(scope="module")
def qparams():
    rng = np.random.default_rng(3)

    def q(n, k):
        return QuantTensor.quantize(
            GGMLType.Q4_K, (rng.standard_normal((n, k)) * 0.05
                            ).astype(np.float32))

    D, FF, KVD = CFG.n_embd, CFG.n_ff, CFG.n_kv_head * CFG.head_dim
    p = {"wte": jnp.asarray(rng.standard_normal((CFG.n_vocab, D)) * 0.05,
                            jnp.float32),
         "out_norm": jnp.ones((D,), jnp.float32), "blocks": []}
    for _ in range(CFG.n_layer):
        p["blocks"].append({
            "attn_norm": jnp.ones((D,), jnp.float32),
            "wq": q(D, D), "wk": q(KVD, D), "wv": q(KVD, D), "wo": q(D, D),
            "ffn_norm": jnp.ones((D,), jnp.float32),
            "w_gate": q(FF, D), "w_up": q(FF, D), "w_down": q(D, FF),
        })
    return p


def test_tp2_forward_matches_single(qparams):
    mesh = make_mesh(dp=1, tp=2)
    sparams = shard_llama_params(mesh, qparams)
    toks = jnp.asarray([3, 100, 57, 501, 9], jnp.int32)

    ref, _ = llama.forward(CFG, qparams, toks, llama.make_cache(CFG, 128),
                           jnp.int32(0))
    got, kv2 = tp_forward(mesh, CFG, sparams, toks,
                          llama.make_cache(CFG, 128), jnp.int32(0))
    ref, got = np.asarray(ref), np.asarray(got)
    nmse = ((got - ref) ** 2).sum() / (ref ** 2).sum()
    assert nmse < 1e-9, nmse
    assert int(kv2.length) == 5


def test_tp2_greedy_decode_token_exact(qparams):
    mesh = make_mesh(dp=1, tp=2)
    sparams = shard_llama_params(mesh, qparams)
    prompt = jnp.asarray([5, 17, 80], jnp.int32)

    # single-device chain
    kv = llama.make_cache(CFG, 128)
    logits, kv = llama.forward(CFG, qparams, prompt, kv, jnp.int32(0))
    tok = jnp.argmax(logits[-1]).astype(jnp.int32)[None]
    ref_toks = [int(tok[0])]
    for i in range(4):
        tok, kv = llama.decode_step(CFG, qparams, tok, kv, jnp.int32(3 + i))
        ref_toks.append(int(tok[0]))

    kv2 = llama.make_cache(CFG, 128)
    logits2, kv2 = tp_forward(mesh, CFG, sparams, prompt, kv2, jnp.int32(0))
    tok2 = jnp.argmax(logits2[-1]).astype(jnp.int32)[None]
    got_toks = [int(tok2[0])]
    for i in range(4):
        tok2, kv2 = tp_decode_step(mesh, CFG, sparams, tok2, kv2,
                                   jnp.int32(3 + i))
        got_toks.append(int(tok2[0]))
    assert got_toks == ref_toks, (got_toks, ref_toks)


def test_dp_tp_batched_forward_matches_single(qparams):
    mesh = make_mesh(dp=2, tp=2)
    sparams = shard_llama_params(mesh, qparams)
    B, S = 4, 6
    rng = np.random.default_rng(11)
    toks = jnp.asarray(rng.integers(0, CFG.n_vocab, (B, S)), jnp.int32)
    start = jnp.zeros((B,), jnp.int32)

    def fresh():
        return BatchedKVCache.create(CFG.n_layer, B, 128, CFG.n_kv_head,
                                     CFG.head_dim)

    ref, _ = llama.forward_batch(CFG, qparams, toks, fresh(), start)
    got, kvb = tp_forward_batch(mesh, CFG, sparams, toks, fresh(), start)
    ref, got = np.asarray(ref), np.asarray(got)
    nmse = ((got - ref) ** 2).sum() / (ref ** 2).sum()
    assert nmse < 1e-9, nmse
    np.testing.assert_array_equal(np.asarray(kvb.lengths), 0)
    # greedy next tokens agree per slot
    assert list(np.asarray(got[:, -1].argmax(-1))) == \
        list(np.asarray(ref[:, -1].argmax(-1)))


def test_tp2_int8_layout_forward_matches_single(qparams):
    """The tile-major int8 execution layout row-shards on its own row axis
    (axis 1 of w8t/dwt) and must match the unsharded int8 forward."""
    from ggml_gfx906_tpu.ops.quantized import to_int8_layout

    p8 = jax.tree.map(
        lambda t: to_int8_layout(t) if isinstance(t, QuantTensor) else t,
        qparams, is_leaf=lambda t: isinstance(t, QuantTensor))
    mesh = make_mesh(dp=1, tp=2)
    sparams = shard_llama_params(mesh, p8)
    toks = jnp.asarray([3, 100, 57, 501, 9], jnp.int32)
    ref, _ = llama.forward(CFG, p8, toks, llama.make_cache(CFG, 128),
                           jnp.int32(0))
    got, _ = tp_forward(mesh, CFG, sparams, toks,
                        llama.make_cache(CFG, 128), jnp.int32(0))
    ref, got = np.asarray(ref), np.asarray(got)
    nmse = ((got - ref) ** 2).sum() / (ref ** 2).sum()
    assert nmse < 1e-9, nmse
