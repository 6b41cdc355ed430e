"""Quality gate on the SERVED execution layout (VERDICT r02 weak #4).

Production decode streams the tile-major int8 execution layout — a SECOND
lossy requantization on top of Q4_K that the reference does not have
(ref: the reference's decode streams the wire format directly,
src/ggml-cuda/vecdotq.cuh:590-674). This gate bounds the extra error:

  1. logits: NMSE(int8-layout vs exact-Q4_K path) must stay <= 10% of
     NMSE(Q4_K vs f32) — the int8 re-encode must be nearly free,
  2. perplexity on a deterministic synthetic corpus must agree between the
     exact-Q4_K path and the served int8 layout to < 1 % relative.

Bounds calibrated from tests/test-quantize-fns.cpp:17-25 (the reference's
own quantization-error discipline).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from ggml_gfx906_tpu.models import llama, perplexity
from ggml_gfx906_tpu.ops.quantized import QuantTensor, to_int8_layout
from ggml_gfx906_tpu.quant.types import GGMLType

CFG = llama.LlamaConfig(
    n_vocab=512, n_ctx=128, n_embd=256, n_head=4, n_kv_head=4,
    n_layer=2, n_ff=512)


def _param_triple(seed=7):
    """(f32, exact-Q4_K kernel layout, served int8 layout) from ONE set of
    float weights."""
    rng = np.random.default_rng(seed)

    def mk(n, k):
        return (rng.standard_normal((n, k)) * 0.03).astype(np.float32)

    def three(w):
        q = QuantTensor.quantize(GGMLType.Q4_K, w)
        assert q.layout == "kernel", q.layout
        return jnp.asarray(w), q, to_int8_layout(q)

    D, V, FF = CFG.n_embd, CFG.n_vocab, CFG.n_ff
    outs = [{"blocks": []} for _ in range(3)]
    wte = three(mk(V, D))
    for i, p in enumerate(outs):
        p["wte"] = wte[i]
        p["out_norm"] = jnp.ones((D,), jnp.float32)
    for _ in range(CFG.n_layer):
        blks = [{}, {}, {}]
        for name, shp in (("wq", (D, D)), ("wk", (D, D)), ("wv", (D, D)),
                          ("wo", (D, D)), ("w_gate", (FF, D)),
                          ("w_up", (FF, D)), ("w_down", (D, FF))):
            t = three(mk(*shp))
            for i in range(3):
                blks[i][name] = t[i]
        ones = jnp.ones((D,), jnp.float32)
        for b in blks:
            b["attn_norm"] = ones
            b["ffn_norm"] = ones
        for p, b in zip(outs, blks):
            p["blocks"].append(b)
    return outs


@pytest.fixture(scope="module")
def triple():
    return _param_triple()


def _logits(params, toks):
    lg, _ = llama.forward(CFG, params, toks, llama.make_cache(CFG, 64),
                          jnp.int32(0))
    return np.asarray(lg, np.float64)


def _nmse(a, b):
    return float(((a - b) ** 2).mean() / (b ** 2).mean())


def test_int8_extra_error_le_10pct_of_q4k(triple):
    pf, pq, p8 = triple
    rng = np.random.default_rng(3)
    toks = jnp.asarray(rng.integers(0, CFG.n_vocab, 48).astype(np.int32))
    lf, lq, l8 = _logits(pf, toks), _logits(pq, toks), _logits(p8, toks)
    own = _nmse(lq, lf)          # Q4_K's own quantization error
    extra = _nmse(l8, lq)        # int8 re-encode error on top of it
    assert own > 0
    assert extra <= 0.10 * own, (extra, own)
    # and the served layout stays within 1.15x of Q4_K's error vs f32
    assert _nmse(l8, lf) <= 1.15 * own


def test_ppl_parity_served_vs_exact(triple):
    _, pq, p8 = triple
    rng = np.random.default_rng(11)
    corpus = jnp.asarray(rng.integers(0, CFG.n_vocab, 512).astype(np.int32))
    r_q = perplexity.perplexity_llama(CFG, pq, corpus, n_ctx=64)
    r_8 = perplexity.perplexity_llama(CFG, p8, corpus, n_ctx=64)
    rel = abs(r_8["ppl"] - r_q["ppl"]) / r_q["ppl"]
    assert rel < 0.01, (r_q["ppl"], r_8["ppl"])
