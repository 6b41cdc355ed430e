"""Perplexity evaluator vs a direct numpy reference (the reference tool's
quality-gate semantics, tools/perplexity)."""
import numpy as np
import jax
import jax.numpy as jnp

from ggml_gfx906_tpu.models import llama, perplexity


def _tiny():
    cfg = llama.LlamaConfig(
        n_vocab=96, n_ctx=64, n_embd=48, n_head=4, n_kv_head=2,
        n_layer=2, n_ff=96)
    return cfg, llama.random_params(cfg, seed=1)


def _ref_ppl(cfg, params, toks, n_ctx, warmup):
    """Windowed NLL computed directly from full-precision forwards."""
    total, n = 0.0, 0
    for s in range(0, len(toks) - 1, n_ctx):
        win = toks[s:s + n_ctx + 1]
        inp, tgt = win[:-1], win[1:]
        kv = llama.make_cache(cfg, len(inp))
        logits, _ = llama.forward(cfg, params, jnp.asarray(inp), kv,
                                  jnp.int32(0))
        lp = np.asarray(logits, np.float64)
        lp = lp - lp.max(-1, keepdims=True)
        lp = lp - np.log(np.exp(lp).sum(-1, keepdims=True))
        start = 0 if s == 0 else warmup
        for i in range(start, len(tgt)):
            total += -lp[i, tgt[i]]
            n += 1
    return np.exp(total / n), n


def test_perplexity_matches_reference():
    cfg, params = _tiny()
    rng = np.random.default_rng(0)
    toks = rng.integers(0, cfg.n_vocab, 90).astype(np.int32)
    got = perplexity.perplexity_llama(cfg, params, toks, n_ctx=32)
    want_ppl, want_n = _ref_ppl(cfg, params, toks, 32, warmup=8)
    assert got["n_tokens"] == want_n
    assert abs(got["ppl"] - want_ppl) / want_ppl < 2e-3, (got, want_ppl)


def test_perplexity_random_model_near_uniform():
    """An untrained model's ppl should sit near the uniform bound |V| (and
    must not be wildly below it — sanity against NLL bookkeeping bugs)."""
    cfg, params = _tiny()
    rng = np.random.default_rng(1)
    toks = rng.integers(0, cfg.n_vocab, 65).astype(np.int32)
    got = perplexity.perplexity_llama(cfg, params, toks, n_ctx=64)
    assert 0.3 * cfg.n_vocab < got["ppl"] < 3.0 * cfg.n_vocab, got


def test_ppl_delta_quantized_within_bounds():
    """BASELINE north star: quantized perplexity within bounds of f32
    (the reference's quality gate for every codec). Q8_0 must track f32
    tightly; Q4_K stays within a few percent even on a random model."""
    from ggml_gfx906_tpu.ops.quantized import QuantTensor
    from ggml_gfx906_tpu.quant import GGMLType

    cfg, params = _tiny()
    rng = np.random.default_rng(3)
    toks = rng.integers(0, cfg.n_vocab, 80).astype(np.int32)
    base = perplexity.perplexity_llama(cfg, params, toks, n_ctx=32)["ppl"]

    def quantize_params(qtype):
        def q(t):
            if hasattr(t, "ndim") and t.ndim == 2 and t.shape[1] % 256 == 0:
                return QuantTensor.quantize(qtype, np.asarray(t))
            return t
        return jax.tree.map(q, params)

    for qtype, bound in ((GGMLType.Q8_0, 0.01), (GGMLType.Q4_K, 0.10)):
        ppl = perplexity.perplexity_llama(cfg, quantize_params(qtype), toks,
                                          n_ctx=32)["ppl"]
        delta = abs(ppl - base) / base
        assert delta < bound, (qtype, ppl, base, delta)
