"""Speculative decoding: the emitted stream must be BIT-IDENTICAL to
plain greedy decode for any draft (exactness is the feature's contract;
the reference has no speculative path — this is the llama.cpp-family
lookup-decoding idea rebuilt for the jit runtime, models/speculative.py).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from ggml_gfx906_tpu.models import llama, speculative
from ggml_gfx906_tpu.quant import GGMLType


def _toy(seed=0, quant=None):
    cfg = llama.LlamaConfig(n_vocab=160, n_ctx=256, n_embd=64, n_head=4,
                            n_kv_head=2, n_layer=3, n_ff=128,
                            compute_dtype=jnp.float32)
    params = llama.random_params(cfg, seed=seed, qtype=quant)
    return cfg, params


PROMPT = [3, 14, 15, 9, 2, 6]


@pytest.mark.parametrize("k", [1, 4, 8])
def test_ngram_spec_exact_vs_greedy(k):
    cfg, params = _toy()
    ref = llama.generate(cfg, params, PROMPT, 40)
    got = speculative.spec_generate(cfg, params, PROMPT, 40, k=k)
    assert got == ref


def test_ngram_spec_quantized_weights():
    cfg, params = _toy(seed=3, quant=GGMLType.Q4_K)
    ref = llama.generate(cfg, params, PROMPT, 32)
    got, stats = speculative.spec_generate(cfg, params, PROMPT, 32, k=4,
                                           return_stats=True)
    assert got == ref
    assert stats["spec_steps"] >= 1
    assert all(0 <= a <= 4 for a in stats["accepted_per_step"])


def test_ngram_accepts_on_repetitive_stream():
    """Random toy models typically fall into greedy cycles — once the
    stream repeats, prompt-lookup must start accepting (the honest
    mechanism behind the speedup on repetitive workloads)."""
    cfg, params = _toy(seed=1)
    ref = llama.generate(cfg, params, PROMPT, 96)
    got, stats = speculative.spec_generate(cfg, params, PROMPT, 96, k=8,
                                           return_stats=True)
    assert got == ref
    # acceptance claim only when the stream actually cycles
    s = ref[len(PROMPT):]
    if s[-24:-12] == s[-12:]:
        assert stats["accept_rate"] > 0.5, stats
        assert stats["spec_steps"] < 96


def test_model_draft_exact_and_full_accept():
    cfg, params = _toy(seed=2)
    ref = llama.generate(cfg, params, PROMPT, 30)
    # draft == full model: every proposal must be accepted (m == k)
    got, stats = speculative.model_spec_generate(
        cfg, params, PROMPT, 30, draft=(cfg, params), k=4,
        return_stats=True)
    assert got == ref
    assert all(a == 4 for a in stats["accepted_per_step"]), stats
    # layer-skip draft (weights shared): exact regardless of quality
    got2 = speculative.model_spec_generate(cfg, params, PROMPT, 30,
                                           draft_layers=1, k=4)
    assert got2 == ref


def test_capacity_guard():
    cfg, params = _toy()
    with pytest.raises(ValueError):
        speculative.spec_generate(cfg, params, PROMPT, 400, k=4,
                                  max_seq=256)
