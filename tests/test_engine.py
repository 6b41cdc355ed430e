"""Continuous-batching engine: batched output must equal single-sequence
generate token-for-token (the correctness bar for request batching,
ref main-batched.cpp behaviour)."""
import numpy as np
import jax.numpy as jnp

from ggml_gfx906_tpu.models import llama
from ggml_gfx906_tpu.runtime.engine import Engine


def _tiny_model():
    cfg = llama.LlamaConfig(
        n_vocab=128, n_ctx=64, n_embd=64, n_head=4, n_kv_head=2,
        n_layer=2, n_ff=128)
    params = llama.random_params(cfg, seed=0)
    return cfg, params


def test_engine_matches_single_sequence():
    cfg, params = _tiny_model()
    eng = Engine(llama, cfg, params, max_batch=3, max_seq=64)
    prompts = [[1, 2, 3], [7, 8, 9, 10, 11], [42]]
    n_new = 6
    rids = [eng.submit(p, n_new) for p in prompts]
    done = {r.rid: r for r in eng.run()}
    assert set(done) == set(rids)
    for rid, prompt in zip(rids, prompts):
        expect = llama.generate(cfg, params, prompt, n_new, max_seq=64)
        got = prompt + done[rid].out
        assert got == expect, (prompt, got, expect)


def test_engine_continuous_admission():
    """More requests than slots: finished slots are recycled and every
    request still matches its single-sequence reference."""
    cfg, params = _tiny_model()
    eng = Engine(llama, cfg, params, max_batch=2, max_seq=64)
    prompts = [[i + 1, i + 2] for i in range(5)]
    rids = [eng.submit(p, 4) for p in prompts]
    done = {r.rid: r for r in eng.run()}
    assert len(done) == 5
    for rid, prompt in zip(rids, prompts):
        expect = llama.generate(cfg, params, prompt, 4, max_seq=64)
        assert prompt + done[rid].out == expect


def test_engine_eos_stops():
    cfg, params = _tiny_model()
    # find what token gets produced, then use it as eos to force early stop
    base = llama.generate(cfg, params, [5, 6], 4, max_seq=64)
    eos = base[2]  # first generated token
    eng = Engine(llama, cfg, params, max_batch=2, max_seq=64)
    rid = eng.submit([5, 6], 8, eos_id=eos)
    done = {r.rid: r for r in eng.run()}
    assert done[rid].out == [eos]
