"""Paged KV pool (runtime/paged_kv.py): bit-exact drop-in for the dense
slab + the capacity claim — HBM scales with LIVE tokens.

ref: KV-cell management, examples/gpt-2/main-batched.cpp:88-139 (cells
allocated per sequence, reclaimed on completion), vs the dense
max_batch × max_seq reservation the engine used before."""
import numpy as np
import jax.numpy as jnp
import pytest

from ggml_gfx906_tpu.models import llama
from ggml_gfx906_tpu.runtime.batched_kv import BatchedKVCache
from ggml_gfx906_tpu.runtime.engine import Engine
from ggml_gfx906_tpu.runtime.paged_kv import PagedKVCache
from ggml_gfx906_tpu.utils import config


def _tiny_model():
    cfg = llama.LlamaConfig(
        n_vocab=128, n_ctx=64, n_embd=64, n_head=4, n_kv_head=2,
        n_layer=2, n_ff=128)
    return cfg, llama.random_params(cfg, seed=0)


PS = 16  # small pages so tiny tests cross page boundaries


@pytest.fixture(autouse=True)
def _small_pages():
    old = config.get("kv_page_size")
    config.set("kv_page_size", PS)
    yield
    config.set("kv_page_size", old)


def test_paged_cache_unit_parity():
    """update_layer/layer_kv against the dense BatchedKVCache on the same
    random write sequence (decode S=1 writes at staggered positions)."""
    rng = np.random.default_rng(0)
    B, H, D, L, MS = 3, 2, 8, 2, 64
    dense = BatchedKVCache.create(L, B, MS, H, D)
    paged = PagedKVCache.create(L, B, MS, H, D, total_pages=B * MS // PS,
                                page_size=PS)
    # identity page tables: slot b owns pages [b*MS/PS, (b+1)*MS/PS)
    pt = np.arange(B * (MS // PS), dtype=np.int32).reshape(B, MS // PS)
    paged = paged.with_page_table(jnp.asarray(pt))
    starts = jnp.asarray([0, 5, 17], jnp.int32)
    for step in range(PS + 3):      # crosses a page boundary for slot 1
        k_new = jnp.asarray(rng.standard_normal((B, 1, H, D)), jnp.float32)
        v_new = jnp.asarray(rng.standard_normal((B, 1, H, D)), jnp.float32)
        s = starts + step
        for li in range(L):
            dense = dense.update_layer(li, k_new, v_new, s)
            paged = paged.update_layer(li, k_new, v_new, s)
    for li in range(L):
        for w in (32, 64, None):
            kd, vd = dense.layer_kv(li, w)[:2]
            kp, vp = paged.layer_kv(li, w)[:2]
            np.testing.assert_array_equal(np.asarray(kd), np.asarray(kp))
            np.testing.assert_array_equal(np.asarray(vd), np.asarray(vp))


def test_engine_paged_matches_single_sequence():
    cfg, params = _tiny_model()
    eng = Engine(llama, cfg, params, max_batch=3, max_seq=64,
                 paged_pages=3 * 64 // PS)
    prompts = [[1, 2, 3], [7, 8, 9, 10, 11], [42]]
    n_new = 20          # long enough to cross page boundaries
    rids = [eng.submit(p, n_new) for p in prompts]
    done = {r.rid: r for r in eng.run()}
    assert set(done) == set(rids)
    for rid, prompt in zip(rids, prompts):
        expect = llama.generate(cfg, params, prompt, n_new, max_seq=64)
        assert prompt + done[rid].out == expect, (prompt,)


def test_engine_paged_quantized_kv_matches_single():
    cfg, params = _tiny_model()
    config.set("kv_quant", True)
    try:
        eng = Engine(llama, cfg, params, max_batch=2, max_seq=64,
                     paged_pages=2 * 64 // PS)
        # reference: single-sequence QUANTIZED cache decode
        eng_ref = Engine(llama, cfg, params, max_batch=2, max_seq=64)
        prompts = [[3, 1, 4, 1, 5], [9, 2, 6]]
        rids = [eng.submit(p, 18) for p in prompts]
        rids_ref = [eng_ref.submit(p, 18) for p in prompts]
        done = {r.rid: r for r in eng.run()}
        ref = {r.rid: r for r in eng_ref.run()}
        for a, b in zip(rids, rids_ref):
            assert done[a].out == ref[b].out
    finally:
        config.set("kv_quant", False)


def test_double_slot_capacity_at_equal_hbm():
    """THE capacity claim: a pool with HALF the dense slab's pages serves
    the full slot count when sequences stay short — the dense cache would
    need 2x the HBM for the same concurrency."""
    cfg, params = _tiny_model()
    max_batch, max_seq = 4, 64
    dense_pages = max_batch * max_seq // PS          # 16
    eng = Engine(llama, cfg, params, max_batch=max_batch, max_seq=max_seq,
                 paged_pages=dense_pages // 2)       # half the HBM
    # HBM accounting: pool bytes vs the dense slab
    pool_bytes = sum(x.nbytes for x in eng.kv.k + eng.kv.v)
    dense = BatchedKVCache.create(cfg.n_layer, max_batch, max_seq,
                                  cfg.n_kv_head, cfg.head_dim)
    dense_bytes = sum(x.nbytes for x in dense.k + dense.v)
    assert pool_bytes <= 0.6 * dense_bytes           # ≈½ (+1 scratch page)
    # 4 concurrent slots, each ≤ 32 positions ⇒ fits the half-size pool
    prompts = [[i + 1, i + 2, i + 3] for i in range(max_batch)]
    rids = [eng.submit(p, 24) for p in prompts]
    done = {r.rid: r for r in eng.run()}
    assert len(done) == max_batch
    for rid, prompt in zip(rids, prompts):
        expect = llama.generate(cfg, params, prompt, 24, max_seq=max_seq)
        assert prompt + done[rid].out == expect


def test_admission_defers_when_pool_full():
    """A request that cannot get pages waits (active slots keep decoding)
    and is admitted after completions free pages — and still matches its
    single-sequence reference."""
    cfg, params = _tiny_model()
    eng = Engine(llama, cfg, params, max_batch=2, max_seq=64,
                 paged_pages=3)       # 3 pages of 16 = 48 positions total
    prompts = [[1, 2, 3], [7, 8], [4, 5, 6]]
    rids = [eng.submit(p, 8) for p in prompts]
    done = {r.rid: r for r in eng.run()}
    assert len(done) == 3
    for rid, prompt in zip(rids, prompts):
        expect = llama.generate(cfg, params, prompt, 8, max_seq=64)
        assert prompt + done[rid].out == expect


def test_pool_too_small_raises():
    cfg, params = _tiny_model()
    eng = Engine(llama, cfg, params, max_batch=2, max_seq=64, paged_pages=1)
    eng.submit(list(range(1, 20)), 4)      # needs 2 pages, pool has 1
    with pytest.raises(RuntimeError, match="paged KV pool"):
        eng.run()
