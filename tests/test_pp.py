"""Pipeline parallelism (GPipe microbatching over a 'pp' mesh axis) —
parity vs the single-device forward (ref: the reference's pipeline
overlap, src/ggml-backend.cpp:1352-1430)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ggml_gfx906_tpu.models import llama
from ggml_gfx906_tpu.parallel.pp import (
    make_pp_mesh, pp_forward, shard_pp, stack_blocks)
from ggml_gfx906_tpu.runtime.batched_kv import BatchedKVCache

CFG = llama.LlamaConfig(n_vocab=128, n_ctx=64, n_embd=64, n_head=4,
                        n_kv_head=2, n_layer=4, n_ff=128)


@pytest.fixture(scope="module")
def dense_params():
    return llama.random_params(CFG, seed=2)


def _reference(params, toks):
    kv = BatchedKVCache.create(CFG.n_layer, toks.shape[0], 64,
                               CFG.n_kv_head, CFG.head_dim)
    logits, _ = llama.forward_batch(CFG, params, toks,
                                    kv, jnp.zeros(toks.shape[0], jnp.int32))
    return np.asarray(logits)


@pytest.mark.parametrize("pp,n_micro", [(2, 2), (2, 4), (4, 4)])
def test_pp_forward_matches_single(dense_params, pp, n_micro):
    mesh = make_pp_mesh(pp)
    sharded = shard_pp(mesh, stack_blocks(dense_params))
    rng = np.random.default_rng(0)
    B, S = n_micro * 2, 8
    toks = jnp.asarray(rng.integers(0, CFG.n_vocab, (B, S)), jnp.int32)
    got = np.asarray(pp_forward(mesh, CFG, sharded, toks, n_micro))
    ref = _reference(dense_params, toks)
    nmse = ((got - ref) ** 2).sum() / (ref ** 2).sum()
    assert nmse < 1e-9, nmse


def test_pp_requires_divisible_layers(dense_params):
    mesh = make_pp_mesh(3)   # 4 layers % 3 != 0 → sharding must reject
    stacked = stack_blocks(dense_params)
    with pytest.raises(Exception):
        sharded = shard_pp(mesh, stacked)
        toks = jnp.zeros((3, 4), jnp.int32)
        np.asarray(pp_forward(mesh, CFG, sharded, toks, 3))


def test_offload_split_matches_single(dense_params):
    """The -ngl analogue: layers split across two devices with one
    boundary transfer must match the single-device forward (ref: layer
    offload splits, src/ggml-backend.cpp)."""
    from ggml_gfx906_tpu.models.offload import OffloadSplit

    params = dict(dense_params)
    params["lm_head"] = params["wte"]   # untie for the host-side head
    devs = jax.devices()
    split = OffloadSplit.build(CFG, params, n_device_layers=2,
                               device=devs[0], host_device=devs[1])
    kvs = split.make_caches(32)
    toks = jnp.asarray([3, 9, 27, 81], jnp.int32)
    got, kvs = split.forward(toks, kvs, jnp.int32(0))
    ref, _ = llama.forward(CFG, params, toks, llama.make_cache(CFG, 32),
                           jnp.int32(0))
    ref, got = np.asarray(ref), np.asarray(got)
    nmse = ((got - ref) ** 2).sum() / (ref ** 2).sum()
    assert nmse < 1e-9, nmse
    # incremental decode continues across the same split caches
    got2, kvs = split.forward(jnp.asarray([5], jnp.int32), kvs, jnp.int32(4))
    kv = llama.make_cache(CFG, 32)
    _, kv = llama.forward(CFG, params, toks, kv, jnp.int32(0))
    ref2, _ = llama.forward(CFG, params, jnp.asarray([5], jnp.int32), kv,
                            jnp.int32(4))
    nmse2 = ((np.asarray(got2) - np.asarray(ref2)) ** 2).sum() / \
        (np.asarray(ref2) ** 2).sum()
    assert nmse2 < 1e-9, nmse2


def test_auto_split_memory_gravity(dense_params):
    """auto_split picks the largest device-layer count whose weights+KV
    fit the budget (the measured auto -ngl; ref scheduler pass 1 weights
    gravity, src/ggml-backend.cpp:871-906)."""
    from ggml_gfx906_tpu.models.offload import (OffloadSplit, _tree_bytes,
                                                auto_split)

    cfg, params = CFG, dense_params

    kv_layer = (2 * 64 * cfg.n_kv_head * cfg.head_dim
                * jnp.dtype(cfg.compute_dtype).itemsize)
    per_layer = _tree_bytes(params["blocks"][0]) + kv_layer
    wte = _tree_bytes(params["wte"])
    # budget for exactly 2 layers (headroom=1 for determinism)
    budget = wte + 2 * per_layer + per_layer // 2
    n = auto_split(cfg, params, 64, budget_bytes=budget, headroom=1.0)
    assert n == 2, n
    # zero budget -> nothing on device; huge -> everything
    assert auto_split(cfg, params, 64, budget_bytes=wte,
                      headroom=1.0) == 0
    assert auto_split(cfg, params, 64, budget_bytes=10 ** 12,
                      headroom=1.0) == cfg.n_layer
    # and the chosen split actually runs
    split = OffloadSplit.build(cfg, params, n)
    assert split.n_dev == n
