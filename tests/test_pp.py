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
