"""Sampling semantics (ref: gpt_sample_top_k_top_p, examples/common.cpp)."""
import numpy as np
import jax
import jax.numpy as jnp

from ggml_gfx906_tpu.runtime.sampling import greedy, sample_batch, \
    sample_top_k_top_p


def _keys(n, seed=0):
    return jax.vmap(jax.random.PRNGKey)(jnp.arange(seed, seed + n))


def test_temp_zero_is_greedy():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((5, 64)).astype(np.float32))
    out = sample_batch(logits, _keys(5), jnp.zeros(5),
                       jnp.full(5, 40, jnp.int32), jnp.full(5, 0.9))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(greedy(logits)))


def test_top_k_one_is_argmax():
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.standard_normal((4, 32)).astype(np.float32))
    out = sample_batch(logits, _keys(4), jnp.ones(4),
                       jnp.ones(4, jnp.int32), jnp.ones(4))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(greedy(logits)))


def test_tiny_top_p_keeps_first():
    """top_p below the top token's probability must still keep it."""
    rng = np.random.default_rng(2)
    logits = jnp.asarray(rng.standard_normal((3, 32)).astype(np.float32))
    out = sample_batch(logits, _keys(3), jnp.ones(3),
                       jnp.full(3, 40, jnp.int32), jnp.full(3, 1e-6))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(greedy(logits)))


def test_sampled_tokens_within_top_k():
    rng = np.random.default_rng(3)
    logits = jnp.asarray(rng.standard_normal((8, 128)).astype(np.float32))
    k = 5
    out = np.asarray(sample_batch(logits, _keys(8, 7), jnp.ones(8),
                                  jnp.full(8, k, jnp.int32), jnp.ones(8)))
    top = np.argsort(-np.asarray(logits), axis=1)[:, :k]
    for i in range(8):
        assert out[i] in top[i], (i, out[i], top[i])


def test_mixed_per_slot_settings():
    """Slots with different temp/top_k/top_p run in one program; greedy
    slots must be unaffected by their neighbours' sampling params."""
    rng = np.random.default_rng(4)
    logits = jnp.asarray(rng.standard_normal((2, 64)).astype(np.float32))
    out = np.asarray(sample_batch(
        logits, _keys(2), jnp.asarray([0.0, 1.5]),
        jnp.asarray([40, 3], jnp.int32), jnp.asarray([0.9, 0.7])))
    assert out[0] == int(np.argmax(np.asarray(logits)[0]))


def test_scalar_sampler_matches_distribution_support():
    rng = np.random.default_rng(5)
    logits = jnp.asarray(rng.standard_normal(64).astype(np.float32))
    for seed in range(5):
        t = sample_top_k_top_p(logits, jax.random.PRNGKey(seed), top_k=4,
                               top_p=1.0)
        assert int(t) in np.argsort(-np.asarray(logits))[:4]
