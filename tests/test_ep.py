"""Expert parallelism (MUL_MAT_ID over an 'ep' mesh axis) — parity vs the
single-device routed matmul (ops.mul_mat_id; ref: the CUDA MUL_MAT_ID
path, src/ggml-cuda/ggml-cuda.cu)."""
import numpy as np
import jax.numpy as jnp
import pytest

from ggml_gfx906_tpu.ops.recurrent import mul_mat_id
from ggml_gfx906_tpu.parallel.ep import (
    ep_mul_mat_id, make_ep_mesh, shard_experts)


def _mk(rng, E, N, K, T, U):
    experts = jnp.asarray(rng.standard_normal((E, N, K)) * 0.1, jnp.float32)
    x = jnp.asarray(rng.standard_normal((T, U, K)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, E, (T, U)), jnp.int32)
    return experts, x, ids


@pytest.mark.parametrize("ep,dp", [(2, 1), (4, 1), (8, 1), (4, 2)])
def test_ep_matches_single_device(ep, dp):
    rng = np.random.default_rng(ep + dp)
    E, N, K, T, U = 2 * ep, 24, 16, 6 * max(dp, 1), 2
    experts, x, ids = _mk(rng, E, N, K, T, U)
    ref = np.asarray(mul_mat_id(experts, x, ids))
    mesh = make_ep_mesh(ep=ep, dp=dp)
    got = np.asarray(ep_mul_mat_id(mesh, shard_experts(mesh, experts),
                                   x, ids))
    nmse = ((got - ref) ** 2).sum() / (ref ** 2).sum()
    assert nmse < 1e-12, nmse


def test_ep_capacity_drops_match():
    """With a tight capacity the same tokens overflow on the sharded and
    the single-device path (queue order is per-expert arrival order on
    both)."""
    rng = np.random.default_rng(9)
    E, N, K, T, U = 4, 8, 8, 16, 2
    experts, x, _ = _mk(rng, E, N, K, T, U)
    ids = jnp.asarray(rng.integers(0, E, (T, U)), jnp.int32)
    cap = 3
    ref = np.asarray(mul_mat_id(experts, x, ids, capacity=cap))
    mesh = make_ep_mesh(ep=4)
    got = np.asarray(ep_mul_mat_id(mesh, shard_experts(mesh, experts),
                                   x, ids, capacity=cap))
    assert np.allclose(got, ref, atol=1e-6), np.abs(got - ref).max()


def test_ep_capacity_is_per_dp_shard():
    """Documents the intended dp>1 capacity semantics (GShard-style LOCAL
    capacity): each dp shard bounds its expert queues over its own T/dp
    tokens, so the sharded result equals per-shard single-device runs
    concatenated — NOT one run over the full batch."""
    rng = np.random.default_rng(21)
    E, N, K, T, U = 4, 8, 8, 8, 2
    dp = 2
    experts, x, _ = _mk(rng, E, N, K, T, U)
    ids = jnp.asarray(rng.integers(0, E, (T, U)), jnp.int32)
    cap = 2
    mesh = make_ep_mesh(ep=4, dp=dp)
    got = np.asarray(ep_mul_mat_id(mesh, shard_experts(mesh, experts),
                                   x, ids, capacity=cap))
    half = T // dp
    ref = np.concatenate([
        np.asarray(mul_mat_id(experts, x[s * half:(s + 1) * half],
                              ids[s * half:(s + 1) * half], capacity=cap))
        for s in range(dp)])
    nmse = ((got - ref) ** 2).sum() / (ref ** 2).sum()
    assert nmse < 1e-12, nmse
