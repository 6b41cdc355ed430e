"""Expert parallelism: MUL_MAT_ID routed over an 'ep' mesh axis.

The reference routes MoE tokens to experts on one device
(src/ggml-cuda/ggml-cuda.cu MUL_MAT_ID path, dynamic row grouping); the
TPU-native scale-out places each expert's weights on exactly one device of
the 'ep' axis and keeps the routing dense and static: every device runs the
GShard-style capacity dispatch (ops/recurrent.mul_mat_id) against only its
local expert slice — tokens routed elsewhere land in the zero row of the
dispatch buffer — and one psum over 'ep' assembles the routed outputs.
Expert weights are never gathered; each device streams only E/ep experts.

Composes with data parallelism: tokens shard over 'dp', experts over 'ep'.

    mesh = make_ep_mesh(ep=4, dp=2)
    experts = shard_experts(mesh, experts)      # (E, N, K) on P('ep')
    out = ep_mul_mat_id(mesh, experts, x, ids)  # == ops.mul_mat_id
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.recurrent import mul_mat_id


def make_ep_mesh(ep: int, dp: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = dp * ep
    assert len(devices) >= n, (len(devices), n)
    return Mesh(np.asarray(devices[:n]).reshape(dp, ep), ("dp", "ep"))


def shard_experts(mesh: Mesh, experts, axis: str = "ep"):
    """Place a stacked (E, N, K) expert tensor with each expert on one
    'ep' device (E must divide by mesh.shape[axis])."""
    assert experts.shape[0] % mesh.shape[axis] == 0, (
        experts.shape, mesh.shape[axis])
    return jax.device_put(
        experts, NamedSharding(mesh, P(axis, None, None)))


def _ep_body(experts, x, ids, *, axis, capacity):
    i = jax.lax.axis_index(axis)
    El = experts.shape[0]                       # local experts per device
    lid = ids - i * El
    ok = (lid >= 0) & (lid < El)
    # non-local tokens get the out-of-range sentinel: mul_mat_id outputs
    # zero for them without consuming local expert queue slots, so
    # capacity drops match the single-device routing exactly
    out = mul_mat_id(experts, x, jnp.where(ok, lid, El), capacity)
    return jax.lax.psum(out, axis)


def ep_mul_mat_id(mesh: Mesh, experts, x, ids, capacity: int | None = None,
                  axis: str = "ep", batch_axis: str | None = "dp"):
    """Expert-parallel MUL_MAT_ID: out[t, u] = x[t, u] @ experts[ids[t, u]].T

    experts (E, N, K) sharded on `axis`; x (T, U, K), ids (T, U) int32
    (sharded on `batch_axis` over T when present). `capacity` bounds the
    per-expert token queue PER (dp shard, device): with dp>1 each dp shard
    computes queue positions over its own T/dp tokens, so up to
    dp*capacity tokens per expert survive globally — the standard
    GShard-style local-capacity semantics, and intentionally different
    from a single-device run over the full batch (tested in
    tests/test_ep.py::test_ep_capacity_is_per_dp_shard)."""
    bax = batch_axis if (batch_axis in mesh.shape
                         and mesh.shape[batch_axis] > 1) else None
    body = functools.partial(_ep_body, axis=axis, capacity=capacity)
    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(axis, None, None), P(bax, None, None), P(bax, None)),
        out_specs=P(bax, None, None),
    )(experts, x, ids)
