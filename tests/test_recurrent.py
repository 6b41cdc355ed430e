"""Recurrent/MoE op conformance vs direct scalar ports of the reference
CPU kernels (src/ggml-cpu/ops.cpp rwkv_wkv6/rwkv_wkv7/gla scalar loops)."""
import numpy as np
import jax.numpy as jnp

from ggml_gfx906_tpu import ops

RNG = np.random.default_rng(0)


def test_wkv6_matches_scalar():
    B, T, H, D = 2, 5, 3, 4
    k, v, r, w = (RNG.standard_normal((B, T, H, D)).astype(np.float32)
                  for _ in range(4))
    w = np.exp(-np.exp(w))  # decay in (0, 1) like real models
    u = RNG.standard_normal((H, D)).astype(np.float32)
    s0 = RNG.standard_normal((B, H, D, D)).astype(np.float32)

    out, st = ops.rwkv_wkv6(*map(jnp.asarray, (k, v, r, u, w, s0)))

    # scalar port (ops.cpp rwkv_wkv6 fallback loop)
    expect = np.zeros((B, T, H, D), np.float32)
    state = s0.copy()
    for bb in range(B):
        for t in range(T):
            for h in range(H):
                for i in range(D):
                    for j in range(D):
                        kv = v[bb, t, h, j] * k[bb, t, h, i]
                        tmp = kv * u[h, i] + state[bb, h, i, j]
                        expect[bb, t, h, j] += tmp * r[bb, t, h, i]
                        state[bb, h, i, j] = state[bb, h, i, j] * w[bb, t, h, i] + kv
    np.testing.assert_allclose(np.asarray(out), expect, rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(st), state, rtol=2e-5, atol=1e-5)


def test_wkv7_matches_scalar():
    B, T, H, D = 1, 4, 2, 3
    r, w, k, v, a, b = (RNG.standard_normal((B, T, H, D)).astype(np.float32) * 0.5
                        for _ in range(6))
    w = np.exp(-np.exp(w))
    s0 = RNG.standard_normal((B, H, D, D)).astype(np.float32)
    out, st = ops.rwkv_wkv7(*map(jnp.asarray, (r, w, k, v, a, b, s0)))

    expect = np.zeros((B, T, H, D), np.float32)
    state = s0.copy()
    for bb in range(B):
        for t in range(T):
            for h in range(H):
                for i in range(D):
                    sa = sum(a[bb, t, h, j] * state[bb, h, i, j] for j in range(D))
                    res = 0.0
                    for j in range(D):
                        state[bb, h, i, j] = (state[bb, h, i, j] * w[bb, t, h, j]
                                              + v[bb, t, h, i] * k[bb, t, h, j]
                                              + sa * b[bb, t, h, j])
                        res += state[bb, h, i, j] * r[bb, t, h, j]
                    expect[bb, t, h, i] = res
    np.testing.assert_allclose(np.asarray(out), expect, rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(st), state, rtol=2e-5, atol=1e-5)


def test_gla_matches_scalar():
    B, T, H, D = 1, 4, 2, 3
    k, v, q, g = (RNG.standard_normal((B, T, H, D)).astype(np.float32) * 0.5
                  for _ in range(4))
    g = 1.0 / (1.0 + np.exp(-g))
    s0 = RNG.standard_normal((B, H, D, D)).astype(np.float32)
    scale = 0.7
    out, st = ops.gated_linear_attn(*map(jnp.asarray, (k, v, q, g, s0)), scale=scale)

    expect = np.zeros((B, T, H, D), np.float32)
    state = s0.copy()
    for bb in range(B):
        for t in range(T):
            for h in range(H):
                for i in range(D):
                    for j in range(D):
                        kv = v[bb, t, h, j] * k[bb, t, h, i]
                        tmp = state[bb, h, i, j] * g[bb, t, h, i] + kv
                        expect[bb, t, h, j] += tmp * q[bb, t, h, i] * scale
                        state[bb, h, i, j] = tmp
    np.testing.assert_allclose(np.asarray(out), expect, rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(st), state, rtol=2e-5, atol=1e-5)


def test_mul_mat_id():
    E, N, K, T, U = 4, 6, 8, 5, 2
    experts = RNG.standard_normal((E, N, K)).astype(np.float32)
    x = RNG.standard_normal((T, U, K)).astype(np.float32)
    ids = RNG.integers(0, E, (T, U)).astype(np.int32)
    out = np.asarray(ops.mul_mat_id(*map(jnp.asarray, (experts, x, ids))))
    for t in range(T):
        for e in range(U):
            np.testing.assert_allclose(out[t, e], x[t, e] @ experts[ids[t, e]].T,
                                       rtol=1e-5, atol=1e-5)


def test_activation_quantize_matches_codec():
    """On-device q8 activation quant must produce the same int values as
    the reference codec (scale rule + roundf semantics)."""
    from ggml_gfx906_tpu import ops as O
    from ggml_gfx906_tpu.quant import GGMLType, quantize

    x = RNG.standard_normal((4, 256)).astype(np.float32) * 3
    qs, d = O.quantize_q8(jnp.asarray(x))
    ref = quantize(GGMLType.Q8_0, x)
    np.testing.assert_array_equal(np.asarray(qs).reshape(4, 8, 32), ref["qs"])
    # d matches before f16 rounding
    np.testing.assert_allclose(np.asarray(d), np.abs(x.reshape(4, 8, 32)).max(-1) / 127,
                               rtol=1e-6)
    qs2, d2, s2 = O.quantize_q8_with_sums(jnp.asarray(x))
    expect_s = np.asarray(d2) * np.asarray(qs2).reshape(4, 8, 32).astype(np.int32).sum(-1)
    np.testing.assert_allclose(np.asarray(s2), expect_s, rtol=1e-6)
    rt = O.dequantize_q8(qs, d)
    assert np.abs(np.asarray(rt) - x).max() < np.abs(x).max() / 100


def test_mul_mat_id_quant_experts():
    """QuantTensor expert stacks route through the fused kernels and match
    the dequantized dense reference."""
    from ggml_gfx906_tpu.ops.quantized import QuantTensor, dequant
    from ggml_gfx906_tpu.quant.types import GGMLType

    rng = np.random.default_rng(5)
    E, N, K, T, U = 4, 32, 256, 6, 2
    ws = [rng.standard_normal((N, K)).astype(np.float32) for _ in range(E)]
    qts = [QuantTensor.quantize(GGMLType.Q8_0, w) for w in ws]
    dense = np.stack([np.asarray(dequant(q)) for q in qts])
    x = rng.standard_normal((T, U, K)).astype(np.float32)
    ids = rng.integers(0, E, (T, U)).astype(np.int32)
    got = np.asarray(ops.mul_mat_id(qts, jnp.asarray(x), jnp.asarray(ids)))
    want = np.einsum("tuk,tunk->tun", x, dense[ids])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_mul_mat_id_capacity_drops():
    """capacity < tokens-per-expert zeroes the overflow (GShard-style
    bounded dispatch) and keeps everything else exact."""
    rng = np.random.default_rng(6)
    E, N, K, T = 2, 8, 64, 5
    experts = rng.standard_normal((E, N, K)).astype(np.float32)
    x = rng.standard_normal((T, 1, K)).astype(np.float32)
    ids = np.zeros((T, 1), np.int32)        # all tokens → expert 0
    got = np.asarray(ops.mul_mat_id(jnp.asarray(experts), jnp.asarray(x),
                                    jnp.asarray(ids), capacity=3))
    want = np.einsum("tuk,nk->tun", x[:3], experts[0])
    np.testing.assert_allclose(got[:3], want, rtol=1e-5, atol=1e-6)
    assert np.all(got[3:] == 0.0)
