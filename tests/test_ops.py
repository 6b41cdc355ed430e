"""Op conformance tests — the test-backend-ops analogue (SURVEY.md §4.1):
every jax op is checked against an independent reference (numpy scalar port
of the C semantics, or the bit-exact numpy codec oracle) under NMSE bounds.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ggml_gfx906_tpu import ops
from ggml_gfx906_tpu.quant import GGMLType, dequantize, quantize
from ggml_gfx906_tpu.ops.quantized import QuantTensor, dequant, qmatmul

RNG = np.random.default_rng(11)


def nmse(a, b):
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    denom = (a * a).sum()
    return float(((a - b) ** 2).sum() / denom) if denom else float(((a - b) ** 2).sum())


QTYPES = [GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q5_0, GGMLType.Q5_1,
          GGMLType.Q8_0, GGMLType.Q2_K, GGMLType.Q3_K, GGMLType.Q4_K,
          GGMLType.Q5_K, GGMLType.Q6_K]


@pytest.mark.parametrize("qtype", QTYPES, ids=lambda t: t.name)
def test_jax_dequant_bit_exact(qtype):
    """Device dequant must equal the (C-validated) numpy oracle bit-for-bit."""
    x = RNG.standard_normal((4, 512)).astype(np.float32)
    blocks = quantize(qtype, x)
    expect = dequantize(qtype, blocks)
    qt = QuantTensor.from_blocks(qtype, blocks)
    got = np.asarray(dequant(qt))
    np.testing.assert_array_equal(got, expect)


@pytest.mark.parametrize("qtype", QTYPES, ids=lambda t: t.name)
def test_qmatmul(qtype):
    x = RNG.standard_normal((3, 512)).astype(np.float32)
    w = RNG.standard_normal((64, 512)).astype(np.float32)
    qt = QuantTensor.quantize(qtype, w)
    got = np.asarray(qmatmul(jnp.asarray(x), qt))
    expect = x @ dequantize(qtype, quantize(qtype, w)).T
    assert nmse(expect, got) < 1e-10


@pytest.mark.parametrize("qtype", [GGMLType.Q5_K, GGMLType.Q6_K,
                                   GGMLType.Q2_K, GGMLType.Q3_K])
def test_qmatmul_odd_superblocks(qtype):
    """K = 3 superblocks exercises the packed kernels' chunk zero-padding
    (Q6_K chunks are 2 superblocks, Q5_K 4 — padded blocks must contribute
    exactly zero)."""
    x = RNG.standard_normal((3, 768)).astype(np.float32)
    w = RNG.standard_normal((64, 768)).astype(np.float32)
    qt = QuantTensor.quantize(qtype, w)
    assert qt.layout == "kernel"
    got = np.asarray(qmatmul(jnp.asarray(x), qt))
    expect = x @ dequantize(qtype, quantize(qtype, w)).T
    assert nmse(expect, got) < 1e-10
    got_d = np.asarray(dequant(qt))
    np.testing.assert_array_equal(got_d, dequantize(qtype, quantize(qtype, w)))


def test_norm_and_rms_norm():
    x = RNG.standard_normal((2, 5, 64)).astype(np.float32)
    eps = 1e-5
    mean = x.mean(-1, keepdims=True)
    var = ((x - mean) ** 2).mean(-1, keepdims=True)
    expect = (x - mean) / np.sqrt(var + eps)
    assert nmse(expect, ops.norm(jnp.asarray(x), eps)) < 1e-12
    ms = (x * x).mean(-1, keepdims=True)
    expect = x / np.sqrt(ms + 1e-6)
    assert nmse(expect, ops.rms_norm(jnp.asarray(x), 1e-6)) < 1e-12


def test_group_norm():
    x = RNG.standard_normal((2, 8, 4, 4)).astype(np.float32)
    out = np.asarray(ops.group_norm(jnp.asarray(x), n_groups=4, eps=1e-6))
    g = x.reshape(2, 4, -1)
    expect = ((g - g.mean(-1, keepdims=True))
              / np.sqrt(g.var(-1, keepdims=True) + 1e-6)).reshape(x.shape)
    assert nmse(expect, out) < 1e-10


def test_softmax_plain_vs_scipy_style():
    x = RNG.standard_normal((2, 4, 3, 16)).astype(np.float32) * 3
    out = np.asarray(ops.soft_max_ext(jnp.asarray(x), scale=0.5))
    z = x.astype(np.float64) * 0.5
    e = np.exp(z - z.max(-1, keepdims=True))
    expect = e / e.sum(-1, keepdims=True)
    assert nmse(expect, out) < 1e-12


def test_softmax_alibi_mask_sinks():
    """Scalar port of ggml_compute_forward_soft_max_f32 incl. ALiBi + sinks
    (ref src/ggml-cpu/ops.cpp:5685-5795)."""
    n_head, n_rows, n_cols = 5, 3, 12
    scale, max_bias = 0.7, 4.0
    x = RNG.standard_normal((n_head, n_rows, n_cols)).astype(np.float32)
    mask = np.triu(np.full((n_rows, n_cols), -np.inf, np.float32), k=1)
    mask[mask != mask] = 0  # no NaN
    sinks = RNG.standard_normal(n_head).astype(np.float32)

    out = np.asarray(ops.soft_max_ext(jnp.asarray(x), jnp.asarray(mask),
                                      scale=scale, max_bias=max_bias,
                                      sinks=jnp.asarray(sinks)))
    n_head_log2 = 1 << int(math.floor(math.log2(n_head)))
    m0 = 2.0 ** (-max_bias / n_head_log2)
    m1 = 2.0 ** (-max_bias / 2.0 / n_head_log2)
    expect = np.zeros_like(x)
    for h in range(n_head):
        slope = m0 ** (h + 1) if h < n_head_log2 else m1 ** (2 * (h - n_head_log2) + 1)
        for r in range(n_rows):
            wp = x[h, r] * scale + slope * mask[r]
            mx = max(wp.max(), sinks[h])
            e = np.exp(wp - mx)
            s = e.sum() + np.exp(sinks[h] - mx)
            expect[h, r] = e / s
    assert nmse(expect, out) < 1e-10


def test_rope_normal_vs_scalar():
    """Scalar port of ggml_rope_cache_init + normal-mode rotation
    (ref src/ggml-cpu/ops.cpp:6073-6086, 6280-6300)."""
    n_seq, n_head, hd, n_dims = 5, 2, 16, 12
    fb = 10000.0
    x = RNG.standard_normal((n_seq, n_head, hd)).astype(np.float32)
    pos = np.array([3, 7, 11, 20, 0], dtype=np.int32)
    out = np.asarray(ops.rope_ext(jnp.asarray(x), jnp.asarray(pos), n_dims,
                                  mode=ops.ROPE_TYPE_NORMAL, freq_base=fb))
    expect = x.copy()
    theta_scale = fb ** (-2.0 / n_dims)
    for s in range(n_seq):
        theta = float(pos[s])
        for i0 in range(0, n_dims, 2):
            c, sn = math.cos(theta), math.sin(theta)
            for h in range(n_head):
                x0, x1 = x[s, h, i0], x[s, h, i0 + 1]
                expect[s, h, i0] = x0 * c - x1 * sn
                expect[s, h, i0 + 1] = x0 * sn + x1 * c
            theta *= theta_scale
    assert nmse(expect, out) < 1e-10


def test_rope_neox_and_back():
    n_seq, n_head, hd = 4, 3, 32
    x = RNG.standard_normal((n_seq, n_head, hd)).astype(np.float32)
    pos = np.arange(n_seq, dtype=np.int32) + 5
    y = ops.rope_ext(jnp.asarray(x), jnp.asarray(pos), hd, mode=ops.ROPE_TYPE_NEOX)
    # neox pairs (i, i+hd/2): check invariant |pair| preserved
    xr = np.asarray(y)
    n0 = np.hypot(x[..., : hd // 2], x[..., hd // 2 :])
    n1 = np.hypot(xr[..., : hd // 2], xr[..., hd // 2 :])
    assert nmse(n0, n1) < 1e-10
    # rope_back inverts rope
    back = ops.rope_ext(y, jnp.asarray(pos), hd, mode=ops.ROPE_TYPE_NEOX,
                        forward=False)
    assert nmse(x, np.asarray(back)) < 1e-10


def test_rope_yarn_runs_and_scales():
    n_seq, n_head, hd = 3, 2, 32
    x = RNG.standard_normal((n_seq, n_head, hd)).astype(np.float32)
    pos = np.arange(n_seq, dtype=np.int32) * 100
    y = ops.rope_ext(jnp.asarray(x), jnp.asarray(pos), hd,
                     mode=ops.ROPE_TYPE_NEOX, freq_scale=0.25,
                     ext_factor=1.0, n_ctx_orig=2048)
    assert np.isfinite(np.asarray(y)).all()
    # mscale amplifies magnitude by 1 + 0.1*ln(1/freq_scale)
    ms = 1.0 + 0.1 * math.log(4.0)
    ratio = np.linalg.norm(np.asarray(y)) / np.linalg.norm(x)
    assert abs(ratio - ms) < 0.05


def test_attention_matches_manual():
    B, H, N, M, D = 2, 4, 5, 7, 16
    q = RNG.standard_normal((B, H, N, D)).astype(np.float32)
    k = RNG.standard_normal((B, H, M, D)).astype(np.float32)
    v = RNG.standard_normal((B, H, M, D)).astype(np.float32)
    mask = np.where(np.arange(M)[None, :] <= np.arange(N)[:, None] + 2, 0, -np.inf).astype(np.float32)
    out = np.asarray(ops.flash_attn_ext(*map(jnp.asarray, (q, k, v)),
                                        mask=jnp.asarray(mask), scale=0.25))
    s = np.einsum("bhnd,bhmd->bhnm", q, k) * 0.25 + mask
    e = np.exp(s - s.max(-1, keepdims=True))
    p = e / e.sum(-1, keepdims=True)
    expect = np.einsum("bhnm,bhmd->bhnd", p, v)
    assert nmse(expect, out) < 1e-10


def test_attention_gqa_softcap():
    B, H, Hkv, N, M, D = 1, 8, 2, 4, 6, 8
    q = RNG.standard_normal((B, H, N, D)).astype(np.float32)
    k = RNG.standard_normal((B, Hkv, M, D)).astype(np.float32)
    v = RNG.standard_normal((B, Hkv, M, D)).astype(np.float32)
    out = np.asarray(ops.flash_attn_ext(*map(jnp.asarray, (q, k, v)),
                                        scale=0.3, logit_softcap=5.0))
    kk = np.repeat(k, 4, axis=1)
    vv = np.repeat(v, 4, axis=1)
    s = np.einsum("bhnd,bhmd->bhnm", q, kk) * 0.3
    s = np.tanh(s / 5.0) * 5.0
    e = np.exp(s - s.max(-1, keepdims=True))
    p = e / e.sum(-1, keepdims=True)
    expect = np.einsum("bhnm,bhmd->bhnd", p, vv)
    assert nmse(expect, out) < 1e-9


def test_glu_ops():
    x = RNG.standard_normal((3, 32)).astype(np.float32)
    a, g = x[:, :16], x[:, 16:]
    silu = a * (1 / (1 + np.exp(-a)))
    assert nmse(silu * g, ops.swiglu(jnp.asarray(x))) < 1e-6
    assert nmse(np.maximum(a, 0) * g, ops.reglu(jnp.asarray(x))) < 1e-12


def test_get_set_rows_argsort():
    x = RNG.standard_normal((6, 8)).astype(np.float32)
    ids = np.array([3, 0, 5], dtype=np.int32)
    np.testing.assert_array_equal(np.asarray(ops.get_rows(jnp.asarray(x), jnp.asarray(ids))), x[ids])
    rows = np.zeros((3, 8), np.float32)
    out = np.asarray(ops.set_rows(jnp.asarray(x), jnp.asarray(rows), jnp.asarray(ids)))
    expect = x.copy()
    expect[ids] = 0
    np.testing.assert_array_equal(out, expect)
    order = np.asarray(ops.argsort(jnp.asarray(x)))
    np.testing.assert_array_equal(np.take_along_axis(x, order, -1), np.sort(x, -1))


def test_diag_mask_and_cross_entropy():
    x = RNG.standard_normal((4, 6)).astype(np.float32)
    out = np.asarray(ops.diag_mask_inf(jnp.asarray(x), n_past=1))
    for r in range(4):
        for c in range(6):
            if c > r + 1:
                assert out[r, c] == -np.inf
            else:
                assert out[r, c] == x[r, c]
    logits = RNG.standard_normal((5, 10)).astype(np.float32)
    labels = np.eye(10, dtype=np.float32)[RNG.integers(0, 10, 5)]
    got = float(ops.cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels)))
    z = logits - logits.max(-1, keepdims=True)
    lsm = z - np.log(np.exp(z).sum(-1, keepdims=True))
    expect = -(labels * lsm).sum() / 5
    assert abs(got - expect) < 1e-5


def test_unary_table_finite():
    x = jnp.asarray(RNG.standard_normal((4, 16)).astype(np.float32) * 3)
    for name, fn in ops.UNARY.items():
        y = np.asarray(fn(x))
        assert np.isfinite(y).all(), name


def test_timestep_embedding():
    t = jnp.asarray(np.array([0.0, 1.0, 10.0], np.float32))
    emb = np.asarray(ops.timestep_embedding(t, 16))
    assert emb.shape == (3, 16)
    np.testing.assert_allclose(emb[0, :8], 1.0, atol=1e-6)  # cos(0)
    np.testing.assert_allclose(emb[0, 8:], 0.0, atol=1e-6)  # sin(0)
