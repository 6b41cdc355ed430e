"""Flash-attention Pallas kernel vs the naive reference.

Mirrors the reference's fattn coverage: test-backend-ops FLASH_ATTN_EXT
cases (tests/test-backend-ops.cpp) over head counts/GQA/softcap, plus the
quantized-KV instances of src/ggml-cuda/fattn.cu:180-270. The kernel runs
in interpret mode on CPU (tests/conftest.py), so the exact kernel logic
that compiles on TPU is what is validated here.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ggml_gfx906_tpu import ops
from ggml_gfx906_tpu.ops.pallas import flash_attn as fa


def _nmse(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return float(((a - b) ** 2).mean() / max((b ** 2).mean(), 1e-30))


def _mk(rng, b, h, kvh, n, m, d, dtype=jnp.float32):
    q = jnp.asarray(rng.standard_normal((b, h, n, d)), dtype)
    k = jnp.asarray(rng.standard_normal((b, kvh, m, d)), dtype)
    v = jnp.asarray(rng.standard_normal((b, kvh, m, d)), dtype)
    return q, k, v


def _ref(q, k, v, pos, scale=None, softcap=0.0):
    return ops.causal_flash_attn(q, k, v, pos, scale, softcap, force_ref=True)


CASES = [
    # (B, H, KVH, N, M, pos, softcap, dtype) — decode, prefill, GQA, softcap
    (1, 4, 4, 1, 256, 64, 0.0, jnp.float32),        # MHA decode
    (1, 8, 2, 1, 256, 200, 0.0, jnp.float32),       # GQA decode
    (1, 4, 4, 128, 256, 0, 0.0, jnp.float32),       # prefill from zero
    (1, 8, 2, 96, 256, 100, 0.0, jnp.float32),      # GQA chunked prefill
    (2, 4, 2, 5, 384, [3, 250], 0.0, jnp.float32),  # batched, ragged pos
    (1, 4, 4, 1, 256, 17, 30.0, jnp.float32),       # logit softcap (gemma)
    (1, 4, 1, 33, 256, 64, 0.0, jnp.float32),       # MQA, unaligned N
    (1, 4, 4, 1, 256, 64, 0.0, jnp.bfloat16),       # bf16 decode
]


@pytest.mark.parametrize("b,h,kvh,n,m,pos,softcap,dtype", CASES)
def test_causal_flash_vs_ref(b, h, kvh, n, m, pos, softcap, dtype):
    rng = np.random.default_rng(hash((b, h, kvh, n, m)) % 2**31)
    d = 64 if h == 8 else 128
    q, k, v = _mk(rng, b, h, kvh, n, m, d, dtype)
    pos = jnp.asarray(pos, jnp.int32)
    assert fa.supported(q, k, v, pos, softcap)
    out = fa.causal_flash_attention(q, k, v, pos, None, softcap)
    ref = _ref(q, k, v, pos, None, softcap)
    tol = 1e-10 if dtype == jnp.float32 else 2e-4
    assert out.shape == ref.shape
    assert _nmse(out, ref) < tol


def test_matches_flash_attn_ext_mask_semantics():
    """The pos-based kernel must equal flash_attn_ext with the equivalent
    additive causal mask (the path models used in round 1)."""
    rng = np.random.default_rng(0)
    q, k, v = _mk(rng, 1, 4, 4, 7, 256, 128)
    pos = 19
    jpos = jnp.arange(256, dtype=jnp.int32)[None, :]
    ipos = pos + jnp.arange(7, dtype=jnp.int32)[:, None]
    mask = jnp.where(jpos <= ipos, 0.0, -jnp.inf).astype(jnp.float32)
    ref = ops.flash_attn_ext(q, k, v, mask=mask, scale=1.0 / (128 ** 0.5))
    out = fa.causal_flash_attention(q, k, v, jnp.int32(pos))
    assert _nmse(out, ref) < 1e-10


def test_quantized_kv_parity():
    """int8 K/V with per-(head,pos) scales vs attention over the
    dequantized cache (ref: quantized-KV fattn instances)."""
    rng = np.random.default_rng(1)
    b, h, kvh, n, m, d = 1, 8, 4, 1, 256, 128
    q, kf, vf = _mk(rng, b, h, kvh, n, m, d)
    kd = jnp.abs(kf).max(-1) / 127.0
    vd = jnp.abs(vf).max(-1) / 127.0
    k8 = jnp.round(kf / kd[..., None]).astype(jnp.int8)
    v8 = jnp.round(vf / vd[..., None]).astype(jnp.int8)
    pos = jnp.int32(m - 1)
    out = fa.causal_flash_attention(q, k8, v8, pos, k_scale=kd, v_scale=vd)
    ref = _ref(q, k8.astype(jnp.float32) * kd[..., None],
               v8.astype(jnp.float32) * vd[..., None], pos)
    assert _nmse(out, ref) < 1e-10


def test_padding_region_ignored():
    """Cache contents beyond pos+n must not affect the output (the engine
    leaves stale garbage there)."""
    rng = np.random.default_rng(2)
    q, k, v = _mk(rng, 1, 4, 4, 1, 256, 128)
    pos = jnp.int32(40)
    out1 = fa.causal_flash_attention(q, k, v, pos)
    junk = jnp.asarray(rng.standard_normal(k.shape) * 100, jnp.float32)
    sel = jnp.arange(256)[None, None, :, None] > 40
    out2 = fa.causal_flash_attention(q, jnp.where(sel, junk, k),
                                     jnp.where(sel, junk * 2, v), pos)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), rtol=1e-6)


def test_dispatch_through_ops():
    rng = np.random.default_rng(3)
    q, k, v = _mk(rng, 1, 4, 2, 1, 256, 128)
    out = ops.causal_flash_attn(q, k, v, jnp.int32(100))
    ref = _ref(q, k, v, jnp.int32(100))
    assert _nmse(out, ref) < 1e-10


def test_grad_flows():
    """jax.grad through the public entry: forward is the Pallas kernel,
    backward recomputes via the XLA reference (custom_vjp)."""
    rng = np.random.default_rng(4)
    q, k, v = _mk(rng, 1, 2, 2, 8, 128, 64)

    def loss(q, k, v):
        return ops.causal_flash_attn(q, k, v, jnp.int32(120)).sum()

    def loss_ref(q, k, v):
        return _ref(q, k, v, jnp.int32(120)).sum()

    g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g, gr):
        assert _nmse(a, b) < 1e-9


@pytest.mark.parametrize("b,h,kvh,n,pos", [
    (2, 8, 8, 1, 200),     # MHA decode
    (2, 8, 2, 1, 130),     # GQA decode
    (1, 8, 4, 16, 40),     # GQA chunked prefill rows
])
def test_postscale_quant_parity(b, h, kvh, n, pos):
    """The XLA postscale quantized-KV path (ops/attention._causal_postscale
    — int8 streams into the dots, scales on the outputs) must match the
    dequantize-first oracle. Float-associativity only: both compute the
    same s[m] = (q·k8[m])·kd[m] and Σ_m p[m]·vd[m]·v8[m]."""
    from ggml_gfx906_tpu.ops.attention import _causal_postscale, _causal_ref

    rng = np.random.default_rng(11)
    m, d = 256, 128
    q, kf, vf = _mk(rng, b, h, kvh, n, m, d)
    kd = jnp.abs(kf).max(-1) / 127.0
    vd = jnp.abs(vf).max(-1) / 127.0
    k8 = jnp.round(kf / kd[..., None]).astype(jnp.int8)
    v8 = jnp.round(vf / vd[..., None]).astype(jnp.int8)
    p = jnp.int32(pos)
    out = _causal_postscale(q, k8, v8, kd, vd, p, 1.0 / d ** 0.5, 0.0)
    # oracle: dense attention over the explicitly dequantized cache
    ref = _causal_ref(q, k8.astype(jnp.float32) * kd[..., None],
                      v8.astype(jnp.float32) * vd[..., None],
                      p, 1.0 / d ** 0.5, 0.0)
    assert _nmse(out, ref) < 1e-9
