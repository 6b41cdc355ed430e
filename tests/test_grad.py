"""Per-op gradient checks — the test-backend-ops MODE_GRAD analogue.

ref: tests/test-backend-ops.cpp:1409-1493 (numeric vs backward-graph grads
per op). Here: directional derivatives — jax.grad of sum(op(x)) dotted with
random directions vs central finite differences in float64.

Also the conformance oracles for the round-2 op additions: OUT_PROD
(naive loops), conv_3d (torch oracle), M-RoPE (scalar port of
ggml_mrope_cache_init, src/ggml-cpu/ops.cpp:6089-6146).
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ggml_gfx906_tpu import ops

RNG = np.random.default_rng(42)


@pytest.fixture(autouse=True)
def _reseed():
    # The draws below must not depend on test execution order (xdist assigns
    # tests to workers arbitrarily): a shared RNG stream once put a
    # leaky_relu input within eps of its kink at 0, breaking the central
    # finite difference. A fresh seed per test makes every input
    # order-independent and verified kink-safe.
    global RNG
    RNG = np.random.default_rng(42)


def _dircheck(f, *args, eps=5e-3, tol=5e-3, n_dirs=2):
    """grad(sum f)·v  ==  (f(x+εv)-f(x-εv))/2ε for random directions v.

    Inputs/loss are f64, but the ops cast to f32 internally (ggml/TPU
    semantics), so the FD noise floor is |loss|·2⁻²³/eps — eps must sit at
    the f32 optimum (~5e-3), not the f64 one (1e-6), and tol is the sum of
    truncation (~eps²) and noise (~1e-7/eps) terms."""
    with jax.enable_x64():
        args64 = [jnp.asarray(np.asarray(a, np.float64)) for a in args]

        def loss(*a):
            return jnp.sum(f(*a).astype(jnp.float64))

        grads = jax.grad(loss, argnums=tuple(range(len(args64))))(*args64)
        for _ in range(n_dirs):
            vs = [np.asarray(RNG.standard_normal(np.shape(a)), np.float64)
                  for a in args64]
            lin = sum(float(jnp.vdot(g, v)) for g, v in zip(grads, vs))
            fp = float(loss(*[a + eps * v for a, v in zip(args64, vs)]))
            fm = float(loss(*[a - eps * v for a, v in zip(args64, vs)]))
            num = (fp - fm) / (2 * eps)
            denom = max(1.0, abs(num), abs(lin))
            assert abs(lin - num) / denom < tol, (lin, num)


def _x(*shape, scale=1.0, shift=0.0):
    return (RNG.standard_normal(shape) * scale + shift).astype(np.float64)


UNARY_OPS = [
    ("gelu", ops.gelu), ("gelu_erf", ops.gelu_erf),
    ("gelu_quick", ops.gelu_quick), ("silu", ops.silu),
    ("elu", ops.elu), ("sigmoid", ops.sigmoid), ("tanh", ops.tanh),
    ("exp", ops.exp), ("hardswish", ops.hardswish),
    ("hardsigmoid", ops.hardsigmoid), ("neg", ops.neg),
    ("leaky_relu", lambda x: ops.leaky_relu(x, 0.1)),
    ("softcap", lambda x: ops.softcap(x, 30.0)),
    ("scale", lambda x: ops.scale(x, 0.7)),
    ("soft_max", ops.soft_max),
    ("norm", lambda x: ops.norm(x, 1e-5)),
    ("rms_norm", lambda x: ops.rms_norm(x, 1e-6)),
    ("l2_norm", lambda x: ops.l2_norm(x)),
    ("sum_rows", ops.sum_rows), ("mean", ops.mean),
    ("swiglu", ops.swiglu), ("reglu", ops.reglu), ("geglu", ops.geglu),
    ("geglu_erf", ops.geglu_erf), ("geglu_quick", ops.geglu_quick),
]


@pytest.mark.parametrize("name,fn", UNARY_OPS, ids=[n for n, _ in UNARY_OPS])
def test_grad_unary(name, fn):
    _dircheck(fn, _x(4, 16))


def test_grad_group_norm():
    _dircheck(lambda x: ops.group_norm(x, 2), _x(1, 4, 3, 8))


def test_grad_soft_max_ext():
    x = _x(2, 3, 8, 8)
    mask = np.where(RNG.random((8, 8)) < 0.2, -np.inf, 0.0)
    _dircheck(lambda a: ops.soft_max_ext(a, jnp.asarray(mask), scale=0.3),
              x)


def test_grad_cross_entropy():
    logits = _x(5, 11)
    labels = RNG.random((5, 11))
    labels = (labels / labels.sum(-1, keepdims=True)).astype(np.float64)
    _dircheck(lambda lg: ops.cross_entropy_loss(lg, jnp.asarray(labels))[None],
              logits)


def test_grad_out_prod():
    _dircheck(ops.out_prod, _x(6, 5), _x(6, 7))


def test_grad_convs():
    _dircheck(lambda x, w: ops.conv_1d(x, w, 1, 1), _x(1, 3, 10), _x(4, 3, 3))
    _dircheck(lambda x, w: ops.conv_2d(x, w, (1, 1), (1, 1)),
              _x(1, 2, 6, 6), _x(3, 2, 3, 3))
    _dircheck(lambda x, w: ops.conv_3d(x, w), _x(1, 2, 4, 4, 4),
              _x(3, 2, 2, 2, 2))
    _dircheck(lambda x, w: ops.conv_transpose_1d(x, w, 2), _x(1, 3, 6),
              _x(3, 4, 3))


def test_grad_pool_im2col():
    _dircheck(lambda x: ops.pool_2d(x, "avg", (2, 2), (2, 2)), _x(1, 2, 6, 6))
    _dircheck(lambda x: ops.im2col(x, 3, 3, (1, 1), (1, 1)), _x(1, 2, 5, 5))


def test_grad_rope():
    pos = jnp.arange(5, dtype=jnp.int32)
    x = _x(5, 2, 16)
    _dircheck(lambda a: ops.rope_ext(a, pos, 16), x)
    _dircheck(lambda a: ops.rope_ext(a, pos, 16, mode=ops.ROPE_TYPE_NEOX), x)
    _dircheck(lambda a: ops.rope_ext(
        a, pos, 16, mode=ops.ROPE_TYPE_NEOX, ext_factor=1.0, n_ctx_orig=64,
        freq_scale=0.5), x)


def test_grad_rope_multi():
    pos = jnp.asarray(RNG.integers(0, 16, (4, 5)), jnp.int32)
    x = _x(5, 2, 16)
    _dircheck(lambda a: ops.rope_multi(a, pos, 8, [2, 1, 1, 0]), x)
    _dircheck(lambda a: ops.rope_multi(a, pos, 8, [3, 3, 2, 0],
                                       mode=ops.ROPE_TYPE_VISION), x)


def test_grad_attention():
    q, k, v = _x(1, 2, 4, 8), _x(1, 2, 6, 8), _x(1, 2, 6, 8)
    _dircheck(lambda a, b, c: ops.attention_ref(a, b, c), q, k, v)


def test_grad_causal_flash_attn():
    """The Pallas kernel's custom_vjp (backward recomputes through the XLA
    reference) must match finite differences through the kernel itself."""
    q, k, v = _x(1, 4, 4, 8), _x(1, 2, 8, 8), _x(1, 2, 8, 8)
    _dircheck(lambda a, b, c: ops.causal_flash_attn(a, b, c, 2), q, k, v)


def test_grad_ssm_scan():
    s = _x(2, 3, 4, scale=0.1)
    xx = _x(2, 5, 3, scale=0.1)
    dt = _x(2, 5, 3, scale=0.1)
    A = _x(3, 4, scale=0.1)
    B = _x(2, 5, 4, scale=0.1)
    C = _x(2, 5, 4, scale=0.1)
    _dircheck(lambda *a: ops.ssm_scan(*a)[0], s, xx, dt, A, B, C)


def test_grad_matmul_dense():
    _dircheck(lambda x, w: ops.qmatmul(x, w), _x(3, 16), _x(5, 16))


# ---------------------------------------------------------------- new-op oracles

def test_out_prod_naive():
    a = _x(6, 5).astype(np.float32)
    b = _x(6, 7).astype(np.float32)
    want = np.zeros((7, 5), np.float32)
    for j in range(7):
        for k in range(6):
            want[j] += b[k, j] * a[k]
    got = np.asarray(ops.out_prod(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_out_prod_gqa_broadcast():
    a = _x(2, 6, 5).astype(np.float32)   # 2 kv groups
    b = _x(4, 6, 7).astype(np.float32)   # 4 heads
    got = np.asarray(ops.out_prod(jnp.asarray(a), jnp.asarray(b)))
    for h in range(4):
        want = np.asarray(ops.out_prod(jnp.asarray(a[h // 2]),
                                       jnp.asarray(b[h])))
        np.testing.assert_allclose(got[h], want, rtol=1e-5)


def test_conv_3d_matches_torch():
    torch = pytest.importorskip("torch")
    x = _x(2, 3, 6, 7, 8).astype(np.float32)
    w = _x(4, 3, 3, 2, 3).astype(np.float32)
    got = np.asarray(ops.conv_3d(jnp.asarray(x), jnp.asarray(w),
                                 stride=(1, 2, 1), padding=(1, 0, 1),
                                 dilation=(1, 1, 2)))
    want = torch.nn.functional.conv3d(
        torch.from_numpy(x), torch.from_numpy(w), stride=(1, 2, 1),
        padding=(1, 0, 1), dilation=(1, 1, 2)).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def _mrope_cache_scalar(p, sections, vision, n_dims, freq_base):
    """Scalar port of ggml_mrope_cache_init (no yarn, ff=1)."""
    theta_scale = freq_base ** (-2.0 / n_dims)
    th = [float(p[0]), float(p[1]), float(p[2]), float(p[3])]
    base = list(th)
    s0, s1, s2, s3 = sections
    sect_dims = s0 + s1 + s2 + s3
    sec_w = s0 + s1
    sec_e = s2 + sec_w
    P = n_dims if vision else n_dims // 2
    cos, sin = np.zeros(P, np.float32), np.zeros(P, np.float32)
    for ic in range(P):
        sector = ic % sect_dims
        if vision:
            if sector == 0:
                th[0] = base[0]
            elif sector == s0:
                th[1] = base[1]
            elif sector == sec_w:
                th[2] = base[2]
            elif sector == sec_e:
                th[3] = base[3]
        theta = th[0]
        if s0 <= sector < sec_w:
            theta = th[1]
        elif sec_w <= sector < sec_w + s2:
            theta = th[2]
        elif sector >= sec_w + s2:
            theta = th[3]
        cos[ic] = math.cos(theta)
        sin[ic] = math.sin(theta)
        for t in range(4):
            th[t] *= theta_scale
    return cos, sin


@pytest.mark.parametrize("vision,sections,n_dims", [
    (False, [2, 1, 1, 0], 8),
    (False, [4, 2, 2, 0], 16),
    (True, [2, 1, 1, 0], 8),
    (True, [3, 3, 2, 0], 8),
])
def test_rope_multi_matches_scalar_port(vision, sections, n_dims):
    head_dim = 2 * n_dims if vision else n_dims
    S, H = 3, 2
    pos = RNG.integers(0, 32, (4, S)).astype(np.int32)
    x = _x(S, H, head_dim).astype(np.float32)
    mode = ops.ROPE_TYPE_VISION if vision else ops.ROPE_TYPE_MROPE
    got = np.asarray(ops.rope_multi(jnp.asarray(x), jnp.asarray(pos),
                                    n_dims, sections, mode=mode))
    P = n_dims if vision else n_dims // 2
    want = x.copy()
    for s in range(S):
        cos, sin = _mrope_cache_scalar(pos[:, s], sections, vision, n_dims,
                                       10000.0)
        for h in range(H):
            for ic in range(P):
                x0, x1 = x[s, h, ic], x[s, h, ic + P]
                want[s, h, ic] = x0 * cos[ic] - x1 * sin[ic]
                want[s, h, ic + P] = x0 * sin[ic] + x1 * cos[ic]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
