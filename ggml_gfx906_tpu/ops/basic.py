"""Core op surface: elementwise, unary, GLU, norms, softmax, rows, etc.

Functional jax analogues of the ggml op enum (ref: include/ggml.h:450-581;
CPU semantics src/ggml-cpu/ops.cpp). Arrays use numpy/C axis order — the
last axis is ggml's ne0 (contiguous). Where ggml ops carry op_params
(eps, scale, bias, ...), they are keyword arguments here; under jit they are
static and folded into the compiled program, matching ggml's
define-graph-then-execute staging.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------- unary
# ref: ggml_unary_op include/ggml.h; kernels src/ggml-cpu/unary-ops.cpp

GELU_COEF_A = 0.044715
GELU_QUICK_COEF = -1.702
SQRT_2_OVER_PI = 0.79788456080286535587989211986876


def gelu(x):
    """tanh-approximated gelu — the ggml default (GGML_UNARY_OP_GELU)."""
    xf = x.astype(jnp.float32)
    y = 0.5 * xf * (1.0 + jnp.tanh(SQRT_2_OVER_PI * xf * (1.0 + GELU_COEF_A * xf * xf)))
    return y.astype(x.dtype)


def gelu_erf(x):
    xf = x.astype(jnp.float32)
    y = 0.5 * xf * (1.0 + jax.lax.erf(xf / math.sqrt(2.0)))
    return y.astype(x.dtype)


def gelu_quick(x):
    xf = x.astype(jnp.float32)
    return (xf * jax.nn.sigmoid(-GELU_QUICK_COEF * xf)).astype(x.dtype)


def silu(x):
    xf = x.astype(jnp.float32)
    return (xf * jax.nn.sigmoid(xf)).astype(x.dtype)


def relu(x):
    return jnp.maximum(x, 0)


def leaky_relu(x, negative_slope: float = 0.1):
    return jnp.where(x > 0, x, x * negative_slope)


def elu(x):
    return jnp.where(x > 0, x, jnp.expm1(x))


def sigmoid(x):
    return jax.nn.sigmoid(x)


def hardswish(x):
    return x * jnp.clip(x / 6.0 + 0.5, 0.0, 1.0)


def hardsigmoid(x):
    return jnp.clip(x / 6.0 + 0.5, 0.0, 1.0)


def step(x):
    return (x > 0).astype(x.dtype)


def abs_(x):
    return jnp.abs(x)


def sgn(x):
    return jnp.sign(x)


def neg(x):
    return -x


def tanh(x):
    return jnp.tanh(x)


def exp(x):
    return jnp.exp(x)


UNARY = {
    "abs": abs_, "sgn": sgn, "neg": neg, "step": step, "tanh": tanh,
    "elu": elu, "relu": relu, "sigmoid": sigmoid, "gelu": gelu,
    "gelu_quick": gelu_quick, "silu": silu, "hardswish": hardswish,
    "hardsigmoid": hardsigmoid, "exp": exp, "gelu_erf": gelu_erf,
}


# ---------------------------------------------------------------- GLU
# ref: ggml_glu_op; split the last axis in half (or take a second tensor b):
# out = act(a_half) * b_half  (src/ggml-cpu/unary-ops.cpp glu kernels)

def _glu(x, act, b=None, swapped: bool = False):
    if b is None:
        a, g = jnp.split(x, 2, axis=-1)
    else:
        a, g = x, b
    if swapped:
        a, g = g, a
    return act(a) * g


def reglu(x, b=None, swapped=False):
    return _glu(x, relu, b, swapped)


def geglu(x, b=None, swapped=False):
    return _glu(x, gelu, b, swapped)


def swiglu(x, b=None, swapped=False):
    return _glu(x, silu, b, swapped)


def geglu_erf(x, b=None, swapped=False):
    return _glu(x, gelu_erf, b, swapped)


def geglu_quick(x, b=None, swapped=False):
    return _glu(x, gelu_quick, b, swapped)


def swiglu_oai(x, b=None, alpha: float = 1.702, limit: float = 7.0):
    """ref: ggml_swiglu_oai — clamped variant used by gpt-oss."""
    if b is None:
        a, g = jnp.split(x, 2, axis=-1)
    else:
        a, g = x, b
    a = jnp.minimum(a, limit)
    g = jnp.clip(g, -limit, limit)
    out = a * jax.nn.sigmoid(alpha * a) * (g + 1.0)
    return out


# ---------------------------------------------------------------- norms
# ref: ggml_norm / rms_norm / group_norm / l2_norm (src/ggml-cpu/ops.cpp)

def norm(x, eps: float = 1e-5):
    """LayerNorm without affine params (GGML_OP_NORM)."""
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    xc = xf - mean
    var = (xc * xc).mean(axis=-1, keepdims=True)
    return (xc * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def rms_norm(x, eps: float = 1e-6):
    xf = x.astype(jnp.float32)
    ms = (xf * xf).mean(axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(ms + eps)).astype(x.dtype)


def group_norm(x, n_groups: int, eps: float = 1e-6):
    """GGML_OP_GROUP_NORM: normalize over (channels-in-group, spatial).
    x: (..., C, H*W or spatial dims...) with channels at axis -3 in ggml's
    conv layout (N, C, H, W) here."""
    n, c = x.shape[0], x.shape[1]
    g = x.reshape(n, n_groups, -1)
    xf = g.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    xc = xf - mean
    var = (xc * xc).mean(axis=-1, keepdims=True)
    return (xc * jax.lax.rsqrt(var + eps)).reshape(x.shape).astype(x.dtype)


def l2_norm(x, eps: float = 1e-12):
    xf = x.astype(jnp.float32)
    ss = (xf * xf).sum(axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(jnp.maximum(ss, eps))).astype(x.dtype)


# ---------------------------------------------------------------- softmax

def alibi_slopes(n_head: int, max_bias: float) -> jnp.ndarray:
    """Per-head ALiBi slopes (ref: ggml_compute_forward_soft_max_f32,
    src/ggml-cpu/ops.cpp:5715-5738)."""
    if max_bias <= 0.0:
        return jnp.ones((n_head,), dtype=jnp.float32)
    n_head_log2 = 1 << int(math.floor(math.log2(n_head)))
    m0 = 2.0 ** (-max_bias / n_head_log2)
    m1 = 2.0 ** (-max_bias / 2.0 / n_head_log2)
    h = jnp.arange(n_head)
    return jnp.where(
        h < n_head_log2,
        jnp.float32(m0) ** (h + 1).astype(jnp.float32),
        jnp.float32(m1) ** (2 * (h - n_head_log2) + 1).astype(jnp.float32),
    )


def soft_max_ext(x, mask=None, scale: float = 1.0, max_bias: float = 0.0,
                 sinks=None):
    """GGML_OP_SOFT_MAX with mask + ALiBi + attention sinks.

    x: (..., n_head, n_rows, n_cols); mask broadcasts over heads; sinks is a
    per-head extra logit included in the denominator only.
    ref: src/ggml-cpu/ops.cpp:5685-5795.
    """
    xf = x.astype(jnp.float32) * jnp.float32(scale)
    if mask is not None:
        n_head = x.shape[-3]
        slope = alibi_slopes(n_head, max_bias).reshape(n_head, 1, 1)
        xf = xf + slope * mask.astype(jnp.float32)
    m = xf.max(axis=-1, keepdims=True)
    if sinks is not None:
        sk = sinks.astype(jnp.float32).reshape(-1, 1, 1)  # (n_head, 1, 1)
        m = jnp.maximum(m, sk)
    e = jnp.exp(xf - m)
    denom = e.sum(axis=-1, keepdims=True)
    if sinks is not None:
        denom = denom + jnp.exp(sk - m)
    return (e / denom).astype(x.dtype)


def soft_max(x):
    return soft_max_ext(x)


def diag_mask_inf(x, n_past: int = 0):
    """Causal mask: set entries with col > n_past + row to -inf
    (GGML_OP_DIAG_MASK_INF, ref src/ggml-cpu/ops.cpp diag_mask)."""
    n_rows, n_cols = x.shape[-2], x.shape[-1]
    row = jnp.arange(n_rows)[:, None]
    col = jnp.arange(n_cols)[None, :]
    keep = col <= row + n_past
    return jnp.where(keep, x, -jnp.inf)


def causal_mask(n_rows: int, n_cols: int, n_past: int = 0, dtype=jnp.float32):
    """Additive causal mask (0 / -inf) like the masks fed to soft_max_ext."""
    row = jnp.arange(n_rows)[:, None]
    col = jnp.arange(n_cols)[None, :]
    return jnp.where(col <= row + n_past, 0.0, -jnp.inf).astype(dtype)


# ---------------------------------------------------------------- rows / indexing

def get_rows(x, ids):
    """GGML_OP_GET_ROWS: gather rows (embedding lookup). x: (..., R, C),
    ids: int array; gathers along axis -2."""
    return jnp.take(x, ids, axis=-2)


def set_rows(x, rows, ids):
    """GGML_OP_SET_ROWS: scatter rows into x at positions ids (last-writer-
    wins like the sequential reference)."""
    return x.at[..., ids, :].set(rows.astype(x.dtype))


def argsort(x, descending: bool = False):
    order = jnp.argsort(x, axis=-1, stable=True)
    if descending:
        order = jnp.flip(order, axis=-1)
    return order


def top_k(x, k: int):
    """GGML_OP_ARGSORT + view: indices of the k largest values per row."""
    return jax.lax.top_k(x, k)


def argmax(x):
    return jnp.argmax(x, axis=-1)


def count_equal(a, b):
    return (a == b).sum()


# ---------------------------------------------------------------- shapes / data movement

def concat(a, b, axis: int = -1):
    return jnp.concatenate([a, b], axis=axis)


def repeat(x, target_shape):
    """GGML_OP_REPEAT: broadcast-tile x up to target_shape."""
    reps = tuple(t // s for t, s in zip(target_shape, x.shape))
    return jnp.tile(x, reps)


def pad(x, paddings):
    """GGML_OP_PAD: zero-pad; paddings = [(lo, hi), ...] per axis."""
    return jnp.pad(x, paddings)


def pad_reflect_1d(x, p0: int, p1: int):
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(p0, p1)], mode="reflect")


def roll(x, shifts, axes):
    return jnp.roll(x, shifts, axes)


def arange(start: float, stop: float, step: float):
    return jnp.arange(start, stop, step, dtype=jnp.float32)


def timestep_embedding(timesteps, dim: int, max_period: int = 10000):
    """GGML_OP_TIMESTEP_EMBEDDING (ref: src/ggml-cpu/ops.cpp tsembd,
    mirrors the DDPM sinusoidal embedding). timesteps: (N,) → (N, dim)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.pad(emb, [(0, 0), (0, 1)])
    return emb


def scale(x, s: float, bias: float = 0.0):
    """GGML_OP_SCALE (with the newer bias param)."""
    return x * s + bias


def clamp(x, lo: float, hi: float):
    return jnp.clip(x, lo, hi)


def add1(x, y):
    return x + y.reshape(())


def acc(x, src, offset_elems: int, target_shape=None):
    """GGML_OP_ACC: add src into a flattened-offset view of x."""
    flat = x.reshape(-1)
    s = src.reshape(-1)
    upd = jax.lax.dynamic_slice(flat, (offset_elems,), (s.size,)) + s
    return jax.lax.dynamic_update_slice(flat, upd, (offset_elems,)).reshape(x.shape)


def out_prod(a, b):
    """GGML_OP_OUT_PROD (ggml_out_prod, include/ggml.h:1311; CPU kernel
    src/ggml-cpu/ops.cpp:4542): a (..., n, m), b (..., n, p) → (..., p, m)
    = bᵀ·a per batch — dst[j, :] = Σ_k b[k, j] · a[k, :], the rank-n update
    the reference's autodiff uses for weight gradients. Leading batch dims
    of b may be a multiple of a's (GQA-style broadcast, dps2/dps3)."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    if a.ndim > 2 and b.ndim == a.ndim and a.shape[:-2] != b.shape[:-2]:
        # broadcast a's groups over b's (dst-per-src ratios)
        reps = [bs // as_ for bs, as_ in zip(b.shape[:-2], a.shape[:-2])]
        for ax, r in enumerate(reps):
            if r > 1:
                a = jnp.repeat(a, r, axis=ax)
    # HIGHEST: TPU default einsum rounds f32 operands through bf16 —
    # measured NMSE ~6e-6 vs the CPU backend on the conformance sweep
    return jnp.einsum("...nm,...np->...pm", a, b,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)


# ---------------------------------------------------------------- reductions

def sum_(x):
    return x.sum()


def sum_rows(x):
    return x.sum(axis=-1, keepdims=True)


def mean(x):
    return x.mean(axis=-1, keepdims=True)


# ---------------------------------------------------------------- losses

def cross_entropy_loss(logits, labels):
    """GGML_OP_CROSS_ENTROPY_LOSS: mean over rows of -sum(label * logsoftmax)
    (ref: src/ggml-cpu/ops.cpp cross_entropy; labels are probabilities)."""
    lsm = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    n_rows = logits.size // logits.shape[-1]
    return -(labels.astype(jnp.float32) * lsm).sum() / n_rows


# ---------------------------------------------------------------- misc model ops

def embedding(table, ids):
    return get_rows(table, ids)


def softcap(x, s: float):
    """scale-tanh-scale softcap (the CUDA-fused pattern, ggml-cuda/softcap.cu)."""
    return jnp.tanh(x * (1.0 / s)) * s
