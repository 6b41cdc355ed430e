"""Rotary position embedding with ggml's full parameter surface.

ref: ggml_rope_ext (include/ggml.h:1645-1740), CPU kernel
src/ggml-cpu/ops.cpp:6049-6330 (rope_yarn, ggml_rope_cache_init,
ggml_compute_forward_rope_f32), YaRN correction dims src/ggml.c:4083-4098.

Modes: NORMAL rotates adjacent pairs (x[2i], x[2i+1]); NEOX rotates
half-split pairs (x[i], x[i + n_dims/2]). Dims beyond n_dims pass through.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

ROPE_TYPE_NORMAL = 0
ROPE_TYPE_NEOX = 2
ROPE_TYPE_MROPE = 8    # multimodal (t/h/w/e position streams)
ROPE_TYPE_VISION = 24  # mrope + per-section theta reset + half-dim pairs


def yarn_corr_dims(n_dims: int, n_ctx_orig: int, freq_base: float,
                   beta_fast: float, beta_slow: float) -> tuple[float, float]:
    """ref: ggml_rope_yarn_corr_dims src/ggml.c:4088-4098."""

    def corr_dim(n_rot):
        return n_dims * math.log(n_ctx_orig / (n_rot * 2 * math.pi)) / (
            2 * math.log(freq_base))

    start = math.floor(corr_dim(beta_fast))
    end = math.ceil(corr_dim(beta_slow))
    return max(0.0, start), min(n_dims - 1.0, end)


def _yarn_cos_sin(theta_extrap, pair_idx, n_dims: int, freq_base: float,
                  freq_scale: float, ext_factor: float, attn_factor: float,
                  beta_fast: float, beta_slow: float, n_ctx_orig: int,
                  freq_factors):
    """rope_yarn applied to a precomputed extrapolation theta per pair.

    pair_idx: the absolute pair index of each lane (i0/2 in the C kernel —
    the YaRN correction ramp indexes pairs by head position, even when the
    theta streams are sectioned as in M-RoPE)."""
    if freq_factors is not None:
        theta_extrap = theta_extrap / jnp.asarray(
            freq_factors, jnp.float32)[pair_idx]
    theta_interp = freq_scale * theta_extrap
    mscale = jnp.float32(attn_factor)
    if ext_factor != 0.0:
        low, high = yarn_corr_dims(n_dims, n_ctx_orig, freq_base, beta_fast,
                                   beta_slow)
        ramp_y = (pair_idx.astype(np.float32) - low) / max(0.001, high - low)
        ramp = (1.0 - jnp.clip(jnp.asarray(ramp_y, jnp.float32), 0.0, 1.0)) \
            * ext_factor
        theta = theta_interp * (1 - ramp) + theta_extrap * ramp
        mscale = mscale * (1.0 + 0.1 * math.log(1.0 / freq_scale))
    else:
        theta = theta_interp
    return jnp.cos(theta) * mscale, jnp.sin(theta) * mscale


def _rope_angles(pos, n_dims: int, freq_base: float, freq_scale: float,
                 ext_factor: float, attn_factor: float, beta_fast: float,
                 beta_slow: float, n_ctx_orig: int, freq_factors):
    """cos/sin caches, shape (*pos.shape, n_dims//2).

    Mirrors rope_yarn + ggml_rope_cache_init exactly (theta recurrence
    theta *= theta_scale == freq_base^(-2 i/n_dims))."""
    half = n_dims // 2
    pair_idx = np.arange(half)
    theta_scale_pow = jnp.float32(freq_base) ** (
        -2.0 * pair_idx.astype(np.float32) / n_dims)
    theta_extrap = pos.astype(jnp.float32)[..., None] * theta_scale_pow
    return _yarn_cos_sin(theta_extrap, pair_idx, n_dims, freq_base,
                         freq_scale, ext_factor, attn_factor, beta_fast,
                         beta_slow, n_ctx_orig, freq_factors)


def rope_ext(
    x,
    pos,
    n_dims: int,
    mode: int = ROPE_TYPE_NORMAL,
    freq_base: float = 10000.0,
    freq_scale: float = 1.0,
    ext_factor: float = 0.0,
    attn_factor: float = 1.0,
    beta_fast: float = 32.0,
    beta_slow: float = 1.0,
    n_ctx_orig: int = 0,
    freq_factors=None,
    forward: bool = True,
):
    """x: (..., n_seq, n_head, head_dim) — pos indexes the n_seq axis (-3).

    Returns x with the first n_dims of head_dim rotated. forward=False is
    rope_back (inverse rotation — sin sign flip)."""
    head_dim = x.shape[-1]
    assert n_dims % 2 == 0 and n_dims <= head_dim
    n_ctx_orig = n_ctx_orig or 0
    if ext_factor != 0.0:
        assert n_ctx_orig > 0, "YaRN needs n_ctx_orig"
    cos, sin = _rope_angles(pos, n_dims, freq_base, freq_scale, ext_factor,
                            attn_factor, beta_fast, beta_slow,
                            max(n_ctx_orig, 1), freq_factors)
    if not forward:
        sin = -sin
    # insert head axis: pos applies along n_seq (axis -3 of x)
    cos = cos[..., None, :]
    sin = sin[..., None, :]
    xf = x.astype(jnp.float32)
    rot, rest = xf[..., :n_dims], xf[..., n_dims:]
    if mode & ROPE_TYPE_NEOX:
        half = n_dims // 2
        x0, x1 = rot[..., :half], rot[..., half:]
        y0 = x0 * cos - x1 * sin
        y1 = x0 * sin + x1 * cos
        out = jnp.concatenate([y0, y1], axis=-1)
    else:
        x0 = rot[..., 0::2]
        x1 = rot[..., 1::2]
        y0 = x0 * cos - x1 * sin
        y1 = x0 * sin + x1 * cos
        out = jnp.stack([y0, y1], axis=-1).reshape(rot.shape)
    return jnp.concatenate([out, rest], axis=-1).astype(x.dtype)


def rope_multi(
    x,
    pos,
    n_dims: int,
    sections,
    mode: int = ROPE_TYPE_MROPE,
    freq_base: float = 10000.0,
    freq_scale: float = 1.0,
    ext_factor: float = 0.0,
    attn_factor: float = 1.0,
    beta_fast: float = 32.0,
    beta_slow: float = 1.0,
    n_ctx_orig: int = 0,
    freq_factors=None,
    forward: bool = True,
):
    """Multimodal RoPE — ggml_rope_multi (include/ggml.h:1660; CPU kernel
    ggml_mrope_cache_init, src/ggml-cpu/ops.cpp:6089-6146).

    x: (..., n_seq, n_head, head_dim); pos (4, n_seq) int32 — the t/h/w/e
    position streams. sections[4] split the dim pairs cyclically into
    sectors; each sector's theta uses its stream's position. All four theta
    streams advance by theta_scale every pair; VISION mode additionally
    resets a stream at its sector start (indep_sects) and rotates
    half-split pairs (i, i + n_dims) with n_dims == head_dim//2 covering
    the whole head."""
    vision = mode == ROPE_TYPE_VISION
    head_dim = x.shape[-1]
    assert pos.shape[0] == 4, pos.shape
    sections = list(sections)
    assert len(sections) == 4 and sum(sections[:3]) > 0, sections
    P = n_dims if vision else n_dims // 2   # number of rotated pairs
    if vision:
        assert n_dims == head_dim // 2, (n_dims, head_dim)

    sect_dims = sum(sections)
    cum = np.cumsum(sections)
    starts = np.concatenate([[0], cum[:-1]])
    ic = np.arange(P)
    sector = ic % sect_dims
    kind = np.searchsorted(cum, sector, side="right")      # 0..3 per pair
    # theta exponent: pairs advance theta_scale per step from the stream
    # base; vision resets the selected stream at each sector start
    expo = (sector - starts[kind]).astype(np.float32) if vision \
        else ic.astype(np.float32)

    psel = jnp.asarray(pos)[kind]                 # (P, n_seq) stream select
    scale_pow = jnp.float32(freq_base) ** (-2.0 * expo / n_dims)
    theta_extrap = psel.T.astype(jnp.float32) * scale_pow  # (n_seq, P)
    cos, sin = _yarn_cos_sin(theta_extrap, ic, n_dims, freq_base, freq_scale,
                             ext_factor, attn_factor, beta_fast, beta_slow,
                             max(n_ctx_orig or 0, 1), freq_factors)
    if not forward:
        sin = -sin
    cos = cos[..., None, :]   # head axis
    sin = sin[..., None, :]
    xf = x.astype(jnp.float32)
    rot, rest = xf[..., :2 * P], xf[..., 2 * P:]
    x0, x1 = rot[..., :P], rot[..., P:]
    y0 = x0 * cos - x1 * sin
    y1 = x0 * sin + x1 * cos
    out = jnp.concatenate([y0, y1], axis=-1)
    return jnp.concatenate([out, rest], axis=-1).astype(x.dtype)
