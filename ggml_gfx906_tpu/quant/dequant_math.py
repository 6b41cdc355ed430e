"""Backend-generic dequantization math (numpy or jax.numpy via the `xp` arg).

One implementation of the bit-unpack arithmetic per format, shared by the
numpy oracle codecs (quant/legacy.py, quant/kquants.py) and the jax/TPU path
(ops/quantized.py) so bit-exactness proven against the C reference carries
over to the device path. All functions take plain unsigned/int arrays (the
struct fields), return float32, and use only ops available in both numpy
and jax.numpy. ref: dequantize_row_* in src/ggml-quants.c.
"""
from __future__ import annotations

import numpy as np


def _f32(xp, a):
    return a.astype(xp.float32)


def u32_from_bytes(xp, b):
    """(..., 4) uint8 → (...,) uint32 little-endian (no .view: jax-safe)."""
    b = b.astype(xp.uint32)
    return b[..., 0] | (b[..., 1] << 8) | (b[..., 2] << 16) | (b[..., 3] << 24)


def dequant_q4_0(xp, d, qs):
    """d: (..., nb) f16, qs: (..., nb, 16) u8 → (..., nb*32) f32."""
    d = _f32(xp, d)[..., None]
    lo = _f32(xp, (qs & 0x0F).astype(xp.int8)) - 8.0
    hi = _f32(xp, (qs >> 4).astype(xp.int8)) - 8.0
    y = xp.concatenate([lo, hi], axis=-1) * d
    return y.reshape(*y.shape[:-2], -1)


def dequant_q4_1(xp, d, m, qs):
    d = _f32(xp, d)[..., None]
    m = _f32(xp, m)[..., None]
    lo = _f32(xp, qs & 0x0F)
    hi = _f32(xp, qs >> 4)
    y = xp.concatenate([lo, hi], axis=-1) * d + m
    return y.reshape(*y.shape[:-2], -1)


def _q5_high_bits(xp, qh_bytes):
    """(..., nb, 4) u8 → (..., nb, 32) u8 with the 5th bit at position 4."""
    qh = u32_from_bytes(xp, qh_bytes)[..., None]
    j = xp.arange(16, dtype=xp.uint32)
    xh_0 = ((qh >> j) << 4) & 0x10
    xh_1 = (qh >> (j + 12)) & 0x10
    return xp.concatenate([xh_0, xh_1], axis=-1).astype(xp.uint8)


def dequant_q5_0(xp, d, qh, qs):
    d = _f32(xp, d)[..., None]
    xh = _q5_high_bits(xp, qh)
    lo = ((qs & 0x0F) | xh[..., :16]).astype(xp.int32) - 16
    hi = ((qs >> 4) | xh[..., 16:]).astype(xp.int32) - 16
    y = _f32(xp, xp.concatenate([lo, hi], axis=-1)) * d
    return y.reshape(*y.shape[:-2], -1)


def dequant_q5_1(xp, d, m, qh, qs):
    d = _f32(xp, d)[..., None]
    m = _f32(xp, m)[..., None]
    xh = _q5_high_bits(xp, qh)
    lo = (qs & 0x0F) | xh[..., :16]
    hi = (qs >> 4) | xh[..., 16:]
    y = _f32(xp, xp.concatenate([lo, hi], axis=-1)) * d + m
    return y.reshape(*y.shape[:-2], -1)


def dequant_q8_0(xp, d, qs):
    y = _f32(xp, qs) * _f32(xp, d)[..., None]
    return y.reshape(*y.shape[:-2], -1)


def dequant_q8_1(xp, d, qs):
    return dequant_q8_0(xp, d, qs)


def dequant_q8_K(xp, d, qs):
    y = _f32(xp, qs) * _f32(xp, d)[..., None]
    return y.reshape(*y.shape[:-2], -1)


def unpack_scale_min_k4(xp, scales):
    """(..., 12) u8 → (sc (..., 8), m (..., 8)) u8 6-bit values.
    ref: get_scale_min_k4 src/ggml-quants.c:703-711."""
    s03 = scales[..., 0:4] & 63
    m03 = scales[..., 4:8] & 63
    s47 = (scales[..., 8:12] & 0xF) | ((scales[..., 0:4] >> 6) << 4)
    m47 = (scales[..., 8:12] >> 4) | ((scales[..., 4:8] >> 6) << 4)
    return (
        xp.concatenate([s03, s47], axis=-1),
        xp.concatenate([m03, m47], axis=-1),
    )


def dequant_q4_K(xp, d, dmin, scales, qs):
    """d/dmin: (..., nb) f16, scales: (..., nb, 12) u8, qs: (..., nb, 128) u8."""
    sc, m = unpack_scale_min_k4(xp, scales)
    d_j = _f32(xp, d)[..., None] * _f32(xp, sc)  # (..., nb, 8)
    m_j = _f32(xp, dmin)[..., None] * _f32(xp, m)
    q = qs.reshape(*qs.shape[:-1], 4, 32)
    lo = _f32(xp, q & 0xF)
    hi = _f32(xp, q >> 4)
    qf = xp.stack([lo, hi], axis=-2)  # (..., nb, 4, 2, 32); subblock = 2*g+half
    y = qf * d_j.reshape(*d_j.shape[:-1], 4, 2, 1) - m_j.reshape(*m_j.shape[:-1], 4, 2, 1)
    return y.reshape(*y.shape[:-4], -1)


def dequant_q5_K(xp, d, dmin, scales, qh, qs):
    sc, m = unpack_scale_min_k4(xp, scales)
    d_j = _f32(xp, d)[..., None] * _f32(xp, sc)
    m_j = _f32(xp, dmin)[..., None] * _f32(xp, m)
    ql = qs.reshape(*qs.shape[:-1], 4, 32)
    qhb = qh.reshape(*qh.shape[:-1], 1, 32)
    g = xp.arange(4, dtype=xp.uint8)[:, None]
    hi0 = ((qhb >> (2 * g)) & 1) * 16
    hi1 = ((qhb >> (2 * g + 1)) & 1) * 16
    q0 = _f32(xp, (ql & 0xF) + hi0)
    q1 = _f32(xp, (ql >> 4) + hi1)
    qf = xp.stack([q0, q1], axis=-2)  # (..., nb, 4, 2, 32)
    y = qf * d_j.reshape(*d_j.shape[:-1], 4, 2, 1) - m_j.reshape(*m_j.shape[:-1], 4, 2, 1)
    return y.reshape(*y.shape[:-4], -1)


def dequant_q6_K(xp, d, ql, qh, scales):
    """ql: (..., nb, 128), qh: (..., nb, 64), scales: (..., nb, 16) i8."""
    dq = _f32(xp, d)
    qlr = ql.reshape(*ql.shape[:-1], 2, 2, 32)  # [128-group][byte-half][l]
    qhr = qh.reshape(*qh.shape[:-1], 2, 32)
    scr = _f32(xp, scales.reshape(*scales.shape[:-1], 2, 8))
    q1 = ((qlr[..., 0, :] & 0xF) | (((qhr >> 0) & 3) << 4)).astype(xp.int32) - 32
    q2 = ((qlr[..., 1, :] & 0xF) | (((qhr >> 2) & 3) << 4)).astype(xp.int32) - 32
    q3 = ((qlr[..., 0, :] >> 4) | (((qhr >> 4) & 3) << 4)).astype(xp.int32) - 32
    q4 = ((qlr[..., 1, :] >> 4) | (((qhr >> 6) & 3) << 4)).astype(xp.int32) - 32
    q = _f32(xp, xp.stack([q1, q2, q3, q4], axis=-2))  # (..., nb, 2, 4, 32)
    sidx = np.arange(4)[:, None] * 2 + (np.arange(32) // 16)[None, :]  # static
    dsc = dq[..., None, None, None] * scr[..., sidx]
    y = q * dsc
    return y.reshape(*y.shape[:-4], -1)


def dequant_q2_K(xp, d, dmin, scales, qs):
    dl = _f32(xp, d)[..., None] * _f32(xp, scales & 0xF)  # (..., nb, 16)
    ml = _f32(xp, dmin)[..., None] * _f32(xp, scales >> 4)
    q = qs.reshape(*qs.shape[:-1], 2, 1, 32)
    shift = (np.arange(4)[None, :, None] * 2).astype(np.uint8)  # static
    qv = _f32(xp, (q >> shift) & 3)  # (..., nb, 2, 4, 32)
    pre = qv.shape[:-3]
    qv = qv.reshape(*pre, 2, 4, 2, 16)
    dlr = dl.reshape(*pre, 2, 4, 2, 1)
    mlr = ml.reshape(*pre, 2, 4, 2, 1)
    y = qv * dlr - mlr
    return y.reshape(*y.shape[:-5], -1)


def unpack_q3_scales(xp, scales):
    """(..., 12) u8 → (..., 16) int32 signed scales in [-32, 31]."""
    low = xp.concatenate([scales[..., 0:8] & 0xF, scales[..., 0:8] >> 4], axis=-1)
    j = np.arange(16)
    hi_byte = scales[..., 8:12]  # (..., 4)
    hi = (hi_byte[..., j % 4] >> (2 * (j // 4)).astype(np.uint8)) & 3
    return (low.astype(xp.int32) | (hi.astype(xp.int32) << 4)) - 32


def dequant_q3_K(xp, d, hmask, scales, qs):
    dl = _f32(xp, d)[..., None] * _f32(xp, unpack_q3_scales(xp, scales))
    q = qs.reshape(*qs.shape[:-1], 2, 1, 32)
    shift = (np.arange(4)[None, :, None] * 2).astype(np.uint8)
    qv = ((q >> shift) & 3).astype(xp.int32)  # (..., nb, 2, 4, 32)
    hm = hmask.reshape(*hmask.shape[:-1], 1, 1, 32)
    bit = (np.arange(2)[:, None] * 4 + np.arange(4)[None, :]).reshape(2, 4, 1).astype(np.uint8)
    has_high = ((hm >> bit) & 1).astype(xp.int32)
    qsigned = _f32(xp, qv - (1 - has_high) * 4)
    pre = qsigned.shape[:-3]
    y = qsigned.reshape(*pre, 2, 4, 2, 16) * dl.reshape(*pre, 2, 4, 2, 1)
    return y.reshape(*y.shape[:-5], -1)
