"""Legacy block-32 quant codecs: Q4_0, Q4_1, Q5_0, Q5_1, Q8_0, Q8_1.

Vectorized numpy implementations with the same numerical semantics as the
reference scalar code (ref: src/ggml-quants.c:36-258 quantize_row_*_ref,
:307-415 dequantize_row_*). These are the deterministic "reference" codecs —
the oracle every TPU kernel is tested against, and the path GGUF files are
written with.

All quantize functions take float32 arrays whose last dim is a multiple of the
block size and return a structured array of blocks with shape
(..., n // blck_size); dequantize is the inverse. Wire bytes are just
`.tobytes()` of the structured array (layouts are bit-identical to C).
"""
from __future__ import annotations

import numpy as np

from . import dequant_math as dq
from .numerics import (
    F32,
    fp16_round,
    fp16_to_fp32,
    fp32_to_fp16,
    nearest_int,
    roundf_c,
    safe_div,
    signed_absmax,
    trunc_i,
)
from .types import (
    BLOCK_Q4_0,
    BLOCK_Q4_1,
    BLOCK_Q5_0,
    BLOCK_Q5_1,
    BLOCK_Q8_0,
    BLOCK_Q8_1,
    QK4_0,
    QK5_0,
    QK8_0,
    QK8_1,
)


def _blocked(x: np.ndarray, qk: int) -> np.ndarray:
    x = np.ascontiguousarray(x, dtype=np.float32)
    assert x.shape[-1] % qk == 0, f"last dim {x.shape[-1]} not a multiple of {qk}"
    return x.reshape(*x.shape[:-1], x.shape[-1] // qk, qk)


# ---------------------------------------------------------------- Q4_0

def quantize_q4_0(x: np.ndarray) -> np.ndarray:
    """ref: quantize_row_q4_0_ref src/ggml-quants.c:36-71."""
    xb = _blocked(x, QK4_0)
    mx = signed_absmax(xb)
    d = mx / F32(-8)
    id = safe_div(F32(1), d)
    q = xb * id[..., None]
    xi = np.minimum(15, trunc_i(q + F32(8.5))).astype(np.uint8)
    lo, hi = xi[..., : QK4_0 // 2], xi[..., QK4_0 // 2 :]
    out = np.empty(xb.shape[:-1], dtype=BLOCK_Q4_0)
    out["d"] = fp32_to_fp16(d)
    out["qs"] = lo | (hi << 4)
    return out


def dequantize_q4_0(blocks: np.ndarray) -> np.ndarray:
    """ref: dequantize_row_q4_0 src/ggml-quants.c:307-325."""
    return dq.dequant_q4_0(np, blocks["d"], blocks["qs"])


# ---------------------------------------------------------------- Q4_1

def quantize_q4_1(x: np.ndarray) -> np.ndarray:
    """ref: quantize_row_q4_1_ref src/ggml-quants.c:73-108."""
    xb = _blocked(x, QK4_0)
    mn = xb.min(axis=-1)
    mx = xb.max(axis=-1)
    d = (mx - mn) / F32(15)
    id = safe_div(F32(1), d)
    q = (xb - mn[..., None]) * id[..., None]
    xi = np.minimum(15, trunc_i(q + F32(0.5))).astype(np.uint8)
    lo, hi = xi[..., : QK4_0 // 2], xi[..., QK4_0 // 2 :]
    out = np.empty(xb.shape[:-1], dtype=BLOCK_Q4_1)
    out["d"] = fp32_to_fp16(d)
    out["m"] = fp32_to_fp16(mn)
    out["qs"] = lo | (hi << 4)
    return out


def dequantize_q4_1(blocks: np.ndarray) -> np.ndarray:
    """ref: dequantize_row_q4_1 src/ggml-quants.c:327-346."""
    return dq.dequant_q4_1(np, blocks["d"], blocks["m"], blocks["qs"])


# ---------------------------------------------------------------- Q5_0 / Q5_1

def _pack_qh(xi: np.ndarray) -> np.ndarray:
    """Pack the 5th bit of 32 5-bit values into 4 bytes (little-endian u32).

    Bit j of qh holds bit 4 of element j for j<16, and of element j+16's
    counterpart per the reference layout (first half at bits 0..15, second
    half at bits 16..31)."""
    bits = ((xi >> 4) & 1).astype(np.uint32)
    shifts = np.arange(32, dtype=np.uint32)
    qh = (bits << shifts).sum(axis=-1, dtype=np.uint32)
    return np.ascontiguousarray(qh[..., None]).view(np.uint8).reshape(*qh.shape, 4)


def quantize_q5_0(x: np.ndarray) -> np.ndarray:
    """ref: quantize_row_q5_0_ref src/ggml-quants.c:110-152."""
    xb = _blocked(x, QK5_0)
    mx = signed_absmax(xb)
    d = mx / F32(-16)
    id = safe_div(F32(1), d)
    q = xb * id[..., None]
    xi = np.minimum(31, trunc_i(q + F32(16.5))).astype(np.uint8)
    lo, hi = xi[..., : QK5_0 // 2], xi[..., QK5_0 // 2 :]
    out = np.empty(xb.shape[:-1], dtype=BLOCK_Q5_0)
    out["d"] = fp32_to_fp16(d)
    out["qs"] = (lo & 0x0F) | ((hi & 0x0F) << 4)
    out["qh"] = _pack_qh(xi)
    return out


def _unpack_qh(qh_bytes: np.ndarray) -> np.ndarray:
    """Inverse of _pack_qh: (..., 4) u8 -> (..., 32) of the 5th bits shifted
    into position 4, matching `((qh >> (j+0)) << 4) & 0x10` /
    `((qh >> (j+12))) & 0x10` in the reference."""
    qh = qh_bytes.view(np.uint32)[..., 0] if qh_bytes.shape[-1] == 4 else qh_bytes
    j = np.arange(16, dtype=np.uint32)
    xh_0 = ((qh[..., None] >> j) << 4) & 0x10
    xh_1 = (qh[..., None] >> (j + 12)) & 0x10
    return np.concatenate([xh_0, xh_1], axis=-1).astype(np.uint8)


def dequantize_q5_0(blocks: np.ndarray) -> np.ndarray:
    """ref: dequantize_row_q5_0 src/ggml-quants.c:348-372."""
    return dq.dequant_q5_0(np, blocks["d"], np.ascontiguousarray(blocks["qh"]), blocks["qs"])


def quantize_q5_1(x: np.ndarray) -> np.ndarray:
    """ref: quantize_row_q5_1_ref src/ggml-quants.c:154-197."""
    xb = _blocked(x, QK5_0)
    mn = xb.min(axis=-1)
    mx = xb.max(axis=-1)
    d = (mx - mn) / F32(31)
    id = safe_div(F32(1), d)
    q = (xb - mn[..., None]) * id[..., None]
    xi = trunc_i(q + F32(0.5)).astype(np.uint8)  # no clamp in the reference
    lo, hi = xi[..., : QK5_0 // 2], xi[..., QK5_0 // 2 :]
    out = np.empty(xb.shape[:-1], dtype=BLOCK_Q5_1)
    out["d"] = fp32_to_fp16(d)
    out["m"] = fp32_to_fp16(mn)
    out["qs"] = (lo & 0x0F) | ((hi & 0x0F) << 4)
    out["qh"] = _pack_qh(xi)
    return out


def dequantize_q5_1(blocks: np.ndarray) -> np.ndarray:
    """ref: dequantize_row_q5_1 src/ggml-quants.c:374-399."""
    return dq.dequant_q5_1(np, blocks["d"], blocks["m"], np.ascontiguousarray(blocks["qh"]), blocks["qs"])


# ---------------------------------------------------------------- Q8_0 / Q8_1

def quantize_q8_0(x: np.ndarray) -> np.ndarray:
    """ref: quantize_row_q8_0_ref src/ggml-quants.c:199-223."""
    xb = _blocked(x, QK8_0)
    amax = np.abs(xb).max(axis=-1)
    d = amax / F32(127)
    id = safe_div(F32(1), d)
    qs = roundf_c(xb * id[..., None]).astype(np.int8)
    out = np.empty(xb.shape[:-1], dtype=BLOCK_Q8_0)
    out["d"] = fp32_to_fp16(d)
    out["qs"] = qs
    return out


def dequantize_q8_0(blocks: np.ndarray) -> np.ndarray:
    """ref: dequantize_row_q8_0 src/ggml-quants.c:401-415."""
    return dq.dequant_q8_0(np, blocks["d"], blocks["qs"])


def quantize_q8_1(x: np.ndarray) -> np.ndarray:
    """ref: quantize_row_q8_1_ref src/ggml-quants.c:225-258."""
    xb = _blocked(x, QK8_1)
    amax = np.abs(xb).max(axis=-1)
    d = amax / F32(127)
    id = safe_div(F32(1), d)
    qs = roundf_c(xb * id[..., None]).astype(np.int8)
    s = qs.astype(np.int32).sum(axis=-1).astype(np.float32) * d
    out = np.empty(xb.shape[:-1], dtype=BLOCK_Q8_1)
    out["d"] = fp32_to_fp16(d)
    out["s"] = fp32_to_fp16(s)
    out["qs"] = qs
    return out


def dequantize_q8_1(blocks: np.ndarray) -> np.ndarray:
    return dq.dequant_q8_1(np, blocks["d"], blocks["qs"])


# ------------------------------------------------------- imatrix variants
#
# The reference's chunk quantizers accept an importance row
# (quantize_q4_0(src, dst, nrow, n_per_row, quant_weights),
# src/ggml-quants.c:1893-2089): the block-32 types switch to the weighted
# scale searches make_qx_quants / make_qkx3_quants with
# weight[j] = qw[j] * sqrtf(sigma2 + x[j]^2), sigma2 taken over the WHOLE
# row (not per block). Row-vectorized, bit-exact vs the compiled C
# reference (tests/test_imatrix_oracle.py). Q8_0 ignores the weights
# upstream (src/ggml-quants.c:2091-2096), so it has no variant here.

def _imatrix_blocks(x: np.ndarray, quant_weights: np.ndarray, qk: int):
    """(xb (R*nb, qk) blocks, weight (R*nb, qk)) with per-ROW sigma2."""
    from .numerics import seq_sum

    x = np.ascontiguousarray(x, dtype=np.float32)
    n = x.shape[-1]
    qw = np.ascontiguousarray(quant_weights, dtype=np.float32).reshape(-1)
    assert qw.size == n and n % qk == 0, (qw.shape, x.shape)
    rows = x.reshape(-1, n)
    sigma2 = seq_sum(rows * rows) / F32(n)  # per row, over n_per_row
    nb = n // qk
    xb = rows.reshape(-1, qk)
    qb = np.tile(qw.reshape(nb, qk), (rows.shape[0], 1))
    weight = (qb * np.sqrt(np.repeat(sigma2, nb)[:, None] + xb * xb)
              ).astype(np.float32)
    return xb, weight


def quantize_q4_0_imatrix(x: np.ndarray, quant_weights: np.ndarray) -> np.ndarray:
    """ref: quantize_row_q4_0_impl src/ggml-quants.c:1893-1918."""
    from .kquants import make_qx_quants

    xb, weight = _imatrix_blocks(x, quant_weights, QK4_0)
    d, L = make_qx_quants(xb, 8, weight)  # L in [0, 15]
    out = np.empty(xb.shape[0], dtype=BLOCK_Q4_0)
    out["d"] = fp32_to_fp16(d)
    Lu = L.astype(np.uint8)
    out["qs"] = Lu[:, :16] | (Lu[:, 16:] << 4)
    return out.reshape(np.asarray(x).shape[:-1] + (np.asarray(x).shape[-1] // QK4_0,))


def quantize_q4_1_imatrix(x: np.ndarray, quant_weights: np.ndarray) -> np.ndarray:
    """ref: quantize_row_q4_1_impl src/ggml-quants.c:1935-1964."""
    from .kquants import make_qkx2_quants

    xb, weight = _imatrix_blocks(x, quant_weights, QK4_0)
    d, the_min, L = make_qkx2_quants(xb, weight, 15, -0.9, 0.05, 36, False)
    out = np.empty(xb.shape[0], dtype=BLOCK_Q4_1)
    out["d"] = fp32_to_fp16(d)
    out["m"] = fp32_to_fp16(-the_min)
    Lu = L.astype(np.uint8)
    out["qs"] = Lu[:, :16] | (Lu[:, 16:] << 4)
    return out.reshape(np.asarray(x).shape[:-1] + (np.asarray(x).shape[-1] // QK4_0,))


def quantize_q5_0_imatrix(x: np.ndarray, quant_weights: np.ndarray) -> np.ndarray:
    """ref: quantize_row_q5_0_impl src/ggml-quants.c:1982-2021."""
    from .kquants import make_qx_quants

    xb, weight = _imatrix_blocks(x, quant_weights, QK5_0)
    d, L = make_qx_quants(xb, 16, weight)  # L in [0, 31]
    out = np.empty(xb.shape[0], dtype=BLOCK_Q5_0)
    out["d"] = fp32_to_fp16(d)
    Lu = L.astype(np.uint8)
    out["qs"] = (Lu[:, :16] & 0x0F) | ((Lu[:, 16:] & 0x0F) << 4)
    out["qh"] = _pack_qh(Lu)
    return out.reshape(np.asarray(x).shape[:-1] + (np.asarray(x).shape[-1] // QK5_0,))


def quantize_q5_1_imatrix(x: np.ndarray, quant_weights: np.ndarray) -> np.ndarray:
    """ref: quantize_row_q5_1_impl src/ggml-quants.c:2036-2073."""
    from .kquants import make_qkx2_quants

    xb, weight = _imatrix_blocks(x, quant_weights, QK5_0)
    d, the_min, L = make_qkx2_quants(xb, weight, 31, -0.9, 0.05, 36, False)
    out = np.empty(xb.shape[0], dtype=BLOCK_Q5_1)
    out["d"] = fp32_to_fp16(d)
    out["m"] = fp32_to_fp16(-the_min)
    Lu = L.astype(np.uint8)
    out["qs"] = (Lu[:, :16] & 0x0F) | ((Lu[:, 16:] & 0x0F) << 4)
    out["qh"] = _pack_qh(Lu)
    return out.reshape(np.asarray(x).shape[:-1] + (np.asarray(x).shape[-1] // QK5_0,))
