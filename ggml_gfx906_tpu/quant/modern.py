"""MXFP4, ternary (TQ1_0/TQ2_0) and IQ4 non-linear codecs.

Bit-exact vectorized re-derivations of the reference algorithms
(behavioral spec, not a translation):
  - MXFP4: src/ggml-quants.c:260-306 (e8m0 shared scale + e2m1 codebook
    nearest-value search), dequant :417-432; e8m0 helpers
    src/ggml-impl.h:430-470; codebook src/ggml-common.h:1094.
  - TQ1_0 / TQ2_0: src/ggml-quants.c:2103-2270 (ternary, base-3 packed
    5-per-byte resp. 2-bit); block structs src/ggml-common.h:238-256.
  - IQ4_NL / IQ4_XS: src/ggml-quants.c:4638-4812
    (quantize_row_iq4_nl_impl — weighted codebook scale search, optional
    imatrix weights, 6-bit super-scales for the XS variant); codebook
    src/ggml-common.h:1088.

All row-batched: x (..., K) processed per 32/256-element block with
sequential-f32 accumulation (seq_sum) where the C code accumulates
scalars, so wire bytes match the compiled reference byte-for-byte
(enforced by tests/test_c_oracle.py).
"""
from __future__ import annotations

import numpy as np

from .numerics import (
    F32,
    fp16_round,
    fp32_to_fp16,
    fp16_to_fp32,
    nearest_int,
    seq_sum,
    signed_absmax,
)
from .types import (
    BLOCK_IQ4_NL,
    BLOCK_IQ4_XS,
    BLOCK_MXFP4,
    BLOCK_TQ1_0,
    BLOCK_TQ2_0,
    GROUP_MAX_EPS,
    QK_K,
    QK_MXFP4,
    QK4_NL,
)

# e2m1 values doubled (OCP MX spec), low 8 = positives, high 8 = negatives
KVALUES_MXFP4 = np.array([0, 1, 2, 3, 4, 6, 8, 12,
                          0, -1, -2, -3, -4, -6, -8, -12], dtype=np.int8)
# non-linear 4-bit codebook, ascending
KVALUES_IQ4NL = np.array([-127, -104, -83, -65, -49, -35, -22, -10,
                          1, 13, 25, 38, 53, 69, 89, 113], dtype=np.int8)


# ------------------------------------------------------------------ MXFP4

def e8m0_to_fp32_half(e: np.ndarray) -> np.ndarray:
    """0.5 * 2^(e-127) with the reference's denormal patterns for e<2."""
    e = e.astype(np.uint32)
    bits = np.where(e < 2, np.uint32(0x00200000) << e, (e - 1) << np.uint32(23))
    return bits.astype(np.uint32).view(np.float32)


def quantize_mxfp4(x: np.ndarray) -> np.ndarray:
    orig = x.shape
    xb = x.astype(F32).reshape(-1, QK_MXFP4)
    amax = np.max(np.abs(xb), axis=-1)
    # C: (uint8_t)(floorf(log2f(amax)) - 2 + 127); float->u8 cast truncates
    # to int and keeps the low byte
    with np.errstate(divide="ignore"):
        ef = np.floor(np.log2(amax)) - F32(2) + F32(127)
    e = np.where(amax > 0, np.trunc(np.where(amax > 0, ef, 0)).astype(np.int64) & 0xFF,
                 0).astype(np.uint8)
    d = e8m0_to_fp32_half(e)
    # nearest codebook value, first index on ties (strict < in the C scan)
    err = np.abs(KVALUES_MXFP4.astype(F32)[None, None, :] * d[:, None, None]
                 - xb[:, :, None])
    idx = np.argmin(err, axis=-1).astype(np.uint8)
    lo, hi = idx[:, :QK_MXFP4 // 2], idx[:, QK_MXFP4 // 2:]
    out = np.zeros(xb.shape[0], dtype=BLOCK_MXFP4)
    out["e"] = e
    out["qs"] = lo | (hi << 4)
    return out.reshape(*orig[:-1], orig[-1] // QK_MXFP4)


def dequantize_mxfp4(blocks: np.ndarray) -> np.ndarray:
    d = e8m0_to_fp32_half(blocks["e"])[..., None]
    qs = blocks["qs"]
    lo = KVALUES_MXFP4[qs & 0xF].astype(F32)
    hi = KVALUES_MXFP4[qs >> 4].astype(F32)
    y = np.concatenate([lo * d, hi * d], axis=-1)
    return y.reshape(*blocks.shape[:-1], blocks.shape[-1] * QK_MXFP4)


# ---------------------------------------------------------------- ternary

def _tq_trits(xb: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per 256-block: d = amax (unrounded for id), trits in {0,1,2}."""
    amax = np.max(np.abs(xb), axis=-1)
    inv = np.where(amax != 0, F32(1) / np.where(amax != 0, amax, 1), F32(0))
    # lroundf: round half away from zero
    t = xb * inv[:, None]
    xi = (np.sign(t) * np.floor(np.abs(t) + F32(0.5))).astype(np.int32) + 1
    return amax, xi.astype(np.uint16)


def quantize_tq1_0(x: np.ndarray) -> np.ndarray:
    orig = x.shape
    xb = x.astype(F32).reshape(-1, QK_K)
    d, xi = _tq_trits(xb)
    nb = xb.shape[0]
    out = np.zeros(nb, dtype=BLOCK_TQ1_0)
    out["d"] = fp32_to_fp16(d)

    def pack5(seg):  # (nb, 5, w) base-3 digits n=0..4 -> (nb, w) bytes
        q = np.zeros((nb, seg.shape[2]), dtype=np.uint16)
        for n in range(5):
            q = q * 3 + seg[:, n]
        return ((q * 256 + 242) // 243).astype(np.uint8)

    # first 160 elements: 32-byte stride, element m + n*32
    out["qs"][:, :32] = pack5(xi[:, :160].reshape(nb, 5, 32))
    # next 80: 16-byte stride
    out["qs"][:, 32:48] = pack5(xi[:, 160:240].reshape(nb, 5, 16))
    # last 16: 4 per byte, shifted to the most significant trits
    seg = xi[:, 240:256].reshape(nb, 4, 4)
    q = np.zeros((nb, 4), dtype=np.uint16)
    for n in range(4):
        q = q * 3 + seg[:, n]
    q = q * 3
    out["qh"] = ((q * 256 + 242) // 243).astype(np.uint8)
    return out.reshape(*orig[:-1], orig[-1] // QK_K)


_POW3 = np.array([1, 3, 9, 27, 81, 243], dtype=np.uint16)


def _unpack5(qbytes: np.ndarray, ntrits: int) -> np.ndarray:
    """bytes (nb, w) -> digits (nb, ntrits, w) in {0,1,2} (ref pow3 trick)."""
    outs = []
    for n in range(ntrits):
        q = (qbytes.astype(np.uint16) * _POW3[n]) & 0xFF  # uint8 wrap
        outs.append(((q * 3) >> 8).astype(np.int16))
    return np.stack(outs, axis=1)


def dequantize_tq1_0(blocks: np.ndarray) -> np.ndarray:
    shape = blocks.shape
    b = blocks.reshape(-1)
    d = fp16_to_fp32(b["d"])[:, None]
    y = np.empty((b.shape[0], QK_K), dtype=F32)
    y[:, :160] = (_unpack5(b["qs"][:, :32], 5).reshape(-1, 160) - 1) * d
    y[:, 160:240] = (_unpack5(b["qs"][:, 32:48], 5).reshape(-1, 80) - 1) * d
    y[:, 240:256] = (_unpack5(b["qh"], 4).reshape(-1, 16) - 1) * d
    return y.reshape(*shape[:-1], shape[-1] * QK_K)


def quantize_tq2_0(x: np.ndarray) -> np.ndarray:
    orig = x.shape
    xb = x.astype(F32).reshape(-1, QK_K)
    d, xi = _tq_trits(xb)
    nb = xb.shape[0]
    out = np.zeros(nb, dtype=BLOCK_TQ2_0)
    out["d"] = fp32_to_fp16(d)
    seg = (xi & 3).reshape(nb, 2, 4, 32).astype(np.uint8)  # (nb, j, n, m)
    qs = np.zeros((nb, 2, 32), dtype=np.uint8)
    for n in range(4):
        qs |= seg[:, :, n] << (2 * n)
    out["qs"] = qs.reshape(nb, 64)
    return out.reshape(*orig[:-1], orig[-1] // QK_K)


def dequantize_tq2_0(blocks: np.ndarray) -> np.ndarray:
    shape = blocks.shape
    b = blocks.reshape(-1)
    d = fp16_to_fp32(b["d"])[:, None, None, None]
    qs = b["qs"].reshape(-1, 2, 1, 32)
    l = np.arange(4, dtype=np.uint8)[None, None, :, None]
    vals = ((qs >> (2 * l)) & 3).astype(np.int16) - 1
    return (vals * d).astype(F32).reshape(*shape[:-1], shape[-1] * QK_K)


# ------------------------------------------------------------ IQ4 family

def best_index_iq4nl(x: np.ndarray) -> np.ndarray:
    """Vectorized best_index_int8 over the ascending IQ4NL codebook
    (nearest value, ties to the upper index — src/ggml-quants.c:24-33)."""
    vals = KVALUES_IQ4NL.astype(F32)
    mu = np.searchsorted(vals, x, side="right").astype(np.int32)
    mu = np.clip(mu, 1, 15)
    lo, hi = vals[mu - 1], vals[mu]
    idx = np.where((x - lo) < (hi - x), mu - 1, mu)
    idx = np.where(x <= vals[0], 0, idx)
    idx = np.where(x >= vals[15], 15, idx)
    return idx.astype(np.uint8)


def _iq4_search_block(xb, weight, ntry):
    """Per-block scale search (xb (R, B)): returns (scales, L_first).

    Mirrors quantize_row_iq4_nl_impl's inner loop: initial codebook fit,
    LS refit d = Σw·q·x / Σw·q², then ntry grid restarts keeping the best
    d by the Σ(w·q·x)²/Σw·q² objective. L is NOT refit inside the restarts
    (the caller requantizes with the final scale where the format needs it).
    """
    amax = np.max(np.abs(xb), axis=-1)
    smax = signed_absmax(xb)
    dead = amax < GROUP_MAX_EPS
    safe_max = np.where(dead, 1, smax)
    v0 = F32(KVALUES_IQ4NL[0])  # -127
    d0 = (-safe_max / v0) if ntry > 0 else (safe_max / v0)
    id0 = F32(1) / d0
    L = best_index_iq4nl(id0[:, None] * xb)
    q = KVALUES_IQ4NL.astype(F32)[L]
    sumqx = seq_sum((weight * q) * xb)
    sumq2 = seq_sum((weight * q) * q)
    with np.errstate(divide="ignore", invalid="ignore"):
        d = (sumqx / sumq2).astype(F32)
    best = d * sumqx
    for itry in range(-ntry, ntry + 1):
        idt = F32(itry - 127) / safe_max
        Lt = best_index_iq4nl(idt[:, None] * xb)
        qt = KVALUES_IQ4NL.astype(F32)[Lt]
        sqx = seq_sum((weight * qt) * xb)
        sq2 = seq_sum((weight * qt) * qt)
        with np.errstate(divide="ignore", invalid="ignore"):
            better = (sq2 > 0) & (sqx * sqx > best * sq2)
            d = np.where(better, (sqx / sq2).astype(F32), d)
        best = np.where(better, d * sqx, best) if ntry > 0 else best
    scales = np.where(dead, F32(0), d).astype(F32)
    return scales, L, dead


def quantize_iq4_nl(x: np.ndarray, quant_weights: np.ndarray | None = None
                    ) -> np.ndarray:
    """Single-scale 32-blocks. No imatrix → the _ref path (ntry=-1, L kept
    from the initial fit); with imatrix → the chunk path (ntry=7, refit L
    with the final scale). ref :4749-4786."""
    orig = x.shape
    xb = x.astype(F32).reshape(-1, QK4_NL)
    ntry = -1 if quant_weights is None else 7
    if quant_weights is None:
        weight = xb * xb
    else:
        qw = np.broadcast_to(np.asarray(quant_weights, F32).reshape(-1, QK4_NL)
                             if quant_weights.size == xb.size else
                             np.asarray(quant_weights, F32)[None, :], xb.shape)
        sigma2 = (F32(2) / QK4_NL) * seq_sum(xb * xb)
        weight = qw * np.sqrt(sigma2[:, None] + xb * xb)
    scales, L, dead = _iq4_search_block(xb, weight, ntry)
    if ntry > 0:
        inv = np.where(scales != 0, F32(1) / np.where(scales != 0, scales, 1),
                       F32(0))
        L = best_index_iq4nl(inv[:, None] * xb)
    L = np.where(dead[:, None], best_index_iq4nl(np.zeros_like(xb)), L)
    out = np.zeros(xb.shape[0], dtype=BLOCK_IQ4_NL)
    out["d"] = fp32_to_fp16(scales)
    out["qs"] = L[:, :16] | (L[:, 16:] << 4)
    return out.reshape(*orig[:-1], orig[-1] // QK4_NL)


def dequantize_iq4_nl(blocks: np.ndarray) -> np.ndarray:
    d = fp16_to_fp32(blocks["d"])[..., None]
    qs = blocks["qs"]
    lo = KVALUES_IQ4NL[qs & 0xF].astype(F32)
    hi = KVALUES_IQ4NL[qs >> 4].astype(F32)
    y = np.concatenate([lo * d, hi * d], axis=-1)
    return y.reshape(*blocks.shape[:-1], blocks.shape[-1] * QK4_NL)


def quantize_iq4_xs(x: np.ndarray, quant_weights: np.ndarray | None = None
                    ) -> np.ndarray:
    """256-superblocks of 32-blocks with 6-bit super-scales (ref :4787-4812;
    both the ref entry and the chunk API use ntry=7)."""
    orig = x.shape
    xs = x.astype(F32).reshape(-1, QK_K)          # (R, 256)
    R = xs.shape[0]
    xb = xs.reshape(R * 8, 32)
    sigma2 = (F32(2) / QK_K) * seq_sum(xs * xs)   # per superblock
    if quant_weights is None:
        weight = xb * xb
    else:
        qw = np.broadcast_to(np.asarray(quant_weights, F32).reshape(-1, QK_K)
                             if quant_weights.size == xs.size else
                             np.asarray(quant_weights, F32)[None, :], xs.shape)
        weight = (qw.reshape(R * 8, 32)
                  * np.sqrt(np.repeat(sigma2, 8)[:, None] + xb * xb))
    scales, _, _ = _iq4_search_block(xb, weight, ntry=7)
    scales = scales.reshape(R, 8)
    # super-scale: signed absmax of the block scales (strict > keeps first)
    max_scale = signed_absmax(scales)
    d = (-max_scale / F32(32)).astype(F32)
    inv_d = np.where(d != 0, F32(1) / np.where(d != 0, d, 1), F32(0))
    l = np.clip(nearest_int(inv_d[:, None] * scales), -32, 31)
    dl = d[:, None] * l.astype(F32)
    idl = np.where(dl != 0, F32(1) / np.where(dl != 0, dl, 1), F32(0))
    L = best_index_iq4nl(idl.reshape(R * 8, 1) * xb).reshape(R, 8, 32)
    ls = (l + 32).astype(np.uint16)
    out = np.zeros(R, dtype=BLOCK_IQ4_XS)
    out["d"] = fp32_to_fp16(d)
    out["scales_l"] = (ls[:, 0::2] & 0xF | ((ls[:, 1::2] & 0xF) << 4)).astype(np.uint8)
    sh = np.zeros(R, dtype=np.uint16)
    for ib in range(8):
        sh |= ((ls[:, ib] >> 4) & 3) << np.uint16(2 * ib)
    out["scales_h"] = sh
    Lr = L.reshape(R, 8, 2, 16)
    out["qs"] = (Lr[:, :, 0] | (Lr[:, :, 1] << 4)).reshape(R, 128)
    return out.reshape(*orig[:-1], orig[-1] // QK_K)


def dequantize_iq4_xs(blocks: np.ndarray) -> np.ndarray:
    shape = blocks.shape
    b = blocks.reshape(-1)
    d = fp16_to_fp32(b["d"])
    ib = np.arange(8)
    ls_l = (b["scales_l"][:, ib // 2] >> (4 * (ib % 2))[None, :]) & 0xF
    ls_h = (b["scales_h"][:, None].astype(np.uint32) >> (2 * ib)[None, :]) & 3
    ls = (ls_l | (ls_h << 4)).astype(np.int32)
    dl = d[:, None] * (ls - 32).astype(F32)      # (nb, 8)
    qs = b["qs"].reshape(-1, 8, 16)
    lo = KVALUES_IQ4NL[qs & 0xF].astype(F32)
    hi = KVALUES_IQ4NL[qs >> 4].astype(F32)
    y = np.concatenate([lo, hi], axis=-1) * dl[:, :, None]
    return y.reshape(*shape[:-1], shape[-1] * QK_K)
