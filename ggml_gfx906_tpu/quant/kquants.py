"""K-quant superblock codecs: Q2_K, Q3_K, Q4_K, Q5_K, Q6_K, Q8_K (QK_K=256).

Vectorized numpy implementations of the reference scalar algorithms
(ref: src/ggml-quants.c — quantize_row_q2_K_ref:714, q3_K:1052, q4_K:1280,
q5_K:1467, q6_K:1692, q8_K:2555; helpers make_qx_quants:451,
make_q3_quants:520, make_qkx2_quants:622, get_scale_min_k4:703).

Both quantization and dequantization are bit-exact w.r.t. the C reference
(validated during development against a compiled oracle of ggml-quants.c on
cosine + gaussian + zero inputs): float accumulations replicate C's sequential
left-to-right order (seq_sum), int→float promotions stay in float32, and the
running-min semantics of the affine scale search are preserved. Round-trip
error is additionally bounded by the reference thresholds
(tests/test_quantize_fns.py, ref tests/test-quantize-fns.cpp:17-25).
"""
from __future__ import annotations

import numpy as np

from . import dequant_math as dqm
from .numerics import (
    F32,
    seq_sum,
    fp16_to_fp32,
    fp32_to_fp16,
    nearest_int,
    signed_absmax,
)
from .types import (
    BLOCK_Q2_K,
    BLOCK_Q3_K,
    BLOCK_Q4_K,
    BLOCK_Q5_K,
    BLOCK_Q6_K,
    BLOCK_Q8_K,
    GROUP_MAX_EPS,
    QK_K,
)

_ERR = dict(divide="ignore", invalid="ignore", over="ignore")


def _rows(x: np.ndarray) -> np.ndarray:
    x = np.ascontiguousarray(x, dtype=np.float32)
    assert x.shape[-1] % QK_K == 0, x.shape
    return x.reshape(-1, QK_K)


# ------------------------------------------------------------------ helpers

def make_qx_quants(
    x: np.ndarray, nmax: int, weights: np.ndarray | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """Weighted scale search, rmse_type=1 (w = weights, or x^2 when None).

    x: (R, n) f32; weights: optional (R, n) f32 (the imatrix-derived qw of
    the reference's `const float * qw` argument).
    Returns (scale (R,), L (R, n) int32 in [0, 2*nmax-1]).
    ref: make_qx_quants src/ggml-quants.c:451-518.
    """
    R, n = x.shape
    mx = signed_absmax(x)
    amax = np.abs(mx)
    dead = amax < GROUP_MAX_EPS
    with np.errstate(**_ERR):
        iscale = F32(-nmax) / mx
        l = np.clip(nearest_int(iscale[:, None] * x), -nmax, nmax - 1)
        lf = l.astype(np.float32)
        w = (x * x) if weights is None else weights
        sumlx = seq_sum(w * x * lf)
        suml2 = seq_sum(w * lf * lf)
        scale = np.where(suml2 != 0, sumlx / suml2, F32(0))
        best = scale * sumlx
        L = l.copy()
        for is_ in range(-9, 10):
            if is_ == 0:
                continue
            isc = -(F32(nmax) + F32(0.1) * F32(is_)) / mx
            l2 = np.clip(nearest_int(isc[:, None] * x), -nmax, nmax - 1)
            l2f = l2.astype(np.float32)
            slx = seq_sum(w * x * l2f)
            sl2 = seq_sum(w * l2f * l2f)
            upd = (sl2 > 0) & (slx * slx > best * sl2)
            L[upd] = l2[upd]
            scale = np.where(upd, slx / np.where(upd, sl2, 1), scale)
            best = np.where(upd, scale * slx, best)
    L = L + nmax
    L[dead] = 0
    scale = np.where(dead, F32(0), scale)
    return scale.astype(np.float32), L


def make_q3_quants(x: np.ndarray, nmax: int) -> tuple[np.ndarray, np.ndarray]:
    """Scale search with per-element coordinate descent (do_rmse=true path).

    x: (R, n). Returns (scale (R,), L (R, n) int32 in [0, 2*nmax-1]).
    ref: make_q3_quants src/ggml-quants.c:520-577.
    """
    R, n = x.shape
    mx = signed_absmax(x)
    amax = np.abs(mx)
    dead = amax < GROUP_MAX_EPS
    with np.errstate(**_ERR):
        iscale = F32(-nmax) / mx
        L = np.clip(nearest_int(iscale[:, None] * x), -nmax, nmax - 1)
        w = x * x
        Lf = L.astype(np.float32)
        sumlx = seq_sum(w * x * Lf)
        suml2 = seq_sum(w * Lf * Lf)
        # 5 sweeps of sequential per-element improvement (order matters: the
        # running sums incorporate earlier updates within a sweep).
        for _ in range(5):
            for i in range(n):
                wi = w[:, i]
                xi = x[:, i]
                li = L[:, i].astype(np.float32)
                slx = sumlx - wi * xi * li
                sl2 = suml2 - wi * li * li
                new_l = np.clip(nearest_int(xi * sl2 / np.where(slx > 0, slx, 1)),
                                -nmax, nmax - 1)
                new_lf = new_l.astype(np.float32)
                cand_slx = slx + wi * xi * new_lf
                cand_sl2 = sl2 + wi * new_lf * new_lf
                ok = (
                    (slx > 0)
                    & (new_l != L[:, i])
                    & (cand_sl2 > 0)
                    & (cand_slx * cand_slx * suml2 > sumlx * sumlx * cand_sl2)
                )
                L[:, i] = np.where(ok, new_l, L[:, i])
                sumlx = np.where(ok, cand_slx, sumlx)
                suml2 = np.where(ok, cand_sl2, suml2)
        scale = np.where(suml2 > 0, sumlx / np.where(suml2 > 0, suml2, 1), F32(0))
    L = L + nmax
    L[dead] = 0
    scale = np.where(dead, F32(0), scale)
    return scale.astype(np.float32), L


def make_qkx2_quants(
    x: np.ndarray,
    weights: np.ndarray,
    nmax: int,
    rmin: float,
    rdelta: float,
    nstep: int,
    use_mad: bool,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Affine (scale+min) grid search. x, weights: (R, n).

    Returns (scale (R,), the_min (R,), L (R, n) int32 in [0, nmax]).
    ref: make_qkx2_quants src/ggml-quants.c:622-701.
    """
    R, n = x.shape
    mn = x.min(-1)
    mx = x.max(-1)
    sum_w = seq_sum(weights)
    sum_x = seq_sum(weights * x)
    mn = np.minimum(mn, F32(0))
    dead = mx == mn
    with np.errstate(**_ERR):
        span = np.where(dead, F32(1), mx - mn)  # guarded; dead rows masked at end
        iscale = F32(nmax) / span
        scale = 1 / iscale
        l = np.clip(nearest_int(iscale[:, None] * (x - mn[:, None])), 0, nmax)
        L = l.copy()
        diff = scale[:, None] * l.astype(np.float32) + mn[:, None] - x
        diff = np.abs(diff) if use_mad else diff * diff
        best_error = seq_sum(weights * diff)
        for is_ in range(nstep + 1):
            # `min` is a *running* variable in the reference: a winning
            # candidate's min feeds the next step's iscale and quant grid
            span = np.where(dead, F32(1), mx - mn)
            isc = (F32(rmin) + F32(rdelta) * F32(is_) + F32(nmax)) / span
            laux = np.clip(nearest_int(isc[:, None] * (x - mn[:, None])), 0, nmax)
            lf = laux.astype(np.float32)
            sum_l = seq_sum(weights * lf)
            sum_l2 = seq_sum(weights * lf * lf)
            sum_xl = seq_sum(weights * lf * x)
            D = sum_w * sum_l2 - sum_l * sum_l
            this_scale = (sum_w * sum_xl - sum_x * sum_l) / np.where(D > 0, D, 1)
            this_min = (sum_l2 * sum_x - sum_l * sum_xl) / np.where(D > 0, D, 1)
            pos = this_min > 0
            this_min = np.where(pos, F32(0), this_min)
            this_scale = np.where(
                pos, sum_xl / np.where(sum_l2 != 0, sum_l2, 1), this_scale
            )
            diff = this_scale[:, None] * lf + this_min[:, None] - x
            diff = np.abs(diff) if use_mad else diff * diff
            cur_error = seq_sum(weights * diff)
            upd = (D > 0) & (cur_error < best_error)
            L[upd] = laux[upd]
            best_error = np.where(upd, cur_error, best_error)
            scale = np.where(upd, this_scale, scale)
            mn = np.where(upd, this_min, mn)
    L[dead] = 0
    scale = np.where(dead, F32(0), scale)
    the_min = -mn
    the_min = np.where(dead, -np.minimum(x.min(-1), F32(0)), the_min)
    return scale.astype(np.float32), the_min.astype(np.float32), L


def make_qp_quants(
    x: np.ndarray, weight: np.ndarray, nmax: int
) -> tuple[np.ndarray, np.ndarray]:
    """Weighted non-negative scale fit: candidate sweep + up-to-5 greedy
    coordinate-descent sweeps. Row-vectorized version of the per-vector
    helper the reference uses for super-block scale/min codes.

    x, weight: (R, n) f32, x >= 0. Returns (scale (R,), L (R, n) int32 in
    [0, nmax]). ref: make_qp_quants src/ggml-quants.c:899-970.
    """
    R, n = x.shape
    maxv = x.max(-1)
    dead = maxv < GROUP_MAX_EPS
    with np.errstate(**_ERR):
        safe_max = np.where(dead, F32(1), maxv)
        iscale = F32(nmax) / safe_max
        l0 = nearest_int(iscale[:, None] * x)  # unclamped in the reference
        diff = x - ((1 / iscale)[:, None] * l0.astype(np.float32))
        best_mse = seq_sum(weight * diff * diff)
        for is_ in range(-4, 5):
            if is_ == 0:
                continue
            isc = (F32(0.1) * F32(is_) + F32(nmax)) / safe_max
            l = np.minimum(nearest_int(isc[:, None] * x), nmax)
            diff = x - ((1 / isc)[:, None] * l.astype(np.float32))
            mse = seq_sum(weight * diff * diff)
            upd = mse < best_mse
            best_mse = np.where(upd, mse, best_mse)
            iscale = np.where(upd, isc, iscale)
        L = np.minimum(nearest_int(iscale[:, None] * x), nmax)
        Lf = L.astype(np.float32)
        sumlx = seq_sum(weight * x * Lf)
        suml2 = seq_sum(weight * Lf * Lf)
        # greedy refinement: sequential over elements (running sums carry
        # within-sweep updates, as in the reference); a row whose sweep
        # changes nothing is a fixed point, so running all 5 sweeps
        # unconditionally matches the early-break semantics.
        for _ in range(5):
            for i in range(n):
                w, xi = weight[:, i], x[:, i]
                li = L[:, i].astype(np.float32)
                slx = sumlx - w * xi * li
                sl2 = suml2 - w * li * li
                new_l = np.minimum(
                    nearest_int(xi * sl2 / np.where(slx > 0, slx, 1)), nmax)
                nf = new_l.astype(np.float32)
                cand_slx = slx + w * xi * nf
                cand_sl2 = sl2 + w * nf * nf
                ok = (
                    (slx > 0) & (sl2 > 0) & (new_l != L[:, i])
                    & (cand_slx * cand_slx * suml2 > sumlx * sumlx * cand_sl2)
                )
                L[:, i] = np.where(ok, new_l, L[:, i])
                sumlx = np.where(ok, cand_slx, sumlx)
                suml2 = np.where(ok, cand_sl2, suml2)
        scale = np.where(suml2 > 0, sumlx / np.where(suml2 > 0, suml2, 1), F32(0))
    L[dead] = 0
    scale = np.where(dead, F32(0), scale)
    return scale.astype(np.float32), L


def pack_scale_min_k4(ls: np.ndarray, lm: np.ndarray) -> np.ndarray:
    """Pack 8 6-bit scales + 8 6-bit mins into 12 bytes.
    ref: quantize_row_q4_K_ref packing src/ggml-quants.c:1312-1326."""
    nb = ls.shape[0]
    out = np.zeros((nb, 12), dtype=np.uint8)
    for j in range(8):
        s, m = ls[:, j].astype(np.uint8), lm[:, j].astype(np.uint8)
        if j < 4:
            out[:, j] = s
            out[:, j + 4] = m
        else:
            out[:, j + 4] = (s & 0xF) | ((m & 0xF) << 4)
            out[:, j - 4] |= (s >> 4) << 6
            out[:, j] |= (m >> 4) << 6
    return out


def unpack_scale_min_k4(scales: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of pack_scale_min_k4 → (sc (nb,8), m (nb,8)) uint8.
    ref: get_scale_min_k4 src/ggml-quants.c:703-711."""
    sc = np.empty(scales.shape[:-1] + (8,), dtype=np.uint8)
    m = np.empty_like(sc)
    for j in range(4):
        sc[..., j] = scales[..., j] & 63
        m[..., j] = scales[..., j + 4] & 63
    for j in range(4, 8):
        sc[..., j] = (scales[..., j + 4] & 0xF) | ((scales[..., j - 4] >> 6) << 4)
        m[..., j] = (scales[..., j + 4] >> 4) | ((scales[..., j] >> 6) << 4)
    return sc, m


def _requant_affine(
    x: np.ndarray, d_dec: np.ndarray, dm_dec: np.ndarray, L: np.ndarray, qmax: int,
    sub: int,
) -> np.ndarray:
    """Final requantization against the *decoded* scales; keeps the search L
    where the decoded scale is zero (the reference's `if (!d) continue;`)."""
    nb = x.shape[0]
    xs = x.reshape(nb, -1, sub)
    with np.errstate(**_ERR):
        l = np.clip(
            nearest_int((xs + dm_dec[..., None]) / np.where(d_dec, d_dec, 1)[..., None]),
            0,
            qmax,
        )
    keep = (d_dec == 0)[..., None]
    return np.where(keep, L.reshape(nb, -1, sub), l).reshape(nb, -1)


# ------------------------------------------------------------------ Q4_K

def quantize_q4_K(x: np.ndarray) -> np.ndarray:
    """ref: quantize_row_q4_K_ref src/ggml-quants.c:1280-1350."""
    xr = _rows(x)
    nb = xr.shape[0]
    sb = xr.reshape(nb * 8, 32)
    av_x = np.sqrt(seq_sum(sb * sb) / F32(32))
    weights = av_x[:, None] + np.abs(sb)
    scales, mins, L = make_qkx2_quants(sb, weights, 15, -1.0, 0.1, 20, False)
    scales = scales.reshape(nb, 8)
    mins = mins.reshape(nb, 8)
    L = L.reshape(nb, 256)

    max_scale = scales.max(-1) + F32(0)  # +0.0 normalizes -0.0 (C uses strict > from 0)
    max_min = mins.max(-1) + F32(0)
    inv_scale = np.where(max_scale > 0, F32(63) / np.where(max_scale > 0, max_scale, 1), F32(0))
    inv_min = np.where(max_min > 0, F32(63) / np.where(max_min > 0, max_min, 1), F32(0))
    ls = np.minimum(63, nearest_int(inv_scale[:, None] * scales)).astype(np.uint8)
    lm = np.minimum(63, nearest_int(inv_min[:, None] * mins)).astype(np.uint8)

    out = np.zeros(nb, dtype=BLOCK_Q4_K)
    out["scales"] = pack_scale_min_k4(ls, lm)
    out["d"] = fp32_to_fp16(max_scale / F32(63))
    out["dmin"] = fp32_to_fp16(max_min / F32(63))

    sc, m = unpack_scale_min_k4(out["scales"])
    d_dec = fp16_to_fp32(out["d"])[:, None] * sc.astype(np.float32)
    dm_dec = fp16_to_fp32(out["dmin"])[:, None] * m.astype(np.float32)
    L = _requant_affine(xr, d_dec, dm_dec, L, 15, 32)

    Lq = L.reshape(nb, 4, 2, 32).astype(np.uint8)  # [64-group][half][elem]
    out["qs"] = (Lq[:, :, 0, :] | (Lq[:, :, 1, :] << 4)).reshape(nb, 128)
    return out.reshape(np.asarray(x).shape[:-1] + (np.asarray(x).shape[-1] // QK_K,))


def dequantize_q4_K(blocks: np.ndarray) -> np.ndarray:
    """ref: dequantize_row_q4_K src/ggml-quants.c:1352-1374."""
    b = {k: np.ascontiguousarray(blocks[k]) for k in blocks.dtype.names}
    return dqm.dequant_q4_K(np, b["d"], b["dmin"], b["scales"], b["qs"])


# ------------------------------------------------------------------ Q5_K

def quantize_q5_K(x: np.ndarray) -> np.ndarray:
    """ref: quantize_row_q5_K_ref src/ggml-quants.c:1467-1552."""
    xr = _rows(x)
    nb = xr.shape[0]
    sb = xr.reshape(nb * 8, 32)
    av_x = np.sqrt(seq_sum(sb * sb) / F32(32))
    weights = av_x[:, None] + np.abs(sb)
    scales, mins, L = make_qkx2_quants(sb, weights, 31, -0.5, 0.1, 15, False)
    scales = scales.reshape(nb, 8)
    mins = mins.reshape(nb, 8)
    L = L.reshape(nb, 256)

    max_scale = scales.max(-1) + F32(0)  # +0.0 normalizes -0.0 (C uses strict > from 0)
    max_min = mins.max(-1) + F32(0)
    inv_scale = np.where(max_scale > 0, F32(63) / np.where(max_scale > 0, max_scale, 1), F32(0))
    inv_min = np.where(max_min > 0, F32(63) / np.where(max_min > 0, max_min, 1), F32(0))
    ls = np.minimum(63, nearest_int(inv_scale[:, None] * scales)).astype(np.uint8)
    lm = np.minimum(63, nearest_int(inv_min[:, None] * mins)).astype(np.uint8)

    out = np.zeros(nb, dtype=BLOCK_Q5_K)
    out["scales"] = pack_scale_min_k4(ls, lm)
    out["d"] = fp32_to_fp16(max_scale / F32(63))
    out["dmin"] = fp32_to_fp16(max_min / F32(63))

    sc, m = unpack_scale_min_k4(out["scales"])
    d_dec = fp16_to_fp32(out["d"])[:, None] * sc.astype(np.float32)
    dm_dec = fp16_to_fp32(out["dmin"])[:, None] * m.astype(np.float32)
    L = _requant_affine(xr, d_dec, dm_dec, L, 31, 32)

    # pack: 4 groups of 64; within group g, halves l1=L[g,0,:], l2=L[g,1,:];
    # high bits go to qh bits 2g (l1) and 2g+1 (l2). ref :1529-1546.
    Lg = L.reshape(nb, 4, 2, 32)
    hi = (Lg > 15).astype(np.uint8)
    lo = (Lg - 16 * hi).astype(np.uint8)
    qh = np.zeros((nb, 32), dtype=np.uint8)
    for g in range(4):
        qh |= hi[:, g, 0, :] << (2 * g)
        qh |= hi[:, g, 1, :] << (2 * g + 1)
    out["qh"] = qh
    out["qs"] = (lo[:, :, 0, :] | (lo[:, :, 1, :] << 4)).reshape(nb, 128)
    return out.reshape(np.asarray(x).shape[:-1] + (np.asarray(x).shape[-1] // QK_K,))


def dequantize_q5_K(blocks: np.ndarray) -> np.ndarray:
    """ref: dequantize_row_q5_K src/ggml-quants.c:1554-1579."""
    b = {k: np.ascontiguousarray(blocks[k]) for k in blocks.dtype.names}
    return dqm.dequant_q5_K(np, b["d"], b["dmin"], b["scales"], b["qh"], b["qs"])


# ------------------------------------------------------------------ Q6_K

def quantize_q6_K(x: np.ndarray) -> np.ndarray:
    """ref: quantize_row_q6_K_ref src/ggml-quants.c:1692-1760."""
    return _quantize_q6_K_rows(x, _rows(x), None)


def _quantize_q6_K_rows(x, xr, weights16) -> np.ndarray:
    """Shared core: weights16 is None (unweighted ref path) or the raw
    importance row per 16-group ((R*16, 16), imatrix path :1793-1878)."""
    nb = xr.shape[0]
    sb = xr.reshape(nb * 16, 16)
    scales, L = make_qx_quants(sb, 32, weights16)
    scales = scales.reshape(nb, 16)
    L = L.reshape(nb, 256)

    # signed value with the largest |scale| (first occurrence)
    max_scale = signed_absmax(scales)
    max_abs = np.abs(max_scale)
    dead = max_abs < GROUP_MAX_EPS
    with np.errstate(**_ERR):
        iscale = F32(-128) / np.where(dead, F32(1), max_scale)
        d16 = fp32_to_fp16(1 / iscale)
        sc8 = np.minimum(127, nearest_int(iscale[:, None] * scales)).astype(np.int8)
        d_dec = fp16_to_fp32(d16)[:, None] * sc8.astype(np.float32)  # (nb,16)
        xs = xr.reshape(nb, 16, 16)
        l = np.clip(nearest_int(xs / np.where(d_dec, d_dec, 1)[..., None]), -32, 31) + 32
    keep = (d_dec == 0)[..., None]
    L = np.where(keep, L.reshape(nb, 16, 16), l).reshape(nb, 256)

    out = np.zeros(nb, dtype=BLOCK_Q6_K)
    out["d"] = np.where(dead, np.float16(0), d16)
    out["scales"] = np.where(dead[:, None], np.int8(0), sc8)
    Lh = np.where(dead[:, None], 0, L).reshape(nb, 2, 4, 32).astype(np.uint8)
    # ql: per 128-group, bytes [0:32)=q1|q3<<4, [32:64)=q2|q4<<4 (ref :1743-1755)
    ql = np.concatenate(
        [
            (Lh[:, :, 0, :] & 0xF) | ((Lh[:, :, 2, :] & 0xF) << 4),
            (Lh[:, :, 1, :] & 0xF) | ((Lh[:, :, 3, :] & 0xF) << 4),
        ],
        axis=-1,
    )
    out["ql"] = ql.reshape(nb, 128)
    qh = (
        (Lh[:, :, 0, :] >> 4)
        | ((Lh[:, :, 1, :] >> 4) << 2)
        | ((Lh[:, :, 2, :] >> 4) << 4)
        | ((Lh[:, :, 3, :] >> 4) << 6)
    )
    out["qh"] = qh.reshape(nb, 64)
    return out.reshape(np.asarray(x).shape[:-1] + (np.asarray(x).shape[-1] // QK_K,))


def dequantize_q6_K(blocks: np.ndarray) -> np.ndarray:
    """ref: dequantize_row_q6_K src/ggml-quants.c:1762-1791."""
    b = {k: np.ascontiguousarray(blocks[k]) for k in blocks.dtype.names}
    return dqm.dequant_q6_K(np, b["d"], b["ql"], b["qh"], b["scales"])


# ------------------------------------------------------------------ Q2_K

def quantize_q2_K(x: np.ndarray) -> np.ndarray:
    """ref: quantize_row_q2_K_ref src/ggml-quants.c:714-782."""
    xr = _rows(x)
    nb = xr.shape[0]
    sb = xr.reshape(nb * 16, 16)
    weights = np.abs(sb)
    scales, mins, L = make_qkx2_quants(sb, weights, 3, -0.5, 0.1, 15, True)
    scales = scales.reshape(nb, 16)
    mins = mins.reshape(nb, 16)
    L = L.reshape(nb, 256)

    q4scale = F32(15)
    max_scale = scales.max(-1) + F32(0)  # +0.0 normalizes -0.0 (C uses strict > from 0)
    max_min = mins.max(-1) + F32(0)
    sc4 = np.zeros((nb, 16), dtype=np.uint8)
    pos_s = max_scale > 0
    with np.errstate(**_ERR):
        isc = q4scale / np.where(pos_s, max_scale, 1)
        sc4 = np.where(pos_s[:, None], nearest_int(isc[:, None] * scales), 0).astype(np.uint8)
        d16 = np.where(pos_s, fp32_to_fp16(max_scale / q4scale), np.float16(0))
        pos_m = max_min > 0
        ism = q4scale / np.where(pos_m, max_min, 1)
        lm4 = np.where(pos_m[:, None], nearest_int(ism[:, None] * mins), 0).astype(np.uint8)
        dmin16 = np.where(pos_m, fp32_to_fp16(max_min / q4scale), np.float16(0))

    out = np.zeros(nb, dtype=BLOCK_Q2_K)
    out["scales"] = sc4 | (lm4 << 4)
    out["d"] = d16
    out["dmin"] = dmin16

    d_dec = fp16_to_fp32(d16)[:, None] * (out["scales"] & 0xF).astype(np.float32)
    dm_dec = fp16_to_fp32(dmin16)[:, None] * (out["scales"] >> 4).astype(np.float32)
    L = _requant_affine(xr, d_dec, dm_dec, L, 3, 16)

    Lg = L.reshape(nb, 2, 4, 32).astype(np.uint8)  # [128-group][pair][l]
    qs = Lg[:, :, 0, :] | (Lg[:, :, 1, :] << 2) | (Lg[:, :, 2, :] << 4) | (Lg[:, :, 3, :] << 6)
    out["qs"] = qs.reshape(nb, 64)
    return out.reshape(np.asarray(x).shape[:-1] + (np.asarray(x).shape[-1] // QK_K,))


def dequantize_q2_K(blocks: np.ndarray) -> np.ndarray:
    """ref: dequantize_row_q2_K src/ggml-quants.c:784-814."""
    b = {k: np.ascontiguousarray(blocks[k]) for k in blocks.dtype.names}
    return dqm.dequant_q2_K(np, b["d"], b["dmin"], b["scales"], b["qs"])


# ------------------------------------------------------------------ Q3_K

def quantize_q3_K(x: np.ndarray) -> np.ndarray:
    """ref: quantize_row_q3_K_ref src/ggml-quants.c:1052-1126."""
    xr = _rows(x)
    nb = xr.shape[0]
    sb = xr.reshape(nb * 16, 16)
    scales, L = make_q3_quants(sb, 4)
    scales = scales.reshape(nb, 16)
    L = (L - 4).reshape(nb, 256)  # back to signed [-4, 3] for the repack below

    max_scale = signed_absmax(scales)
    amax = np.abs(max_scale)
    alive = amax != 0
    with np.errstate(**_ERR):
        iscale = F32(-32) / np.where(alive, max_scale, 1)
        l6 = np.clip(nearest_int(iscale[:, None] * scales), -32, 31) + 32  # (nb,16)
        l6 = np.where(alive[:, None], l6, 0)
        d16 = np.where(alive, fp32_to_fp16(1 / iscale), np.float16(0))

    packed = np.zeros((nb, 12), dtype=np.uint8)
    for j in range(16):
        lv = l6[:, j].astype(np.uint8)
        if j < 8:
            packed[:, j] |= lv & 0xF
        else:
            packed[:, j - 8] |= (lv & 0xF) << 4
        packed[:, 8 + j % 4] |= (lv >> 4) << (2 * (j // 4))

    # decode scales back and requantize (ref :1091-1103)
    sc_dec = _unpack_q3_scales(packed).astype(np.float32)  # (nb,16), signed
    d_dec = fp16_to_fp32(d16)[:, None] * sc_dec
    xs = xr.reshape(nb, 16, 16)
    with np.errstate(**_ERR):
        l = np.clip(nearest_int(xs / np.where(d_dec, d_dec, 1)[..., None]), -4, 3) + 4
    keep = (d_dec == 0)[..., None]
    L = np.where(keep, L.reshape(nb, 16, 16) + 4, l).reshape(nb, 256)

    out = np.zeros(nb, dtype=BLOCK_Q3_K)
    out["d"] = d16
    out["scales"] = packed
    high = (L > 3).astype(np.uint8)
    Lo = (L - 4 * high).astype(np.uint8)
    # hmask: element e → byte e%32, bit e//32 (ref :1106-1117)
    hm = high.reshape(nb, 8, 32)
    bits = np.arange(8, dtype=np.uint8)[None, :, None]
    out["hmask"] = (hm << bits).sum(axis=1, dtype=np.uint8).reshape(nb, 32)
    Lg = Lo.reshape(nb, 2, 4, 32)
    qs = Lg[:, :, 0, :] | (Lg[:, :, 1, :] << 2) | (Lg[:, :, 2, :] << 4) | (Lg[:, :, 3, :] << 6)
    out["qs"] = qs.reshape(nb, 64)
    return out.reshape(np.asarray(x).shape[:-1] + (np.asarray(x).shape[-1] // QK_K,))


def _unpack_q3_scales(packed: np.ndarray) -> np.ndarray:
    """(nb, 12) → (nb, 16) int32 signed scales in [-32, 31].
    ref: scale decode in quantize_row_q3_K_ref :1091-1094 / dequant aux trick."""
    nb = packed.shape[0]
    sc = np.empty((nb, 16), dtype=np.int32)
    for j in range(16):
        low = (packed[:, j] & 0xF) if j < 8 else (packed[:, j - 8] >> 4)
        hi = (packed[:, 8 + j % 4] >> (2 * (j // 4))) & 3
        sc[:, j] = (low.astype(np.int32) | (hi.astype(np.int32) << 4)) - 32
    return sc


def dequantize_q3_K(blocks: np.ndarray) -> np.ndarray:
    """ref: dequantize_row_q3_K src/ggml-quants.c:1128-1176."""
    b = {k: np.ascontiguousarray(blocks[k]) for k in blocks.dtype.names}
    return dqm.dequant_q3_K(np, b["d"], b["hmask"], b["scales"], b["qs"])


# ------------------------------------------------------------------ Q8_K

def quantize_q8_K(x: np.ndarray) -> np.ndarray:
    """ref: quantize_row_q8_K_ref src/ggml-quants.c:2555-2593."""
    xr = _rows(x)
    nb = xr.shape[0]
    mx = signed_absmax(xr)
    amax = np.abs(mx)
    alive = amax != 0
    with np.errstate(**_ERR):
        iscale = F32(-127) / np.where(alive, mx, 1)
        v = np.minimum(127, nearest_int(iscale[:, None] * xr))
        qs = np.where(alive[:, None], v, 0).astype(np.int8)
        d = np.where(alive, 1 / iscale, F32(0)).astype(np.float32)
    out = np.zeros(nb, dtype=BLOCK_Q8_K)
    out["d"] = d
    out["qs"] = qs
    out["bsums"] = qs.reshape(nb, 16, 16).astype(np.int32).sum(-1).astype(np.int16)
    return out.reshape(np.asarray(x).shape[:-1] + (np.asarray(x).shape[-1] // QK_K,))


def dequantize_q8_K(blocks: np.ndarray) -> np.ndarray:
    """ref: dequantize_row_q8_K src/ggml-quants.c:2594-2603."""
    b = {k: np.ascontiguousarray(blocks[k]) for k in blocks.dtype.names}
    return dqm.dequant_q8_K(np, b["d"], b["qs"])


# ------------------------------------------------------- imatrix variants
#
# The reference's chunk quantizers take an optional importance row
# (`quantize_q2_K(src, dst, nrow, n_per_row, quant_weights)`,
# include/ggml.h:2406-2416): per-column activation statistics collected by
# the imatrix tool. With weights present, every type switches to a
# different, weighted scale search (quantize_row_q*_K_impl,
# src/ggml-quants.c:972-1890). These are row-vectorized ports with the same
# sequential-f32 accumulation semantics, bit-exact vs the compiled C
# reference (tests/test_imatrix_oracle.py).

def _qw_superblocks(x: np.ndarray, quant_weights: np.ndarray):
    """Align a per-row importance vector with superblock rows.

    x: (..., n) with n % QK_K == 0; quant_weights: (n,). Returns
    (xr (R, QK_K), qwr (R, QK_K)) where every tensor row reuses the same
    importance row, as in the reference chunk API."""
    xr = _rows(x)
    qw = np.ascontiguousarray(quant_weights, dtype=np.float32).reshape(-1)
    n = np.asarray(x).shape[-1]
    assert qw.size == n, (qw.shape, n)
    n_rows = xr.shape[0] * QK_K // n
    qwr = np.tile(qw.reshape(-1, QK_K), (n_rows, 1))
    return xr, qwr


def _sigma_weights(xr, qwr, sigma2, sub):
    """weight[l] = qw[l] * sqrtf(sigma2 + x[l]^2) per `sub`-wide group.

    Returns (weights (R*QK_K/sub, sub), sw (R, QK_K/sub) group sums)."""
    nb = xr.shape[0]
    g = QK_K // sub
    sb = xr.reshape(nb * g, sub)
    qsb = qwr.reshape(nb * g, sub)
    weights = (qsb * np.sqrt(np.repeat(sigma2, g)[:, None] + sb * sb)
               ).astype(np.float32)
    sw = seq_sum(weights).reshape(nb, g)
    return sb, weights, sw


def quantize_q2_K_imatrix(x: np.ndarray, quant_weights: np.ndarray) -> np.ndarray:
    """ref: quantize_row_q2_K_impl src/ggml-quants.c:972-1032."""
    xr, qwr = _qw_superblocks(x, quant_weights)
    nb = xr.shape[0]
    sigma2 = seq_sum(xr * xr) / F32(QK_K)
    sb, weights, sw = _sigma_weights(xr, qwr, sigma2, 16)
    scales, mins, L = make_qkx2_quants(sb, weights, 3, -0.9, 0.05, 36, False)
    scales = scales.reshape(nb, 16)
    mins = mins.reshape(nb, 16)
    L = L.reshape(nb, 256)

    dm, Ls = make_qp_quants(scales, sw, 15)
    mm, Lm = make_qp_quants(mins, sw, 15)
    out = np.zeros(nb, dtype=BLOCK_Q2_K)
    out["d"] = fp32_to_fp16(dm)
    out["dmin"] = fp32_to_fp16(mm)
    out["scales"] = (Ls | (Lm << 4)).astype(np.uint8)

    d_dec = fp16_to_fp32(out["d"])[:, None] * (out["scales"] & 0xF).astype(np.float32)
    dm_dec = fp16_to_fp32(out["dmin"])[:, None] * (out["scales"] >> 4).astype(np.float32)
    L = _requant_affine(xr, d_dec, dm_dec, L, 3, 16)

    Lg = L.reshape(nb, 2, 4, 32).astype(np.uint8)
    qs = Lg[:, :, 0, :] | (Lg[:, :, 1, :] << 2) | (Lg[:, :, 2, :] << 4) | (Lg[:, :, 3, :] << 6)
    out["qs"] = qs.reshape(nb, 64)
    return out.reshape(np.asarray(x).shape[:-1] + (np.asarray(x).shape[-1] // QK_K,))


def quantize_q3_K_imatrix(x: np.ndarray, quant_weights: np.ndarray) -> np.ndarray:
    """ref: quantize_row_q3_K_impl src/ggml-quants.c:1178-1260."""
    xr, qwr = _qw_superblocks(x, quant_weights)
    nb = xr.shape[0]
    sigma2 = F32(2) * seq_sum(xr * xr) / F32(QK_K)
    sb, weights, sw = _sigma_weights(xr, qwr, sigma2, 16)
    scales, L = make_qx_quants(sb, 4, weights)  # L in [0, 7]
    scales = scales.reshape(nb, 16)
    L = L.reshape(nb, 256)

    d_block, Ls = make_qx_quants(scales, 32, sw)  # Ls in [0, 63]
    packed = np.zeros((nb, 12), dtype=np.uint8)
    for j in range(16):
        lv = Ls[:, j].astype(np.uint8)
        if j < 8:
            packed[:, j] |= lv & 0xF
        else:
            packed[:, j - 8] |= (lv & 0xF) << 4
        packed[:, 8 + j % 4] |= (lv >> 4) << (2 * (j // 4))
    d16 = fp32_to_fp16(d_block)

    sc_dec = _unpack_q3_scales(packed).astype(np.float32)
    d_dec = fp16_to_fp32(d16)[:, None] * sc_dec
    xs = xr.reshape(nb, 16, 16)
    with np.errstate(**_ERR):
        l = np.clip(nearest_int(xs / np.where(d_dec, d_dec, 1)[..., None]), -4, 3) + 4
    keep = (d_dec == 0)[..., None]
    L = np.where(keep, L.reshape(nb, 16, 16), l).reshape(nb, 256)

    out = np.zeros(nb, dtype=BLOCK_Q3_K)
    out["d"] = d16
    out["scales"] = packed
    high = (L > 3).astype(np.uint8)
    Lo = (L - 4 * high).astype(np.uint8)
    hm = high.reshape(nb, 8, 32)
    bits = np.arange(8, dtype=np.uint8)[None, :, None]
    out["hmask"] = (hm << bits).sum(axis=1, dtype=np.uint8).reshape(nb, 32)
    Lg = Lo.reshape(nb, 2, 4, 32)
    qs = Lg[:, :, 0, :] | (Lg[:, :, 1, :] << 2) | (Lg[:, :, 2, :] << 4) | (Lg[:, :, 3, :] << 6)
    out["qs"] = qs.reshape(nb, 64)
    return out.reshape(np.asarray(x).shape[:-1] + (np.asarray(x).shape[-1] // QK_K,))


def _quantize_q45_K_imatrix(x, quant_weights, nmax, block_dtype):
    """Shared q4_K/q5_K imatrix path (they differ only in nmax + packing).
    ref: quantize_row_q4_K_impl :1376-1448, quantize_row_q5_K_impl :1580-1672."""
    xr, qwr = _qw_superblocks(x, quant_weights)
    nb = xr.shape[0]
    sigma2 = F32(2) * seq_sum(xr * xr) / F32(QK_K)
    sb, weights, sw = _sigma_weights(xr, qwr, sigma2, 32)
    scales, mins, L = make_qkx2_quants(sb, weights, nmax, -0.9, 0.05, 36, False)
    scales = scales.reshape(nb, 8)
    mins = mins.reshape(nb, 8)
    L = L.reshape(nb, 256)

    d_block, Ls = make_qp_quants(scales, sw, 63)
    m_block, Lm = make_qp_quants(mins, sw, 63)
    out = np.zeros(nb, dtype=block_dtype)
    out["scales"] = pack_scale_min_k4(Ls.astype(np.uint8), Lm.astype(np.uint8))
    out["d"] = fp32_to_fp16(d_block)
    out["dmin"] = fp32_to_fp16(m_block)

    sc, m = unpack_scale_min_k4(out["scales"])
    d_dec = fp16_to_fp32(out["d"])[:, None] * sc.astype(np.float32)
    dm_dec = fp16_to_fp32(out["dmin"])[:, None] * m.astype(np.float32)
    L = _requant_affine(xr, d_dec, dm_dec, L, nmax, 32)
    return out, L, nb


def quantize_q4_K_imatrix(x: np.ndarray, quant_weights: np.ndarray) -> np.ndarray:
    out, L, nb = _quantize_q45_K_imatrix(x, quant_weights, 15, BLOCK_Q4_K)
    Lq = L.reshape(nb, 4, 2, 32).astype(np.uint8)
    out["qs"] = (Lq[:, :, 0, :] | (Lq[:, :, 1, :] << 4)).reshape(nb, 128)
    return out.reshape(np.asarray(x).shape[:-1] + (np.asarray(x).shape[-1] // QK_K,))


def quantize_q5_K_imatrix(x: np.ndarray, quant_weights: np.ndarray) -> np.ndarray:
    out, L, nb = _quantize_q45_K_imatrix(x, quant_weights, 31, BLOCK_Q5_K)
    Lg = L.reshape(nb, 4, 2, 32)
    hi = (Lg > 15).astype(np.uint8)
    lo = (Lg - 16 * hi).astype(np.uint8)
    qh = np.zeros((nb, 32), dtype=np.uint8)
    for g in range(4):
        qh |= hi[:, g, 0, :] << (2 * g)
        qh |= hi[:, g, 1, :] << (2 * g + 1)
    out["qh"] = qh
    out["qs"] = (lo[:, :, 0, :] | (lo[:, :, 1, :] << 4)).reshape(nb, 128)
    return out.reshape(np.asarray(x).shape[:-1] + (np.asarray(x).shape[-1] // QK_K,))


def quantize_q6_K_imatrix(x: np.ndarray, quant_weights: np.ndarray) -> np.ndarray:
    """ref: quantize_row_q6_K_impl src/ggml-quants.c:1793-1878 — identical
    to the unweighted path except make_qx_quants gets the raw importance
    row as weights (the sigma2 scaling is commented out upstream)."""
    xr, qwr = _qw_superblocks(x, quant_weights)
    return _quantize_q6_K_rows(x, xr, qwr.reshape(-1, 16))
