"""Codebook i-quants: IQ2_XXS/XS/S, IQ3_XXS/S, IQ1_S/M.

Bit-exact vectorized re-derivations of the reference algorithms
(behavioral spec, not a translation):
  - dequant: src/ggml-quants.c:2275-2505 (grid lookup + ksigns sign
    expansion + 4-bit/3-bit block scales).
  - grid machinery: iq2xs_init_impl / iq3xs_init_impl
    (src/ggml-quants.c:2640-2996, :3434-3548): the packed kgrid constants
    expand to (grid_size, 8|4) lattice points; off-grid points get
    deterministic nearest-neighbor lists sorted by (distance, index).
  - quantize: quantize_row_iq*_impl (src/ggml-quants.c:3030-4630) —
    per-32-block sign-folded codebook search with scale refinement,
    imatrix-weighted when quantization weights are provided (REQUIRED for
    IQ2_XXS/XS/S and IQ1_S/M, matching the reference's asserts).

Grid constant tables (unavoidable shared schema, like the GGUF ids and
GELU tables) live in data/iq_grids.npz.
"""
from __future__ import annotations

import functools
import os

import numpy as np

from .numerics import (
    F32,
    fp16_to_fp32,
    fp32_to_fp16,
    nearest_int,
    seq_sum,
)
from .types import (
    BLOCK_IQ1_M,
    BLOCK_IQ1_S,
    BLOCK_IQ2_S,
    BLOCK_IQ2_XS,
    BLOCK_IQ2_XXS,
    BLOCK_IQ3_S,
    BLOCK_IQ3_XXS,
    GROUP_MAX_EPS,
    QK_K,
)

IQ1S_DELTA = np.float32(0.125)
IQ1M_DELTA = np.float32(0.125)

_DATA = os.path.join(os.path.dirname(__file__), "data", "iq_grids.npz")


@functools.cache
def _tables():
    return dict(np.load(_DATA))


@functools.cache
def ksigns() -> np.ndarray:
    """ksigns_iq2xs (src/ggml-common.h): 7-bit sign word → 8-bit with odd
    parity in bit 7 (derived, verified against the reference table)."""
    i = np.arange(128, dtype=np.uint16)
    pc = ((i[:, None] >> np.arange(7)) & 1).sum(1) & 1
    return (i | (pc << 7)).astype(np.uint8)


def _sign_pm1(sign_bytes: np.ndarray) -> np.ndarray:
    """(...,) u8 sign bytes → (..., 8) of ±1 f32 (kmask_iq2xs bit j)."""
    bits = (sign_bytes[..., None] >> np.arange(8)) & 1
    return np.where(bits.astype(bool), F32(-1.0), F32(1.0))


@functools.cache
def grid_u8(name: str) -> np.ndarray:
    """Dequant lattice table as (grid_size, 8|4) u8 (iq1s: int8)."""
    t = _tables()[name]
    if t.dtype == np.uint64:
        g = t.view(np.uint8).reshape(len(t), 8)
    else:
        g = t.view(np.uint8).reshape(len(t), 4)
    if name == "iq1s_grid":
        return g.view(np.int8)
    return g


# ------------------------------------------------------------- dequantize

def dequantize_iq2_xxs(blocks: np.ndarray) -> np.ndarray:
    b = blocks.reshape(-1)
    d = fp16_to_fp32(b["d"]).astype(F32)                    # (nb,)
    aux = np.ascontiguousarray(b["qs"]).view(np.uint32).reshape(-1, 8, 2)
    a, s = aux[..., 0], aux[..., 1]                         # (nb, 8)
    db = (d[:, None] * (F32(0.5) + (s >> 28).astype(F32))).astype(F32) \
        * F32(0.25)
    gidx = (a[..., None] >> (8 * np.arange(4))) & 0xFF      # (nb, 8, 4)
    grid = grid_u8("iq2xxs_grid")[gidx].astype(F32)         # (nb, 8, 4, 8)
    sbits = ksigns()[(s[..., None] >> (7 * np.arange(4))) & 127]
    signs = _sign_pm1(sbits)                                # (nb, 8, 4, 8)
    y = (db[:, :, None, None] * grid).astype(F32) * signs
    return y.reshape(blocks.shape[:-1] + (-1,)).astype(np.float32) \
        if blocks.ndim > 1 else y.reshape(-1).astype(np.float32)


def dequantize_iq2_xs(blocks: np.ndarray) -> np.ndarray:
    b = blocks.reshape(-1)
    d = fp16_to_fp32(b["d"]).astype(F32)
    qs = np.ascontiguousarray(b["qs"]).reshape(-1, 8, 4)    # (nb, ib32, l)
    sc = np.ascontiguousarray(b["scales"]).reshape(-1, 8)
    sc_lh = np.stack([sc & 0xF, sc >> 4], axis=-1)          # (nb, 8, 2)
    db = (d[:, None, None] * (F32(0.5) + sc_lh.astype(F32))).astype(F32) \
        * F32(0.25)                                         # (nb, 8, 2)
    grid = grid_u8("iq2xs_grid")[qs & 511].astype(F32)      # (nb, 8, 4, 8)
    signs = _sign_pm1(ksigns()[qs >> 9])
    dl = db[:, :, [0, 0, 1, 1]]                             # per l
    y = (dl[..., None] * grid).astype(F32) * signs
    return y.reshape(blocks.shape[:-1] + (-1,)).astype(np.float32) \
        if blocks.ndim > 1 else y.reshape(-1).astype(np.float32)


def dequantize_iq2_s(blocks: np.ndarray) -> np.ndarray:
    b = blocks.reshape(-1)
    d = fp16_to_fp32(b["d"]).astype(F32)
    qs_all = np.ascontiguousarray(b["qs"])
    qs = qs_all[:, :QK_K // 8].reshape(-1, 8, 4).astype(np.uint16)
    sgn = qs_all[:, QK_K // 8:].reshape(-1, 8, 4)
    qh = np.ascontiguousarray(b["qh"]).reshape(-1, 8).astype(np.uint16)
    sc = np.ascontiguousarray(b["scales"]).reshape(-1, 8)
    sc_lh = np.stack([sc & 0xF, sc >> 4], axis=-1)
    db = (d[:, None, None] * (F32(0.5) + sc_lh.astype(F32))).astype(F32) \
        * F32(0.25)
    sh = 8 - 2 * np.arange(4)
    gidx = qs | ((qh[..., None] << sh) & 0x300)
    grid = grid_u8("iq2s_grid")[gidx].astype(F32)
    signs = _sign_pm1(sgn)
    dl = db[:, :, [0, 0, 1, 1]]
    y = (dl[..., None] * grid).astype(F32) * signs
    return y.reshape(blocks.shape[:-1] + (-1,)).astype(np.float32) \
        if blocks.ndim > 1 else y.reshape(-1).astype(np.float32)


def dequantize_iq3_xxs(blocks: np.ndarray) -> np.ndarray:
    b = blocks.reshape(-1)
    d = fp16_to_fp32(b["d"]).astype(F32)
    raw = np.ascontiguousarray(b["qs"])
    qs = raw[:, :QK_K // 4].reshape(-1, 8, 8)               # grid bytes
    aux = raw[:, QK_K // 4:].copy().view(np.uint32).reshape(-1, 8)
    db = (d[:, None] * (F32(0.5) + (aux >> 28).astype(F32))).astype(F32) \
        * F32(0.5)                                          # (nb, 8)
    grid = grid_u8("iq3xxs_grid")[qs].astype(F32)           # (nb, 8, 8, 4)
    sbits = ksigns()[(aux[..., None] >> (7 * np.arange(4))) & 127]
    signs = _sign_pm1(sbits)                                # (nb, 8, 4, 8)
    y = db[:, :, None, None] * grid.reshape(-1, 8, 4, 8)
    # grid pairs: qs[2l], qs[2l+1] give elements 0-3 / 4-7 of sign word l
    y = (y.astype(F32) * signs).astype(F32)
    return y.reshape(blocks.shape[:-1] + (-1,)).astype(np.float32) \
        if blocks.ndim > 1 else y.reshape(-1).astype(np.float32)


def dequantize_iq3_s(blocks: np.ndarray) -> np.ndarray:
    b = blocks.reshape(-1)
    nb = b.shape[0]
    d = fp16_to_fp32(b["d"]).astype(F32)
    qs = np.ascontiguousarray(b["qs"]).reshape(nb, 4, 2, 8)  # (pair32, half, 2l)
    qh = np.ascontiguousarray(b["qh"]).reshape(nb, 4, 2).astype(np.uint16)
    sgn = np.ascontiguousarray(b["signs"]).reshape(nb, 4, 2, 4)
    sc = np.ascontiguousarray(b["scales"]).reshape(nb, 4)
    # C order: d * (1 + 2*scale_nibble)
    db = (d[:, None, None] * np.stack(
        [(F32(1.0) + F32(2.0) * (sc & 0xF).astype(F32)),
         (F32(1.0) + F32(2.0) * (sc >> 4).astype(F32))],
        axis=-1)).astype(F32)                                # (nb, 4, 2)
    l2 = np.arange(8)                                        # 2l+0/2l+1 pairs
    shifts = np.where(l2 % 2 == 0, 8 - (l2 // 2) * 2, 7 - (l2 // 2) * 2)
    gidx = qs.astype(np.uint16) | ((qh[..., None] << shifts) & 256)
    grid = grid_u8("iq3s_grid")[gidx].astype(F32)            # (nb,4,2,8,4)
    signs = _sign_pm1(sgn)                                   # (nb,4,2,4,8)
    # elements: for sign word l: grid1(qs[2l]) j0..3, grid2(qs[2l+1]) j4..7
    y = db[:, :, :, None, None] * grid.reshape(nb, 4, 2, 4, 8)
    y = y.astype(F32) * signs
    return y.reshape(blocks.shape[:-1] + (-1,)).astype(np.float32) \
        if blocks.ndim > 1 else y.reshape(-1).astype(np.float32)


def dequantize_iq1_s(blocks: np.ndarray) -> np.ndarray:
    b = blocks.reshape(-1)
    d = fp16_to_fp32(b["d"]).astype(F32)
    qs = np.ascontiguousarray(b["qs"]).reshape(-1, 8, 4).astype(np.uint16)
    qh = np.ascontiguousarray(b["qh"]).reshape(-1, 8)
    dl = d[:, None] * (F32(2.0) * ((qh >> 12) & 7).astype(F32) + F32(1.0))
    delta = np.where((qh & 0x8000).astype(bool), -IQ1S_DELTA, IQ1S_DELTA)
    gidx = qs | (((qh[..., None] >> (3 * np.arange(4))) & 7) << 8)
    grid = grid_u8("iq1s_grid")[gidx].astype(F32)            # (nb, 8, 4, 8)
    y = dl[..., None, None].astype(F32) * \
        (grid + delta[..., None, None].astype(F32))
    return y.reshape(blocks.shape[:-1] + (-1,)).astype(np.float32) \
        if blocks.ndim > 1 else y.reshape(-1).astype(np.float32)


def dequantize_iq1_m(blocks: np.ndarray) -> np.ndarray:
    b = blocks.reshape(-1)
    nb = b.shape[0]
    sc = np.ascontiguousarray(b["scales"]).view(np.uint16).reshape(nb, 4)
    du16 = ((sc[:, 0] >> 12) | ((sc[:, 1] >> 8) & 0x00F0)
            | ((sc[:, 2] >> 4) & 0x0F00) | (sc[:, 3] & 0xF000)).astype(np.uint16)
    d = fp16_to_fp32(du16.view(np.float16)).astype(F32)
    qs = np.ascontiguousarray(b["qs"]).reshape(nb, 8, 4).astype(np.uint16)
    qh = np.ascontiguousarray(b["qh"]).reshape(nb, 8, 2).astype(np.uint16)
    ib = np.arange(8)
    dl1 = (sc[:, ib // 2] >> (6 * (ib % 2) + 0)) & 0x7       # (nb, 8)
    dl2 = (sc[:, ib // 2] >> (6 * (ib % 2) + 3)) & 0x7
    dl = np.stack([dl1, dl2], axis=-1).astype(F32) * F32(2.0) + F32(1.0)
    dl = d[:, None, None] * dl                               # (nb, 8, 2)
    idx = np.empty((nb, 8, 4), np.uint16)
    idx[..., 0] = qs[..., 0] | ((qh[..., 0] << 8) & 0x700)
    idx[..., 1] = qs[..., 1] | ((qh[..., 0] << 4) & 0x700)
    idx[..., 2] = qs[..., 2] | ((qh[..., 1] << 8) & 0x700)
    idx[..., 3] = qs[..., 3] | ((qh[..., 1] << 4) & 0x700)
    hb = np.stack([qh[..., 0] & 0x08, qh[..., 0] & 0x80,
                   qh[..., 1] & 0x08, qh[..., 1] & 0x80], axis=-1)
    delta = np.where(hb.astype(bool), -IQ1M_DELTA, IQ1M_DELTA)
    grid = grid_u8("iq1s_grid")[idx].astype(F32)             # (nb, 8, 4, 8)
    dsel = dl[:, :, [0, 0, 1, 1]]                            # per l
    y = dsel[..., None].astype(F32) * (grid + delta[..., None].astype(F32))
    return y.reshape(blocks.shape[:-1] + (-1,)).astype(np.float32) \
        if blocks.ndim > 1 else y.reshape(-1).astype(np.float32)


# -------------------------------------------------------- grid machinery

GROUP_MAX_EPS_IQ3_XXS = np.float32(1e-8)
GROUP_MAX_EPS_IQ2_S = np.float32(1e-8)
GROUP_MAX_EPS_IQ1_M = np.float32(1e-7)
GROUP_MAX_EPS_IQ1_S = np.float32(1e-12)


@functools.cache
def iq_machinery(kind: str):
    """Quantize-side lattice machinery — port of iq2xs_init_impl /
    iq3xs_init_impl (src/ggml-quants.c:2640-2996, :3434-3548).

    kind ∈ {iq2_xxs, iq2_xs, iq2_s, iq1, iq3_256, iq3_512} →
    (grid int8 (S, dim), kmap int64 (kmap_size,), neighbors uint16 flat).
    kmap[u] ≥ 0 → exact grid index; kmap[u] < 0 → neighbors[-kmap[u]-1]
    holds the count, followed by that many grid indices sorted by
    (distance², index) — the deterministic order of the C qsort comparator.

    The result is deterministic, so it is disk-cached next to the grid
    constants (the iq1 build covers 42k off-grid points × 2048 lattice
    rows and costs ~2 minutes cold; the cache ships prebuilt)."""
    cache = os.path.join(os.path.dirname(_DATA), f"machinery_{kind}.npz")
    if os.path.exists(cache):
        z = np.load(cache)
        return z["grid"], z["kmap"], z["neigh"]
    t = _tables()
    spec = {
        "iq2_xxs": (t["kgrid_2bit_256"], 8, 2, 2, 43692),
        "iq2_xs": (t["kgrid_2bit_512"], 8, 2, 2, 43692),
        "iq2_s": (t["kgrid_2bit_1024"], 8, 2, 1, 43692),
        "iq1": (t["kgrid_1bit_2048"], 8, 2, 3, 43692),
        "iq3_256": (t["iq3_kgrid_256"], 4, 3, 2, 4096),
        "iq3_512": (t["iq3_kgrid_512"], 4, 3, 3, 4096),
    }
    kgrid, dim, bits, nwant, kmap_size = spec[kind]
    S = len(kgrid)
    mask = (1 << bits) - 1
    shifts = (bits * np.arange(dim)).astype(np.uint16)
    lv = ((kgrid.astype(np.int64)[:, None] >> shifts) & mask)
    grid = (2 * lv + 1).astype(np.int8)               # (S, dim)
    kmap = np.full(kmap_size, -1, np.int64)
    index = (lv << shifts).sum(1)
    kmap[index] = np.arange(S)

    missing = np.nonzero(kmap < 0)[0]
    parts: list[np.ndarray] = []
    counter = 0
    g32 = grid.astype(np.int32)
    gg = (g32 * g32).sum(1)                           # (S,)
    # batched distance computation (exact ints via |p|²+|g|²−2p·g matmul);
    # per-row stable argsort reproduces the C comparator's (d2, j) order
    for s0 in range(0, len(missing), 4096):
        chunk = missing[s0:s0 + 4096]
        pos = (2 * ((chunk[:, None] >> shifts) & mask) + 1).astype(np.int32)
        # |p|²+|g|²−2p·g via BLAS f32 (exact: |values| ≤ 392 ≪ 2²⁴)
        dots = (pos.astype(np.float32) @ g32.T.astype(np.float32))
        d2 = ((pos * pos).sum(1)[:, None] + gg[None, :]
              - 2 * dots.astype(np.int64))
        order = np.argsort(d2, axis=1, kind="stable")      # (m, S)
        d2s = np.take_along_axis(d2, order, axis=1)
        distinct = np.cumsum(
            np.concatenate([np.ones((len(chunk), 1), bool),
                            d2s[:, 1:] != d2s[:, :-1]], axis=1), axis=1)
        within = distinct <= nwant
        # flat layout per row: [count, idx...]; assembled without a
        # per-row python loop (42k rows for the iq1 grid)
        lens = within.sum(1)
        starts = np.zeros(len(chunk), np.int64)
        starts[1:] = np.cumsum(lens[:-1] + 1)
        total = int(lens.sum()) + len(chunk)
        flat = np.empty(total, np.uint16)
        flat[starts] = lens.astype(np.uint16)
        fill = np.ones(total, bool)
        fill[starts] = False
        flat[fill] = order[within].astype(np.uint16)   # row-major select
        kmap[chunk] = -(counter + starts + 1)
        parts.append(flat)
        counter += total
    neigh = np.concatenate(parts)
    try:
        np.savez_compressed(cache, grid=grid, kmap=kmap, neigh=neigh)
    except OSError:
        pass                     # read-only installs build in memory only
    return grid, kmap, neigh


def _neighbours_at(neigh: np.ndarray, kmap: np.ndarray, u: int) -> np.ndarray:
    start = -int(kmap[u]) - 1
    n = int(neigh[start])
    return neigh[start + 1:start + 1 + n]


def _find_best_neighbour(neigh_list, grid, xval, weight, scale):
    """iq*_find_best_neighbour: first-minimum of Σ w·(scale·g − x)² over the
    (distance, index)-ordered neighbor list. Returns grid_index."""
    g = grid[neigh_list].astype(F32)                  # (n, dim)
    diff = (scale * g).astype(F32) - xval[None, :]
    d2 = seq_sum((weight[None, :] * diff * diff).astype(F32))
    return int(neigh_list[int(np.argmin(d2))])


def _sign_fold(xb, weight, width=8):
    """Shared sign-folding prologue of the iq2/iq3 quantizers: fold signs
    out of each `width`-element group, forcing even parity by flipping the
    least-important element when needed. Returns (xval, block_signs)."""
    ng = len(xb) // width
    xval = np.abs(xb).astype(F32)
    s = np.zeros(ng, np.uint16)
    for k in range(ng):
        neg = xb[width * k:width * (k + 1)] < 0
        sk = int((neg << np.arange(width)).sum())
        if int(neg.sum()) % 2:
            wseg = weight[width * k:width * (k + 1)]
            xseg = xb[width * k:width * (k + 1)]
            ax = (wseg * xseg * xseg).astype(F32)
            imin = int(np.argmin(ax))
            xval[width * k + imin] = -xval[width * k + imin]
            sk ^= 1 << imin
        s[k] = sk & ((1 << (width - 1)) - 1)
    return xval, s


# ------------------------------------------------------------- quantize

def _quantize_iq3(grid_size: int, x: np.ndarray,
                  quant_weights: np.ndarray | None):
    """quantize_row_iq3_xxs_impl (src/ggml-quants.c:3624-3836) for one or
    more rows; returns the per-superblock raw fields for the caller to
    pack (d f16, q3 bytes, scales_and_signs u32, qh)."""
    kind = "iq3_256" if grid_size == 256 else "iq3_512"
    grid, kmap, neigh = iq_machinery(kind)
    kMaxQ = 8
    x = x.reshape(-1, QK_K).astype(np.float32)
    nbl = x.shape[0]
    qw = quant_weights.reshape(-1, QK_K).astype(np.float32) \
        if quant_weights is not None else None

    d_out = np.zeros(nbl, np.float16)
    q3_out = np.zeros((nbl, QK_K // 4), np.uint8)
    sas_out = np.zeros((nbl, QK_K // 32), np.uint32)
    qh_out = np.zeros((nbl, QK_K // 32), np.uint8)

    for ibl in range(nbl):
        xbl = x[ibl]
        sumx2 = seq_sum(xbl * xbl)
        sigma2 = F32(2.0) * sumx2 / F32(QK_K)
        scales = np.zeros(QK_K // 32, np.float32)
        max_scale = F32(0.0)
        for ib in range(QK_K // 32):
            xb = xbl[32 * ib:32 * (ib + 1)]
            if qw is not None:
                weight = (qw[ibl, 32 * ib:32 * (ib + 1)]
                          * np.sqrt(sigma2 + xb * xb)).astype(F32)
            else:
                weight = (xb * xb).astype(F32)
            waux = np.sqrt(weight).astype(F32)
            xval, block_signs = _sign_fold(xb, weight, 8)
            maxv = F32(np.max(xval))
            if maxv < GROUP_MAX_EPS_IQ3_XXS:
                scales[ib] = 0.0
                continue
            best = F32(0.0)
            scale = maxv / F32(2 * kMaxQ - 1)
            L = np.zeros(32, np.int8)
            is_on_grid = np.zeros(8, bool)
            for is_ in range(-15, 16):
                id_ = (F32(2 * kMaxQ - 1) + F32(is_) * F32(0.2)) / maxv
                this_scale = F32(1.0) / id_
                Laux = np.clip(nearest_int(
                    F32(0.5) * (id_ * xval - F32(1.0))), 0, kMaxQ - 1
                ).astype(np.int8)
                on_aux = np.ones(8, bool)
                for k in range(8):
                    u = int((Laux[4 * k:4 * k + 4].astype(np.uint16)
                             << (3 * np.arange(4))).sum())
                    gi = int(kmap[u])
                    if gi < 0:
                        on_aux[k] = False
                        gi = _find_best_neighbour(
                            _neighbours_at(neigh, kmap, u), grid,
                            xval[4 * k:4 * k + 4], waux[4 * k:4 * k + 4],
                            this_scale)
                        Laux[4 * k:4 * k + 4] = (grid[gi] - 1) // 2
                q = (F32(2.0) * Laux.astype(F32) + F32(1.0))
                sumqx = seq_sum(weight * xval * q)
                sumq2 = seq_sum(weight * q * q)
                if sumq2 > 0 and sumqx * sumqx > best * sumq2:
                    scale = sumqx / sumq2
                    best = scale * sumqx
                    L[:] = Laux
                    is_on_grid[:] = on_aux
            if (~is_on_grid).any() and scale > 0:
                id_ = F32(1.0) / scale
                for k in range(8):
                    if is_on_grid[k]:
                        continue
                    l = np.clip(nearest_int(
                        F32(0.5) * (id_ * xval[4 * k:4 * k + 4] - F32(1.0))),
                        0, kMaxQ - 1)
                    u = int((l.astype(np.uint16) << (3 * np.arange(4))).sum())
                    gi = int(kmap[u])
                    if gi < 0:
                        gi = _find_best_neighbour(
                            _neighbours_at(neigh, kmap, u), grid,
                            xval[4 * k:4 * k + 4], waux[4 * k:4 * k + 4],
                            scale)
                    L[4 * k:4 * k + 4] = (grid[gi] - 1) // 2
                q = (F32(2.0) * L.astype(F32) + F32(1.0))
                sumqx = seq_sum(weight * xval * q)
                sumq2 = seq_sum(weight * q * q)
                if sumq2 > 0:
                    scale = sumqx / sumq2
            if scale < 0:
                scale = -scale
                block_signs = (~block_signs) & 127
            for k in range(8):
                u = int((L[4 * k:4 * k + 4].astype(np.uint16)
                         << (3 * np.arange(4))).sum())
                gi = int(kmap[u])
                assert gi >= 0, (u, L[4 * k:4 * k + 4])
                if grid_size == 256:
                    q3_out[ibl, 8 * ib + k] = gi
                else:
                    q3_out[ibl, 8 * ib + k] = gi & 255
                    qh_out[ibl, ib] |= (gi >> 8) << k
            sas_out[ibl, ib] = (int(block_signs[0])
                                | (int(block_signs[1]) << 7)
                                | (int(block_signs[2]) << 14)
                                | (int(block_signs[3]) << 21))
            scales[ib] = scale
            max_scale = max(max_scale, F32(scale))

        if not max_scale:
            continue
        d = F32(max_scale) / F32(31.0)
        d_out[ibl] = fp32_to_fp16(np.float32(d * F32(1.0125)))
        id_ = F32(1.0) / d
        for ib in range(QK_K // 32):
            l = int(np.clip(nearest_int(
                F32(0.5) * (id_ * F32(scales[ib]) - F32(1.0))), 0, 15))
            sas_out[ibl, ib] |= np.uint32(l) << 28
    return d_out, q3_out, sas_out, qh_out


def quantize_iq3_xxs(x: np.ndarray, quant_weights: np.ndarray | None = None
                     ) -> np.ndarray:
    xb = x.reshape(-1, QK_K)
    d, q3, sas, _ = _quantize_iq3(256, xb, quant_weights)
    out = np.zeros(xb.shape[0], BLOCK_IQ3_XXS)
    out["d"] = d
    out["qs"][:, :QK_K // 4] = q3
    out["qs"][:, QK_K // 4:] = sas.view(np.uint8).reshape(len(xb), -1)
    return out.reshape(x.shape[:-1] + (x.shape[-1] // QK_K,))


def quantize_iq3_s(x: np.ndarray, quant_weights: np.ndarray | None = None
                   ) -> np.ndarray:
    """quantize_row_iq3_s_impl (src/ggml-quants.c:3854-4035): 512-point
    grid, full 8-bit sign bytes (no parity folding), is ∈ [-9, 9], and the
    refinement pass re-fits EVERY group (the reference's on-grid skip is
    commented out)."""
    grid, kmap, neigh = iq_machinery("iq3_512")
    kMaxQ = 8
    bsz = 32
    xr = x.reshape(-1, QK_K).astype(np.float32)
    nbl = xr.shape[0]
    qw = quant_weights.reshape(-1, QK_K).astype(np.float32) \
        if quant_weights is not None else None
    out = np.zeros(nbl, BLOCK_IQ3_S)

    for ibl in range(nbl):
        xbl = xr[ibl]
        sigma2 = F32(2.0) * seq_sum(xbl * xbl) / F32(QK_K)
        scales = np.zeros(QK_K // bsz, np.float32)
        max_scale = F32(0.0)
        qs_all = out["qs"][ibl]
        qh_all = out["qh"][ibl]
        sg_all = out["signs"][ibl]
        for ib in range(QK_K // bsz):
            xb = xbl[bsz * ib:bsz * (ib + 1)]
            if qw is not None:
                weight = (qw[ibl, bsz * ib:bsz * (ib + 1)]
                          * np.sqrt(sigma2 + xb * xb)).astype(F32)
            else:
                weight = (xb * xb).astype(F32)
            waux = np.sqrt(weight).astype(F32)
            xval = np.abs(xb).astype(F32)
            neg = xb < 0
            block_signs = ((neg.reshape(4, 8)
                            << np.arange(8)).sum(1)).astype(np.uint8)
            maxv = F32(np.max(xval))
            if maxv == 0:
                scales[ib] = 0.0
                continue
            best = F32(0.0)
            scale = maxv / F32(2 * kMaxQ - 1)
            L = np.zeros(bsz, np.int8)
            is_on_grid = np.zeros(8, bool)
            for is_ in range(-9, 10):
                id_ = (F32(2 * kMaxQ - 1) + F32(is_) * F32(0.2)) / maxv
                this_scale = F32(1.0) / id_
                Laux = np.clip(nearest_int(
                    F32(0.5) * (id_ * xval - F32(1.0))), 0, kMaxQ - 1
                ).astype(np.int8)
                on_aux = np.ones(8, bool)
                for k in range(8):
                    u = int((Laux[4 * k:4 * k + 4].astype(np.uint16)
                             << (3 * np.arange(4))).sum())
                    gi = int(kmap[u])
                    if gi < 0:
                        on_aux[k] = False
                        gi = _find_best_neighbour(
                            _neighbours_at(neigh, kmap, u), grid,
                            xval[4 * k:4 * k + 4], waux[4 * k:4 * k + 4],
                            this_scale)
                        Laux[4 * k:4 * k + 4] = (grid[gi] - 1) // 2
                q = (F32(2.0) * Laux.astype(F32) + F32(1.0))
                sumqx = seq_sum(weight * xval * q)
                sumq2 = seq_sum(weight * q * q)
                if sumq2 > 0 and sumqx * sumqx > best * sumq2:
                    scale = sumqx / sumq2
                    best = scale * sumqx
                    L[:] = Laux
                    is_on_grid[:] = on_aux
            if (~is_on_grid).any() and scale > 0:
                id_ = F32(1.0) / scale
                for k in range(8):        # note: refits every group
                    l = np.clip(nearest_int(
                        F32(0.5) * (id_ * xval[4 * k:4 * k + 4] - F32(1.0))),
                        0, kMaxQ - 1)
                    u = int((l.astype(np.uint16) << (3 * np.arange(4))).sum())
                    gi = int(kmap[u])
                    if gi < 0:
                        gi = _find_best_neighbour(
                            _neighbours_at(neigh, kmap, u), grid,
                            xval[4 * k:4 * k + 4], waux[4 * k:4 * k + 4],
                            scale)
                    L[4 * k:4 * k + 4] = (grid[gi] - 1) // 2
                q = (F32(2.0) * L.astype(F32) + F32(1.0))
                sumqx = seq_sum(weight * xval * q)
                sumq2 = seq_sum(weight * q * q)
                if sumq2 > 0:
                    scale = sumqx / sumq2
            if scale < 0:
                scale = -scale
                block_signs = (~block_signs).astype(np.uint8)
            for k in range(8):
                u = int((L[4 * k:4 * k + 4].astype(np.uint16)
                         << (3 * np.arange(4))).sum())
                gi = int(kmap[u])
                assert gi >= 0, (u,)
                qs_all[ib * 8 + k] = gi & 255
                qh_all[(ib * 8 + k) // 8] |= (gi >> 8) << ((ib * 8 + k) % 8)
            sg_all[ib * 4:ib * 4 + 4] = block_signs
            scales[ib] = scale
            max_scale = max(max_scale, F32(scale))
        if not max_scale:
            continue
        d = F32(max_scale) / F32(31.0)
        out["d"][ibl] = fp32_to_fp16(np.float32(d * F32(1.033)))
        id_ = F32(1.0) / d
        for ib in range(0, QK_K // bsz, 2):
            l1 = int(np.clip(nearest_int(
                F32(0.5) * (id_ * F32(scales[ib]) - F32(1.0))), 0, 15))
            l2 = int(np.clip(nearest_int(
                F32(0.5) * (id_ * F32(scales[ib + 1]) - F32(1.0))), 0, 15))
            out["scales"][ibl, ib // 2] = l1 | (l2 << 4)
    return out.reshape(x.shape[:-1] + (x.shape[-1] // QK_K,))


def _make_qp_quants(nmax: int, x: np.ndarray, weight: np.ndarray
                    ) -> tuple[np.float32, np.ndarray]:
    """make_qp_quants (src/ggml-quants.c:899-970): weighted non-negative
    scale fit with candidate sweep + greedy per-element refinement.
    Returns (scale, L)."""
    n = len(x)
    maxv = F32(np.max(x))
    if maxv < GROUP_MAX_EPS:
        return F32(0.0), np.zeros(n, np.uint8)
    iscale = F32(nmax) / maxv
    L0 = nearest_int(iscale * x)
    scale = F32(1.0) / iscale
    diff = x - (scale * L0.astype(F32)).astype(F32)
    best_mse = seq_sum(weight * diff * diff)
    for is_ in range(-4, 5):
        if is_ == 0:
            continue
        iscale_is = (F32(0.1) * F32(is_) + F32(nmax)) / maxv
        scale_is = F32(1.0) / iscale_is
        l = np.minimum(nearest_int(iscale_is * x), nmax)
        diff = x - (scale_is * l.astype(F32)).astype(F32)
        mse = seq_sum(weight * diff * diff)
        if mse < best_mse:
            best_mse = mse
            iscale = iscale_is
    L = np.minimum(nearest_int(iscale * x), nmax).astype(np.int32)
    sumlx = seq_sum(weight * x * L.astype(F32))
    suml2 = seq_sum(weight * L.astype(F32) * L.astype(F32))
    for _ in range(5):
        n_changed = 0
        for i in range(n):
            w = F32(weight[i])
            xi = F32(x[i])
            li = F32(L[i])
            slx = sumlx - w * xi * li
            sl2 = suml2 - w * li * li
            if slx > 0 and sl2 > 0:
                new_l = min(int(nearest_int(xi * sl2 / slx)), nmax)
                if new_l != L[i]:
                    nf = F32(new_l)
                    slx = slx + w * xi * nf
                    sl2 = sl2 + w * nf * nf
                    if slx * slx * suml2 > sumlx * sumlx * sl2:
                        L[i] = new_l
                        sumlx, suml2 = slx, sl2
                        n_changed += 1
        if not n_changed:
            break
    return (sumlx / suml2 if suml2 > 0 else F32(0.0)), L.astype(np.uint8)


def quantize_iq2_xxs(x: np.ndarray, quant_weights: np.ndarray) -> np.ndarray:
    """quantize_row_iq2_xxs_impl (src/ggml-quants.c:3030-3200).
    quant_weights (imatrix) is REQUIRED, as in the reference."""
    assert quant_weights is not None, "iq2_xxs needs quantization weights"
    grid, kmap, neigh = iq_machinery("iq2_xxs")
    kMaxQ = 3
    xr = x.reshape(-1, QK_K).astype(np.float32)
    nbl = xr.shape[0]
    # the reference applies the same per-row imatrix to every row
    qw_rows = np.asarray(quant_weights, np.float32).reshape(-1, QK_K)
    out = np.zeros(nbl, BLOCK_IQ2_XXS)

    for ibl in range(nbl):
        xbl = xr[ibl]
        qwr = qw_rows[ibl % len(qw_rows)]
        sigma2 = seq_sum(xbl * xbl) / F32(QK_K)
        q2 = np.zeros(QK_K // 16, np.uint32)          # [2*ib], [2*ib+1]
        scales = np.zeros(QK_K // 32, np.float32)
        max_scale = F32(0.0)
        for ib in range(QK_K // 32):
            xb = xbl[32 * ib:32 * (ib + 1)]
            qw = qwr[32 * ib:32 * (ib + 1)]
            weight = (qw * np.sqrt(sigma2 + xb * xb)).astype(F32)
            waux = np.sqrt(weight).astype(F32)
            xval, block_signs = _sign_fold(xb, weight, 8)
            maxv = F32(np.max(xval))
            if maxv < GROUP_MAX_EPS:
                scales[ib] = 0.0
                continue
            scale, L8 = _make_qp_quants(kMaxQ + 1, xval, weight)
            L = L8.astype(np.int8)
            eff_max = scale * F32(kMaxQ)
            best = F32(0.0)
            for is_ in range(-6, 7):
                id_ = (F32(2 * kMaxQ - 1) + F32(is_) * F32(0.1)) / eff_max
                this_scale = F32(1.0) / id_
                Laux = np.clip(nearest_int(
                    F32(0.5) * (id_ * xval - F32(1.0))), 0, kMaxQ - 1
                ).astype(np.int8)
                for k in range(4):
                    u = int((Laux[8 * k:8 * k + 8].astype(np.uint16)
                             << (2 * np.arange(8))).sum())
                    gi = int(kmap[u])
                    if gi < 0:
                        gi = _find_best_neighbour(
                            _neighbours_at(neigh, kmap, u), grid,
                            xval[8 * k:8 * k + 8], waux[8 * k:8 * k + 8],
                            this_scale)
                        Laux[8 * k:8 * k + 8] = (grid[gi] - 1) // 2
                q = (F32(2.0) * Laux.astype(F32) + F32(1.0))
                sumqx = seq_sum(weight * xval * q)
                sumq2 = seq_sum(weight * q * q)
                if sumq2 > 0 and sumqx * sumqx > best * sumq2:
                    scale = sumqx / sumq2
                    best = scale * sumqx
                    L[:] = Laux
            if scale > 0:
                id_ = F32(1.0) / scale
                for k in range(4):
                    l = np.clip(nearest_int(
                        F32(0.5) * (id_ * xval[8 * k:8 * k + 8] - F32(1.0))),
                        0, kMaxQ - 1)
                    u = int((l.astype(np.uint16) << (2 * np.arange(8))).sum())
                    gi = int(kmap[u])
                    if gi < 0:
                        gi = _find_best_neighbour(
                            _neighbours_at(neigh, kmap, u), grid,
                            xval[8 * k:8 * k + 8], waux[8 * k:8 * k + 8],
                            scale)
                    L[8 * k:8 * k + 8] = (grid[gi] - 1) // 2
                q = (F32(2.0) * L.astype(F32) + F32(1.0))
                sumqx = seq_sum(weight * xval * q)
                sumq2 = seq_sum(weight * q * q)
                if sumq2 > 0:
                    scale = sumqx / sumq2
            if scale < 0:
                scale = -scale
                block_signs = (~block_signs) & 127
            for k in range(4):
                u = int((L[8 * k:8 * k + 8].astype(np.uint16)
                         << (2 * np.arange(8))).sum())
                gi = int(kmap[u])
                assert gi >= 0, (u,)
                q2[2 * ib + 0] |= np.uint32(gi) << (8 * k)
                q2[2 * ib + 1] |= np.uint32(int(block_signs[k])) << (7 * k)
            scales[ib] = scale
            max_scale = max(max_scale, F32(scale))
        if not max_scale:
            continue
        d = F32(max_scale) / F32(31.0)
        out["d"][ibl] = fp32_to_fp16(np.float32(d))
        id_ = F32(1.0) / d
        for ib in range(QK_K // 32):
            l = int(np.clip(nearest_int(
                F32(0.5) * (id_ * F32(scales[ib]) - F32(1.0))), 0, 15))
            q2[2 * ib + 1] |= np.uint32(l) << 28
        out["qs"][ibl] = q2.view(np.uint16)
    return out.reshape(x.shape[:-1] + (x.shape[-1] // QK_K,))


def quantize_iq2_xs(x: np.ndarray, quant_weights: np.ndarray) -> np.ndarray:
    """quantize_row_iq2_xs_impl (src/ggml-quants.c:3203-3380): 16-element
    scale blocks of two 8-element grid groups, is ∈ [-9, 9] with 0.1 step
    over max (not the qp-quants eff_max of iq2_xxs); refinement writes the
    clipped L before the neighbor fallback."""
    assert quant_weights is not None, "iq2_xs needs quantization weights"
    grid, kmap, neigh = iq_machinery("iq2_xs")
    kMaxQ = 3
    xr = x.reshape(-1, QK_K).astype(np.float32)
    nbl = xr.shape[0]
    qw_rows = np.asarray(quant_weights, np.float32).reshape(-1, QK_K)
    out = np.zeros(nbl, BLOCK_IQ2_XS)

    for ibl in range(nbl):
        xbl = xr[ibl]
        qwr = qw_rows[ibl % len(qw_rows)]
        sigma2 = seq_sum(xbl * xbl) / F32(QK_K)
        q2 = np.zeros(QK_K // 8, np.uint16)
        scales = np.zeros(QK_K // 16, np.float32)
        max_scale = F32(0.0)
        for ib in range(QK_K // 16):
            xb = xbl[16 * ib:16 * (ib + 1)]
            qw = qwr[16 * ib:16 * (ib + 1)]
            weight = (qw * np.sqrt(sigma2 + xb * xb)).astype(F32)
            waux = np.sqrt(weight).astype(F32)
            xval, block_signs = _sign_fold(xb, weight, 8)
            maxv = F32(np.max(xval))
            if maxv < GROUP_MAX_EPS:
                scales[ib] = 0.0
                continue
            best = F32(0.0)
            scale = maxv / F32(2 * kMaxQ - 1)
            L = np.zeros(16, np.int8)
            is_on_grid = np.ones(2, bool)
            for is_ in range(-9, 10):
                id_ = (F32(2 * kMaxQ - 1) + F32(is_) * F32(0.1)) / maxv
                this_scale = F32(1.0) / id_
                Laux = np.clip(nearest_int(
                    F32(0.5) * (id_ * xval - F32(1.0))), 0, kMaxQ - 1
                ).astype(np.int8)
                on_aux = np.ones(2, bool)
                for k in range(2):
                    u = int((Laux[8 * k:8 * k + 8].astype(np.uint16)
                             << (2 * np.arange(8))).sum())
                    gi = int(kmap[u])
                    if gi < 0:
                        on_aux[k] = False
                        gi = _find_best_neighbour(
                            _neighbours_at(neigh, kmap, u), grid,
                            xval[8 * k:8 * k + 8], waux[8 * k:8 * k + 8],
                            this_scale)
                        Laux[8 * k:8 * k + 8] = (grid[gi] - 1) // 2
                q = (F32(2.0) * Laux.astype(F32) + F32(1.0))
                sumqx = seq_sum(weight * xval * q)
                sumq2 = seq_sum(weight * q * q)
                if sumq2 > 0 and sumqx * sumqx > best * sumq2:
                    scale = sumqx / sumq2
                    best = scale * sumqx
                    L[:] = Laux
                    is_on_grid[:] = on_aux
            if (~is_on_grid).any() and scale > 0:
                id_ = F32(1.0) / scale
                for k in range(2):
                    if is_on_grid[k]:
                        continue
                    l = np.clip(nearest_int(
                        F32(0.5) * (id_ * xval[8 * k:8 * k + 8] - F32(1.0))),
                        0, kMaxQ - 1)
                    L[8 * k:8 * k + 8] = l
                    u = int((l.astype(np.uint16) << (2 * np.arange(8))).sum())
                    gi = int(kmap[u])
                    if gi < 0:
                        gi = _find_best_neighbour(
                            _neighbours_at(neigh, kmap, u), grid,
                            xval[8 * k:8 * k + 8], waux[8 * k:8 * k + 8],
                            scale)
                        L[8 * k:8 * k + 8] = (grid[gi] - 1) // 2
                q = (F32(2.0) * L.astype(F32) + F32(1.0))
                sumqx = seq_sum(weight * xval * q)
                sumq2 = seq_sum(weight * q * q)
                if sumq2 > 0:
                    scale = sumqx / sumq2
            if scale < 0:
                scale = -scale
                block_signs = (~block_signs) & 127
            for k in range(2):
                u = int((L[8 * k:8 * k + 8].astype(np.uint16)
                         << (2 * np.arange(8))).sum())
                gi = int(kmap[u])
                assert gi >= 0, (u,)
                q2[2 * ib + k] = gi | (int(block_signs[k]) << 9)
            scales[ib] = scale
            max_scale = max(max_scale, F32(scale))
        if not max_scale:
            continue
        d = F32(max_scale) / F32(31.0)
        out["d"][ibl] = fp32_to_fp16(np.float32(d))
        id_ = F32(1.0) / d
        for ib in range(QK_K // 16):
            l = int(np.clip(nearest_int(
                F32(0.5) * (id_ * F32(scales[ib]) - F32(1.0))), 0, 15))
            if ib % 2 == 0:
                out["scales"][ibl, ib // 2] = l
            else:
                out["scales"][ibl, ib // 2] |= l << 4
        out["qs"][ibl] = q2
    return out.reshape(x.shape[:-1] + (x.shape[-1] // QK_K,))


def quantize_iq2_s(x: np.ndarray, quant_weights: np.ndarray | None = None
                   ) -> np.ndarray:
    """quantize_row_iq2_s_impl (src/ggml-quants.c:4814-4980): 1024-point
    grid with full 8-bit signs (no parity folding), sigma2 doubled,
    0.25·sigma2 fallback weights, 0.9875 fudge on d."""
    grid, kmap, neigh = iq_machinery("iq2_s")
    kMaxQ = 3
    xr = x.reshape(-1, QK_K).astype(np.float32)
    nbl = xr.shape[0]
    qw_rows = (np.asarray(quant_weights, np.float32).reshape(-1, QK_K)
               if quant_weights is not None else None)
    out = np.zeros(nbl, BLOCK_IQ2_S)

    for ibl in range(nbl):
        xbl = xr[ibl]
        sigma2 = F32(2.0) * seq_sum(xbl * xbl) / F32(QK_K)
        scales = np.zeros(QK_K // 16, np.float32)
        max_scale = F32(0.0)
        for ib in range(QK_K // 16):
            xb = xbl[16 * ib:16 * (ib + 1)]
            if qw_rows is not None:
                qw = qw_rows[ibl % len(qw_rows)][16 * ib:16 * (ib + 1)]
                weight = (qw * np.sqrt(sigma2 + xb * xb)).astype(F32)
            else:
                weight = (F32(0.25) * sigma2 + xb * xb).astype(F32)
            waux = np.sqrt(weight).astype(F32)
            xval = np.abs(xb).astype(F32)
            neg = xb < 0
            block_signs = ((neg.reshape(2, 8)
                            << np.arange(8)).sum(1)).astype(np.uint8)
            maxv = F32(np.max(xval))
            if maxv < GROUP_MAX_EPS_IQ2_S:
                scales[ib] = 0.0
                continue
            best = F32(0.0)
            scale = maxv / F32(2 * kMaxQ - 1)
            L = np.zeros(16, np.int8)
            is_on_grid = np.ones(2, bool)
            for is_ in range(-9, 10):
                id_ = (F32(2 * kMaxQ - 1) + F32(is_) * F32(0.1)) / maxv
                this_scale = F32(1.0) / id_
                Laux = np.clip(nearest_int(
                    F32(0.5) * (id_ * xval - F32(1.0))), 0, kMaxQ - 1
                ).astype(np.int8)
                on_aux = np.ones(2, bool)
                for k in range(2):
                    u = int((Laux[8 * k:8 * k + 8].astype(np.uint16)
                             << (2 * np.arange(8))).sum())
                    gi = int(kmap[u])
                    if gi < 0:
                        on_aux[k] = False
                        gi = _find_best_neighbour(
                            _neighbours_at(neigh, kmap, u), grid,
                            xval[8 * k:8 * k + 8], waux[8 * k:8 * k + 8],
                            this_scale)
                        Laux[8 * k:8 * k + 8] = (grid[gi] - 1) // 2
                q = (F32(2.0) * Laux.astype(F32) + F32(1.0))
                sumqx = seq_sum(weight * xval * q)
                sumq2 = seq_sum(weight * q * q)
                if sumq2 > 0 and sumqx * sumqx > best * sumq2:
                    scale = sumqx / sumq2
                    best = scale * sumqx
                    L[:] = Laux
                    is_on_grid[:] = on_aux
            if (~is_on_grid).any() and scale > 0:
                id_ = F32(1.0) / scale
                for k in range(2):
                    if is_on_grid[k]:
                        continue
                    l = np.clip(nearest_int(
                        F32(0.5) * (id_ * xval[8 * k:8 * k + 8] - F32(1.0))),
                        0, kMaxQ - 1)
                    L[8 * k:8 * k + 8] = l
                    u = int((l.astype(np.uint16) << (2 * np.arange(8))).sum())
                    gi = int(kmap[u])
                    if gi < 0:
                        gi = _find_best_neighbour(
                            _neighbours_at(neigh, kmap, u), grid,
                            xval[8 * k:8 * k + 8], waux[8 * k:8 * k + 8],
                            scale)
                        L[8 * k:8 * k + 8] = (grid[gi] - 1) // 2
                q = (F32(2.0) * L.astype(F32) + F32(1.0))
                sumqx = seq_sum(weight * xval * q)
                sumq2 = seq_sum(weight * q * q)
                if sumq2 > 0:
                    scale = sumqx / sumq2
            if scale < 0:
                scale = -scale
                block_signs = (~block_signs).astype(np.uint8)
            for k in range(2):
                u = int((L[8 * k:8 * k + 8].astype(np.uint16)
                         << (2 * np.arange(8))).sum())
                gi = int(kmap[u])
                assert gi >= 0, (u,)
                i8 = 2 * ib + k
                out["qs"][ibl, i8] = gi & 255
                out["qh"][ibl, i8 // 4] |= (gi >> 8) << (2 * (i8 % 4))
                out["qs"][ibl, QK_K // 8 + i8] = block_signs[k]
            scales[ib] = scale
            max_scale = max(max_scale, F32(scale))
        if not max_scale:
            continue
        d = F32(max_scale) / F32(31.0)
        out["d"][ibl] = fp32_to_fp16(np.float32(d * F32(0.9875)))
        id_ = F32(1.0) / d
        for ib in range(QK_K // 16):
            l = int(np.clip(nearest_int(
                F32(0.5) * (id_ * F32(scales[ib]) - F32(1.0))), 0, 15))
            if ib % 2 == 0:
                out["scales"][ibl, ib // 2] = l
            else:
                out["scales"][ibl, ib // 2] |= l << 4
    return out.reshape(x.shape[:-1] + (x.shape[-1] // QK_K,))


def _iq1_best_neighbour2(neigh_list, grid, xval, weight, scale, xg):
    """iq1_find_best_neighbour2 (src/ggml-quants.c:4127-4183): weighted
    first-minimum over the neighbor list with grid values mapped through
    the shifted ternary codebook xg."""
    g = grid[neigh_list]                               # (n, 8) int8 1/3/5
    q = xg[(g.astype(np.int32) - 1) // 2].astype(F32)  # (n, 8)
    diff = (scale * q).astype(F32) - xval[None, :]
    d2 = seq_sum((weight[None, :] * diff * diff).astype(F32))
    return int(neigh_list[int(np.argmin(d2))])


def quantize_iq1_s(x: np.ndarray, quant_weights: np.ndarray) -> np.ndarray:
    """quantize_row_iq1_s_impl (src/ggml-quants.c:4192-4348): exact
    weighted ternary split search (sorted prefix sums over both shifted
    codebooks), grid snap with neighbor fallback, 3-bit scales + shift bit.
    quant_weights (imatrix) REQUIRED, as in the reference."""
    assert quant_weights is not None, "iq1_s needs quantization weights"
    grid, kmap, neigh = iq_machinery("iq1")
    bsz = 32
    xr = x.reshape(-1, QK_K).astype(np.float32)
    nbl = xr.shape[0]
    qw_rows = np.asarray(quant_weights, np.float32).reshape(-1, QK_K)
    out = np.zeros(nbl, BLOCK_IQ1_S)
    x_p = np.array([-1 + 0.125, 0.125, 1 + 0.125], np.float32)
    x_m = np.array([-1 - 0.125, -0.125, 1 - 0.125], np.float32)

    for ibl in range(nbl):
        xbl = xr[ibl]
        qwr = qw_rows[ibl % len(qw_rows)]
        sigma2 = F32(2.0) * seq_sum(xbl * xbl) / F32(QK_K)
        scales = np.zeros(QK_K // bsz, np.float32)
        shifts = np.zeros(QK_K // bsz, np.int8)
        max_scale = F32(0.0)
        for ib in range(QK_K // bsz):
            xb = xbl[bsz * ib:bsz * (ib + 1)]
            qw = qwr[bsz * ib:bsz * (ib + 1)]
            weight = (qw * np.sqrt(sigma2 + xb * xb)).astype(F32)
            maxv = F32(np.max(np.abs(xb)))
            if maxv < GROUP_MAX_EPS_IQ1_S:
                scales[ib] = 0.0
                continue
            # exact ternary split via sorted prefix sums (glibc qsort is a
            # stable mergesort → stable argsort reproduces tie order)
            order = np.argsort(xb, kind="stable")
            sumx = np.zeros(bsz + 1, np.float32)
            sumw = np.zeros(bsz + 1, np.float32)
            wx = (weight * xb).astype(F32)
            for j in range(bsz):
                i = order[j]
                sumx[j + 1] = sumx[j] + wx[i]
                sumw[j + 1] = sumw[j] + weight[i]
            # C inits best_score to -FLT_MAX; every use multiplies it by
            # a positive sumq2 before comparing against sumqx² ≥ 0, so -inf
            # is decision-equivalent and avoids f32 overflow warnings
            best_score = -np.float32(np.inf)
            scale = maxv
            besti1 = besti2 = -1
            best_shift = 0
            for i1 in range(bsz + 1):
                for i2 in range(i1, bsz + 1):
                    for xx, sh in ((x_p, 1), (x_m, -1)):
                        sumqx = ((sumx[i1] - sumx[0]) * xx[0]
                                 + (sumx[i2] - sumx[i1]) * xx[1]
                                 + (sumx[bsz] - sumx[i2]) * xx[2])
                        sumq2 = ((sumw[i1] - sumw[0]) * xx[0] * xx[0]
                                 + (sumw[i2] - sumw[i1]) * xx[1] * xx[1]
                                 + (sumw[bsz] - sumw[i2]) * xx[2] * xx[2])
                        if sumq2 > 0 and sumqx * sumqx > best_score * sumq2:
                            scale = sumqx / sumq2
                            best_score = scale * sumqx
                            besti1, besti2, best_shift = i1, i2, sh
            assert besti1 >= 0 and besti2 >= 0 and best_shift != 0
            L = np.zeros(bsz, np.int8)
            L[order[:besti1]] = 0
            L[order[besti1:besti2]] = 1
            L[order[besti2:]] = 2
            if scale < 0:
                L = 2 - L
                scale = -scale
                best_shift = -best_shift
            xg = x_p if best_shift == 1 else x_m
            all_on_grid = True
            index = np.zeros(bsz // 8, np.uint16)
            for k in range(bsz // 8):
                u = int((L[8 * k:8 * k + 8].astype(np.uint16)
                         << (2 * np.arange(8))).sum())
                gi = int(kmap[u])
                if gi < 0:
                    all_on_grid = False
                    gi = _iq1_best_neighbour2(
                        _neighbours_at(neigh, kmap, u), grid,
                        xb[8 * k:8 * k + 8], weight[8 * k:8 * k + 8],
                        scale, xg)
                    L[8 * k:8 * k + 8] = (grid[gi] - 1) // 2
                index[k] = gi
            if not all_on_grid:
                sumqx = F32(0.0)
                sumq2 = F32(0.0)
                for k in range(bsz // 8):
                    g = grid[index[k]]
                    q = xg[(g.astype(np.int32) - 1) // 2].astype(F32)
                    w8 = weight[8 * k:8 * k + 8]
                    sumqx = sumqx + seq_sum(w8 * q * xb[8 * k:8 * k + 8])
                    sumq2 = sumq2 + seq_sum(w8 * q * q)
                if sumqx > 0 and sumq2 > 0:
                    scale = sumqx / sumq2
            h = 0
            for k in range(bsz // 8):
                out["qs"][ibl, (bsz // 8) * ib + k] = index[k] & 255
                h |= (int(index[k]) >> 8) << (3 * k)
            out["qh"][ibl, ib] = h
            scales[ib] = scale
            shifts[ib] = best_shift
            max_scale = max(max_scale, F32(scale))
        if not max_scale:
            continue
        d = F32(max_scale) / F32(15.0)
        out["d"][ibl] = fp32_to_fp16(np.float32(d * F32(1.125)))
        id_ = F32(1.0) / d
        for ib in range(QK_K // bsz):
            l = int(np.clip(nearest_int(
                F32(0.5) * (id_ * F32(scales[ib]) - F32(1.0))), 0, 7))
            if shifts[ib] == -1:
                l |= 8
            out["qh"][ibl, ib] |= l << 12
    return out.reshape(x.shape[:-1] + (x.shape[-1] // QK_K,))


def quantize_iq1_m(x: np.ndarray, quant_weights: np.ndarray | None = None
                   ) -> np.ndarray:
    """quantize_row_iq1_m_impl (src/ggml-quants.c:4370-4615): 16-element
    blocks, independent ± codebook shift per 8-element half (4 combos),
    exact ternary split search, block-global d refit, f16 scale smuggled
    into the 4-bit scale words."""
    grid, kmap, neigh = iq_machinery("iq1")
    bsz = 16
    xr = x.reshape(-1, QK_K).astype(np.float32)
    nbl = xr.shape[0]
    qw_rows = (np.asarray(quant_weights, np.float32).reshape(-1, QK_K)
               if quant_weights is not None else None)
    out = np.zeros(nbl, BLOCK_IQ1_M)
    x_p = np.array([-1 + 0.125, 0.125, 1 + 0.125], np.float32)
    x_m = np.array([-1 - 0.125, -0.125, 1 - 0.125], np.float32)
    masks = np.array([0x00, 0x80, 0x08, 0x88], np.uint8)

    def block_weight(ibl, ib, xb, sigma2):
        if qw_rows is not None:
            qw = qw_rows[ibl % len(qw_rows)][bsz * ib:bsz * (ib + 1)]
            return (qw * np.sqrt(sigma2 + xb * xb)).astype(F32)
        return (xb * xb).astype(F32)

    for ibl in range(nbl):
        xbl = xr[ibl]
        sigma2 = F32(2.0) * seq_sum(xbl * xbl) / F32(QK_K)
        scales = np.zeros(QK_K // bsz, np.float32)
        shifts = np.zeros(QK_K // bsz, np.int8)
        max_scale = F32(0.0)
        for ib in range(QK_K // bsz):
            xb = xbl[bsz * ib:bsz * (ib + 1)]
            weight = block_weight(ibl, ib, xb, sigma2)
            maxv = F32(np.max(np.abs(xb)))
            if maxv < GROUP_MAX_EPS_IQ1_M:
                scales[ib] = 0.0
                continue
            order = np.argsort(xb, kind="stable")
            lower = order < bsz // 2          # first-half membership, sorted
            w_s = weight[order]
            x_s = xb[order]
            best_score = -np.float32(np.inf)  # see quantize_iq1_s note
            scale = maxv
            besti1 = besti2 = best_k = -1
            # combos: k: (first-half shift, second-half shift) =
            # 0:(+,+) 1:(+,-) 2:(-,+) 3:(-,-)
            for i1 in range(bsz + 1):
                g = np.zeros(bsz, np.int8)
                for i2 in range(i1, bsz + 1):
                    g[:i1] = 0
                    g[i1:i2] = 1
                    g[i2:] = 2
                    qp = x_p[g]
                    qm = x_m[g]
                    for k in range(4):
                        first = qp if k < 2 else qm
                        second = qp if k % 2 == 0 else qm
                        q = np.where(lower, first, second)
                        sumqx = seq_sum(w_s * q * x_s)
                        sumq2 = seq_sum(w_s * q * q)
                        if sumq2 > 0 and sumqx * sumqx > best_score * sumq2:
                            scale = sumqx / sumq2
                            best_score = scale * sumqx
                            besti1, besti2, best_k = i1, i2, k
            assert besti1 >= 0 and besti2 >= 0 and best_k >= 0
            L = np.zeros(bsz, np.int8)
            L[order[:besti1]] = 0
            L[order[besti1:besti2]] = 1
            L[order[besti2:]] = 2
            if scale < 0:
                L = 2 - L
                scale = -scale
                best_k = {0: 3, 1: 2, 2: 1, 3: 0}[best_k]
            all_on_grid = True
            index = np.zeros(2, np.uint16)
            for k in range(2):
                xg = (x_p if best_k < 2 else x_m) if k == 0 else \
                    (x_p if best_k % 2 == 0 else x_m)
                u = int((L[8 * k:8 * k + 8].astype(np.uint16)
                         << (2 * np.arange(8))).sum())
                gi = int(kmap[u])
                if gi < 0:
                    all_on_grid = False
                    gi = _iq1_best_neighbour2(
                        _neighbours_at(neigh, kmap, u), grid,
                        xb[8 * k:8 * k + 8], weight[8 * k:8 * k + 8],
                        scale, xg)
                    L[8 * k:8 * k + 8] = (grid[gi] - 1) // 2
                index[k] = gi
            if not all_on_grid:
                sumqx_f = F32(0.0)
                sumq2_f = F32(0.0)
                for k in range(2):
                    xg = (x_p if best_k < 2 else x_m) if k == 0 else \
                        (x_p if best_k % 2 == 0 else x_m)
                    gq = xg[(grid[index[k]].astype(np.int32) - 1) // 2]
                    w8 = weight[8 * k:8 * k + 8]
                    sumqx_f = sumqx_f + seq_sum(w8 * gq * xb[8 * k:8 * k + 8])
                    sumq2_f = sumq2_f + seq_sum(w8 * gq * gq)
                if sumqx_f > 0 and sumq2_f > 0:
                    scale = sumqx_f / sumq2_f
            out["qs"][ibl, 2 * ib + 0] = index[0] & 255
            out["qs"][ibl, 2 * ib + 1] = index[1] & 255
            out["qh"][ibl, ib] = (int(index[0]) >> 8) \
                | ((int(index[1]) >> 8) << 4)
            scales[ib] = scale
            shifts[ib] = best_k
            max_scale = max(max_scale, F32(scale))
        if not max_scale:
            continue
        sc = out["scales"][ibl].view(np.uint16)
        d = F32(max_scale) / F32(15.0)
        id_ = F32(1.0) / d
        sumqx_f = F32(0.0)
        sumq2_f = F32(0.0)
        for ib in range(QK_K // bsz):
            l = int(np.clip(nearest_int(
                F32(0.5) * (id_ * F32(scales[ib]) - F32(1.0))), 0, 7))
            sc[ib // 4] |= l << (3 * (ib % 4))
            out["qh"][ibl, ib] |= masks[shifts[ib]]
            xb = xbl[bsz * ib:bsz * (ib + 1)]
            weight = block_weight(ibl, ib, xb, sigma2)
            for k in range(2):
                xg = (x_p if shifts[ib] < 2 else x_m) if k == 0 else \
                    (x_p if shifts[ib] % 2 == 0 else x_m)
                gi = int(out["qs"][ibl, 2 * ib + k]) \
                    | ((int(out["qh"][ibl, ib]) << (8 - 4 * k)) & 0x700)
                gq = (xg[(grid[gi].astype(np.int32) - 1) // 2]
                      * F32(2 * l + 1))
                w8 = weight[8 * k:8 * k + 8]
                sumqx_f = sumqx_f + seq_sum(w8 * gq * xb[8 * k:8 * k + 8])
                sumq2_f = sumq2_f + seq_sum(w8 * gq * gq)
        if sumq2_f > 0:
            d = sumqx_f / sumq2_f
        su16 = fp32_to_fp16(np.float32(d * F32(1.1125))).view(np.uint16)
        sc[0] |= (int(su16) & 0x000F) << 12
        sc[1] |= (int(su16) & 0x00F0) << 8
        sc[2] |= (int(su16) & 0x0F00) << 4
        sc[3] |= (int(su16) & 0xF000)
    return out.reshape(x.shape[:-1] + (x.shape[-1] // QK_K,))
