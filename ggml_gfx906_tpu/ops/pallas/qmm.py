"""Fused dequant+matmul Pallas kernels — the performance core.

Replaces ggml's mmvq/mmq CUDA kernels and the gfx906 V_DOT paths
(ref: src/ggml-cuda/mmvq.cu, mmq.cu, vecdotq.cuh; gfx906 overrides
src/ggml-cuda/q4_0-gfx906.cuh etc.). Weights stay packed in HBM and are
expanded in VMEM right before feeding the MXU — one pass over the packed
bytes per matmul instead of XLA's dequantize-to-dense-then-dot.

Layout rules learned on hardware (v5e, Mosaic):
- All HBM operands are 2-D with lane-dense rows: 3-D arrays with small
  trailing dims get tiled-layout padding in HBM (observed 32x expansion on
  (N, Sb, 4) f32 scales → 51 GB OOM for a 7B model).
- Within a 128-byte lane tile, bytes are interleaved so lane l belongs to
  sub-block l % G (G = 4 for Q4_K 64-element groups, 4×32-blocks for Q8_0,
  8×16-byte blocks for Q4_0); per-block scales then expand with one
  pltpu.repeat. The activation matrix is permuted to match outside the
  kernel (XLA fuses that).
- The whole K dimension is one grid step (block lane dim == array lane dim
  is always legal, and out-of-bounds block padding is undefined — NaN in
  interpret mode — so no K padding may ever be read). The in-kernel loop
  over K lane-tiles is statically unrolled (dynamic u8 slices don't
  legalize; 8-bit shifts don't either — widen to i32 first).

This is the direct analogue of repack.cpp's load-time re-layout plus the
LDS-tiled dot kernels of the gfx906 fork.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _cdiv(a, b):
    return -(-a // b)


def _interpret() -> bool:
    # compiled on TPU; interpreter mode elsewhere so tests exercise the
    # same kernel logic on CPU
    return jax.default_backend() != "tpu"


def _nibbles(q_u8):
    q = q_u8.astype(jnp.int32)
    return (q & 0xF).astype(jnp.float32), (q >> 4).astype(jnp.float32)


def _dot_nt(a, b):
    """(tm, 128) ⋅ (tn, 128)^T → (tm, tn)."""
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _pick_mn(m, n):
    tm = min(64, max(8, m))
    tn = min(128, n)
    return tm, tn


def _common_call(kernel, m, n, kt, tm, tn, x_inputs, x_lanes, w_inputs,
                 w_lanes):
    """grid (M/tm, N/tn); K is not tiled (full-row blocks — always legal and
    never reads block padding); lane widths are per-lane-tile."""
    grid = (_cdiv(m, tm), _cdiv(n, tn))
    in_specs = (
        [pl.BlockSpec((tm, kt * ln), lambda i, j: (i, 0)) for ln in x_lanes]
        + [pl.BlockSpec((tn, kt * ln), lambda i, j: (j, 0)) for ln in w_lanes]
    )
    return pl.pallas_call(
        functools.partial(kernel, kt=kt),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tm, tn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=_interpret(),
    )(*x_inputs, *w_inputs)


# ---------------------------------------------------------------- Q4_K
# per 256-element superblock = one 128-byte lane tile:
#   byte lane l = 4*j + g  (g = 64-element group 0..3, j = byte 0..31)
#   lo nibble → element 256*sb + 64*g + j      (sub-block 2g)
#   hi nibble → element 256*sb + 64*g + 32 + j (sub-block 2g+1)
# scales: 4 f32 per superblock per field, flattened (N, Sb*4)

def _q4k_kernel(xlo_ref, xhi_ref, qs_ref, dsclo_ref, dschi_ref,
                dmlo_ref, dmhi_ref, out_ref, *, kt: int):
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for i in range(kt):
        lo, hi = _nibbles(qs_ref[:, i * 128:(i + 1) * 128])
        s4 = slice(i * 4, (i + 1) * 4)
        wlo = lo * pltpu.repeat(dsclo_ref[:, s4], 32, axis=1) \
            - pltpu.repeat(dmlo_ref[:, s4], 32, axis=1)
        whi = hi * pltpu.repeat(dschi_ref[:, s4], 32, axis=1) \
            - pltpu.repeat(dmhi_ref[:, s4], 32, axis=1)
        acc += _dot_nt(xlo_ref[:, i * 128:(i + 1) * 128], wlo)
        acc += _dot_nt(xhi_ref[:, i * 128:(i + 1) * 128], whi)
    out_ref[...] = acc


def q4k_weight_layout(qs, d, dmin, sc, mm):
    """Wire fields → kernel operands (all 2-D, lane-dense).

    qs (N, Sb, 128) u8 → lane-interleaved (N, Sb*128);
    dsc_lo/hi = d*sc[even/odd], dm_lo/hi = dmin*mm[even/odd], (N, Sb*4) f32."""
    n, sb, _ = qs.shape
    qs_k = qs.reshape(n, sb, 4, 32).transpose(0, 1, 3, 2).reshape(n, sb * 128)
    d32 = d.astype(jnp.float32)[..., None]
    m32 = dmin.astype(jnp.float32)[..., None]
    scf = sc.astype(jnp.float32)
    mmf = mm.astype(jnp.float32)
    r = lambda a: a.reshape(n, sb * 4)
    return (qs_k, r(d32 * scf[..., 0::2]), r(d32 * scf[..., 1::2]),
            r(m32 * mmf[..., 0::2]), r(m32 * mmf[..., 1::2]))


def q4k_split_x(x):
    """x (M, K) → x_lo, x_hi (M, K/2) in kernel element order."""
    m, kdim = x.shape
    xr = x.reshape(m, kdim // 256, 4, 2, 32)      # (M, sb, g, half, j)
    xlo = xr[:, :, :, 0, :].transpose(0, 1, 3, 2).reshape(m, kdim // 2)
    xhi = xr[:, :, :, 1, :].transpose(0, 1, 3, 2).reshape(m, kdim // 2)
    return xlo, xhi


def qmm_q4_K(x, qs_k, dsclo, dschi, dmlo, dmhi):
    """x (M, K) @ W(N, K).T, W in Q4_K kernel layout → (M, N) f32."""
    m, kdim = x.shape
    n = qs_k.shape[0]
    kt = kdim // 256
    assert qs_k.shape[1] == kt * 128, (x.shape, qs_k.shape)
    xlo, xhi = q4k_split_x(x.astype(jnp.float32))
    tm, tn = _pick_mn(m, n)
    return _common_call(_q4k_kernel, m, n, kt, tm, tn,
                        [xlo, xhi], [128, 128],
                        [qs_k, dsclo, dschi, dmlo, dmhi],
                        [128, 4, 4, 4, 4])


# ---------------------------------------------------------------- Q8_0
# per 128-element lane tile: byte lane l = 4*j + b (b = 32-block 0..3)
# → element 128*t + 32*b + j; d flattened (N, K/32) in natural block order
# (block of lane l in tile t = 4*t + l%4)

def _q8_kernel(x_ref, qs_ref, d_ref, out_ref, *, kt: int):
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for i in range(kt):
        w = qs_ref[:, i * 128:(i + 1) * 128].astype(jnp.float32) * \
            pltpu.repeat(d_ref[:, i * 4:(i + 1) * 4], 32, axis=1)
        acc += _dot_nt(x_ref[:, i * 128:(i + 1) * 128], w)
    out_ref[...] = acc


def q8_weight_layout(qs, d):
    """qs (N, nb, 32) i8 → (N, K) lane-interleaved; d (N, nb) → (N, K/32) f32."""
    n, nb, _ = qs.shape
    kdim = nb * 32
    qs_k = qs.reshape(n, kdim // 128, 4, 32).transpose(0, 1, 3, 2).reshape(n, kdim)
    d_k = d.astype(jnp.float32).reshape(n, kdim // 32)
    return qs_k, d_k


def q8_split_x(x):
    m, kdim = x.shape
    xr = x.reshape(m, kdim // 128, 4, 32)
    return xr.transpose(0, 1, 3, 2).reshape(m, kdim)


def qmm_q8_0(x, qs_k, d_k):
    m, kdim = x.shape
    n = qs_k.shape[0]
    kt = kdim // 128
    assert qs_k.shape[1] == kdim, (x.shape, qs_k.shape)
    xk = q8_split_x(x.astype(jnp.float32))
    tm, tn = _pick_mn(m, n)
    return _common_call(_q8_kernel, m, n, kt, tm, tn,
                        [xk], [128], [qs_k, d_k], [128, 4])


# ---------------------------------------------------------------- Q4_0
# per 256-element lane tile (128 packed bytes): byte lane l = 8*j + b
# (b = 32-block 0..7, j = byte 0..15); lo → 256*t + 32*b + j, hi → +16;
# d (N, K/32) natural order (block of lane l in tile t = 8*t + l%8)

def _q40_kernel(xlo_ref, xhi_ref, qs_ref, d_ref, out_ref, *, kt: int):
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for i in range(kt):
        lo, hi = _nibbles(qs_ref[:, i * 128:(i + 1) * 128])
        drep = pltpu.repeat(d_ref[:, i * 8:(i + 1) * 8], 16, axis=1)
        wlo = (lo - 8.0) * drep
        whi = (hi - 8.0) * drep
        acc += _dot_nt(xlo_ref[:, i * 128:(i + 1) * 128], wlo)
        acc += _dot_nt(xhi_ref[:, i * 128:(i + 1) * 128], whi)
    out_ref[...] = acc


def q40_weight_layout(qs, d):
    """qs (N, nb, 16) u8 → (N, K/2); d (N, nb) → (N, K/32) f32."""
    n, nb, _ = qs.shape
    kdim = nb * 32
    qs_k = qs.reshape(n, kdim // 256, 8, 16).transpose(0, 1, 3, 2).reshape(
        n, kdim // 2)
    d_k = d.astype(jnp.float32).reshape(n, kdim // 32)
    return qs_k, d_k


def q40_split_x(x):
    m, kdim = x.shape
    xr = x.reshape(m, kdim // 256, 8, 2, 16)      # (M, t, b, half, j)
    xlo = xr[:, :, :, 0, :].transpose(0, 1, 3, 2).reshape(m, kdim // 2)
    xhi = xr[:, :, :, 1, :].transpose(0, 1, 3, 2).reshape(m, kdim // 2)
    return xlo, xhi


def qmm_q4_0(x, qs_k, d_k):
    m, kdim = x.shape
    n = qs_k.shape[0]
    kt = kdim // 256
    assert qs_k.shape[1] == kdim // 2, (x.shape, qs_k.shape)
    xlo, xhi = q40_split_x(x.astype(jnp.float32))
    tm, tn = _pick_mn(m, n)
    return _common_call(_q40_kernel, m, n, kt, tm, tn,
                        [xlo, xhi], [128, 128], [qs_k, d_k], [128, 8])

# ---------------------------------------------------------- int8-MXU path
# The TPU analogue of the reference's integer-dot pipeline: on-the-fly q8
# activation quantization (src/ggml-cuda/quantize.cu) feeding integer dot
# products (mmq.cu:275, vecdotq.cuh:590-672, the gfx906 V_DOT delta).
#
# MXU shape dictates a different factorization than dp4a: per-32-block
# integer dots would run the systolic array at 1/4 contraction depth, so
# instead both operands are requantized to a shared scale per 128-lane
# tile — activations per (row, tile) outside the kernel, weights in-kernel
# with the per-block wire scales pre-divided by an analytic per-tile bound
# (folded into the scale operands, so requantization costs no extra
# in-kernel multiplies). Each tile then contributes one full-depth
# int8×int8→int32 MXU dot, and the f32 tile scales apply to the int32
# partial sums as a rank-1 (row ⊗ column) factor:
#   out += (qx ⋅ qw^T) · ex[m,t] · dw[n,t]
# Exactness: the integer dot is exact (verified on hardware); the only new
# error is the two int8 roundings, bounded by the tile max / 254.

def _round_i8(w):
    # explicit clamp: Mosaic's f32→i8 cast saturates but XLA (interpret
    # mode) wraps — clip so both paths agree
    return jnp.clip(jnp.round(w), -127.0, 127.0).astype(jnp.int8)


def _dot_nt_i8(a, b):
    """(tm, 128) i8 ⋅ (tn, 128) i8 ^T → (tm, tn) i32 (integer MXU)."""
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.int32)


def quantize_x_tiles(x):
    """Per-(row, 128-lane-tile) symmetric int8 activation quantization.

    x (M, K) f32 in kernel element order → qx (M, K) int8, ex (M, K/128)
    f32 scales. XLA-side (fuses with the preceding permute); the kernel
    consumes both."""
    m, kdim = x.shape
    xt = x.reshape(m, kdim // 128, 128).astype(jnp.float32)
    amax = jnp.max(jnp.abs(xt), axis=-1)
    ex = amax / 127.0
    inv = jnp.where(amax > 0, 127.0 / jnp.where(amax > 0, amax, 1.0), 0.0)
    qx = jnp.clip(jnp.round(xt * inv[..., None]), -127.0, 127.0)
    return qx.astype(jnp.int8).reshape(m, kdim), ex


def _tile_fold(dsc, dm, blk_per_tile, qmax):
    """Fold per-block scales by the analytic per-tile amax bound.

    dsc/dm (N, kt*B) f32 (dm may be None for symmetric formats) →
    (dsc', dm', dw) with dsc' = dsc/dw per tile, dw (N, kt) = per-tile
    max|w|/127 where |w| ≤ max(qmax·dsc − dm, dm) per block (q ∈ [0, qmax],
    scales ≥ 0 by construction — the bound is near-tight because the
    codecs place the block max at q = qmax)."""
    n, nb = dsc.shape
    kt = nb // blk_per_tile
    d3 = dsc.reshape(n, kt, blk_per_tile)
    if dm is None:
        bound = qmax * jnp.abs(d3)
    else:
        m3 = dm.reshape(n, kt, blk_per_tile)
        bound = jnp.maximum(jnp.abs(qmax * d3 - m3), jnp.abs(m3))
    amax = bound.max(-1)                              # (N, kt)
    dw = amax / 127.0
    inv = jnp.where(amax > 0, 127.0 / jnp.where(amax > 0, amax, 1.0), 0.0)
    dsc_f = (d3 * inv[..., None]).reshape(n, nb)
    dm_f = None if dm is None else (m3 * inv[..., None]).reshape(n, nb)
    return dsc_f, dm_f, dw


def _q4k_i8_kernel(qxlo_ref, exlo_ref, qxhi_ref, exhi_ref, qs_ref,
                   dsclo_ref, dschi_ref, dmlo_ref, dmhi_ref,
                   dwlo_ref, dwhi_ref, out_ref, *, kt: int):
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for i in range(kt):
        lo, hi = _nibbles(qs_ref[:, i * 128:(i + 1) * 128])
        s4 = slice(i * 4, (i + 1) * 4)
        w8lo = _round_i8(lo * pltpu.repeat(dsclo_ref[:, s4], 32, axis=1)
                         - pltpu.repeat(dmlo_ref[:, s4], 32, axis=1))
        w8hi = _round_i8(hi * pltpu.repeat(dschi_ref[:, s4], 32, axis=1)
                         - pltpu.repeat(dmhi_ref[:, s4], 32, axis=1))
        plo = _dot_nt_i8(qxlo_ref[:, i * 128:(i + 1) * 128], w8lo)
        phi = _dot_nt_i8(qxhi_ref[:, i * 128:(i + 1) * 128], w8hi)
        acc += plo.astype(jnp.float32) * exlo_ref[:, i:i + 1] \
            * dwlo_ref[i:i + 1, :]
        acc += phi.astype(jnp.float32) * exhi_ref[:, i:i + 1] \
            * dwhi_ref[i:i + 1, :]
    out_ref[...] = acc


def _qd_i8_kernel(qx_ref, ex_ref, qs_ref, dsc_ref, dw_ref, out_ref, *,
                  kt: int, nblk: int, blk: int, shift: float):
    """Symmetric formats (Q8_0 nblk=4, Q4_0 nblk=8 with shift=8)."""
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for i in range(kt):
        q = qs_ref[:, i * 128:(i + 1) * 128]
        qf = (q.astype(jnp.int32).astype(jnp.float32) - shift) if shift \
            else q.astype(jnp.float32)
        sn = slice(i * nblk, (i + 1) * nblk)
        w8 = _round_i8(qf * pltpu.repeat(dsc_ref[:, sn], blk, axis=1))
        p = _dot_nt_i8(qx_ref[:, i * 128:(i + 1) * 128], w8)
        acc += p.astype(jnp.float32) * ex_ref[:, i:i + 1] * dw_ref[i:i + 1, :]
    out_ref[...] = acc


def _q40_i8_kernel(qxlo_ref, exlo_ref, qxhi_ref, exhi_ref, qs_ref,
                   dsc_ref, dw_ref, out_ref, *, kt: int):
    """Q4_0: one packed byte tile yields lo/hi 128-element halves sharing
    the same 8 blocks' scales (both halves of a 32-block live in one
    tile pair, so dsc/dw are shared)."""
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for i in range(kt):
        lo, hi = _nibbles(qs_ref[:, i * 128:(i + 1) * 128])
        drep = pltpu.repeat(dsc_ref[:, i * 8:(i + 1) * 8], 16, axis=1)
        w8lo = _round_i8((lo - 8.0) * drep)
        w8hi = _round_i8((hi - 8.0) * drep)
        plo = _dot_nt_i8(qxlo_ref[:, i * 128:(i + 1) * 128], w8lo)
        phi = _dot_nt_i8(qxhi_ref[:, i * 128:(i + 1) * 128], w8hi)
        scale = dw_ref[i:i + 1, :]
        acc += plo.astype(jnp.float32) * exlo_ref[:, i:i + 1] * scale
        acc += phi.astype(jnp.float32) * exhi_ref[:, i:i + 1] * scale
    out_ref[...] = acc


def _i8_call(kernel, m, n, kt, x_inputs, x_lanes, w_inputs, w_lanes,
             dw_inputs, tm=None, tn=None):
    """Like _common_call but with (kt, N)-shaped transposed tile-scale
    operands appended (sliced per-tile inside the kernel as (1, tn) rows)."""
    if tm is None:
        tm, tn = _pick_mn(m, n)
    grid = (_cdiv(m, tm), _cdiv(n, tn))
    in_specs = (
        [pl.BlockSpec((tm, kt * ln), lambda i, j: (i, 0)) for ln in x_lanes]
        + [pl.BlockSpec((tn, kt * ln), lambda i, j: (j, 0)) for ln in w_lanes]
        + [pl.BlockSpec((kt, tn), lambda i, j: (0, j)) for _ in dw_inputs]
    )
    return pl.pallas_call(
        functools.partial(kernel, kt=kt),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tm, tn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=_interpret(),
    )(*x_inputs, *w_inputs, *dw_inputs)


def qmm_q4_K_i8(x, qs_k, dsclo, dschi, dmlo, dmhi):
    """Integer-MXU Q4_K matmul (prefill path): x (M, K) f32 → (M, N) f32."""
    m, kdim = x.shape
    n = qs_k.shape[0]
    kt = kdim // 256
    xlo, xhi = q4k_split_x(x.astype(jnp.float32))
    qxlo, exlo = quantize_x_tiles(xlo)
    qxhi, exhi = quantize_x_tiles(xhi)
    dsclo_f, dmlo_f, dwlo = _tile_fold(dsclo, dmlo, 4, 15.0)
    dschi_f, dmhi_f, dwhi = _tile_fold(dschi, dmhi, 4, 15.0)
    return _i8_call(
        _q4k_i8_kernel, m, n, kt,
        [qxlo, exlo, qxhi, exhi], [128, 1, 128, 1],
        [qs_k, dsclo_f, dschi_f, dmlo_f, dmhi_f], [128, 4, 4, 4, 4],
        [dwlo.T, dwhi.T])


def qmm_q8_0_i8(x, qs_k, d_k):
    m, kdim = x.shape
    n = qs_k.shape[0]
    kt = kdim // 128
    qx, ex = quantize_x_tiles(q8_split_x(x.astype(jnp.float32)))
    dsc_f, _, dw = _tile_fold(d_k, None, 4, 127.0)
    return _i8_call(
        functools.partial(_qd_i8_kernel, nblk=4, blk=32, shift=0.0),
        m, n, kt, [qx, ex], [128, 1], [qs_k, dsc_f], [128, 4], [dw.T])


def qmm_q4_0_i8(x, qs_k, d_k):
    m, kdim = x.shape
    n = qs_k.shape[0]
    kt = kdim // 256
    xlo, xhi = q40_split_x(x.astype(jnp.float32))
    qxlo, exlo = quantize_x_tiles(xlo)
    qxhi, exhi = quantize_x_tiles(xhi)
    dsc_f, _, dw = _tile_fold(d_k, None, 8, 8.0)
    return _i8_call(
        _q40_i8_kernel, m, n, kt,
        [qxlo, exlo, qxhi, exhi], [128, 1, 128, 1],
        [qs_k, dsc_f], [128, 8], [dw.T])


# ------------------------------------------------- Q6_K / Q5_K (expanded)
# These superblock formats carry 6/5-bit values with per-16/per-32 scales;
# round 1 expands them to int8 at load with premultiplied f32 scales
# (10 effective bpw vs 6.56/5.5 wire — they typically cover only one or two
# tensors per model, e.g. output.weight in Q4_K_M files; fully packed
# kernels are a planned optimization). Lane order: element lane
# l = G*j + b (b = block 0..G-1, j = element within block), so scales
# expand with one pltpu.repeat.

def _q8s_kernel(x_ref, qs_ref, dsc_ref, dm_ref, out_ref, *, kt: int,
                nblk: int, blk: int, affine: bool):
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for i in range(kt):
        q = qs_ref[:, i * 128:(i + 1) * 128].astype(jnp.float32)
        dsc = pltpu.repeat(dsc_ref[:, i * nblk:(i + 1) * nblk], blk, axis=1)
        w = q * dsc
        if affine:
            w = w - pltpu.repeat(dm_ref[:, i * nblk:(i + 1) * nblk], blk, axis=1)
        acc += _dot_nt(x_ref[:, i * 128:(i + 1) * 128], w)
    out_ref[...] = acc


def _interleave(a, g, b):
    """(M, K) → (M, K) with per-128 lane order l = g*j + blockidx."""
    m, kdim = a.shape
    return a.reshape(m, kdim // 128, g, b).transpose(0, 1, 3, 2).reshape(m, kdim)


def q6k_weight_layout(q_i8, dsc):
    """q_i8 (N, K) int8 signed values (already -32 shifted), dsc (N, K/16)
    f32 premultiplied d*scale per 16 elements."""
    n, kdim = q_i8.shape
    qs_k = _interleave(q_i8, 8, 16)
    return qs_k, dsc.reshape(n, kdim // 16)


def q5k_weight_layout(q_u8, dsc, dm):
    """q_u8 (N, K) unsigned 5-bit values, per-32 affine scales (N, K/32)."""
    n, kdim = q_u8.shape
    qs_k = _interleave(q_u8.astype(jnp.int8) if hasattr(q_u8, "astype") else q_u8, 4, 32)
    return qs_k, dsc.reshape(n, kdim // 32), dm.reshape(n, kdim // 32)


def _qmm_expanded(x, qs_k, dsc, dm, nblk, blk, affine):
    m, kdim = x.shape
    n = qs_k.shape[0]
    kt = kdim // 128
    xk = _interleave(x.astype(jnp.float32), 128 // blk, blk)
    tm, tn = _pick_mn(m, n)
    grid = (_cdiv(m, tm), _cdiv(n, tn))
    in_specs = [
        pl.BlockSpec((tm, kdim), lambda i, j: (i, 0)),
        pl.BlockSpec((tn, kdim), lambda i, j: (j, 0)),
        pl.BlockSpec((tn, kt * nblk), lambda i, j: (j, 0)),
        pl.BlockSpec((tn, kt * nblk), lambda i, j: (j, 0)),
    ]
    return pl.pallas_call(
        functools.partial(_q8s_kernel, kt=kt, nblk=nblk, blk=blk,
                          affine=affine),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tm, tn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=_interpret(),
    )(xk, qs_k, dsc, dm)


def qmm_q6_K(x, qs_k, dsc):
    return _qmm_expanded(x, qs_k, dsc, dsc, nblk=8, blk=16, affine=False)


def qmm_q5_K(x, qs_k, dsc, dm):
    return _qmm_expanded(x, qs_k, dsc, dm, nblk=4, blk=32, affine=True)
