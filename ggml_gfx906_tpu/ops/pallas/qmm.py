"""Fused dequant+matmul Pallas kernels — the performance core.

Replaces ggml's mmvq/mmq CUDA kernels and the gfx906 V_DOT paths
(ref: src/ggml-cuda/mmvq.cu, mmq.cu, vecdotq.cuh; gfx906 overrides
src/ggml-cuda/q4_0-gfx906.cuh etc.). Weights stay packed in HBM and are
expanded in VMEM right before feeding the MXU — one pass over the packed
bytes per matmul instead of XLA's dequantize-to-dense-then-dot.

Layout: "lane-interleaved blocks". TPU lanes are 128 wide and Mosaic
supports lane-tiling via pltpu.repeat (period-G tile) but not arbitrary
lane-crossing reshapes. So at load time the packed bytes are re-interleaved
so that lane l belongs to sub-block (l % G) of its 128-lane tile
(G = 4 sub-blocks for Q4_K, 4×32-blocks for Q8_0, 8×16-byte blocks for
Q4_0); per-block scales then expand with a single pltpu.repeat. The small
activation matrix is permuted to the same element order outside the kernel
(XLA fuses it). In-kernel: loop over 128-lane tiles → unpack → scale →
128-deep MXU dot, accumulating in a VMEM scratch across the K grid axis.

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


def _f32(x):
    return x.astype(jnp.int32).astype(jnp.float32)


def _nibbles(q_u8):
    """u8 → (lo, hi) f32. 8-bit shifts don't legalize on Mosaic — widen to
    int32 first."""
    q = q_u8.astype(jnp.int32)
    return (q & 0xF).astype(jnp.float32), (q >> 4).astype(jnp.float32)


def _pick_tiles(m, n, k_tiles):
    """Tile sizes; k is tiled in units of 128-lane tiles. Kept small: the
    statically unrolled k loop keeps temporaries live, and v5e has 16 MB
    VMEM/core (empirically tn=256,tkt=16 blows the scoped-vmem budget on
    the 11008-row FFN matmuls)."""
    tm = min(128, max(8, m))
    tn = min(128, n)
    tkt = k_tiles if k_tiles <= 8 else 8
    return tm, tn, tkt


def _common_call(kernel, m, n, kt, tm, tn, tkt, x_inputs, w_inputs):
    """Shared pallas_call plumbing: grid (M/tm, N/tn, KT/tkt); operands are
    3-D (rows, k_tiles, lanes) with k sliced on the middle axis."""
    n_k = _cdiv(kt, tkt)
    grid = (_cdiv(m, tm), _cdiv(n, tn), n_k)

    def xspec(lanes):
        return pl.BlockSpec((tm, tkt, lanes), lambda i, j, k: (i, k, 0))

    def wspec(lanes):
        return pl.BlockSpec((tn, tkt, lanes), lambda i, j, k: (j, k, 0))

    in_specs = [xspec(s.shape[2]) for s in x_inputs] + \
               [wspec(s.shape[2]) for s in w_inputs]
    return pl.pallas_call(
        functools.partial(kernel, n_k=n_k, tkt=tkt),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=_interpret(),
    )(*x_inputs, *w_inputs)


def _dot_nt(a, b):
    """(tm, 128) ⋅ (tn, 128)^T → (tm, tn)."""
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


# ---------------------------------------------------------------- Q4_K
# kernel layout per 256-element superblock (one 128-lane tile of bytes):
#   byte lane l = 4*j + g  (g = 64-element group 0..3, j = byte 0..31)
#   lo nibble → element 256*sb + 64*g + j      (sub-block 2g)
#   hi nibble → element 256*sb + 64*g + 32 + j (sub-block 2g+1)

def _q4k_kernel(xlo_ref, xhi_ref, qs_ref, dsclo_ref, dschi_ref,
                dmlo_ref, dmhi_ref, out_ref, acc_ref, *, n_k: int, tkt: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    for i in range(tkt):  # static unroll: dynamic i8 mid-dim slices don't
        lo, hi = _nibbles(qs_ref[:, i, :])        # legalize on Mosaic
        wlo = lo * pltpu.repeat(dsclo_ref[:, i, :], 32, axis=1) \
            - pltpu.repeat(dmlo_ref[:, i, :], 32, axis=1)
        whi = hi * pltpu.repeat(dschi_ref[:, i, :], 32, axis=1) \
            - pltpu.repeat(dmhi_ref[:, i, :], 32, axis=1)
        acc_ref[...] += _dot_nt(xlo_ref[:, i, :], wlo)
        acc_ref[...] += _dot_nt(xhi_ref[:, i, :], whi)

    @pl.when(k == n_k - 1)
    def _():
        out_ref[...] = acc_ref[...]


def q4k_weight_layout(qs, d, dmin, sc, mm):
    """Wire fields → kernel operands.

    qs (N, Sb, 128) u8 wire → lane-interleaved (N, Sb, 128); scales
    pre-multiplied: dsc_lo/hi = d*sc[even/odd], dm_lo/hi = dmin*mm[even/odd],
    all (N, Sb, 4) f32 (32 B per 256 weights → ~5.5 effective bpw)."""
    n, sb, _ = qs.shape
    qs_k = qs.reshape(n, sb, 4, 32).transpose(0, 1, 3, 2).reshape(n, sb, 128)
    d32 = d.astype(jnp.float32)[..., None]
    m32 = dmin.astype(jnp.float32)[..., None]
    scf = sc.astype(jnp.float32)
    mmf = mm.astype(jnp.float32)
    return (qs_k, d32 * scf[..., 0::2], d32 * scf[..., 1::2],
            m32 * mmf[..., 0::2], m32 * mmf[..., 1::2])


def q4k_split_x(x):
    """x (M, K) → x_lo, x_hi (M, K/256, 128) in kernel element order."""
    m, kdim = x.shape
    xr = x.reshape(m, kdim // 256, 4, 2, 32)      # (M, sb, g, half, j)
    xlo = xr[:, :, :, 0, :].transpose(0, 1, 3, 2).reshape(m, kdim // 256, 128)
    xhi = xr[:, :, :, 1, :].transpose(0, 1, 3, 2).reshape(m, kdim // 256, 128)
    return xlo, xhi


def qmm_q4_K(x, qs_k, dsclo, dschi, dmlo, dmhi):
    """x (M, K) @ W(N, K).T, W in Q4_K kernel layout → (M, N) f32."""
    m, kdim = x.shape
    n, kt, _ = qs_k.shape
    assert kdim == kt * 256, (x.shape, qs_k.shape)
    xlo, xhi = q4k_split_x(x.astype(jnp.float32))
    tm, tn, tkt = _pick_tiles(m, n, kt)
    return _common_call(_q4k_kernel, m, n, kt, tm, tn, tkt,
                        [xlo, xhi], [qs_k, dsclo, dschi, dmlo, dmhi])


# ---------------------------------------------------------------- Q8_0
# kernel layout per 128-element tile: byte lane l = 4*j + b
# (b = 32-block 0..3, j = byte 0..31) → element 128*t + 32*b + j

def _q8_kernel(x_ref, qs_ref, d_ref, out_ref, acc_ref, *, n_k: int, tkt: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    for i in range(tkt):  # static unroll (see _q4k_kernel)
        w = qs_ref[:, i, :].astype(jnp.float32) * \
            pltpu.repeat(d_ref[:, i, :], 32, axis=1)
        acc_ref[...] += _dot_nt(x_ref[:, i, :], w)

    @pl.when(k == n_k - 1)
    def _():
        out_ref[...] = acc_ref[...]


def q8_weight_layout(qs, d):
    """qs (N, nb, 32) i8 wire → (N, K/128, 128); d (N, nb) → (N, K/128, 4) f32."""
    n, nb, _ = qs.shape
    kdim = nb * 32
    qs_k = qs.reshape(n, kdim // 128, 4, 32).transpose(0, 1, 3, 2).reshape(
        n, kdim // 128, 128)
    d_k = d.astype(jnp.float32).reshape(n, kdim // 128, 4)
    return qs_k, d_k


def q8_split_x(x):
    m, kdim = x.shape
    xr = x.reshape(m, kdim // 128, 4, 32)
    return xr.transpose(0, 1, 3, 2).reshape(m, kdim // 128, 128)


def qmm_q8_0(x, qs_k, d_k):
    m, kdim = x.shape
    n, kt, _ = qs_k.shape
    assert kdim == kt * 128, (x.shape, qs_k.shape)
    xk = q8_split_x(x.astype(jnp.float32))
    tm, tn, tkt = _pick_tiles(m, n, kt)
    return _common_call(_q8_kernel, m, n, kt, tm, tn, tkt, [xk], [qs_k, d_k])


# ---------------------------------------------------------------- Q4_0
# kernel layout per 256-element tile (128 packed bytes): byte lane
# l = 8*j + b (b = 32-block 0..7, j = byte 0..15);
# lo nibble → element 256*t + 32*b + j, hi → +16

def _q40_kernel(xlo_ref, xhi_ref, qs_ref, d_ref, out_ref, acc_ref,
                *, n_k: int, tkt: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    for i in range(tkt):  # static unroll (see _q4k_kernel)
        lo, hi = _nibbles(qs_ref[:, i, :])
        drep = pltpu.repeat(d_ref[:, i, :], 16, axis=1)   # (tn, 128)
        wlo = (lo - 8.0) * drep
        whi = (hi - 8.0) * drep
        acc_ref[...] += _dot_nt(xlo_ref[:, i, :], wlo)
        acc_ref[...] += _dot_nt(xhi_ref[:, i, :], whi)

    @pl.when(k == n_k - 1)
    def _():
        out_ref[...] = acc_ref[...]


def q40_weight_layout(qs, d):
    """qs (N, nb, 16) u8 wire → (N, K/256, 128); d (N, nb) → (N, K/256, 8) f32."""
    n, nb, _ = qs.shape
    kdim = nb * 32
    qs_k = qs.reshape(n, kdim // 256, 8, 16).transpose(0, 1, 3, 2).reshape(
        n, kdim // 256, 128)
    d_k = d.astype(jnp.float32).reshape(n, kdim // 256, 8)
    return qs_k, d_k


def q40_split_x(x):
    m, kdim = x.shape
    xr = x.reshape(m, kdim // 256, 8, 2, 16)      # (M, t, b, half, j)
    xlo = xr[:, :, :, 0, :].transpose(0, 1, 3, 2).reshape(m, kdim // 256, 128)
    xhi = xr[:, :, :, 1, :].transpose(0, 1, 3, 2).reshape(m, kdim // 256, 128)
    return xlo, xhi


def qmm_q4_0(x, qs_k, d_k):
    m, kdim = x.shape
    n, kt, _ = qs_k.shape
    assert kdim == kt * 256, (x.shape, qs_k.shape)
    xlo, xhi = q40_split_x(x.astype(jnp.float32))
    tm, tn, tkt = _pick_tiles(m, n, kt)
    return _common_call(_q40_kernel, m, n, kt, tm, tn, tkt,
                        [xlo, xhi], [qs_k, d_k])
