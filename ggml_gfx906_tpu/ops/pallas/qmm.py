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


_FORCE_INTERPRET = [False]


def _interpret() -> bool:
    # compiled on TPU; interpreter mode elsewhere so tests exercise the
    # same kernel logic on CPU. force_interpret() lets a TPU process trace
    # the interpret variant (the conformance harness's CPU-oracle leg).
    return _FORCE_INTERPRET[0] or jax.default_backend() != "tpu"


class force_interpret:
    """Context manager: trace pallas_calls in interpret mode regardless of
    the default backend (tools/backend_ops.py runs the CPU reference leg
    of each quantized-matmul case this way inside a TPU process; a fresh
    jax.jit per leg gives each its own trace)."""

    def __enter__(self):
        _FORCE_INTERPRET[0] = True

    def __exit__(self, *exc):
        _FORCE_INTERPRET[0] = False
        return False


def _nibbles(q_u8):
    q = q_u8.astype(jnp.int32)
    return (q & 0xF).astype(jnp.float32), (q >> 4).astype(jnp.float32)


def _dot_nt(a, b):
    """(tm, 128) ⋅ (tn, 128)^T → (tm, tn).

    HIGHEST precision: Mosaic's default f32 matmul truncates inputs to
    bf16 (measured NMSE ~5e-6 on hardware vs exact); the f32-expand
    kernels serve decode, which is HBM-bound, so the 3-pass exact dot is
    free there and keeps hardware bit-comparable with interpret mode."""
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)


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
# scales stream at wire density: scm (N, Sb*16) u8 holds the unpacked
# 6-bit [sc_even(4) | sc_odd(4) | mm_even(4) | mm_odd(4)] per superblock and
# dd (N, Sb*2) f32 the [d, dmin] pair; the d·sc f32 products are formed
# in-kernel (identical f32 multiply → results stay bit-exact vs the C
# reference). 152 bytes per superblock = 4.75 bpw streamed vs 6 bpw with
# premultiplied f32 scale arrays — decode is HBM-bound, so this is a
# direct tok/s win.

def _q4k_kernel(xlo_ref, xhi_ref, qs_ref, scm_ref, dd_ref, out_ref, *,
                kt: int):
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for i in range(kt):
        lo, hi = _nibbles(qs_ref[:, i * 128:(i + 1) * 128])
        s = scm_ref[:, i * 16:(i + 1) * 16].astype(jnp.int32) \
            .astype(jnp.float32)
        d = dd_ref[:, 2 * i:2 * i + 1]
        dm = dd_ref[:, 2 * i + 1:2 * i + 2]
        wlo = lo * pltpu.repeat(s[:, 0:4] * d, 32, axis=1) \
            - pltpu.repeat(s[:, 8:12] * dm, 32, axis=1)
        whi = hi * pltpu.repeat(s[:, 4:8] * d, 32, axis=1) \
            - pltpu.repeat(s[:, 12:16] * dm, 32, axis=1)
        acc += _dot_nt(xlo_ref[:, i * 128:(i + 1) * 128], wlo)
        acc += _dot_nt(xhi_ref[:, i * 128:(i + 1) * 128], whi)
    out_ref[...] = acc


def q4k_weight_layout(qs, d, dmin, sc, mm):
    """Wire fields → kernel operands (all 2-D, lane-dense).

    qs (N, Sb, 128) u8 → lane-interleaved (N, Sb*128);
    scm (N, Sb*16) u8 = [sc_even, sc_odd, mm_even, mm_odd] per superblock;
    dd (N, Sb*2) f32 = [d, dmin] per superblock."""
    import numpy as _np

    n, sb, _ = qs.shape
    qs_k = qs.reshape(n, sb, 4, 32).transpose(0, 1, 3, 2).reshape(n, sb * 128)
    scm = _np.concatenate(
        [sc[..., 0::2], sc[..., 1::2], mm[..., 0::2], mm[..., 1::2]],
        axis=-1).astype(_np.uint8).reshape(n, sb * 16)
    dd = _np.stack([_np.asarray(d, _np.float32),
                    _np.asarray(dmin, _np.float32)],
                   axis=-1).reshape(n, sb * 2)
    return qs_k, scm, dd


def q4k_scale_arrays(scm, dd):
    """Expand the packed scale fields back to the four premultiplied f32
    (N, Sb*4) arrays (dsclo, dschi, dmlo, dmhi) — XLA-side, used by the
    int8 prefill path's tile-bound folding and by dequantization."""
    n = scm.shape[0]
    sb = scm.shape[1] // 16
    s = scm.reshape(n, sb, 4, 4).astype(jnp.float32)
    d = dd.reshape(n, sb, 2)
    dsclo = s[:, :, 0] * d[:, :, 0:1]
    dschi = s[:, :, 1] * d[:, :, 0:1]
    dmlo = s[:, :, 2] * d[:, :, 1:2]
    dmhi = s[:, :, 3] * d[:, :, 1:2]
    r = lambda a: a.reshape(n, sb * 4)
    return r(dsclo), r(dschi), r(dmlo), r(dmhi)


def q4k_split_x(x):
    """x (M, K) → x_lo, x_hi (M, K/2) in kernel element order."""
    m, kdim = x.shape
    xr = x.reshape(m, kdim // 256, 4, 2, 32)      # (M, sb, g, half, j)
    xlo = xr[:, :, :, 0, :].transpose(0, 1, 3, 2).reshape(m, kdim // 2)
    xhi = xr[:, :, :, 1, :].transpose(0, 1, 3, 2).reshape(m, kdim // 2)
    return xlo, xhi


def qmm_q4_K(x, qs_k, scm, dd):
    """x (M, K) @ W(N, K).T, W in Q4_K kernel layout → (M, N) f32."""
    m, kdim = x.shape
    n = qs_k.shape[0]
    kt = kdim // 256
    assert qs_k.shape[1] == kt * 128, (x.shape, qs_k.shape)
    xlo, xhi = q4k_split_x(x.astype(jnp.float32))
    tm, tn = _pick_mn(m, n)
    return _common_call(_q4k_kernel, m, n, kt, tm, tn,
                        [xlo, xhi], [128, 128],
                        [qs_k, scm, dd],
                        [128, 16, 2])


# ------------------------------------------------- manual-pipeline decode
# Wire-density decode (4.75 bpw streamed), built on three r03 hardware
# measurements (scripts/exp_dma_tune.py, exp_unpack_cost.py, /tmp probes):
#   1. a SINGLE grid step whose inner fori_loop double-buffers explicit
#      make_async_copy DMAs streams 692-819 GB/s (92-109% of measured
#      HBM) — r02's "Pallas DMA pathological" verdict was the OUTER grid
#      machinery, not the DMA engine;
#   2. nibble unpack + f32 convert on full-width chunks is unmeasurably
#      cheap, BUT any (128,4)→(128,128) scale broadcast costs ~0.4 us
#      (pltpu.repeat, either axis — lane/sublane relayouts), and
#      dynamic-index loads cost ~1 us each: per-superblock scale
#      expansion runs a 4096² matmul at 8 GB/s;
#   3. therefore NO per-element scale materialization: the kernel computes
#      per-(row, 32-group) partial sums with ONE big MXU dot per nibble
#      half against a block-diagonal X (XbT[g, l] = x[l]·[l∈group g]) and
#      applies the Q4_K scales on the small (rows, groups) output —
#      algebraically  y[r] = Σ_g d·sc[r,g]·S[r,g] − Σ_g dmin·mm[r,g]·XS[g],
#      S = nibbles ⊛ XbT, XS = per-group x sums. Scale-selection from the
#      packed scm field also rides the MXU (0/1 selection matrices).
# The lo/hi nibbles are exact in bf16 (integers ≤ 15), so the main dots
# run DEFAULT precision; x is bf16-truncated there (≈2⁻⁹ relative), well
# inside the reference's 0.02 dot-error budget
# (tests/test-quantize-fns.cpp:23). Direct analogue of the fork's raison
# d'être: V_DOT8 on packed nibbles, q4_0-gfx906.cuh:14-21.

def _pipe_tn(n: int, row_bytes: int, want: int = 512 << 10) -> int:
    """Largest 128-multiple chunk of N that divides n and keeps a chunk
    near `want` bytes (two slots must fit VMEM beside x and out)."""
    best = 128
    t = 128
    while t * 2 <= n and n % (t * 2) == 0 and (t * 2) * row_bytes <= want:
        t *= 2
        best = t
    return best


def _dot_nt_default(a, b):
    """(p, L) ⋅ (q, L)^T → (p, q), DEFAULT precision (single MXU pass —
    exact when one operand is small integers, e.g. unpacked nibbles)."""
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _q4k_pipe_kernel(xbt_lo_ref, xbt_hi_ref, scm_ref,
                     dd_ref, sel_ref, seld_ref, qs_hbm, out_ref, *,
                     kt: int, tn: int, slots: int, scm_resident: bool):
    num_chunks = out_ref.shape[0]       # out is (n // tn, tn)
    G = kt * 4          # 32-element scale groups per nibble half

    ones_g = jnp.ones((1, G), jnp.float32)

    def body(qs_s, scm_s, lo_s, hi_s, sem, sem2):
        def dma(slot, ci):
            return pltpu.make_async_copy(
                qs_hbm.at[pl.ds(ci * tn, tn)], qs_s.at[slot], sem.at[slot])

        def dma2(slot, ci):
            return pltpu.make_async_copy(
                scm_ref.at[pl.ds(ci * tn, tn)], scm_s.at[slot],
                sem2.at[slot])

        def start(slot, ci):
            dma(slot, ci).start()
            if not scm_resident:
                dma2(slot, ci).start()

        def wait(slot, ci):
            dma(slot, ci).wait()
            if not scm_resident:
                dma2(slot, ci).wait()

        for s in range(slots - 1):
            start(s, s)

        def loop(ci, _):
            slot = ci % slots

            @pl.when(ci + slots - 1 < num_chunks)
            def _():
                start((ci + slots - 1) % slots, ci + slots - 1)

            wait(slot, ci)
            rows = pl.ds(ci * tn, tn)
            # hoisted ONCE per chunk (dynamic loads cost ~1 us each)
            qsl = qs_s[slot]
            scm_c = (scm_ref[rows, :] if scm_resident
                     else scm_s[slot]).astype(jnp.int32).astype(jnp.float32)
            dd_c = dd_ref[rows, :]

            # unpack into persistent bf16 scratch in 256-row sub-tiles
            # (full-chunk temps blow Mosaic's unrolled-liveness stack);
            # nibbles are exact in bf16, the unpack itself measured free
            for r0 in range(0, tn, 256):
                q = qsl[r0:r0 + 256, :].astype(jnp.int32)
                lo_s[r0:r0 + 256, :] = (q & 0xF).astype(jnp.bfloat16)
                hi_s[r0:r0 + 256, :] = (q >> 4).astype(jnp.bfloat16)

            # per-(row, group) partial sums: ONE big MXU dot per half
            s_lo = _dot_nt_default(lo_s[...], xbt_lo_ref[...])   # (tn, G)
            s_hi = _dot_nt_default(hi_s[...], xbt_hi_ref[...])

            # scale selection rides the MXU too: sel (2G, kt*16) picks
            # [sc_even | sc_odd]; seld (G, kt*2) expands d per group.
            # (the dmin/mm term never touches qs, so the WRAPPER computes
            # it in XLA from the premultiplied scale arrays and subtracts
            # it outside — two fewer in-kernel dots per chunk)
            sc = _dot_nt_default(scm_c, sel_ref[...])            # (tn, 2G)
            d4 = _dot_nt(dd_c, seld_ref[...])                    # (tn, G)
            acc = d4 * (sc[:, 0:G] * s_lo + sc[:, G:] * s_hi)
            # group-reduction + transpose via the MXU ((tn,1) VMEM writes
            # lane-pad 128x)
            out_ref[pl.ds(ci, 1), :] = _dot_nt(ones_g, acc)
            return 0

        jax.lax.fori_loop(0, num_chunks, loop, 0)

    pl.run_scoped(
        body,
        qs_s=pltpu.VMEM((slots, tn, kt * 128), jnp.uint8),
        scm_s=pltpu.VMEM((1 if scm_resident else slots, tn, kt * 16),
                         jnp.uint8),
        lo_s=pltpu.VMEM((tn, kt * 128), jnp.bfloat16),
        hi_s=pltpu.VMEM((tn, kt * 128), jnp.bfloat16),
        sem=pltpu.SemaphoreType.DMA((slots,)),
        sem2=pltpu.SemaphoreType.DMA((slots,)))


@functools.lru_cache(maxsize=32)
def _q4k_pipe_consts(kt: int):
    """Selection matrices (numpy; passed as arguments so they upload once
    per shape, not per call) + group one-hot for the block-diagonal x."""
    import numpy as _np

    G = kt * 4
    # sel: (2G, kt*16) — scm column sb*16+{0..8} → [sc_even | sc_odd]
    sel = _np.zeros((2 * G, kt * 16), _np.float32)
    for sb in range(kt):
        for g in range(4):
            sel[sb * 4 + g, sb * 16 + g] = 1            # sc_even
            sel[G + sb * 4 + g, sb * 16 + 4 + g] = 1    # sc_odd
    # seld: (G, kt*2) — d expanded per group
    seld = _np.zeros((G, kt * 2), _np.float32)
    for sb in range(kt):
        for g in range(4):
            seld[sb * 4 + g, 2 * sb] = 1
    # group id per lane of a nibble half (kernel element order: lane
    # l = i*128 + 4*j + g_half… group of element = its 32-block)
    gid = _np.arange(kt * 128) // 128 * 4 + (_np.arange(kt * 128) % 4)
    onehot = (gid[None, :] == _np.arange(G)[:, None])
    return sel, seld, onehot.astype(_np.float32)


def qmm_q4_K_pipelined(x, qs_k, scm, dd, slots: int = 3):
    """Single-stream (M=1) Q4_K decode matmul at wire density through the
    manual DMA pipeline + two-level MXU dot. Returns (1, N) f32.

    NOT bit-identical to qmm_q4_K: x rides the main dots in bf16 (the
    nibbles are exact; relative error ≈ 2e-3, inside the reference's 0.02
    dot-error budget) — enforced by tests/test_qmm_int8.py and the bench
    quality gate."""
    m, kdim = x.shape
    assert m == 1, "pipelined decode kernel is single-stream"
    n = qs_k.shape[0]
    kt = kdim // 256
    G = kt * 4
    assert qs_k.shape[1] == kt * 128, (x.shape, qs_k.shape)
    sel_np, seld_np, onehot_np = _q4k_pipe_consts(kt)
    sel = jnp.asarray(sel_np)
    seld = jnp.asarray(seld_np)
    onehot = jnp.asarray(onehot_np)

    xlo, xhi = q4k_split_x(x.astype(jnp.float32))
    xbt_lo = (onehot * xlo[0][None, :]).astype(jnp.bfloat16)   # (G, K/2)
    xbt_hi = (onehot * xhi[0][None, :]).astype(jnp.bfloat16)
    xs_lo = xlo[0] @ onehot.T                                  # group sums
    xs_hi = xhi[0] @ onehot.T
    # the dmin/mm term never touches qs — compute it here from the
    # premultiplied scale arrays (XLA streams scm+dd once more, ~0.5 bpw)
    _, _, dmlo, dmhi = q4k_scale_arrays(scm, dd)
    min_vec = dmlo @ xs_lo + dmhi @ xs_hi                      # (n,)

    row_qs = kt * 128
    scm_resident = (kt * 16) % 128 != 0
    tn = _pipe_tn(n, row_qs, want=2 << 20)
    budget = 13 << 20
    resident = n * kt * (16 if scm_resident else 0) + n * kt * 8
    while True:
        work = (slots * tn * row_qs
                + (0 if scm_resident else slots * tn * kt * 16)
                + 2 * tn * row_qs * 2          # lo/hi bf16 scratch
                + 2 * G * row_qs * 2           # XbT halves
                + tn * 2 * G * 4 + resident)
        if work <= budget or tn == 128:
            break
        tn //= 2
    slots = max(2, min(slots, n // tn))

    out = pl.pallas_call(
        functools.partial(_q4k_pipe_kernel, kt=kt, tn=tn, slots=slots,
                          scm_resident=scm_resident),
        in_specs=[
            pl.BlockSpec((G, row_qs), lambda: (0, 0)),
            pl.BlockSpec((G, row_qs), lambda: (0, 0)),
            (pl.BlockSpec((n, kt * 16), lambda: (0, 0)) if scm_resident
             else pl.BlockSpec(memory_space=pltpu.ANY)),
            pl.BlockSpec((n, kt * 2), lambda: (0, 0)),
            pl.BlockSpec((2 * G, kt * 16), lambda: (0, 0)),
            pl.BlockSpec((G, kt * 2), lambda: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((n // tn, tn), lambda: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((n // tn, tn), jnp.float32),
        interpret=_interpret(),
    )(xbt_lo, xbt_hi, scm, dd, sel, seld, qs_k)
    return out.reshape(1, n) - min_vec[None, :]


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
                   dwlo_ref, dwhi_ref, out_ref, wlo_ref, whi_ref, *,
                   kt: int):
    @pl.when(pl.program_id(1) == 0)
    def _expand():
        for i in range(kt):
            lo, hi = _nibbles(qs_ref[:, i * 128:(i + 1) * 128])
            s4 = slice(i * 4, (i + 1) * 4)
            wlo_ref[:, i * 128:(i + 1) * 128] = _round_i8(
                lo * pltpu.repeat(dsclo_ref[:, s4], 32, axis=1)
                - pltpu.repeat(dmlo_ref[:, s4], 32, axis=1))
            whi_ref[:, i * 128:(i + 1) * 128] = _round_i8(
                hi * pltpu.repeat(dschi_ref[:, s4], 32, axis=1)
                - pltpu.repeat(dmhi_ref[:, s4], 32, axis=1))

    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for i in range(kt):
        s = slice(i * 128, (i + 1) * 128)
        plo = _dot_nt_i8(qxlo_ref[:, s], wlo_ref[:, s])
        phi = _dot_nt_i8(qxhi_ref[:, s], whi_ref[:, s])
        acc += plo.astype(jnp.float32) * exlo_ref[:, i:i + 1] \
            * dwlo_ref[i:i + 1, :]
        acc += phi.astype(jnp.float32) * exhi_ref[:, i:i + 1] \
            * dwhi_ref[i:i + 1, :]
    out_ref[...] = acc


def _qd_i8_kernel(qx_ref, ex_ref, qs_ref, dsc_ref, dw_ref, out_ref, w8_ref,
                  *, kt: int, nblk: int, blk: int, shift: float):
    """Symmetric formats (Q8_0 nblk=4, Q4_0 nblk=8 with shift=8)."""
    @pl.when(pl.program_id(1) == 0)
    def _expand():
        for i in range(kt):
            q = qs_ref[:, i * 128:(i + 1) * 128]
            qf = (q.astype(jnp.int32).astype(jnp.float32) - shift) if shift \
                else q.astype(jnp.float32)
            sn = slice(i * nblk, (i + 1) * nblk)
            w8_ref[:, i * 128:(i + 1) * 128] = _round_i8(
                qf * pltpu.repeat(dsc_ref[:, sn], blk, axis=1))

    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for i in range(kt):
        s = slice(i * 128, (i + 1) * 128)
        p = _dot_nt_i8(qx_ref[:, s], w8_ref[:, s])
        acc += p.astype(jnp.float32) * ex_ref[:, i:i + 1] * dw_ref[i:i + 1, :]
    out_ref[...] = acc


def _q40_i8_kernel(qxlo_ref, exlo_ref, qxhi_ref, exhi_ref, qs_ref,
                   dsc_ref, dw_ref, out_ref, wlo_ref, whi_ref, *, kt: int):
    """Q4_0: one packed byte tile yields lo/hi 128-element halves sharing
    the same 8 blocks' scales (both halves of a 32-block live in one
    tile pair, so dsc/dw are shared)."""
    @pl.when(pl.program_id(1) == 0)
    def _expand():
        for i in range(kt):
            lo, hi = _nibbles(qs_ref[:, i * 128:(i + 1) * 128])
            drep = pltpu.repeat(dsc_ref[:, i * 8:(i + 1) * 8], 16, axis=1)
            wlo_ref[:, i * 128:(i + 1) * 128] = _round_i8((lo - 8.0) * drep)
            whi_ref[:, i * 128:(i + 1) * 128] = _round_i8((hi - 8.0) * drep)

    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for i in range(kt):
        s = slice(i * 128, (i + 1) * 128)
        plo = _dot_nt_i8(qxlo_ref[:, s], wlo_ref[:, s])
        phi = _dot_nt_i8(qxhi_ref[:, s], whi_ref[:, s])
        scale = dw_ref[i:i + 1, :]
        acc += plo.astype(jnp.float32) * exlo_ref[:, i:i + 1] * scale
        acc += phi.astype(jnp.float32) * exhi_ref[:, i:i + 1] * scale
    out_ref[...] = acc


def _i8_call(kernel, m, n, kt, x_inputs, x_lanes, w_inputs, w_lanes,
             dw_inputs, n_scratch, tm=None, tn=None):
    """GEMM-shaped launcher for the integer kernels.

    Grid is (N-tiles, M-tiles) with M fastest, so the requantized int8
    weight tile lives in VMEM scratch and is expanded ONCE per N-tile
    (at m-index 0) instead of once per grid cell — at M=512 the expansion
    VPU work would otherwise dominate the whole matmul 8:1. "arbitrary"
    dimension semantics pin the row-major traversal the scratch reuse
    depends on. Transposed (kt, N) tile-scale operands are appended and
    sliced per-tile inside the kernel as (1, tn) rows."""
    if tm is None:
        tm, tn = _pick_mn(m, n)
    grid = (_cdiv(n, tn), _cdiv(m, tm))
    in_specs = (
        [pl.BlockSpec((tm, kt * ln), lambda j, i: (i, 0)) for ln in x_lanes]
        + [pl.BlockSpec((tn, kt * ln), lambda j, i: (j, 0)) for ln in w_lanes]
        + [pl.BlockSpec((kt, tn), lambda j, i: (0, j)) for _ in dw_inputs]
    )
    return pl.pallas_call(
        functools.partial(kernel, kt=kt),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tm, tn), lambda j, i: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tn, kt * 128), jnp.int8)
                        for _ in range(n_scratch)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=_interpret(),
    )(*x_inputs, *w_inputs, *dw_inputs)


def qmm_q4_K_i8(x, qs_k, scm, dd):
    """Integer-MXU Q4_K matmul (prefill path): x (M, K) f32 → (M, N) f32."""
    m, kdim = x.shape
    n = qs_k.shape[0]
    kt = kdim // 256
    dsclo, dschi, dmlo, dmhi = q4k_scale_arrays(scm, dd)
    xlo, xhi = q4k_split_x(x.astype(jnp.float32))
    qxlo, exlo = quantize_x_tiles(xlo)
    qxhi, exhi = quantize_x_tiles(xhi)
    dsclo_f, dmlo_f, dwlo = _tile_fold(dsclo, dmlo, 4, 15.0)
    dschi_f, dmhi_f, dwhi = _tile_fold(dschi, dmhi, 4, 15.0)
    return _i8_call(
        _q4k_i8_kernel, m, n, kt,
        [qxlo, exlo, qxhi, exhi], [128, 1, 128, 1],
        [qs_k, dsclo_f, dschi_f, dmlo_f, dmhi_f], [128, 4, 4, 4, 4],
        [dwlo.T, dwhi.T], n_scratch=2)


def qmm_q8_0_i8(x, qs_k, d_k):
    m, kdim = x.shape
    n = qs_k.shape[0]
    kt = kdim // 128
    qx, ex = quantize_x_tiles(q8_split_x(x.astype(jnp.float32)))
    dsc_f, _, dw = _tile_fold(d_k, None, 4, 127.0)
    return _i8_call(
        functools.partial(_qd_i8_kernel, nblk=4, blk=32, shift=0.0),
        m, n, kt, [qx, ex], [128, 1], [qs_k, dsc_f], [128, 4], [dw.T],
        n_scratch=1)


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
        [qs_k, dsc_f], [128, 8], [dw.T], n_scratch=2)


# ------------------------------------------------- Q6_K / Q5_K (packed)
# Wire-density kernels: values stream as packed nibbles + packed high-bit
# planes, scales as wire-width integers with the f32 d (and dmin) applied
# in-kernel — 7.0 / 5.75 effective bpw streamed (wire 6.56 / 5.5), vs the
# 10 bpw of round 1's expanded-int8 layout. The unit of work is a CHUNK of
# superblocks sized so the high-bit plane fills one 128-byte lane tile
# (Q6_K: 2 superblocks @ 2 bits/elem; Q5_K: 4 @ 1 bit/elem); superblock
# counts are zero-padded up to the chunk multiple (zero scales → zero
# contribution, x is zero-padded to match).
# ref formats: src/ggml-common.h block_q6_K / block_q5_K; scalar dequant
# src/ggml-quants.c dequantize_row_q6_K / q5_K.

def _widen(q):
    return q.astype(jnp.int32)


def _pad_blocks(n, arrs, nb, mult):
    """Zero-pad the superblock axis (axis 1) of (N, nb, ...) arrays to a
    multiple of `mult`."""
    import numpy as _np

    nbp = _cdiv(nb, mult) * mult
    if nbp == nb:
        return [_np.ascontiguousarray(a) for a in arrs], nb
    out = []
    for a in arrs:
        pad = _np.zeros((n, nbp - nb) + a.shape[2:], a.dtype)
        out.append(_np.ascontiguousarray(_np.concatenate([a, pad], axis=1)))
    return out, nbp


def _pad_x_lanes(x, kp):
    if x.shape[1] == kp:
        return x
    return jnp.pad(x, ((0, 0), (0, kp - x.shape[1])))


# Q6_K chunk = 2 superblocks = 512 elements = 4 element-tiles:
#   t0 = q1 (ql tile A lo nibble), t1 = q2 (tile B lo),
#   t2 = q3 (tile A hi),           t3 = q4 (tile B hi)
# element-tile lane = 8j + b with b = sb_loc*4 + h*2 + s
#   (h = 128-half of the superblock, s = 16-group, j = 0..15)
# qh lane = same (b, j) → the four 2-bit planes (shifts 0/2/4/6) align with
# t0..t3 at the same lane. val = (nib | bits<<4) - 32, w = val * (sc · d).

def _q6k_kernel(x_ref, ql_ref, qh_ref, sc_ref, dq_ref, out_ref, *, kt: int):
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for c in range(kt):
        hb = _widen(qh_ref[:, c * 128:(c + 1) * 128])
        qA = _widen(ql_ref[:, (2 * c) * 128:(2 * c + 1) * 128])
        qB = _widen(ql_ref[:, (2 * c + 1) * 128:(2 * c + 2) * 128])
        d8 = dq_ref[:, c * 8:(c + 1) * 8]
        sc32 = _widen(sc_ref[:, c * 32:(c + 1) * 32]).astype(jnp.float32)
        for t, (nib, sh) in enumerate(((qA & 0xF, 0), (qB & 0xF, 2),
                                       (qA >> 4, 4), (qB >> 4, 6))):
            val = (nib | (((hb >> sh) & 3) << 4)) - 32
            dsc = pltpu.repeat(sc32[:, t * 8:(t + 1) * 8] * d8, 16, axis=1)
            acc += _dot_nt(
                x_ref[:, c * 512 + t * 128:c * 512 + (t + 1) * 128],
                val.astype(jnp.float32) * dsc)
    out_ref[...] = acc


def q6k_weight_layout(ql, qh, scales, d):
    """Wire fields (N, nb, 128) u8 ql, (N, nb, 64) u8 qh, (N, nb, 16) i8
    scales, (N, nb) f16/f32 d → chunked kernel operands (ql_k, qh_k, sc_k,
    dq) with nb zero-padded to even."""
    import numpy as _np

    n, nb = ql.shape[:2]
    (ql, qh, scales, d), nbp = _pad_blocks(
        n, [ql, qh, scales, _np.asarray(d, _np.float32)], nb, 2)
    ch = nbp // 2
    # ql wire byte = h*64 + k*32 + s*16 + j → (chunk, k, j, sb, h, s)
    qlr = ql.reshape(n, ch, 2, 2, 2, 2, 16)        # (c, sb, h, k, s, j)
    ql_k = qlr.transpose(0, 1, 4, 6, 2, 3, 5).reshape(n, nbp * 128)
    # qh wire byte = h*32 + s*16 + j → (chunk, j, sb, h, s)
    qhr = qh.reshape(n, ch, 2, 2, 2, 16)           # (c, sb, h, s, j)
    qh_k = qhr.transpose(0, 1, 5, 2, 3, 4).reshape(n, ch * 128)
    # scales wire idx = h*8 + q*2 + s → (chunk, q, sb, h, s)
    scr = scales.reshape(n, ch, 2, 2, 4, 2)        # (c, sb, h, q, s)
    sc_k = scr.transpose(0, 1, 4, 2, 3, 5).reshape(n, nbp * 16)
    dq = _np.repeat(d, 4, axis=1)                  # (n, nbp*4)
    return ql_k, qh_k, sc_k, dq


def q6k_split_x(x):
    """x (M, K) → (M, Kp) in Q6_K kernel element order (zero-padded to
    whole chunks)."""
    m, kdim = x.shape
    kp = _cdiv(kdim, 512) * 512
    xp = _pad_x_lanes(x.astype(jnp.float32), kp)
    xr = xp.reshape(m, kp // 512, 2, 2, 4, 2, 16)  # (c, sb, h, q, s, j)
    return jnp.transpose(xr, (0, 1, 4, 6, 2, 3, 5)).reshape(m, kp)


def qmm_q6_K(x, ql_k, qh_k, sc_k, dq):
    m = x.shape[0]
    n = ql_k.shape[0]
    kt = ql_k.shape[1] // 256                      # chunks
    xk = q6k_split_x(x)
    assert xk.shape[1] == kt * 512, (x.shape, ql_k.shape)
    tm, tn = _pick_mn(m, n)
    return _common_call(_q6k_kernel, m, n, kt, tm, tn,
                        [xk], [512],
                        [ql_k, qh_k, sc_k, dq], [256, 128, 32, 8])


# Q5_K chunk = 4 superblocks = 1024 elements = 8 element-tiles (g, h):
#   byte-tile g: lo nibble = (g, h=0), hi = (g, h=1)
# element-tile lane = 4j + s (s = sb_loc 0..3, j = 0..31)
# qh lane = same (s, j) → bit plane shift 2g+h aligns at the same lane.
# q = nib | bit<<4; w = q·(sc·d) − (m·dmin).

def _q5k_kernel(x_ref, ql_ref, qh_ref, scm_ref, d_ref, dm_ref, out_ref, *,
                kt: int):
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for c in range(kt):
        hb = _widen(qh_ref[:, c * 128:(c + 1) * 128])
        sm = _widen(scm_ref[:, c * 64:(c + 1) * 64]).astype(jnp.float32)
        d4 = d_ref[:, c * 4:(c + 1) * 4]
        m4 = dm_ref[:, c * 4:(c + 1) * 4]
        for g in range(4):
            qt = _widen(ql_ref[:, (4 * c + g) * 128:(4 * c + g + 1) * 128])
            for h, nib in ((0, qt & 0xF), (1, qt >> 4)):
                t = g * 2 + h
                q = nib | (((hb >> t) & 1) << 4)
                dsc = pltpu.repeat(sm[:, t * 4:(t + 1) * 4] * d4, 32, axis=1)
                dmm = pltpu.repeat(sm[:, 32 + t * 4:32 + (t + 1) * 4] * m4,
                                   32, axis=1)
                acc += _dot_nt(
                    x_ref[:, c * 1024 + t * 128:c * 1024 + (t + 1) * 128],
                    q.astype(jnp.float32) * dsc - dmm)
    out_ref[...] = acc


def q5k_weight_layout(qs, qh, sc, mm, d, dmin):
    """Wire fields (N, nb, 128) u8 qs, (N, nb, 32) u8 qh, (N, nb, 8) sc/mm
    (unpacked 6-bit), (N, nb) d/dmin → chunked kernel operands with nb
    zero-padded to a multiple of 4."""
    import numpy as _np

    n, nb = qs.shape[:2]
    (qs, qh, sc, mm, d, dmin), nbp = _pad_blocks(
        n, [qs, qh, _np.asarray(sc, _np.uint8), _np.asarray(mm, _np.uint8),
            _np.asarray(d, _np.float32), _np.asarray(dmin, _np.float32)],
        nb, 4)
    ch = nbp // 4
    # ql wire byte = g*32 + j → (chunk, g, j, sb)
    qlr = qs.reshape(n, ch, 4, 4, 32)              # (c, sb, g, j)
    ql_k = qlr.transpose(0, 1, 3, 4, 2).reshape(n, nbp * 128)
    # qh wire byte = j → (chunk, j, sb)
    qhr = qh.reshape(n, ch, 4, 32)                 # (c, sb, j)
    qh_k = qhr.transpose(0, 1, 3, 2).reshape(n, nbp * 32)
    # scales wire idx = 2g+h → per chunk [sc(32) | m(32)], each (t, sb)
    scr = sc.reshape(n, ch, 4, 8).transpose(0, 1, 3, 2)   # (c, t, sb)
    mmr = mm.reshape(n, ch, 4, 8).transpose(0, 1, 3, 2)
    scm = _np.concatenate(
        [scr.reshape(n, ch, 32), mmr.reshape(n, ch, 32)],
        axis=2).reshape(n, nbp * 16)
    return ql_k, qh_k, scm, d, dmin


def q5k_split_x(x):
    m, kdim = x.shape
    kp = _cdiv(kdim, 1024) * 1024
    xp = _pad_x_lanes(x.astype(jnp.float32), kp)
    xr = xp.reshape(m, kp // 1024, 4, 4, 2, 32)    # (c, sb, g, h, j)
    return jnp.transpose(xr, (0, 1, 3, 4, 5, 2)).reshape(m, kp)


def qmm_q5_K(x, ql_k, qh_k, scm, d, dmin):
    m = x.shape[0]
    n = ql_k.shape[0]
    kt = ql_k.shape[1] // 512                      # chunks
    xk = q5k_split_x(x)
    assert xk.shape[1] == kt * 1024, (x.shape, ql_k.shape)
    tm, tn = _pick_mn(m, n)
    return _common_call(_q5k_kernel, m, n, kt, tm, tn,
                        [xk], [1024],
                        [ql_k, qh_k, scm, d, dmin], [512, 128, 64, 4, 4])


# --------------------------------------------- Q4_1 / Q5_0 / Q5_1 (legacy)
# Q4_1 is Q4_0's affine sibling (w = q·d + m) and shares its byte order and
# lane interleave. The 5-bit legacy formats carry one high bit per element
# in a 4-byte-per-block plane; the kernel lane order is chosen as
# lane = jj·16 + kk·8 + b (jj = bit position 0..7, kk = byte half, b =
# block 0..7) so each qh byte's 8 consumers sit at a fixed per-lane shift
# (variable-shift vector jj = lane//16) after one pltpu.repeat of the
# 16-lane qh slice — the high-bit plane streams at its wire density.
# ref: src/ggml-common.h block_q4_1/q5_0/q5_1; scalar dequant
# src/ggml-quants.c dequantize_row_q5_0/q5_1.

def _q41_kernel(xlo_ref, xhi_ref, qs_ref, d_ref, m_ref, out_ref, *, kt: int):
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for i in range(kt):
        lo, hi = _nibbles(qs_ref[:, i * 128:(i + 1) * 128])
        drep = pltpu.repeat(d_ref[:, i * 8:(i + 1) * 8], 16, axis=1)
        mrep = pltpu.repeat(m_ref[:, i * 8:(i + 1) * 8], 16, axis=1)
        acc += _dot_nt(xlo_ref[:, i * 128:(i + 1) * 128], lo * drep + mrep)
        acc += _dot_nt(xhi_ref[:, i * 128:(i + 1) * 128], hi * drep + mrep)
    out_ref[...] = acc


def q41_weight_layout(qs, d, m):
    """Same packing as Q4_0 plus the per-block min."""
    import numpy as _np

    n, nb, _ = qs.shape
    kdim = nb * 32
    qs_k = qs.reshape(n, kdim // 256, 8, 16).transpose(0, 1, 3, 2).reshape(
        n, kdim // 2)
    return (qs_k, _np.asarray(d, _np.float32).reshape(n, nb),
            _np.asarray(m, _np.float32).reshape(n, nb))


def qmm_q4_1(x, qs_k, d_k, m_k):
    m, kdim = x.shape
    n = qs_k.shape[0]
    kt = kdim // 256
    assert qs_k.shape[1] == kdim // 2, (x.shape, qs_k.shape)
    xlo, xhi = q40_split_x(x.astype(jnp.float32))
    tm, tn = _pick_mn(m, n)
    return _common_call(_q41_kernel, m, n, kt, tm, tn,
                        [xlo, xhi], [128, 128], [qs_k, d_k, m_k],
                        [128, 8, 8])


def _q5l_body(x_ref, qs_ref, qh_ref, d_ref, m_ref, out_ref, kt: int,
              shift: float):
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    shvec = jax.lax.broadcasted_iota(
        jnp.int32, (qs_ref.shape[0], 128), 1) // 16
    for c in range(kt):
        hb = _widen(qh_ref[:, c * 128:(c + 1) * 128])
        for t in range(4):
            qt_ = _widen(qs_ref[:, (4 * c + t) * 128:(4 * c + t + 1) * 128])
            sblk = slice((c * 4 + t) * 8, (c * 4 + t + 1) * 8)
            drep = pltpu.repeat(d_ref[:, sblk], 16, axis=1)
            mrep = pltpu.repeat(m_ref[:, sblk], 16, axis=1) \
                if m_ref is not None else None
            for h, nib in ((0, qt_ & 0xF), (1, qt_ >> 4)):
                hs = hb[:, t * 32 + h * 16:t * 32 + h * 16 + 16]
                bits = (pltpu.repeat(hs, 8, axis=1) >> shvec) & 1
                q5 = (nib | (bits << 4)).astype(jnp.float32) - shift
                w = q5 * drep
                if mrep is not None:
                    w = w + mrep
                acc += _dot_nt(
                    x_ref[:, c * 1024 + (t * 2 + h) * 128:
                          c * 1024 + (t * 2 + h + 1) * 128], w)
    out_ref[...] = acc


def _q50_kernel(x_ref, qs_ref, qh_ref, d_ref, out_ref, *, kt: int):
    _q5l_body(x_ref, qs_ref, qh_ref, d_ref, None, out_ref, kt, 16.0)


def _q51_kernel(x_ref, qs_ref, qh_ref, d_ref, m_ref, out_ref, *, kt: int):
    _q5l_body(x_ref, qs_ref, qh_ref, d_ref, m_ref, out_ref, kt, 0.0)


def q5l_weight_layout(qs, qh, d, m=None):
    """Wire (N, nb, 16) u8 qs, (N, nb, 4) u8 qh, (N, nb) d (and m) →
    chunked kernel operands; nb zero-padded to a multiple of 32 (one
    128-byte qh lane tile per chunk)."""
    import numpy as _np

    n, nb = qs.shape[:2]
    arrs = [qs, qh, _np.asarray(d, _np.float32)]
    if m is not None:
        arrs.append(_np.asarray(m, _np.float32))
    arrs, nbp = _pad_blocks(n, arrs, nb, 32)
    qs, qh, d = arrs[0], arrs[1], arrs[2]
    m = arrs[3] if len(arrs) > 3 else None
    ch = nbp // 32
    # qs wire byte = kk*8 + jj → tile lane jj*16 + kk*8 + b
    qsr = qs.reshape(n, ch, 4, 8, 2, 8)            # (c, t, b, kk, jj)
    qs_k = qsr.transpose(0, 1, 2, 5, 4, 3).reshape(n, nbp * 16)
    # qh wire byte = 2h + kk → chunk lane t*32 + h*16 + kk*8 + b
    qhr = qh.reshape(n, ch, 4, 8, 2, 2)            # (c, t, b, h, kk)
    qh_k = qhr.transpose(0, 1, 2, 4, 5, 3).reshape(n, ch * 128)
    out = [qs_k, qh_k, d]
    if m is not None:
        out.append(m)
    return tuple(out)


def q5l_split_x(x):
    """x (M, K) → (M, Kp), element (blk, h, j) at chunk-relative lane
    (t·2+h)·128 + (j%8)·16 + (j//8)·8 + b."""
    m, kdim = x.shape
    kp = _cdiv(kdim, 1024) * 1024
    xp = _pad_x_lanes(x.astype(jnp.float32), kp)
    xr = xp.reshape(m, kp // 1024, 4, 8, 2, 2, 8)  # (c, t, b, h, kk, jj)
    return jnp.transpose(xr, (0, 1, 2, 4, 6, 5, 3)).reshape(m, kp)


def qmm_q5_0(x, qs_k, qh_k, d_k):
    m = x.shape[0]
    n = qs_k.shape[0]
    kt = qs_k.shape[1] // 512                      # chunks of 32 blocks
    xk = q5l_split_x(x)
    assert xk.shape[1] == kt * 1024, (x.shape, qs_k.shape)
    tm, tn = _pick_mn(m, n)
    return _common_call(_q50_kernel, m, n, kt, tm, tn,
                        [xk], [1024], [qs_k, qh_k, d_k], [512, 128, 32])


def qmm_q5_1(x, qs_k, qh_k, d_k, m_k):
    m = x.shape[0]
    n = qs_k.shape[0]
    kt = qs_k.shape[1] // 512
    xk = q5l_split_x(x)
    assert xk.shape[1] == kt * 1024, (x.shape, qs_k.shape)
    tm, tn = _pick_mn(m, n)
    return _common_call(_q51_kernel, m, n, kt, tm, tn,
                        [xk], [1024],
                        [qs_k, qh_k, d_k, m_k], [512, 128, 32, 32])


# ------------------------------------------------- Q2_K / Q3_K (packed)
# Both store four 2-bit element planes per qs byte (shifts 0/2/4/6); a
# chunk of 2 superblocks fills one 128-byte qs lane tile. Element-tile
# lane = 8·jj + b with b = sb_loc·4 + h·2 + s (h = 128-half, s = 16-group,
# jj = j % 16) so the per-16 scales expand with one pltpu.repeat of an
# 8-lane slice. Q2_K: w = q·(sc_lo·d) − (sc_hi·dmin). Q3_K: the hmask high
# bit (1 bit/elem, one byte per j serving all 8 (h,t) planes) streams at
# wire density by replicating each byte to its two h-lanes and shifting by
# the per-lane plane index; w = (q − (1−hibit)·4)·(sc·d) with 6-bit signed
# scales. ref: src/ggml-common.h block_q2_K/q3_K; scalar dequant
# src/ggml-quants.c dequantize_row_q2_K/q3_K.

def _q2k_kernel(x_ref, qs_ref, scm_ref, dq_ref, dm_ref, out_ref, *, kt: int):
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for c in range(kt):
        qt = _widen(qs_ref[:, c * 128:(c + 1) * 128])
        s32 = _widen(scm_ref[:, c * 32:(c + 1) * 32])
        d8 = dq_ref[:, c * 8:(c + 1) * 8]
        m8 = dm_ref[:, c * 8:(c + 1) * 8]
        for t in range(4):
            sc_t = s32[:, t * 8:(t + 1) * 8]
            dl = pltpu.repeat((sc_t & 0xF).astype(jnp.float32) * d8, 16,
                              axis=1)
            ml = pltpu.repeat((sc_t >> 4).astype(jnp.float32) * m8, 16,
                              axis=1)
            w = ((qt >> (2 * t)) & 3).astype(jnp.float32) * dl - ml
            acc += _dot_nt(
                x_ref[:, c * 512 + t * 128:c * 512 + (t + 1) * 128], w)
    out_ref[...] = acc


def _q3k_kernel(x_ref, qs_ref, hm_ref, sc_ref, dq_ref, out_ref, *, kt: int):
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    # plane shift of the duplicated hmask byte: h·4 + t with h = (lane//2)%2
    hsh = (jax.lax.broadcasted_iota(
        jnp.int32, (qs_ref.shape[0], 128), 1) // 2) % 2 * 4
    for c in range(kt):
        qt = _widen(qs_ref[:, c * 128:(c + 1) * 128])
        hb = _widen(hm_ref[:, c * 128:(c + 1) * 128])
        s32 = _widen(sc_ref[:, c * 32:(c + 1) * 32])   # int8 signed scales
        d8 = dq_ref[:, c * 8:(c + 1) * 8]
        for t in range(4):
            dl = pltpu.repeat(
                s32[:, t * 8:(t + 1) * 8].astype(jnp.float32) * d8, 16,
                axis=1)
            hi = (hb >> (hsh + t)) & 1
            q = ((qt >> (2 * t)) & 3) - (1 - hi) * 4
            acc += _dot_nt(
                x_ref[:, c * 512 + t * 128:c * 512 + (t + 1) * 128],
                q.astype(jnp.float32) * dl)
    out_ref[...] = acc


def q2k_weight_layout(qs, scales, d, dmin):
    """Wire (N, nb, 64) u8 qs, (N, nb, 16) u8 scales, (N, nb) d/dmin →
    chunked kernel operands (nb zero-padded to even)."""
    import numpy as _np

    n, nb = qs.shape[:2]
    (qs, scales, d, dmin), nbp = _pad_blocks(
        n, [qs, scales, _np.asarray(d, _np.float32),
            _np.asarray(dmin, _np.float32)], nb, 2)
    ch = nbp // 2
    # qs wire byte = h*32 + j → lane 8*(j%16) + sb*4 + h*2 + j//16
    qr = qs.reshape(n, ch, 2, 2, 2, 16)            # (c, sb, h, s, jj)
    qs_k = qr.transpose(0, 1, 5, 2, 3, 4).reshape(n, nbp * 64)
    # scales wire idx = h*8 + t*2 + s → (c, t, sb, h, s)
    scr = scales.reshape(n, ch, 2, 2, 4, 2)        # (c, sb, h, t, s)
    scm = scr.transpose(0, 1, 4, 2, 3, 5).reshape(n, nbp * 16)
    dq = _np.repeat(d, 4, axis=1)                  # (n, nbp*4)
    dm = _np.repeat(dmin, 4, axis=1)
    return qs_k, scm, dq, dm


def q3k_weight_layout(qs, hmask, scales_i8, d):
    """Wire (N, nb, 64) u8 qs, (N, nb, 32) u8 hmask, (N, nb, 16) i8
    unpacked signed scales, (N, nb) d → chunked operands. hmask bytes are
    duplicated across the two h-lanes (2 bpw streamed vs 1 wire)."""
    import numpy as _np

    n, nb = qs.shape[:2]
    (qs, hmask, scales_i8, d), nbp = _pad_blocks(
        n, [qs, hmask, scales_i8, _np.asarray(d, _np.float32)], nb, 2)
    ch = nbp // 2
    qr = qs.reshape(n, ch, 2, 2, 2, 16)
    qs_k = qr.transpose(0, 1, 5, 2, 3, 4).reshape(n, nbp * 64)
    # hmask wire byte = j (no h axis) → duplicate to both h lanes
    hm2 = _np.repeat(hmask.reshape(n, ch, 2, 1, 32), 2, axis=3)  # (c,sb,h,j)
    hmr = hm2.reshape(n, ch, 2, 2, 2, 16)          # (c, sb, h, s, jj)
    hm_k = hmr.transpose(0, 1, 5, 2, 3, 4).reshape(n, nbp * 64)
    scr = scales_i8.reshape(n, ch, 2, 2, 4, 2)
    sc_k = scr.transpose(0, 1, 4, 2, 3, 5).reshape(n, nbp * 16)
    dq = _np.repeat(d, 4, axis=1)
    return qs_k, hm_k, sc_k, dq


def q23_split_x(x):
    """x (M, K) → (M, Kp) in Q2_K/Q3_K kernel element order (chunks of
    512 = 2 superblocks; element e = h·128 + t·32 + s·16 + jj)."""
    m, kdim = x.shape
    kp = _cdiv(kdim, 512) * 512
    xp = _pad_x_lanes(x.astype(jnp.float32), kp)
    xr = xp.reshape(m, kp // 512, 2, 2, 4, 2, 16)  # (c, sb, h, t, s, jj)
    return jnp.transpose(xr, (0, 1, 4, 6, 2, 3, 5)).reshape(m, kp)


def qmm_q2_K(x, qs_k, scm, dq, dm):
    m = x.shape[0]
    n = qs_k.shape[0]
    kt = qs_k.shape[1] // 128                      # chunks
    xk = q23_split_x(x)
    assert xk.shape[1] == kt * 512, (x.shape, qs_k.shape)
    tm, tn = _pick_mn(m, n)
    return _common_call(_q2k_kernel, m, n, kt, tm, tn,
                        [xk], [512],
                        [qs_k, scm, dq, dm], [128, 32, 8, 8])


def qmm_q3_K(x, qs_k, hm_k, sc_k, dq):
    m = x.shape[0]
    n = qs_k.shape[0]
    kt = qs_k.shape[1] // 128
    xk = q23_split_x(x)
    assert xk.shape[1] == kt * 512, (x.shape, qs_k.shape)
    tm, tn = _pick_mn(m, n)
    return _common_call(_q3k_kernel, m, n, kt, tm, tn,
                        [xk], [512],
                        [qs_k, hm_k, sc_k, dq], [128, 128, 32, 8])
