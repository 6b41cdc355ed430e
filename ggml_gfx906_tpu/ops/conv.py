"""Convolution / pooling / resampling ops.

jax analogues of ggml's conv family (ref: include/ggml.h conv builders
:1775-2010; CPU kernels src/ggml-cpu/ops.cpp im2col/conv/pool; CUDA
src/ggml-cuda/{im2col,conv2d-dw,conv-transpose-1d,pool2d}.cu).

Layouts follow ggml's numpy-order shapes: 1d data (N, C, L), 2d data
(N, C, H, W); 1d kernels (OC, IC, K), 2d kernels (OC, IC, KH, KW).
XLA lowers lax.conv_general_dilated straight onto the MXU, which subsumes
the reference's im2col+GEMM strategy.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _conv(x, w, stride, padding, dilation, feature_group_count=1):
    dims = x.ndim - 2
    return jax.lax.conv_general_dilated(
        x.astype(jnp.float32),
        w.astype(jnp.float32),
        window_strides=(stride,) * dims if isinstance(stride, int) else stride,
        padding=[(padding, padding)] * dims if isinstance(padding, int) else padding,
        rhs_dilation=(dilation,) * dims if isinstance(dilation, int) else dilation,
        dimension_numbers=("NCH", "OIH", "NCH") if dims == 1 else ("NCHW", "OIHW", "NCHW"),
        feature_group_count=feature_group_count,
        preferred_element_type=jnp.float32,
        # HIGHEST: TPU default conv rounds f32 through bf16 (NMSE ~5e-6 vs
        # the CPU backend on the conformance sweep); ggml convs are full f32
        precision=jax.lax.Precision.HIGHEST,
    )


def conv_1d(x, w, stride: int = 1, padding: int = 0, dilation: int = 1):
    """ggml_conv_1d: x (N, C, L), w (OC, IC, K) → (N, OC, L_out)."""
    return _conv(x, w, stride, padding, dilation)


def conv_1d_dw(x, w, stride: int = 1, padding: int = 0, dilation: int = 1):
    """depthwise: w (C, 1, K)."""
    c = x.shape[1]
    return _conv(x, w, stride, padding, dilation, feature_group_count=c)


def conv_2d(x, w, stride=(1, 1), padding=(0, 0), dilation=(1, 1)):
    """ggml_conv_2d: x (N, C, H, W), w (OC, IC, KH, KW)."""
    s = (stride, stride) if isinstance(stride, int) else stride
    p = (padding, padding) if isinstance(padding, int) else padding
    d = (dilation, dilation) if isinstance(dilation, int) else dilation
    return _conv(x, w, s, [(p[0], p[0]), (p[1], p[1])], d)


def conv_3d(x, w, stride=(1, 1, 1), padding=(0, 0, 0), dilation=(1, 1, 1)):
    """ggml_conv_3d (include/ggml.h:1866): x (N, C, D, H, W),
    w (OC, IC, KD, KH, KW) → (N, OC, D_out, H_out, W_out)."""
    s = (stride,) * 3 if isinstance(stride, int) else stride
    p = (padding,) * 3 if isinstance(padding, int) else padding
    d = (dilation,) * 3 if isinstance(dilation, int) else dilation
    return jax.lax.conv_general_dilated(
        x.astype(jnp.float32), w.astype(jnp.float32),
        window_strides=s, padding=[(pi, pi) for pi in p], rhs_dilation=d,
        dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


def conv_2d_dw(x, w, stride=(1, 1), padding=(0, 0), dilation=(1, 1)):
    """depthwise 2d: w (C, 1, KH, KW)."""
    c = x.shape[1]
    s = (stride, stride) if isinstance(stride, int) else stride
    p = (padding, padding) if isinstance(padding, int) else padding
    d = (dilation, dilation) if isinstance(dilation, int) else dilation
    return _conv(x, w, s, [(p[0], p[0]), (p[1], p[1])], d, feature_group_count=c)


def conv_transpose_1d(x, w, stride: int = 1, padding: int = 0, dilation: int = 1):
    """ggml_conv_transpose_1d: x (N, C, L), w (IC, OC, K) (torch ConvT
    convention); output length (L-1)*s + (K-1)*d + 1 - 2p.

    jax quirk (verified vs torch): torch ConvTranspose parity needs the
    kernel declared "OIHW"-style with transpose_kernel=True and VALID
    padding; the ggml/torch `padding` crops the full output."""
    out = jax.lax.conv_transpose(
        x.astype(jnp.float32),
        w.astype(jnp.float32),
        strides=(stride,),
        padding="VALID",
        rhs_dilation=(dilation,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        transpose_kernel=True,
        precision=jax.lax.Precision.HIGHEST,
    )
    if padding:
        out = out[..., padding:-padding]
    return out


def conv_transpose_2d(x, w, stride: int = 1):
    """ggml_conv_transpose_2d_p0: w (IC, OC, KH, KW) (torch ConvT layout).
    See conv_transpose_1d for the jax dimension-number quirk."""
    return jax.lax.conv_transpose(
        x.astype(jnp.float32),
        w.astype(jnp.float32),
        strides=(stride, stride),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        transpose_kernel=True,
        precision=jax.lax.Precision.HIGHEST,
    )


def im2col(x, kh: int, kw: int, stride=(1, 1), padding=(0, 0), dilation=(1, 1)):
    """GGML_OP_IM2COL (2d): x (N, C, H, W) → (N, OH, OW, C*KH*KW)
    with the ggml column order (c, kh, kw) fastest-last."""
    s = (stride, stride) if isinstance(stride, int) else stride
    p = (padding, padding) if isinstance(padding, int) else padding
    d = (dilation, dilation) if isinstance(dilation, int) else dilation
    n, c, h, w = x.shape
    xp = jnp.pad(x, [(0, 0), (0, 0), (p[0], p[0]), (p[1], p[1])])
    oh = (h + 2 * p[0] - d[0] * (kh - 1) - 1) // s[0] + 1
    ow = (w + 2 * p[1] - d[1] * (kw - 1) - 1) // s[1] + 1
    # gather patches: index arithmetic, fully static
    i = (jnp.arange(oh) * s[0])[:, None] + (jnp.arange(kh) * d[0])[None, :]  # (oh, kh)
    j = (jnp.arange(ow) * s[1])[:, None] + (jnp.arange(kw) * d[1])[None, :]  # (ow, kw)
    patches = xp[:, :, i[:, None, :, None], j[None, :, None, :]]
    # patches: (n, c, oh, ow, kh, kw) → (n, oh, ow, c, kh, kw)
    patches = jnp.transpose(patches, (0, 2, 3, 1, 4, 5))
    return patches.reshape(n, oh, ow, c * kh * kw)


def pool_1d(x, op: str, k: int, stride: int, padding: int = 0):
    return pool_2d(x[..., None, :], op, (1, k), (1, stride), (0, padding))[..., 0, :]


def pool_2d(x, op: str, k=(2, 2), stride=(2, 2), padding=(0, 0)):
    """GGML_OP_POOL_2D: x (N, C, H, W); op in {"max", "avg"}.
    avg uses count_include_pad like the reference (divides by kh*kw)."""
    kh, kw = (k, k) if isinstance(k, int) else k
    sh, sw = (stride, stride) if isinstance(stride, int) else stride
    ph, pw = (padding, padding) if isinstance(padding, int) else padding
    dims = (1, 1, kh, kw)
    strides = (1, 1, sh, sw)
    pads = [(0, 0), (0, 0), (ph, ph), (pw, pw)]
    xf = x.astype(jnp.float32)
    if op == "max":
        init = -jnp.inf
        out = jax.lax.reduce_window(xf, init, jax.lax.max, dims, strides, pads)
    elif op == "avg":
        out = jax.lax.reduce_window(xf, 0.0, jax.lax.add, dims, strides, pads)
        out = out / (kh * kw)
    else:
        raise ValueError(op)
    return out


def upscale_nearest(x, scale_h: int, scale_w: int):
    """GGML_OP_UPSCALE nearest mode: x (N, C, H, W)."""
    return jnp.repeat(jnp.repeat(x, scale_h, axis=-2), scale_w, axis=-1)


def interpolate_bilinear(x, out_h: int, out_w: int, align_corners: bool = False):
    """GGML_OP_UPSCALE bilinear mode (ref: ggml_interpolate,
    src/ggml-cpu/ops.cpp upscale bilinear path)."""
    n, c, h, w = x.shape
    if align_corners and out_h > 1 and out_w > 1:
        ys = jnp.linspace(0.0, h - 1.0, out_h)
        xs = jnp.linspace(0.0, w - 1.0, out_w)
    else:
        sf_y = h / out_h
        sf_x = w / out_w
        ys = (jnp.arange(out_h) + 0.5) * sf_y - 0.5
        xs = (jnp.arange(out_w) + 0.5) * sf_x - 0.5
    y0 = jnp.clip(jnp.floor(ys), 0, h - 1).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(xs), 0, w - 1).astype(jnp.int32)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    wy = jnp.clip(ys - y0, 0.0, 1.0)[None, None, :, None]
    wx = jnp.clip(xs - x0, 0.0, 1.0)[None, None, None, :]
    xf = x.astype(jnp.float32)
    a = xf[:, :, y0][:, :, :, x0]
    b = xf[:, :, y0][:, :, :, x1]
    cq = xf[:, :, y1][:, :, :, x0]
    d = xf[:, :, y1][:, :, :, x1]
    return (a * (1 - wy) * (1 - wx) + b * (1 - wy) * wx
            + cq * wy * (1 - wx) + d * wy * wx)


# ---------------------------------------------------------------- SAM window ops
# ref: ggml_win_part / ggml_win_unpart / get_rel_pos / add_rel_pos
# (include/ggml.h:2180-2230, used by examples/sam/sam.cpp)

def win_part(x, w: int):
    """x (B, H, W, C) → (B*nWh*nWw, w, w, C) with zero padding."""
    b, h, ww, c = x.shape
    ph, pw = (-h) % w, (-ww) % w
    xp = jnp.pad(x, [(0, 0), (0, ph), (0, pw), (0, 0)])
    hp, wp = h + ph, ww + pw
    xp = xp.reshape(b, hp // w, w, wp // w, w, c)
    return jnp.transpose(xp, (0, 1, 3, 2, 4, 5)).reshape(-1, w, w, c)


def win_unpart(x, h: int, ww: int, w: int):
    hp, wp = h + (-h) % w, ww + (-ww) % w
    b = x.shape[0] // ((hp // w) * (wp // w))
    c = x.shape[-1]
    xp = x.reshape(b, hp // w, wp // w, w, w, c)
    xp = jnp.transpose(xp, (0, 1, 3, 2, 4, 5)).reshape(b, hp, wp, c)
    return xp[:, :h, :ww, :]


def get_rel_pos(rel_pos, qh: int, kh: int):
    """ref: ggml_get_rel_pos — gather relative-position embeddings for
    query/key sizes. rel_pos: (2*max-1, C)."""
    q = jnp.arange(qh)[:, None]
    k = jnp.arange(kh)[None, :]
    idx = (q - k) + (kh - 1)
    return rel_pos[idx]


def add_rel_pos(attn, rel_w, rel_h, qh: int, qw: int, kh: int, kw: int):
    """ref: ggml_add_rel_pos — attn (..., qh*qw, kh*kw) plus decomposed
    relative position terms rel_h (..., qh*qw, kh) and rel_w (..., qh*qw, kw)."""
    pre = attn.shape[:-2]
    a = attn.reshape(*pre, qh, qw, kh, kw)
    a = a + rel_h.reshape(*pre, qh, qw, kh, 1) + rel_w.reshape(*pre, qh, qw, 1, kw)
    return a.reshape(attn.shape)


# ---------------------------------------------------------------- SSM (Mamba)

def ssm_conv(x, c):
    """GGML_OP_SSM_CONV: causal depthwise conv over a pre-windowed input.
    x (B, C_in, L + K - 1), c (C_in, K) → (B, C_in, L)."""
    k = c.shape[-1]
    l = x.shape[-1] - k + 1
    i = jnp.arange(l)[:, None] + jnp.arange(k)[None, :]
    win = x[..., i]  # (B, C, L, K)
    return (win.astype(jnp.float32) * c.astype(jnp.float32)[None, :, None, :]).sum(-1)


def ssm_scan(s, x, dt, A, B, C):
    """GGML_OP_SSM_SCAN (Mamba selective scan, ref src/ggml-cpu/ops.cpp
    ssm_scan): sequential state update
        s_t = s_{t-1} * exp(dt_t * A) + B_t * (dt_t * x_t)
        y_t = C_t · s_t
    s: (B, D, N) initial state; x: (B, L, D); dt: (B, L, D);
    A: (D, N); B, C: (B, L, N). Returns (y (B, L, D), s_final)."""
    dtf = jax.nn.softplus(dt.astype(jnp.float32))
    A = A.astype(jnp.float32)

    def step(state, inputs):
        xt, dtt, Bt, Ct = inputs
        dA = jnp.exp(dtt[..., None] * A[None])        # (B, D, N)
        dBx = Bt[:, None, :] * (dtt * xt)[..., None]  # (B, D, N)
        new = state * dA + dBx
        y = (new * Ct[:, None, :]).sum(-1)            # (B, D)
        return new, y

    xs = (jnp.moveaxis(x, 1, 0).astype(jnp.float32),
          jnp.moveaxis(dtf, 1, 0),
          jnp.moveaxis(B, 1, 0).astype(jnp.float32),
          jnp.moveaxis(C, 1, 0).astype(jnp.float32))
    s_final, ys = jax.lax.scan(step, s.astype(jnp.float32), xs)
    return jnp.moveaxis(ys, 0, 1), s_final
