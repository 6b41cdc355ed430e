"""Quantized tensors on device: pytree container + jax dequant + matmul.

QuantTensor keeps ggml block fields as separate device arrays
(struct-of-arrays — the TPU analogue of the reference's repack.cpp
re-layout). Two layouts exist:

- "wire": the GGUF byte order, fields exactly as in src/ggml-common.h.
- "kernel": lane-interleaved layout for the fused Pallas matmul kernels
  (ops/pallas/qmm.py) — chosen automatically at load for supported types.
  The transform runs once at load; dequantization from either layout is
  bit-exact w.r.t. the C reference (shared math, quant/dequant_math.py).

ref: ggml's mul_mat convention — weights are (n_out, n_in) rows and
`mul_mat(W, x)` dots rows of x with rows of W (SURVEY.md §3.1), i.e.
x @ W.T here.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..quant import dequant_math as dqm
from ..quant.types import GGMLType, TYPE_TRAITS

# wire-layout fields per type (order matters for dequant calls)
_FIELDS = {
    GGMLType.Q4_0: ("d", "qs"),
    GGMLType.Q4_1: ("d", "m", "qs"),
    GGMLType.Q5_0: ("d", "qh", "qs"),
    GGMLType.Q5_1: ("d", "m", "qh", "qs"),
    GGMLType.Q8_0: ("d", "qs"),
    GGMLType.Q8_1: ("d", "qs"),
    GGMLType.Q2_K: ("d", "dmin", "scales", "qs"),
    GGMLType.Q3_K: ("d", "hmask", "scales", "qs"),
    GGMLType.Q4_K: ("d", "dmin", "scales", "qs"),
    GGMLType.Q5_K: ("d", "dmin", "scales", "qh", "qs"),
    GGMLType.Q6_K: ("d", "ql", "qh", "scales"),
    GGMLType.Q8_K: ("d", "qs"),
}

_KFIELDS = {
    GGMLType.Q4_K: ("qs", "scm", "dd"),
    GGMLType.Q8_0: ("qs", "d"),
    GGMLType.Q4_0: ("qs", "d"),
    GGMLType.Q6_K: ("ql", "qh", "sc", "dq"),
    GGMLType.Q5_K: ("ql", "qh", "scm", "d", "dmin"),
    GGMLType.Q4_1: ("qs", "d", "m"),
    GGMLType.Q5_0: ("qs", "qh", "d"),
    GGMLType.Q5_1: ("qs", "qh", "d", "m"),
    GGMLType.Q2_K: ("qs", "scm", "dq", "dm"),
    GGMLType.Q3_K: ("qs", "hm", "sc", "dq"),
}

_DEQUANT_WIRE = {
    GGMLType.Q4_0: dqm.dequant_q4_0,
    GGMLType.Q4_1: dqm.dequant_q4_1,
    GGMLType.Q5_0: dqm.dequant_q5_0,
    GGMLType.Q5_1: dqm.dequant_q5_1,
    GGMLType.Q8_0: dqm.dequant_q8_0,
    GGMLType.Q8_1: dqm.dequant_q8_1,
    GGMLType.Q2_K: dqm.dequant_q2_K,
    GGMLType.Q3_K: dqm.dequant_q3_K,
    GGMLType.Q4_K: dqm.dequant_q4_K,
    GGMLType.Q5_K: dqm.dequant_q5_K,
    GGMLType.Q6_K: dqm.dequant_q6_K,
    GGMLType.Q8_K: dqm.dequant_q8_K,
}


def _to_kernel_layout(qtype: GGMLType, blocks: np.ndarray) -> dict:
    """Wire structured blocks (N, nb) → kernel-layout field dict (numpy,
    once at load). Mirrors ops/pallas/qmm.py layout docs."""
    from .pallas import qmm

    n = blocks.shape[0]
    if qtype == GGMLType.Q4_K:
        sc, mm = dqm.unpack_scale_min_k4(np, np.ascontiguousarray(blocks["scales"]))
        qs_k, scm, dd = qmm.q4k_weight_layout(
            np.ascontiguousarray(blocks["qs"]),
            np.ascontiguousarray(blocks["d"]), np.ascontiguousarray(blocks["dmin"]),
            sc, mm)
        return {"qs": qs_k, "scm": scm, "dd": dd}
    if qtype == GGMLType.Q8_0:
        qs_k, d_k = qmm.q8_weight_layout(
            np.ascontiguousarray(blocks["qs"]), np.ascontiguousarray(blocks["d"]))
        return {"qs": qs_k, "d": d_k}
    if qtype == GGMLType.Q4_0:
        qs_k, d_k = qmm.q40_weight_layout(
            np.ascontiguousarray(blocks["qs"]), np.ascontiguousarray(blocks["d"]))
        return {"qs": qs_k, "d": d_k}
    if qtype == GGMLType.Q4_1:
        qs_k, d_k, m_k = qmm.q41_weight_layout(
            np.ascontiguousarray(blocks["qs"]),
            np.ascontiguousarray(blocks["d"]).astype(np.float32),
            np.ascontiguousarray(blocks["m"]).astype(np.float32))
        return {"qs": qs_k, "d": d_k, "m": m_k}
    if qtype == GGMLType.Q5_0:
        qs_k, qh_k, d_k = qmm.q5l_weight_layout(
            np.ascontiguousarray(blocks["qs"]),
            np.ascontiguousarray(blocks["qh"]),
            np.ascontiguousarray(blocks["d"]).astype(np.float32))
        return {"qs": qs_k, "qh": qh_k, "d": d_k}
    if qtype == GGMLType.Q5_1:
        qs_k, qh_k, d_k, m_k = qmm.q5l_weight_layout(
            np.ascontiguousarray(blocks["qs"]),
            np.ascontiguousarray(blocks["qh"]),
            np.ascontiguousarray(blocks["d"]).astype(np.float32),
            np.ascontiguousarray(blocks["m"]).astype(np.float32))
        return {"qs": qs_k, "qh": qh_k, "d": d_k, "m": m_k}
    if qtype == GGMLType.Q6_K:
        ql_k, qh_k, sc_k, dq = qmm.q6k_weight_layout(
            np.ascontiguousarray(blocks["ql"]),
            np.ascontiguousarray(blocks["qh"]),
            np.ascontiguousarray(blocks["scales"]),
            np.ascontiguousarray(blocks["d"]).astype(np.float32))
        return {"ql": ql_k, "qh": qh_k, "sc": sc_k, "dq": dq}
    if qtype == GGMLType.Q2_K:
        qs_k, scm, dq, dm = qmm.q2k_weight_layout(
            np.ascontiguousarray(blocks["qs"]),
            np.ascontiguousarray(blocks["scales"]),
            np.ascontiguousarray(blocks["d"]).astype(np.float32),
            np.ascontiguousarray(blocks["dmin"]).astype(np.float32))
        return {"qs": qs_k, "scm": scm, "dq": dq, "dm": dm}
    if qtype == GGMLType.Q3_K:
        sc16 = dqm.unpack_q3_scales(
            np, np.ascontiguousarray(blocks["scales"])).astype(np.int8)
        qs_k, hm_k, sc_k, dq = qmm.q3k_weight_layout(
            np.ascontiguousarray(blocks["qs"]),
            np.ascontiguousarray(blocks["hmask"]), sc16,
            np.ascontiguousarray(blocks["d"]).astype(np.float32))
        return {"qs": qs_k, "hm": hm_k, "sc": sc_k, "dq": dq}
    if qtype == GGMLType.Q5_K:
        sc, mm = dqm.unpack_scale_min_k4(np, np.ascontiguousarray(blocks["scales"]))
        ql_k, qh_k, scm, d32, dmin32 = qmm.q5k_weight_layout(
            np.ascontiguousarray(blocks["qs"]),
            np.ascontiguousarray(blocks["qh"]), sc, mm,
            np.ascontiguousarray(blocks["d"]).astype(np.float32),
            np.ascontiguousarray(blocks["dmin"]).astype(np.float32))
        return {"ql": ql_k, "qh": qh_k, "scm": scm, "d": d32, "dmin": dmin32}
    raise KeyError(qtype)


def _dequant_kernel_layout(qt: "QuantTensor") -> jax.Array:
    """Bit-exact dequantization from the (2-D lane-dense) kernel layout
    (cold path; the hot path never expands weights)."""
    f = qt.fields
    n = qt.shape[0]
    if qt.qtype == GGMLType.Q4_K:
        from .pallas import qmm

        sb = f["qs"].shape[1] // 128
        qr = f["qs"].reshape(n, sb, 32, 4)        # [j, g]
        lo = (qr & 0xF).astype(jnp.float32)
        hi = (qr >> 4).astype(jnp.float32)
        dsclo, dschi, dmlo, dmhi = (
            a.reshape(n, sb, 4)
            for a in qmm.q4k_scale_arrays(f["scm"], f["dd"]))
        lo = lo * dsclo[:, :, None, :] - dmlo[:, :, None, :]
        hi = hi * dschi[:, :, None, :] - dmhi[:, :, None, :]
        # element (sb, g, half, j)
        out = jnp.stack([lo, hi], axis=3)          # (n, sb, 32, 2, 4) [j,half,g]
        out = jnp.transpose(out, (0, 1, 4, 3, 2))  # (n, sb, g, half, j)
        return out.reshape(n, sb * 256)
    if qt.qtype == GGMLType.Q8_0:
        kt = f["qs"].shape[1] // 128
        qr = f["qs"].reshape(n, kt, 32, 4).astype(jnp.float32)
        d = f["d"].reshape(n, kt, 4)
        w = qr * d[:, :, None, :]
        return jnp.transpose(w, (0, 1, 3, 2)).reshape(n, kt * 128)
    if qt.qtype == GGMLType.Q4_0:
        kt = f["qs"].shape[1] // 128
        qr = f["qs"].reshape(n, kt, 16, 8)
        d = f["d"].reshape(n, kt, 8)
        lo = ((qr & 0xF).astype(jnp.int32) - 8).astype(jnp.float32)
        hi = ((qr >> 4).astype(jnp.int32) - 8).astype(jnp.float32)
        lo = lo * d[:, :, None, :]
        hi = hi * d[:, :, None, :]
        out = jnp.stack([lo, hi], axis=3)          # (n, kt, 16, 2, 8) [j,half,b]
        out = jnp.transpose(out, (0, 1, 4, 3, 2))  # (n, kt, b, half, j)
        return out.reshape(n, kt * 256)
    if qt.qtype == GGMLType.Q4_1:
        kt = f["qs"].shape[1] // 128
        qr = f["qs"].reshape(n, kt, 16, 8)
        d = f["d"].reshape(n, kt, 8)[:, :, None, :]
        m_ = f["m"].reshape(n, kt, 8)[:, :, None, :]
        lo = (qr & 0xF).astype(jnp.float32) * d + m_
        hi = (qr >> 4).astype(jnp.float32) * d + m_
        out = jnp.stack([lo, hi], axis=3)          # (n, kt, 16, 2, 8)
        out = jnp.transpose(out, (0, 1, 4, 3, 2))  # (n, kt, b, half, j)
        return out.reshape(n, kt * 256)
    if qt.qtype in (GGMLType.Q5_0, GGMLType.Q5_1):
        kdim = qt.shape[-1]
        ch = f["qs"].shape[1] // 512
        qsr = f["qs"].reshape(n, ch, 4, 8, 2, 8)   # (c,t,jj,kk,b)
        qs_w = jnp.transpose(qsr, (0, 1, 2, 5, 4, 3))    # (c,t,b,kk,jj)
        qhr = f["qh"].reshape(n, ch, 4, 2, 2, 8)   # (c,t,h,kk,b)
        qh_w = jnp.transpose(qhr, (0, 1, 2, 5, 3, 4))    # (c,t,b,h,kk)
        qs32 = qs_w.astype(jnp.int32)
        nib = jnp.stack([qs32 & 0xF, qs32 >> 4], axis=4)  # (c,t,b,h,kk,jj)
        bits = (qh_w.astype(jnp.int32)[..., None]
                >> jnp.arange(8, dtype=jnp.int32)) & 1    # (c,t,b,h,kk,jj)
        q5 = (nib | (bits << 4)).astype(jnp.float32)
        d = f["d"].reshape(n, ch, 4, 8)[..., None, None, None]
        if qt.qtype == GGMLType.Q5_0:
            w = (q5 - 16.0) * d
        else:
            m_ = f["m"].reshape(n, ch, 4, 8)[..., None, None, None]
            w = q5 * d + m_
        return w.reshape(n, ch * 1024)[:, :kdim]
    if qt.qtype in (GGMLType.Q2_K, GGMLType.Q3_K):
        kdim = qt.shape[-1]
        ch = f["qs"].shape[1] // 128
        # invert lane = jj*8 + sb*4 + h*2 + s (qmm.q2k/q3k_weight_layout);
        # element within a superblock: e = h*128 + t*32 + s*16 + jj
        qr = f["qs"].reshape(n, ch, 16, 2, 2, 2)           # (c,jj,sb,h,s)
        q_w = jnp.transpose(qr, (0, 1, 3, 4, 5, 2)).astype(jnp.int32)
        t4 = jnp.arange(4, dtype=jnp.int32)
        planes = (q_w[:, :, :, :, None] >>
                  (2 * t4)[None, None, None, None, :, None, None]) & 3
        # planes: (n, c, sb, h, t, s, jj)
        d = f["dq"][:, ::4].reshape(n, ch, 2)              # (c, sb)
        if qt.qtype == GGMLType.Q2_K:
            scr = f["scm"].reshape(n, ch, 4, 2, 2, 2)      # (c,t,sb,h,s)
            sc_w = jnp.transpose(scr, (0, 1, 3, 4, 2, 5))  # (c,sb,h,t,s)
            dmin = f["dm"][:, ::4].reshape(n, ch, 2)
            dl = d[..., None, None, None] * (sc_w & 0xF).astype(jnp.float32)
            ml = dmin[..., None, None, None] * (sc_w >> 4).astype(jnp.float32)
            w = planes.astype(jnp.float32) * dl[..., None] - ml[..., None]
        else:
            hr = f["hm"].reshape(n, ch, 16, 2, 2, 2)       # (c,jj,sb,h,s)
            hm_w = jnp.transpose(hr, (0, 1, 3, 4, 5, 2)).astype(jnp.int32)
            sh = (4 * jnp.arange(2, dtype=jnp.int32)[:, None]
                  + t4[None, :])                           # (h, t)
            hbits = (hm_w[:, :, :, :, None] >>
                     sh[None, None, None, :, :, None, None]) & 1
            sc_w = jnp.transpose(
                f["sc"].reshape(n, ch, 4, 2, 2, 2),
                (0, 1, 3, 4, 2, 5)).astype(jnp.float32)    # (c,sb,h,t,s)
            dl = d[..., None, None, None] * sc_w
            qsgn = (planes - (1 - hbits) * 4).astype(jnp.float32)
            w = qsgn * dl[..., None]
        return w.reshape(n, ch * 512)[:, :kdim]
    if qt.qtype == GGMLType.Q6_K:
        kdim = qt.shape[-1]
        ch = f["ql"].shape[1] // 256
        # invert the chunked kernel layout (qmm.q6k_weight_layout)
        qlr = f["ql"].reshape(n, ch, 2, 16, 2, 2, 2)      # (c,k,j,sb,h,s)
        ql_w = jnp.transpose(qlr, (0, 1, 4, 5, 2, 6, 3))  # (c,sb,h,k,s,j)
        qhr = f["qh"].reshape(n, ch, 16, 2, 2, 2)         # (c,j,sb,h,s)
        qh_w = jnp.transpose(qhr, (0, 1, 3, 4, 5, 2))     # (c,sb,h,s,j)
        scr = f["sc"].reshape(n, ch, 4, 2, 2, 2)          # (c,q,sb,h,s)
        sc_w = jnp.transpose(scr, (0, 1, 3, 4, 2, 5)) \
            .astype(jnp.float32)                          # (c,sb,h,q,s)
        d = f["dq"][:, ::4].reshape(n, ch, 2)             # (c,sb)
        ql32 = ql_w.astype(jnp.int32)
        nibs = jnp.stack([ql32[:, :, :, :, 0] & 0xF,      # q1 (k=0 lo)
                          ql32[:, :, :, :, 1] & 0xF,      # q2
                          ql32[:, :, :, :, 0] >> 4,       # q3
                          ql32[:, :, :, :, 1] >> 4],
                         axis=4)                          # (c,sb,h,q,s,j)
        sh = jnp.arange(4, dtype=jnp.int32)[None, None, None, None, :,
                                            None, None] * 2
        bits = (qh_w.astype(jnp.int32)[:, :, :, :, None] >> sh) & 3
        val = (nibs | (bits << 4)) - 32
        w = val.astype(jnp.float32) * sc_w[..., None] \
            * d[:, :, :, None, None, None, None]
        return w.reshape(n, ch * 512)[:, :kdim]
    if qt.qtype == GGMLType.Q5_K:
        kdim = qt.shape[-1]
        ch = f["ql"].shape[1] // 512
        qlr = f["ql"].reshape(n, ch, 4, 32, 4)            # (c,g,j,sb)
        ql_w = jnp.transpose(qlr, (0, 1, 4, 2, 3))        # (c,sb,g,j)
        qhr = f["qh"].reshape(n, ch, 32, 4)               # (c,j,sb)
        qh_w = jnp.transpose(qhr, (0, 1, 3, 2))           # (c,sb,j)
        scm = f["scm"].reshape(n, ch, 2, 8, 4)            # ([sc|m],t,sb)
        sc_w = jnp.transpose(scm[:, :, 0], (0, 1, 3, 2)) \
            .astype(jnp.float32)                          # (c,sb,t)
        mm_w = jnp.transpose(scm[:, :, 1], (0, 1, 3, 2)).astype(jnp.float32)
        d = f["d"].reshape(n, ch, 4)
        dmin = f["dmin"].reshape(n, ch, 4)
        ql32 = ql_w.astype(jnp.int32)
        qh32 = qh_w.astype(jnp.int32)
        # element order (c, sb, g, h, j); t = 2g+h
        nib = jnp.stack([ql32 & 0xF, ql32 >> 4], axis=4)  # (c,sb,g,h,j)
        sh = (jnp.arange(4)[:, None] * 2 + jnp.arange(2)[None, :]) \
            .astype(jnp.int32)                            # (g,h)
        bits = (qh32[:, :, :, None, None, :]
                >> sh[None, None, None, :, :, None]) & 1  # (c,sb,g,h,j)
        q = nib + 16 * bits
        dsc = sc_w.reshape(n, ch, 4, 4, 2) * d[:, :, :, None, None]
        dmm = mm_w.reshape(n, ch, 4, 4, 2) * dmin[:, :, :, None, None]
        w = q.astype(jnp.float32) * dsc[..., None] - dmm[..., None]
        return w.reshape(n, ch * 1024)[:, :kdim]
    raise KeyError(qt.qtype)


@jax.tree_util.register_pytree_node_class
@dataclass
class QuantTensor:
    """A quantized weight living on device as packed block fields.

    shape is the logical float shape in C order (e.g. (n_out, n_in))."""

    qtype: GGMLType
    shape: tuple[int, ...]
    fields: dict[str, jax.Array]
    layout: str = "wire"

    def tree_flatten(self):
        names = tuple(sorted(self.fields))
        return tuple(self.fields[n] for n in names), (
            self.qtype, self.shape, names, self.layout)

    @classmethod
    def tree_unflatten(cls, aux, children):
        qtype, shape, names, layout = aux
        return cls(qtype, shape, dict(zip(names, children)), layout)

    @property
    def dtype(self):
        return jnp.float32

    @property
    def nbytes(self) -> int:
        return sum(int(np.prod(a.shape)) * a.dtype.itemsize
                   for a in self.fields.values())

    @classmethod
    def from_blocks(cls, qtype: GGMLType, blocks: np.ndarray,
                    shape: tuple[int, ...] | None = None, device=None,
                    prefer_kernel: bool = True) -> "QuantTensor":
        """From a numpy structured block array (e.g. GGUFReader.tensor_blocks)."""
        tt = TYPE_TRAITS[qtype]
        if shape is None:
            shape = blocks.shape[:-1] + (blocks.shape[-1] * tt.blck_size,)
        use_kernel = (prefer_kernel and qtype in _KFIELDS
                      and len(blocks.shape) == 2
                      and shape[-1] % 256 == 0)
        if use_kernel:
            fields_np = _to_kernel_layout(qtype, blocks)
            layout = "kernel"
        elif qtype not in _FIELDS:
            # formats without a device-side wire dequant (MXFP4, ternary,
            # IQ4, codebook i-quants): load straight into the tile-major
            # int8 execution layout — numpy-side, so any registry codec
            # works; runs on the XLA segmented-integer-dot path
            from ..quant.registry import dequantize
            from ..utils import config

            tile = int(config.get("int8_tile"))
            w = dequantize(qtype, blocks).reshape(shape).astype(np.float32)
            while w.shape[1] % tile and tile > 32:   # e.g. K=11008 → 256
                tile //= 2
            while w.shape[1] // tile < 8 and tile > 128:  # ≥8 K-segments
                tile //= 2                                # (floor 128)
            assert w.ndim == 2 and w.shape[1] % tile == 0, (shape, tile)
            wt = w.reshape(w.shape[0], w.shape[1] // tile, tile)
            amax = np.abs(wt).max(-1)
            dw = (amax / 127.0).astype(np.float32)
            inv = np.where(amax > 0, 127.0 / np.where(amax > 0, amax, 1.0),
                           0.0)
            w8 = np.clip(np.round(wt * inv[..., None]), -127, 127)
            fields_np = {"w8t": np.ascontiguousarray(
                             w8.astype(np.int8).transpose(1, 0, 2)),
                         "dwt": np.ascontiguousarray(dw.T)}
            layout = "int8"
        else:
            fields_np = {name: np.ascontiguousarray(blocks[name])
                         for name in _FIELDS[qtype]}
            layout = "wire"
        fields = {k: jax.device_put(v, device) for k, v in fields_np.items()}
        return cls(qtype, tuple(shape), fields, layout)

    @classmethod
    def quantize(cls, qtype: GGMLType, x: np.ndarray, device=None,
                 prefer_kernel: bool = True) -> "QuantTensor":
        from ..quant.registry import quantize

        return cls.from_blocks(qtype, quantize(qtype, x), x.shape, device,
                               prefer_kernel)

    def localize(self) -> "QuantTensor":
        """Rebind the logical shape to the actual field shapes.

        Inside shard_map the pytree leaves are per-device shards while aux
        data (this dataclass's `shape`) still carries the global value; the
        kernels and dequant reshape against `shape`, so sharded-weight
        forwards must localize first (parallel/tp.py does this)."""
        # Only the row (N) axis is ever sharded (shard_quant_tensor shards
        # every field on axis 0); K stays global, including any kernel-layout
        # chunk padding, so it is taken from the logical shape.
        if self.layout == "kernel":
            n = self.fields["qs" if "qs" in self.fields else "ql"].shape[0]
        elif self.layout == "int8":
            # tile-major fields carry both axes: rows on 1, K-tiles on 0
            w8t = self.fields["w8t"]
            shp = (w8t.shape[1], w8t.shape[0] * w8t.shape[2])
            if shp == tuple(self.shape):
                return self
            return QuantTensor(self.qtype, shp, self.fields, self.layout)
        else:
            n = self.fields[_FIELDS[self.qtype][0]].shape[0]
        shp = (n, self.shape[-1])
        if shp == tuple(self.shape):
            return self
        return QuantTensor(self.qtype, shp, self.fields, self.layout)


def to_int8_layout(qt: QuantTensor, tile: int | None = None) -> QuantTensor:
    """Convert any quantized weight to the XLA-native int8 execution
    layout: values requantized to int8 against the ACTUAL per-(row,
    K-tile) max, plus the f32 tile scales (tile width = config
    "int8_tile", default 512 — see the config entry for measurements).

    Motivation (measured on the target runtime): Pallas kernels' HBM→VMEM
    DMA streams at ~19 GB/s here while XLA fusions sustain ~720 GB/s, so
    HBM-bound decode must run through XLA ops. This layout feeds XLA's
    native int8 dot via a per-tile segmented contraction (`qmatmul`),
    streaming ~8.25 bpw at full bandwidth — the same requantization error
    class as the integer-MXU prefill kernels (bounded by tile max / 254;
    wider tiles stream marginally fewer scale bytes at slightly higher
    requant error)."""
    w = dequant(qt)                                    # (N, K) f32
    n, k = w.shape
    tile = _choose_tile(k, tile)
    w8t, dwt = _requant_tiles(w, tile)
    return QuantTensor(qt.qtype, qt.shape,
                       {"w8t": w8t, "dwt": dwt}, "int8")


def _choose_tile(k: int, tile: int | None) -> int:
    from_config = tile is None
    if from_config:
        from ..utils import config

        tile = int(config.get("int8_tile"))
    while k % tile and tile > 32:      # e.g. llama's n_ff=11008 % 512 != 0
        tile //= 2
    if from_config:
        # keep ≥8 K-segments so column TP can still shard the tile axis,
        # but never below 128: sub-lane-width tiles measured numerically
        # unstable under shard_map (XLA fuses the activation-quant chain
        # differently sharded vs not at tile=64 — divergence at requant
        # scale that disappears when the fusion is broken by a tap)
        while k // tile < 8 and tile > 128:
            tile //= 2
    assert k % tile == 0, (k, tile)
    return tile


def _requant_tiles(w, tile: int):
    """(N, K) f32 → tile-major int8 fields (w8t (Kt, N, tile), dwt (Kt, N)).
    Stored tile-major: the segmented contraction batches over tiles, and a
    row-major (N, K) layout would make XLA materialize a full transposed
    copy of the weights EVERY matmul (measured: caps decode at ~50 GB/s;
    tile-major streams at fusion speed)."""
    n, k = w.shape
    wt = w.reshape(n, k // tile, tile)
    amax = jnp.max(jnp.abs(wt), axis=-1)
    dw = amax / 127.0
    inv = jnp.where(amax > 0, 127.0 / jnp.where(amax > 0, amax, 1.0), 0.0)
    w8 = jnp.clip(jnp.round(wt * inv[..., None]), -127.0, 127.0)
    return jnp.swapaxes(w8.astype(jnp.int8), 0, 1), dw.T


# -- minimum-transfer load path (wire bytes → int8 layout ON DEVICE) --------
# Measured on the tunnel runtime (docs/PERFORMANCE.md): host→device
# transfers cap at ~45-50 MB/s with ~0.4 s fixed cost per transfer, and
# strided/small-inner-dim field uploads degrade to ~0.1 MB/s — so
# time-to-first-token is floored by UPLOADED BYTES, not host or device
# work. Raw GGUF wire (4.5 bpw for Q4_K) is the minimum possible payload;
# field splitting (bitcast for packed f16 scales), dequantization
# (quant/dequant_math with xp=jnp) and int8 requantization all run
# device-side in one jitted program per (qtype, n, k, tile) — bit-identical
# to to_int8_layout(QuantTensor.from_blocks(...)), verified in
# tests/test_int8_load.py. The reference analogue is mmap + repack-at-load
# (src/gguf.cpp:319, src/ggml-cpu/repack.cpp).

_WIRE_CONV_JITS: dict = {}


def wire_bytes_supported(qtype: GGMLType) -> bool:
    """True when the on-device wire→int8 program exists for this type."""
    return qtype in _FIELDS and qtype in _DEQUANT_WIRE


def wire_bytes_to_int8(qtype: GGMLType, chunk: jax.Array, offset, n: int,
                       k: int, tile: int | None = None) -> QuantTensor:
    """Slice one tensor's raw wire bytes out of a flat device uint8 chunk
    (traced byte `offset` — one compile covers every tensor of a given
    (qtype, n, k) regardless of position) and convert to the tile-major
    int8 execution layout entirely on device."""
    tt = TYPE_TRAITS[qtype]
    tile = _choose_tile(k, tile)
    key = (qtype, n, k, tile, chunk.shape[0])
    fn = _WIRE_CONV_JITS.get(key)
    if fn is None:
        nb = k // tt.blck_size
        bs = tt.type_size
        metas = []          # (lo, hi, base numpy dtype, element count)
        for nm in _FIELDS[qtype]:
            fdt, off = tt.block_dtype.fields[nm][:2]
            base = fdt.base if fdt.subdtype else fdt
            metas.append((off, off + fdt.itemsize, base,
                          fdt.itemsize // base.itemsize))

        @jax.jit
        def fn(chunk, offset):
            w = jax.lax.dynamic_slice(chunk, (offset,), (n * nb * bs,))
            w = w.reshape(n, nb, bs)
            args = []
            for lo, hi, base, count in metas:
                piece = w[..., lo:hi]
                if base.itemsize > 1:    # f16/f32/i16 scale fields
                    piece = jax.lax.bitcast_convert_type(
                        piece.reshape(n, nb, count, base.itemsize),
                        jnp.dtype(base))
                elif base != np.uint8:   # signed q8 wire values
                    piece = jax.lax.bitcast_convert_type(piece,
                                                         jnp.dtype(base))
                args.append(piece.reshape(n, nb) if count == 1
                            else piece.reshape(n, nb, count))
            wf = _DEQUANT_WIRE[qtype](jnp, *args).reshape(n, k)
            return _requant_tiles(wf, tile)

        _WIRE_CONV_JITS[key] = fn
    w8t, dwt = fn(chunk, jnp.int32(offset))
    return QuantTensor(qtype, (n, k), {"w8t": w8t, "dwt": dwt}, "int8")


def _int8_layout_matmul(x: jax.Array, qt: QuantTensor) -> jax.Array:
    """x (..., K) @ int8-layout weight → (..., N) f32, all XLA ops.

    Per-tile integer contraction: both operands int8 per 128-column tile,
    partial int32 sums scaled by the rank-1 (activation ⊗ weight) f32 tile
    scales and reduced over tiles — the XLA mirror of the Pallas int8
    kernels' math (exact integer dots, two bounded roundings)."""
    lead = x.shape[:-1]
    k = x.shape[-1]
    n = qt.shape[0]
    tile = qt.fields["w8t"].shape[2]
    kt = k // tile
    x2 = x.reshape(-1, kt, tile).astype(jnp.float32)
    amax = jnp.max(jnp.abs(x2), axis=-1)
    ex = amax / 127.0
    inv = jnp.where(amax > 0, 127.0 / jnp.where(amax > 0, amax, 1.0), 0.0)
    qx = jnp.clip(jnp.round(x2 * inv[..., None]), -127.0, 127.0) \
        .astype(jnp.int8)
    # (kt, m, 128) ⋅ (kt, n, 128) → (kt, m, n) int32 (native int8 MXU);
    # weights are stored tile-major so no transpose is materialized
    prod = jax.lax.dot_general(
        jnp.swapaxes(qx, 0, 1), qt.fields["w8t"],
        (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.int32)
    scaled = (prod.astype(jnp.float32)
              * ex.T[:, :, None] * qt.fields["dwt"][:, None, :])
    return scaled.sum(0).reshape(*lead, n)


def embed_rows(table, ids):
    """Row gather + dequantize for embedding tables that may be plain
    arrays or QuantTensors in any layout (packed rows gather cheaply; the
    tile-major int8 layout keeps rows on axis 1)."""
    if not isinstance(table, QuantTensor):
        return table[ids]
    flat = ids.reshape(-1)
    if table.layout == "int8":
        sub = QuantTensor(table.qtype, flat.shape + table.shape[1:],
                          {"w8t": table.fields["w8t"][:, flat],
                           "dwt": table.fields["dwt"][:, flat]}, "int8")
    else:
        sub = QuantTensor(table.qtype, flat.shape + table.shape[1:],
                          {k: v[flat] for k, v in table.fields.items()},
                          table.layout)
    return dequant(sub).reshape(ids.shape + table.shape[1:])


def apply_weights_layout(params, layout: str | None = None):
    """Convert every QuantTensor in a param pytree to the configured
    execution layout (config "weights_layout"; currently 'kernel' keeps
    the load-time layout, 'int8' converts via to_int8_layout)."""
    from ..utils import config

    layout = layout or config.get("weights_layout")
    if layout == "auto":
        from ..utils import autotune

        layout = autotune.choose()
    if layout != "int8":
        return params
    return jax.tree.map(
        lambda t: to_int8_layout(t)
        if isinstance(t, QuantTensor) and t.layout != "int8" else t,
        params, is_leaf=lambda t: isinstance(t, QuantTensor))


def dequant(qt: QuantTensor, dtype=jnp.float32) -> jax.Array:
    """Expand to a dense array of qt.shape (bit-exact f32 w.r.t. the C ref;
    the int8 execution layout reproduces its requantized values)."""
    if qt.layout == "int8":
        n, k = qt.shape
        w8 = jnp.swapaxes(qt.fields["w8t"], 0, 1).astype(jnp.float32)
        y = (w8 * qt.fields["dwt"].T[..., None]).reshape(n, k)
    elif qt.layout == "kernel":
        y = _dequant_kernel_layout(qt)
    else:
        fn = _DEQUANT_WIRE[qt.qtype]
        y = fn(jnp, *(qt.fields[n] for n in _FIELDS[qt.qtype]))
    return y.reshape(qt.shape).astype(dtype)


def qmatmul(x: jax.Array, w: QuantTensor | jax.Array,
            compute_dtype=None, precision=None) -> jax.Array:
    """x: (..., K) @ w(N, K).T → (..., N)  (ggml mul_mat convention).

    Kernel-layout QuantTensors go through the fused Pallas kernels; others
    take the XLA dequant-then-dot fallback. f32 fallback pins HIGHEST
    precision (XLA's default silently rounds through bf16 on TPU)."""
    if isinstance(w, QuantTensor):
        if w.layout == "int8":
            return _int8_layout_matmul(x, w).astype(x.dtype)
        if w.layout == "kernel":
            from .pallas import dispatch

            return dispatch.matmul(x, w).astype(x.dtype)
        wd = dequant(w, compute_dtype or x.dtype)
    else:
        wd = w.astype(compute_dtype or x.dtype)
    if precision is None:
        precision = (jax.lax.Precision.HIGHEST
                     if x.dtype == jnp.float32 else jax.lax.Precision.DEFAULT)
    return jax.lax.dot_general(
        x, wd,
        dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    ).astype(x.dtype)
