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
    GGMLType.Q4_K: ("qs", "dsclo", "dschi", "dmlo", "dmhi"),
    GGMLType.Q8_0: ("qs", "d"),
    GGMLType.Q4_0: ("qs", "d"),
    GGMLType.Q6_K: ("qs", "dsc"),
    GGMLType.Q5_K: ("qs", "dsc", "dm"),
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
        qs_k, dsclo, dschi, dmlo, dmhi = qmm.q4k_weight_layout(
            np.ascontiguousarray(blocks["qs"]),
            np.ascontiguousarray(blocks["d"]), np.ascontiguousarray(blocks["dmin"]),
            sc, mm)
        return {"qs": qs_k, "dsclo": dsclo, "dschi": dschi,
                "dmlo": dmlo, "dmhi": dmhi}
    if qtype == GGMLType.Q8_0:
        qs_k, d_k = qmm.q8_weight_layout(
            np.ascontiguousarray(blocks["qs"]), np.ascontiguousarray(blocks["d"]))
        return {"qs": qs_k, "d": d_k}
    if qtype == GGMLType.Q4_0:
        qs_k, d_k = qmm.q40_weight_layout(
            np.ascontiguousarray(blocks["qs"]), np.ascontiguousarray(blocks["d"]))
        return {"qs": qs_k, "d": d_k}
    if qtype == GGMLType.Q6_K:
        # expanded-int8 layout (see qmm.py): values widened at load,
        # per-16 scales premultiplied (bit-exact product order: d_f32 * sc)
        ql = np.ascontiguousarray(blocks["ql"]).reshape(n, -1, 2, 2, 32)
        qh = np.ascontiguousarray(blocks["qh"]).reshape(n, -1, 2, 32)
        sc = np.ascontiguousarray(blocks["scales"])
        d = np.ascontiguousarray(blocks["d"]).astype(np.float32)
        q1 = (ql[:, :, :, 0, :] & 0xF) | (((qh >> 0) & 3) << 4)
        q2 = (ql[:, :, :, 1, :] & 0xF) | (((qh >> 2) & 3) << 4)
        q3 = (ql[:, :, :, 0, :] >> 4) | (((qh >> 4) & 3) << 4)
        q4 = (ql[:, :, :, 1, :] >> 4) | (((qh >> 6) & 3) << 4)
        q = np.stack([q1, q2, q3, q4], axis=3)          # (n, nb, h, k, 32)
        q_i8 = (q.astype(np.int16) - 32).astype(np.int8).reshape(n, -1)
        dsc = (d[:, :, None] * sc.astype(np.float32)).reshape(n, -1)
        qs_k, dsc_k = qmm.q6k_weight_layout(q_i8, dsc)
        return {"qs": qs_k, "dsc": dsc_k}
    if qtype == GGMLType.Q5_K:
        sc, mm = dqm.unpack_scale_min_k4(np, np.ascontiguousarray(blocks["scales"]))
        d = np.ascontiguousarray(blocks["d"]).astype(np.float32)
        dmin = np.ascontiguousarray(blocks["dmin"]).astype(np.float32)
        d_j = d[:, :, None] * sc.astype(np.float32)     # (n, nb, 8)
        m_j = dmin[:, :, None] * mm.astype(np.float32)
        ql = np.ascontiguousarray(blocks["qs"]).reshape(n, -1, 4, 32)
        qh = np.ascontiguousarray(blocks["qh"]).reshape(n, -1, 1, 32)
        g = np.arange(4)[None, None, :, None].astype(np.uint8)
        q0 = (ql & 0xF) + 16 * ((qh >> (2 * g)) & 1)
        q1 = (ql >> 4) + 16 * ((qh >> (2 * g + 1)) & 1)
        q = np.stack([q0, q1], axis=3)                  # (n, nb, g, half, 32)
        q_i8 = q.astype(np.int8).reshape(n, -1)
        qs_k, dsc_k, dm_k = qmm.q5k_weight_layout(
            q_i8, d_j.reshape(n, -1), m_j.reshape(n, -1))
        return {"qs": qs_k, "dsc": dsc_k, "dm": dm_k}
    raise KeyError(qtype)


def _dequant_kernel_layout(qt: "QuantTensor") -> jax.Array:
    """Bit-exact dequantization from the (2-D lane-dense) kernel layout
    (cold path; the hot path never expands weights)."""
    f = qt.fields
    n = qt.shape[0]
    if qt.qtype == GGMLType.Q4_K:
        sb = f["qs"].shape[1] // 128
        qr = f["qs"].reshape(n, sb, 32, 4)        # [j, g]
        lo = (qr & 0xF).astype(jnp.float32)
        hi = (qr >> 4).astype(jnp.float32)
        dsclo = f["dsclo"].reshape(n, sb, 4)
        dschi = f["dschi"].reshape(n, sb, 4)
        dmlo = f["dmlo"].reshape(n, sb, 4)
        dmhi = f["dmhi"].reshape(n, sb, 4)
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
    if qt.qtype == GGMLType.Q6_K:
        kdim = qt.shape[-1]
        qn = f["qs"].reshape(n, kdim // 128, 16, 8)
        qn = jnp.transpose(qn, (0, 1, 3, 2)).reshape(n, kdim)  # de-interleave
        w = qn.astype(jnp.float32).reshape(n, kdim // 16, 16) \
            * f["dsc"][:, :, None]
        return w.reshape(n, kdim)
    if qt.qtype == GGMLType.Q5_K:
        kdim = qt.shape[-1]
        qn = f["qs"].reshape(n, kdim // 128, 32, 4)
        qn = jnp.transpose(qn, (0, 1, 3, 2)).reshape(n, kdim)
        w = qn.astype(jnp.float32).reshape(n, kdim // 32, 32) \
            * f["dsc"][:, :, None] - f["dm"][:, :, None]
        return w.reshape(n, kdim)
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
        qs = self.fields.get("qs")
        if self.layout == "kernel":
            n = qs.shape[0]
            if self.qtype in (GGMLType.Q4_K, GGMLType.Q4_0):
                k = qs.shape[1] * 2
            elif self.qtype in (GGMLType.Q8_0, GGMLType.Q6_K, GGMLType.Q5_K):
                k = qs.shape[1]
            else:
                raise KeyError(self.qtype)
        else:
            lead = self.fields[_FIELDS[self.qtype][0]]
            n = lead.shape[0]
            k = lead.shape[1] * TYPE_TRAITS[self.qtype].blck_size
        shp = (n, k)
        if shp == tuple(self.shape):
            return self
        return QuantTensor(self.qtype, shp, self.fields, self.layout)


def dequant(qt: QuantTensor, dtype=jnp.float32) -> jax.Array:
    """Expand to a dense array of qt.shape (bit-exact f32 w.r.t. the C ref)."""
    if qt.layout == "kernel":
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
