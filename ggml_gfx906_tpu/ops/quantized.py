"""Quantized tensors on device: pytree container + jax dequant + matmul.

The QuantTensor keeps ggml block fields as separate device arrays
(struct-of-arrays — the TPU analogue of the reference's repack.cpp re-layout)
so sub-byte weights stay packed in HBM and are expanded on the fly inside
jit-compiled code. Dequant math is shared with the bit-exact numpy oracle
(quant/dequant_math.py), so device dequantization matches the C reference
exactly in f32.

ref: ggml's mul_mat convention — weights are (n_out, n_in) rows and
`mul_mat(W, x)` dots rows of x with rows of W (src/ggml.c mul_mat;
SURVEY.md §3.1), i.e. x @ W.T here.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..quant import dequant_math as dqm
from ..quant.types import GGMLType, TYPE_TRAITS

# per-type: which struct fields carry data (order matters for dequant calls)
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

_DEQUANT = {
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


@jax.tree_util.register_pytree_node_class
@dataclass
class QuantTensor:
    """A quantized weight living on device as packed block fields.

    shape is the logical float shape in C order (e.g. (n_out, n_in));
    fields are device arrays shaped (*shape[:-1], nb, ...per-field...).
    """

    qtype: GGMLType
    shape: tuple[int, ...]
    fields: dict[str, jax.Array]

    def tree_flatten(self):
        names = _FIELDS[self.qtype]
        return tuple(self.fields[n] for n in names), (self.qtype, self.shape, names)

    @classmethod
    def tree_unflatten(cls, aux, children):
        qtype, shape, names = aux
        return cls(qtype, shape, dict(zip(names, children)))

    @property
    def dtype(self):
        return jnp.float32

    @property
    def nbytes(self) -> int:
        return sum(int(np.prod(a.shape)) * a.dtype.itemsize for a in self.fields.values())

    @classmethod
    def from_blocks(cls, qtype: GGMLType, blocks: np.ndarray,
                    shape: tuple[int, ...] | None = None,
                    device=None) -> "QuantTensor":
        """From a numpy structured block array (e.g. GGUFReader.tensor_blocks)."""
        tt = TYPE_TRAITS[qtype]
        if shape is None:
            shape = blocks.shape[:-1] + (blocks.shape[-1] * tt.blck_size,)
        fields = {}
        for name in _FIELDS[qtype]:
            arr = np.ascontiguousarray(blocks[name])
            fields[name] = jax.device_put(arr, device)
        return cls(qtype, tuple(shape), fields)

    @classmethod
    def quantize(cls, qtype: GGMLType, x: np.ndarray, device=None) -> "QuantTensor":
        from ..quant.registry import quantize

        return cls.from_blocks(qtype, quantize(qtype, x), x.shape, device)


def dequant(qt: QuantTensor, dtype=jnp.float32) -> jax.Array:
    """Expand to a dense array of qt.shape (bit-exact f32 w.r.t. the C ref)."""
    fn = _DEQUANT[qt.qtype]
    y = fn(jnp, *(qt.fields[n] for n in _FIELDS[qt.qtype]))
    return y.reshape(qt.shape).astype(dtype)


def qmatmul(x: jax.Array, w: QuantTensor | jax.Array,
            compute_dtype=None, precision=None) -> jax.Array:
    """x: (..., K) @ w(N, K).T → (..., N)  (ggml mul_mat convention).

    Correctness-first XLA path: dequantize-on-the-fly then dot. The fused
    Pallas kernels (ops/pallas) replace this on the hot path. f32 inputs
    default to full-precision accumulation (XLA's DEFAULT would silently
    round through bf16 on TPU); bf16 model code passes precision explicitly.
    """
    if isinstance(w, QuantTensor):
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
