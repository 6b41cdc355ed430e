"""Bit-exact scalar numeric helpers shared by the quant codecs.

These replicate the exact rounding/conversion semantics the reference relies on
(ref: src/ggml-quants.c:444-449 nearest_int; src/ggml-impl.h:340-379 fp16
conversion) using numpy, fully vectorized.
"""
from __future__ import annotations

import numpy as np

F32 = np.float32


def fp32_to_fp16(x: np.ndarray) -> np.ndarray:
    """IEEE f32 -> f16 with round-to-nearest-even (matches GGML_FP32_TO_FP16)."""
    return x.astype(np.float16)


def fp16_to_fp32(x: np.ndarray) -> np.ndarray:
    return x.astype(np.float32)


def fp16_round(x: np.ndarray) -> np.ndarray:
    """Round-trip f32 through f16 storage (what storing a ggml_half does)."""
    return x.astype(np.float16).astype(np.float32)


def nearest_int(x: np.ndarray) -> np.ndarray:
    """Round-half-to-even to int32 (ggml nearest_int uses the 12582912.0f
    mantissa trick, which is RNE under default FP rounding mode)."""
    return np.rint(x).astype(np.int32)


def roundf_c(x: np.ndarray) -> np.ndarray:
    """C roundf: round half away from zero (used by q8_0/q8_1 quantizers)."""
    return (np.sign(x) * np.floor(np.abs(x) + F32(0.5))).astype(np.int32)


def trunc_i(x: np.ndarray) -> np.ndarray:
    """C float->int cast: truncation toward zero."""
    return np.trunc(x).astype(np.int32)


def signed_absmax(x: np.ndarray) -> np.ndarray:
    """Per-row value with the largest |.|, first occurrence on ties — matches
    the reference's `if (amax < fabsf(v)) { amax = ...; max = v; }` scan."""
    idx = np.argmax(np.abs(x), axis=-1)
    return np.take_along_axis(x, idx[..., None], axis=-1)[..., 0]


def seq_sum(a: np.ndarray) -> np.ndarray:
    """Strict left-to-right float32 accumulation over the last axis — matches
    C's sequential `acc += a[i]` loops (numpy's .sum is pairwise, which
    rounds differently and breaks bit-parity of the scale searches)."""
    a = a.astype(np.float32, copy=False)
    # np.cumsum accumulates left-to-right in float32 — bit-identical to the
    # scalar loop, one C pass instead of n python-level array adds
    return np.cumsum(a, axis=-1, dtype=np.float32)[..., -1]


def safe_div(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """a/b with 0 where b == 0 (the `d ? 1.0f/d : 0.0f` idiom)."""
    out = np.zeros(np.broadcast_shapes(a.shape, b.shape), dtype=np.float32)
    np.divide(a, b, out=out, where=(b != 0))
    return out
