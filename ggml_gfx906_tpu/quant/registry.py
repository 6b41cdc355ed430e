"""Codec dispatch: quantize/dequantize by GGMLType, wire-bytes conversion.

Analogue of ggml's type-traits function table (ggml_get_type_traits
include/ggml.h:2439-2449, ggml_quantize_chunk src/ggml.c:6989).
"""
from __future__ import annotations

import numpy as np

from . import iquants, kquants, legacy, modern
from .types import GGMLType, TYPE_TRAITS, row_size

# codecs accepting an importance matrix (ggml quantize_* chunk API,
# include/ggml.h:2406-2416 ggml_quantize_chunk(..., imatrix))
_QUANTIZE_IMATRIX = {
    GGMLType.Q4_0: legacy.quantize_q4_0_imatrix,
    GGMLType.Q4_1: legacy.quantize_q4_1_imatrix,
    GGMLType.Q5_0: legacy.quantize_q5_0_imatrix,
    GGMLType.Q5_1: legacy.quantize_q5_1_imatrix,
    GGMLType.Q2_K: kquants.quantize_q2_K_imatrix,
    GGMLType.Q3_K: kquants.quantize_q3_K_imatrix,
    GGMLType.Q4_K: kquants.quantize_q4_K_imatrix,
    GGMLType.Q5_K: kquants.quantize_q5_K_imatrix,
    GGMLType.Q6_K: kquants.quantize_q6_K_imatrix,
    GGMLType.IQ4_NL: modern.quantize_iq4_nl,
    GGMLType.IQ4_XS: modern.quantize_iq4_xs,
    GGMLType.IQ3_XXS: iquants.quantize_iq3_xxs,
    GGMLType.IQ3_S: iquants.quantize_iq3_s,
    GGMLType.IQ2_XXS: iquants.quantize_iq2_xxs,
    GGMLType.IQ2_XS: iquants.quantize_iq2_xs,
    GGMLType.IQ2_S: iquants.quantize_iq2_s,
    GGMLType.IQ1_S: iquants.quantize_iq1_s,
    GGMLType.IQ1_M: iquants.quantize_iq1_m,
}

# types whose reference chunk API accepts but IGNORES the imatrix
# (quantize_q8_0 src/ggml-quants.c:2091, quantize_mxfp4 :2098,
# quantize_tq1_0/tq2_0 :2710-2730)
_IMATRIX_IGNORED = {
    GGMLType.Q8_0, GGMLType.Q8_1, GGMLType.MXFP4,
    GGMLType.TQ1_0, GGMLType.TQ2_0,
}

_QUANTIZE = {
    GGMLType.Q4_0: legacy.quantize_q4_0,
    GGMLType.Q4_1: legacy.quantize_q4_1,
    GGMLType.Q5_0: legacy.quantize_q5_0,
    GGMLType.Q5_1: legacy.quantize_q5_1,
    GGMLType.Q8_0: legacy.quantize_q8_0,
    GGMLType.Q8_1: legacy.quantize_q8_1,
    GGMLType.Q2_K: kquants.quantize_q2_K,
    GGMLType.Q3_K: kquants.quantize_q3_K,
    GGMLType.Q4_K: kquants.quantize_q4_K,
    GGMLType.Q5_K: kquants.quantize_q5_K,
    GGMLType.Q6_K: kquants.quantize_q6_K,
    GGMLType.Q8_K: kquants.quantize_q8_K,
    GGMLType.MXFP4: modern.quantize_mxfp4,
    GGMLType.TQ1_0: modern.quantize_tq1_0,
    GGMLType.TQ2_0: modern.quantize_tq2_0,
    GGMLType.IQ4_NL: modern.quantize_iq4_nl,
    GGMLType.IQ4_XS: modern.quantize_iq4_xs,
    GGMLType.IQ3_XXS: iquants.quantize_iq3_xxs,
    GGMLType.IQ3_S: iquants.quantize_iq3_s,
    GGMLType.IQ2_S: iquants.quantize_iq2_s,
    GGMLType.IQ1_M: iquants.quantize_iq1_m,
}

_DEQUANTIZE = {
    GGMLType.Q4_0: legacy.dequantize_q4_0,
    GGMLType.Q4_1: legacy.dequantize_q4_1,
    GGMLType.Q5_0: legacy.dequantize_q5_0,
    GGMLType.Q5_1: legacy.dequantize_q5_1,
    GGMLType.Q8_0: legacy.dequantize_q8_0,
    GGMLType.Q8_1: legacy.dequantize_q8_1,
    GGMLType.Q2_K: kquants.dequantize_q2_K,
    GGMLType.Q3_K: kquants.dequantize_q3_K,
    GGMLType.Q4_K: kquants.dequantize_q4_K,
    GGMLType.Q5_K: kquants.dequantize_q5_K,
    GGMLType.Q6_K: kquants.dequantize_q6_K,
    GGMLType.Q8_K: kquants.dequantize_q8_K,
    GGMLType.MXFP4: modern.dequantize_mxfp4,
    GGMLType.TQ1_0: modern.dequantize_tq1_0,
    GGMLType.TQ2_0: modern.dequantize_tq2_0,
    GGMLType.IQ4_NL: modern.dequantize_iq4_nl,
    GGMLType.IQ4_XS: modern.dequantize_iq4_xs,
    GGMLType.IQ2_XXS: iquants.dequantize_iq2_xxs,
    GGMLType.IQ2_XS: iquants.dequantize_iq2_xs,
    GGMLType.IQ2_S: iquants.dequantize_iq2_s,
    GGMLType.IQ3_XXS: iquants.dequantize_iq3_xxs,
    GGMLType.IQ3_S: iquants.dequantize_iq3_s,
    GGMLType.IQ1_S: iquants.dequantize_iq1_s,
    GGMLType.IQ1_M: iquants.dequantize_iq1_m,
}


def supported_quant_types() -> list[GGMLType]:
    return sorted(_QUANTIZE.keys())


def quantize(t: GGMLType, x: np.ndarray, quant_weights=None) -> np.ndarray:
    """float32 (..., n) → structured block array (..., n // blck_size).

    quant_weights: optional per-column importance row (imatrix), shape
    (n,) or matching x — only for types in _QUANTIZE_IMATRIX."""
    x = np.asarray(x, dtype=np.float32)
    if quant_weights is not None:
        if t in _QUANTIZE_IMATRIX:
            return _QUANTIZE_IMATRIX[t](x, np.asarray(quant_weights, np.float32))
        if t in _IMATRIX_IGNORED:
            return _QUANTIZE[t](x)
        raise NotImplementedError(f"{t.name} has no imatrix-aware path")
    return _QUANTIZE[t](x)


def dequantize(t: GGMLType, blocks: np.ndarray) -> np.ndarray:
    """structured block array (..., nb) → float32 (..., nb * blck_size)."""
    return _DEQUANTIZE[t](blocks)


def quantize_to_bytes(t: GGMLType, x: np.ndarray) -> bytes:
    """Row-major wire bytes, identical layout to ggml_quantize_chunk output."""
    return np.ascontiguousarray(quantize(t, x)).tobytes()


def bytes_to_blocks(t: GGMLType, data, n_per_row: int, n_rows: int | None = None) -> np.ndarray:
    """View wire bytes as a structured block array (rows, n_per_row/blck)."""
    tt = TYPE_TRAITS[t]
    buf = np.frombuffer(data, dtype=np.uint8)
    rs = row_size(t, n_per_row)
    if n_rows is None:
        assert buf.size % rs == 0, (buf.size, rs)
        n_rows = buf.size // rs
    blocks = buf[: n_rows * rs].view(tt.block_dtype)
    return blocks.reshape(n_rows, n_per_row // tt.blck_size)


def dequantize_bytes(t: GGMLType, data, n_per_row: int, n_rows: int | None = None) -> np.ndarray:
    if t == GGMLType.F32:
        out = np.frombuffer(data, dtype="<f4").astype(np.float32)
        return out.reshape(n_rows, n_per_row) if n_rows else out.reshape(-1, n_per_row)
    if t == GGMLType.F16:
        out = np.frombuffer(data, dtype="<f2").astype(np.float32)
        return out.reshape(n_rows, n_per_row) if n_rows else out.reshape(-1, n_per_row)
    if t == GGMLType.BF16:
        raw = np.frombuffer(data, dtype="<u2").astype(np.uint32) << 16
        out = raw.view(np.float32).astype(np.float32)
        return out.reshape(n_rows, n_per_row) if n_rows else out.reshape(-1, n_per_row)
    return dequantize(t, bytes_to_blocks(t, data, n_per_row, n_rows))
