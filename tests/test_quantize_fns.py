"""Quantization round-trip + dot-product accuracy bounds.

Port of the reference test *strategy and thresholds* — not the code —
from tests/test-quantize-fns.cpp:17-25 (thresholds) and :31-35 (test data).
These are the enforced ppl-parity anchors (SURVEY.md §6).
"""
import numpy as np
import pytest

from ggml_gfx906_tpu.quant import (
    GGMLType,
    TYPE_TRAITS,
    dequantize,
    quantize,
    quantize_to_bytes,
    bytes_to_blocks,
    row_size,
)

MAX_QUANTIZATION_TOTAL_ERROR = 0.002
MAX_QUANTIZATION_TOTAL_ERROR_2BITS = 0.0075
MAX_QUANTIZATION_TOTAL_ERROR_3BITS = 0.0040
MAX_QUANTIZATION_TOTAL_ERROR_TERNARY = 0.01
MAX_QUANTIZATION_TOTAL_ERROR_MXFP4 = 0.0045  # e2m1 on gaussian-ish data
MAX_DOT_PRODUCT_ERROR = 0.02
MAX_DOT_PRODUCT_ERROR_LOWBIT = 0.04
MAX_DOT_PRODUCT_ERROR_TERNARY = 0.15

TOTAL_ERROR = {
    GGMLType.Q4_0: MAX_QUANTIZATION_TOTAL_ERROR,
    GGMLType.Q4_1: MAX_QUANTIZATION_TOTAL_ERROR,
    GGMLType.Q5_0: MAX_QUANTIZATION_TOTAL_ERROR,
    GGMLType.Q5_1: MAX_QUANTIZATION_TOTAL_ERROR,
    GGMLType.Q8_0: MAX_QUANTIZATION_TOTAL_ERROR,
    GGMLType.Q8_1: MAX_QUANTIZATION_TOTAL_ERROR,
    GGMLType.Q2_K: MAX_QUANTIZATION_TOTAL_ERROR_2BITS,
    GGMLType.Q3_K: MAX_QUANTIZATION_TOTAL_ERROR_3BITS,
    GGMLType.Q4_K: MAX_QUANTIZATION_TOTAL_ERROR,
    GGMLType.Q5_K: MAX_QUANTIZATION_TOTAL_ERROR,
    GGMLType.Q6_K: MAX_QUANTIZATION_TOTAL_ERROR,
    GGMLType.Q8_K: MAX_QUANTIZATION_TOTAL_ERROR,
    GGMLType.MXFP4: MAX_QUANTIZATION_TOTAL_ERROR_MXFP4,
    GGMLType.TQ1_0: MAX_QUANTIZATION_TOTAL_ERROR_TERNARY,
    GGMLType.TQ2_0: MAX_QUANTIZATION_TOTAL_ERROR_TERNARY,
    GGMLType.IQ4_NL: MAX_QUANTIZATION_TOTAL_ERROR,
    GGMLType.IQ4_XS: MAX_QUANTIZATION_TOTAL_ERROR,
}

DOT_ERROR = {
    GGMLType.Q2_K: MAX_DOT_PRODUCT_ERROR_LOWBIT,
    GGMLType.Q3_K: MAX_DOT_PRODUCT_ERROR_LOWBIT,
    GGMLType.MXFP4: MAX_DOT_PRODUCT_ERROR_LOWBIT,
    GGMLType.TQ1_0: MAX_DOT_PRODUCT_ERROR_TERNARY,
    GGMLType.TQ2_0: MAX_DOT_PRODUCT_ERROR_TERNARY,
}

QTYPES = sorted(TOTAL_ERROR.keys())

TEST_SIZE = 32 * 128


def generate_data(offset: float, n: int) -> np.ndarray:
    """Same synthetic signal as the reference: 0.1 + 2*cos(i + offset)."""
    i = np.arange(n, dtype=np.float32)
    return (np.float32(0.1) + 2 * np.cos(i + np.float32(offset))).astype(np.float32)


def array_rmse(a: np.ndarray, b: np.ndarray) -> float:
    # reference divides sqrt(sum of squares) by n (not sqrt(n)) — keep that
    d = a.astype(np.float64) - b.astype(np.float64)
    return float(np.sqrt((d * d).sum()) / a.size)


@pytest.mark.parametrize("qtype", QTYPES, ids=lambda t: t.name)
def test_round_trip_error(qtype):
    data = generate_data(0.0, TEST_SIZE)
    deq = dequantize(qtype, quantize(qtype, data)).reshape(-1)
    err = array_rmse(data, deq)
    assert err < TOTAL_ERROR[qtype], f"{qtype.name}: rmse {err}"


@pytest.mark.parametrize("qtype", QTYPES, ids=lambda t: t.name)
def test_round_trip_gaussian(qtype):
    rng = np.random.default_rng(7)
    data = rng.standard_normal(TEST_SIZE).astype(np.float32)
    deq = dequantize(qtype, quantize(qtype, data)).reshape(-1)
    err = array_rmse(data, deq)
    # gaussian data is harsher than the cosine signal; 4x headroom bound
    assert err < 4 * TOTAL_ERROR[qtype], f"{qtype.name}: rmse {err}"


@pytest.mark.parametrize("qtype", QTYPES, ids=lambda t: t.name)
def test_dot_product_error(qtype):
    """Quantized dot (weights quantized, activations quantized to the
    companion vec_dot type) vs f32 dot. ref: test-quantize-fns.cpp dot test."""
    a = generate_data(0.0, TEST_SIZE)
    b = generate_data(1.0, TEST_SIZE)
    wa = dequantize(qtype, quantize(qtype, a)).reshape(-1)
    act_t = TYPE_TRAITS[qtype].vec_dot_type
    qb = dequantize(act_t, quantize(act_t, b)).reshape(-1)
    dot = float(np.dot(wa.astype(np.float64), qb.astype(np.float64)))
    ref = float(np.dot(a.astype(np.float64), b.astype(np.float64)))
    err = abs(dot - ref) / TEST_SIZE
    assert err < DOT_ERROR.get(qtype, MAX_DOT_PRODUCT_ERROR), f"{qtype.name}: {err}"


@pytest.mark.parametrize("qtype", QTYPES, ids=lambda t: t.name)
def test_wire_bytes_round_trip(qtype):
    """quantize→bytes→blocks→dequantize must equal quantize→dequantize."""
    data = generate_data(0.5, TEST_SIZE)
    blocks = quantize(qtype, data)
    raw = quantize_to_bytes(qtype, data)
    assert len(raw) == row_size(qtype, TEST_SIZE)
    blocks2 = bytes_to_blocks(qtype, raw, TEST_SIZE, 1)
    np.testing.assert_array_equal(
        dequantize(qtype, blocks).reshape(-1), dequantize(qtype, blocks2).reshape(-1)
    )


@pytest.mark.parametrize("qtype", QTYPES, ids=lambda t: t.name)
def test_zeros_and_constants(qtype):
    """Degenerate inputs: all-zero and constant blocks must round-trip
    without NaN/inf (the `d ? 1/d : 0` and GROUP_MAX_EPS paths)."""
    for data in [
        np.zeros(1024, dtype=np.float32),
        np.full(1024, 3.25, dtype=np.float32),
        np.full(1024, -1.5, dtype=np.float32),
    ]:
        deq = dequantize(qtype, quantize(qtype, data)).reshape(-1)
        assert np.isfinite(deq).all(), qtype.name
        err = array_rmse(data, deq)
        assert err < 4 * TOTAL_ERROR[qtype], f"{qtype.name}: rmse {err}"


@pytest.mark.parametrize("qtype", QTYPES, ids=lambda t: t.name)
def test_multirow(qtype):
    """2-D inputs quantize row-wise identically to row-at-a-time."""
    data = generate_data(0.25, 4 * 512).reshape(4, 512)
    blocks = quantize(qtype, data)
    for r in range(4):
        row_blocks = quantize(qtype, data[r])
        np.testing.assert_array_equal(
            np.ascontiguousarray(blocks[r]).view(np.uint8),
            np.ascontiguousarray(row_blocks).view(np.uint8),
        )
