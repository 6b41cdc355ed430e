"""Integer-MXU qmm path — parity vs the exact dequant reference.

The int8 kernels (ops/pallas/qmm.py int8-MXU section) are the TPU analogue
of the reference's q8 activation quantization + integer dot pipeline
(src/ggml-cuda/quantize.cu, mmq.cu:275, vecdotq.cuh:590-672). They add two
bounded roundings (activations and weights requantized to per-128-lane-tile
int8), so parity bounds here are NMSE ~1e-4 against the f32 dequant matmul
— the same error class ggml accepts for its own q8_1-activation paths —
not the 1e-10 of the f32-expand kernels (tests/test_ops.py::test_qmatmul).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from ggml_gfx906_tpu.ops import quantized as qz
from ggml_gfx906_tpu.ops.pallas import qmm
from ggml_gfx906_tpu.quant.types import GGMLType

RNG = np.random.default_rng(7)


def nmse(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return float(((a - b) ** 2).mean() / max((a ** 2).mean(), 1e-30))


def _mm_i8(qtype, x, qt):
    f = qt.fields
    if qtype == GGMLType.Q4_K:
        return qmm.qmm_q4_K_i8(x, f["qs"], f["scm"], f["dd"])
    if qtype == GGMLType.Q8_0:
        return qmm.qmm_q8_0_i8(x, f["qs"], f["d"])
    return qmm.qmm_q4_0_i8(x, f["qs"], f["d"])


@pytest.mark.parametrize("qtype", [GGMLType.Q4_K, GGMLType.Q8_0,
                                   GGMLType.Q4_0])
@pytest.mark.parametrize("m", [64, 160])
def test_qmm_int8_parity(qtype, m):
    n, k = 96, 512
    w = RNG.standard_normal((n, k)).astype(np.float32)
    qt = qz.QuantTensor.quantize(qtype, w)
    assert qt.layout == "kernel"
    x = RNG.standard_normal((m, k)).astype(np.float32)
    expect = np.asarray(x @ np.asarray(qz.dequant(qt)).T)
    got = np.asarray(_mm_i8(qtype, jnp.asarray(x), qt))
    assert nmse(expect, got) < 2e-4, nmse(expect, got)


def test_quantize_x_tiles_roundtrip():
    x = RNG.standard_normal((4, 384)).astype(np.float32) * 3.0
    qx, ex = qmm.quantize_x_tiles(jnp.asarray(x))
    qx, ex = np.asarray(qx), np.asarray(ex)
    back = qx.reshape(4, 3, 128).astype(np.float32) * ex[..., None]
    assert nmse(x, back.reshape(4, 384)) < 1e-4
    # scales hit 127 at the tile max
    assert np.all(np.abs(qx).reshape(4, 3, 128).max(-1) == 127)


def test_qmm_int8_exact_when_representable():
    """With activations already int8-valued (scale 1) and weights whose
    blocks share one power-of-two scale, both requantizations are exact and
    the integer dot must match the float reference to f32 rounding."""
    n, k = 32, 256
    qvals = RNG.integers(-127, 128, (n, k)).astype(np.float32)
    qvals[:, ::32] = 127          # every block hits the max → d = 0.5 exact
    w = qvals * 0.5
    qt = qz.QuantTensor.quantize(GGMLType.Q8_0, w)
    x = RNG.integers(-127, 128, (8, k)).astype(np.float32)
    x[:, ::16] = 127              # every activation tile hits the max too
    # pad m to the dispatch threshold by tiling
    x = np.tile(x, (8, 1))
    expect = x @ np.asarray(qz.dequant(qt)).T
    got = np.asarray(_mm_i8(GGMLType.Q8_0, jnp.asarray(x), qt))
    np.testing.assert_allclose(got, expect, rtol=1e-6)


def test_dispatch_routes_by_m():
    from ggml_gfx906_tpu.utils import config

    min_m = config.get("int8_min_m")
    n, k = 64, 256
    w = RNG.standard_normal((n, k)).astype(np.float32)
    qt = qz.QuantTensor.quantize(GGMLType.Q4_K, w)
    dense = np.asarray(qz.dequant(qt))
    for m in (1, min_m):
        x = RNG.standard_normal((m, k)).astype(np.float32)
        got = np.asarray(qz.qmatmul(jnp.asarray(x), qt))
        bound = 1e-10 if m < min_m else 2e-4
        assert nmse(x @ dense.T, got) < bound


def test_int8_execution_layout_matches_dense():
    """The XLA-native int8 decode layout (per-128-tile requantization,
    segmented integer contraction) must match the dequantized dense matmul
    within the int8-rounding error class at any M."""
    n, k = 96, 512
    w = RNG.standard_normal((n, k)).astype(np.float32)
    qt = qz.QuantTensor.quantize(GGMLType.Q4_K, w)
    qt8 = qz.to_int8_layout(qt)
    assert qt8.layout == "int8"
    dense = np.asarray(qz.dequant(qt))
    for m in (1, 7, 64):
        x = RNG.standard_normal((m, k)).astype(np.float32)
        got = np.asarray(qz.qmatmul(jnp.asarray(x), qt8))
        assert got.shape == (m, n)
        assert nmse(x @ dense.T, got) < 2e-4
    # dequant of the int8 layout reproduces its own values exactly
    d8 = np.asarray(qz.dequant(qt8))
    w8 = np.asarray(qt8.fields["w8t"]).transpose(1, 0, 2)
    dw = np.asarray(qt8.fields["dwt"]).T
    np.testing.assert_array_equal(
        d8, (w8.astype(np.float32) * dw[..., None]).reshape(n, k))


def test_int8_layout_batched_shapes():
    n, k = 64, 256
    qt8 = qz.to_int8_layout(
        qz.QuantTensor.quantize(GGMLType.Q8_0,
                                RNG.standard_normal((n, k)).astype(np.float32)))
    x = jnp.asarray(RNG.standard_normal((2, 3, k)).astype(np.float32))
    y = qz.qmatmul(x, qt8)
    assert y.shape == (2, 3, n)


def test_pipelined_q4k_matches_outer_grid():
    """Manual-DMA pipelined decode kernel (qmm_q4_K_pipelined, two-level
    MXU dot, x in bf16) vs the outer-grid kernel: x's bf16 truncation
    bounds the difference (~2e-3 relative → nmse ~5e-6), far inside the
    reference's 0.02 dot-error budget (tests/test-quantize-fns.cpp:23).
    Covers both the scm-chunked (K%2048==0) and scm-resident variants."""
    import numpy as np
    import jax.numpy as jnp
    from ggml_gfx906_tpu.ops.pallas import qmm
    from ggml_gfx906_tpu.ops.quantized import QuantTensor
    from ggml_gfx906_tpu.quant.types import GGMLType

    rng = np.random.default_rng(5)
    for n, k in [(512, 2048), (384, 1024), (256, 2816), (1024, 4096)]:
        w = (rng.standard_normal((n, k)) * 0.05).astype(np.float32)
        f = QuantTensor.quantize(GGMLType.Q4_K, w).fields
        x = jnp.asarray(rng.standard_normal((1, k)).astype(np.float32))
        ref = np.asarray(qmm.qmm_q4_K(x, f["qs"], f["scm"], f["dd"]))
        out = np.asarray(qmm.qmm_q4_K_pipelined(x, f["qs"], f["scm"],
                                                f["dd"]))
        nmse = ((out - ref) ** 2).mean() / (ref ** 2).mean()
        assert nmse < 5e-5, (n, k, nmse)
