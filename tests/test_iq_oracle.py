"""Codebook i-quant bit-exactness vs the compiled reference.

The IQ formats' quantizers need the reference's grid/neighbour machinery
initialized (iq2xs_init_impl / iq3xs_init_impl) and — for IQ2_* and IQ1_* —
an importance matrix. This harness drives the reference's chunk API
(quantize_iq2_xxs etc.) through ctypes to produce wire bytes, then checks:
  1. dequantize parity: my vectorized dequant of those bytes is bit-equal
     to the reference dequantize_row_*.
  2. quantize parity (once a python quantizer exists for the type): my
     wire bytes equal the reference's, byte for byte.
"""
import ctypes
import shutil
import subprocess
from pathlib import Path

import numpy as np
import pytest

from ggml_gfx906_tpu.quant import GGMLType, dequantize, row_size
from ggml_gfx906_tpu.quant.registry import bytes_to_blocks, quantize

REF = Path("/root/reference")

_STUBS = r"""
#include <stdlib.h>
#include <stdio.h>
#include <stdint.h>
const char * ggml_type_name(int type) { (void)type; return "?"; }
size_t ggml_type_size(int type) { (void)type; return 0; }
int64_t ggml_blck_size(int type) { (void)type; return 1; }
size_t ggml_row_size(int type, int64_t ne) { (void)type; (void)ne; return 0; }
void ggml_abort(const char * file, int line, const char * fmt, ...) {
    fprintf(stderr, "abort %s:%d\n", file, line); exit(1);
}
"""

# (GGMLType, symbol suffix, ggml enum value, needs imatrix)
IQ_TYPES = [
    (GGMLType.IQ2_XXS, "iq2_xxs", 16, True),
    (GGMLType.IQ2_XS, "iq2_xs", 17, True),
    (GGMLType.IQ2_S, "iq2_s", 22, True),
    (GGMLType.IQ3_XXS, "iq3_xxs", 18, False),
    (GGMLType.IQ3_S, "iq3_s", 21, False),
    (GGMLType.IQ1_S, "iq1_s", 19, True),
    (GGMLType.IQ1_M, "iq1_m", 29, True),
]

N = 256 * 8


@pytest.fixture(scope="session")
def iqref(tmp_path_factory):
    from _oracle_build import cached_oracle_so
    so = cached_oracle_so("iqref", _STUBS)
    if so is None:
        pytest.skip("no C compiler or reference tree — oracle unavailable")
    lib = ctypes.CDLL(str(so))
    lib.iq2xs_init_impl.argtypes = [ctypes.c_int]
    lib.iq3xs_init_impl.argtypes = [ctypes.c_int]
    for _, _, enum_val, _ in IQ_TYPES:
        if enum_val in (16, 17, 22, 19, 29):
            lib.iq2xs_init_impl(enum_val)
    lib.iq3xs_init_impl(256)
    lib.iq3xs_init_impl(512)
    return lib


def _signals():
    i = np.arange(N, dtype=np.float32)
    rng = np.random.default_rng(11)
    return {
        "cos": (np.float32(0.1) + 2 * np.cos(i)).astype(np.float32),
        "gauss": rng.standard_normal(N).astype(np.float32),
        "mix": (rng.standard_normal(N) * (1 + np.cos(i / 7))).astype(np.float32),
    }


def _imatrix():
    i = np.arange(N, dtype=np.float32)
    return (1.0 + 0.5 * np.sin(i / 3) ** 2).astype(np.float32)


def _ref_wire(lib, name, enum_val, x, use_im):
    qfn = getattr(lib, f"quantize_{name}")
    qfn.restype = ctypes.c_size_t
    qfn.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                    ctypes.c_int64, ctypes.c_void_p]
    wire = np.zeros(row_size(GGMLType[name.upper()], N), np.uint8)
    im = _imatrix()
    qfn(x.ctypes.data, wire.ctypes.data, 1, N,
        im.ctypes.data if use_im else None)
    return wire


@pytest.mark.parametrize("qtype,name,enum_val,needs_im", IQ_TYPES,
                         ids=lambda p: str(p))
def test_iq_dequantize_bit_exact(iqref, qtype, name, enum_val, needs_im):
    dfn = getattr(iqref, f"dequantize_row_{name}")
    dfn.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
    for sig, x in _signals().items():
        wire = _ref_wire(iqref, name, enum_val, x, needs_im)
        ref = np.zeros(N, np.float32)
        dfn(wire.ctypes.data, ref.ctypes.data, ctypes.c_int64(N))
        mine = dequantize(qtype, bytes_to_blocks(qtype, wire, N, 1)).reshape(-1)
        bad = np.nonzero(ref.view(np.uint32) != mine.view(np.uint32))[0]
        assert bad.size == 0, (
            f"{name}/{sig}: {bad.size} mismatches, first@{bad[0]} "
            f"ref={ref[bad[0]]} mine={mine[bad[0]]}")


# quantize parity — the python quantizers must produce the reference's
# wire bytes exactly (same codebook search decisions, same f32 rounding)
_QUANTIZABLE = [t for t in IQ_TYPES]


@pytest.mark.parametrize("qtype,name,enum_val,needs_im", _QUANTIZABLE,
                         ids=lambda p: str(p))
def test_iq_quantize_bit_exact(iqref, qtype, name, enum_val, needs_im):
    im = _imatrix()
    for sig, x in _signals().items():
        wire = _ref_wire(iqref, name, enum_val, x, True)
        mine = np.ascontiguousarray(quantize(qtype, x, im)).view(np.uint8)
        assert bytes(mine) == bytes(wire), f"{name}/{sig}"


@pytest.mark.parametrize("qtype,name,enum_val", [
    (GGMLType.IQ3_XXS, "iq3_xxs", 18),
    (GGMLType.IQ3_S, "iq3_s", 21),
    (GGMLType.IQ2_S, "iq2_s", 22),
    (GGMLType.IQ1_M, "iq1_m", 29),
], ids=lambda p: str(p))
def test_iq_quantize_bit_exact_no_imatrix(iqref, qtype, name, enum_val):
    """Formats whose reference quantizer accepts a NULL imatrix."""
    for sig, x in _signals().items():
        wire = _ref_wire(iqref, name, enum_val, x, False)
        mine = np.ascontiguousarray(quantize(qtype, x)).view(np.uint8)
        assert bytes(mine) == bytes(wire), f"{name}/{sig}"
