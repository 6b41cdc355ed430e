"""Imatrix-aware block-format quantization: bit-exactness vs the compiled C
reference chunk API.

The reference's `quantize_<type>(src, dst, nrow, n_per_row, quant_weights)`
(include/ggml.h:2406-2416, impls src/ggml-quants.c:972-2089) switches every
block format to a weighted scale search when an importance row is given.
This harness drives those entry points through ctypes and asserts our
imatrix variants produce byte-identical wire data.
"""
import ctypes
import shutil
import subprocess
from pathlib import Path

import numpy as np
import pytest

from ggml_gfx906_tpu.quant import GGMLType, quantize, row_size

REF = Path("/root/reference")

_STUBS = r"""
#include <stdlib.h>
#include <stdio.h>
#include <stdint.h>
const char * ggml_type_name(int type) { (void)type; return "?"; }
size_t ggml_type_size(int type) { (void)type; return 0; }
int64_t ggml_blck_size(int type) { (void)type; return 1; }
/* the chunk quantizers advance their dst pointer by ggml_row_size per row
   (e.g. quantize_q4_0 src/ggml-quants.c:1925-1931), so unlike the *_ref
   row APIs this stub must return REAL wire sizes */
size_t ggml_row_size(int type, int64_t ne) {
    switch (type) {
        case  2: return (size_t)(ne/32)*18;   /* Q4_0 */
        case  3: return (size_t)(ne/32)*20;   /* Q4_1 */
        case  6: return (size_t)(ne/32)*22;   /* Q5_0 */
        case  7: return (size_t)(ne/32)*24;   /* Q5_1 */
        case  8: return (size_t)(ne/32)*34;   /* Q8_0 */
        case 10: return (size_t)(ne/256)*84;  /* Q2_K */
        case 11: return (size_t)(ne/256)*110; /* Q3_K */
        case 12: return (size_t)(ne/256)*144; /* Q4_K */
        case 13: return (size_t)(ne/256)*176; /* Q5_K */
        case 14: return (size_t)(ne/256)*210; /* Q6_K */
        default: fprintf(stderr, "row_size stub: type %d\n", type); exit(2);
    }
}
void ggml_abort(const char * file, int line, const char * fmt, ...) {
    fprintf(stderr, "abort %s:%d\n", file, line); exit(1);
}
"""

# types with a weighted chunk path (ref quantize_q*_impl)
IMATRIX_TYPES = [
    (GGMLType.Q4_0, "q4_0"), (GGMLType.Q4_1, "q4_1"),
    (GGMLType.Q5_0, "q5_0"), (GGMLType.Q5_1, "q5_1"),
    (GGMLType.Q2_K, "q2_K"), (GGMLType.Q3_K, "q3_K"),
    (GGMLType.Q4_K, "q4_K"), (GGMLType.Q5_K, "q5_K"),
    (GGMLType.Q6_K, "q6_K"),
]

N_PER_ROW = 256 * 4
N_ROWS = 3


@pytest.fixture(scope="session")
def imref(tmp_path_factory):
    from _oracle_build import cached_oracle_so
    so = cached_oracle_so("imref", _STUBS)
    if so is None:
        pytest.skip("no C compiler or reference tree — oracle unavailable")
    return ctypes.CDLL(str(so))


def _signals():
    n = N_ROWS * N_PER_ROW
    i = np.arange(n, dtype=np.float32)
    rng = np.random.default_rng(17)
    return {
        "cos": (np.float32(0.1) + 2 * np.cos(i)).astype(np.float32),
        "gauss": rng.standard_normal(n).astype(np.float32),
        "mixed": (rng.standard_normal(n) * (1 + (i % 7))).astype(np.float32),
        "zeros": np.zeros(n, dtype=np.float32),
    }


def _imatrices():
    rng = np.random.default_rng(23)
    i = np.arange(N_PER_ROW, dtype=np.float32)
    return {
        "uniform": rng.uniform(0.05, 2.0, N_PER_ROW).astype(np.float32),
        "spiky": np.where(i % 13 == 0, np.float32(40.0),
                          np.float32(0.2)).astype(np.float32),
        # sums of squared activations are >= 0; include near-zero columns
        "sparse": (rng.uniform(0, 1, N_PER_ROW) ** 8).astype(np.float32),
    }


@pytest.mark.parametrize("qtype,name", IMATRIX_TYPES, ids=lambda p: str(p))
def test_imatrix_quantize_bit_exact(imref, qtype, name):
    fn = getattr(imref, f"quantize_{name}")
    fn.restype = ctypes.c_size_t
    fn.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                   ctypes.c_int64, ctypes.c_void_p]
    rs = row_size(qtype, N_PER_ROW)
    for sig, x in _signals().items():
        for wname, qw in _imatrices().items():
            ref = np.zeros(N_ROWS * rs, dtype=np.uint8)
            fn(x.ctypes.data, ref.ctypes.data, ctypes.c_int64(N_ROWS),
               ctypes.c_int64(N_PER_ROW), qw.ctypes.data)
            mine = np.ascontiguousarray(
                quantize(qtype, x.reshape(N_ROWS, N_PER_ROW),
                         quant_weights=qw)).tobytes()
            refb = ref.tobytes()
            assert len(mine) == len(refb), f"{name}/{sig}/{wname}: wire size"
            if mine != refb:
                a = np.frombuffer(mine, np.uint8)
                b = np.frombuffer(refb, np.uint8)
                idx = np.nonzero(a != b)[0]
                pytest.fail(
                    f"{name}/{sig}/{wname}: {idx.size} bytes differ, "
                    f"first@{idx[0]} mine={a[idx[0]]} ref={b[idx[0]]}")


def test_imatrix_ignored_types_fall_back():
    """Types whose reference chunk API ignores the imatrix must accept (and
    ignore) quant_weights, matching quantize_q8_0/mxfp4/tq* upstream
    (src/ggml-quants.c:2091-2106)."""
    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 256)).astype(np.float32)
    qw = rng.uniform(0.1, 1.0, 256).astype(np.float32)
    for t in (GGMLType.Q8_0, GGMLType.MXFP4, GGMLType.TQ1_0, GGMLType.TQ2_0):
        a = np.ascontiguousarray(quantize(t, x, quant_weights=qw)).tobytes()
        b = np.ascontiguousarray(quantize(t, x)).tobytes()
        assert a == b, t
