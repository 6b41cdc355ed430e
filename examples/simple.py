"""Minimal quantized mul_mat in two styles — the `examples/simple` analogue
(ref: examples/simple/simple-ctx.cpp:1-127, simple-backend.cpp:1-219).

The reference shows the same 4x3 @ 2x3^T matmul twice: once with a
malloc'd single context (simple-ctx) and once through an explicit backend
with a graph allocator (simple-backend). The TPU-native framework's two
styles are:

  1. "ctx" style  — eager jax ops on a QuantTensor (trace == the
     metadata-only graph build; XLA owns buffers),
  2. "backend" style — the same matmul compiled once under jax.jit with
     the quantized weight in its packed execution layout, the analogue of
     backend buffer placement + ggml_gallocr planning + graph_compute.

Run:  python examples/simple.py          (CPU or TPU; forces nothing)
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from ggml_gfx906_tpu.ops.quantized import QuantTensor, qmatmul
from ggml_gfx906_tpu.quant import GGMLType

# same operands as the reference example (simple-ctx.cpp:18-35):
# A is 4x2 there; any toy data works — keep block-size-friendly K.
K = 32
rng = np.random.default_rng(0)
A = (rng.standard_normal((4, K)) * 0.5).astype(np.float32)   # weights
B = (rng.standard_normal((3, K)) * 0.5).astype(np.float32)   # activations


def style_ctx():
    """Eager: quantize A to Q8_0, multiply, read back (simple-ctx)."""
    qa = QuantTensor.quantize(GGMLType.Q8_0, A)
    out = qmatmul(jnp.asarray(B), qa)                  # (3, K) @ (4, K)^T
    return np.asarray(out)


def style_backend():
    """Compiled: one jitted program, weight passed as an argument so the
    runtime streams it from its device buffer (simple-backend)."""
    qa = QuantTensor.quantize(GGMLType.Q8_0, A)

    @jax.jit
    def prog(b, w):
        return qmatmul(b, w)

    return np.asarray(prog(jnp.asarray(B), qa))


def main():
    ref = B @ A.T
    for name, fn in (("ctx", style_ctx), ("backend", style_backend)):
        got = fn()
        err = float(np.abs(got - ref).max())
        print(f"style {name:8s}: out {got.shape}, max |err| vs f32 = {err:.4f}")
        assert err < 0.1, err
    print("mul_mat of quantized A against f32 B matches the dense result "
          "within Q8_0 rounding — see models/ for full networks.")


if __name__ == "__main__":
    main()
