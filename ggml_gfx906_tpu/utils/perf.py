"""Per-op microbenchmark harness — the test-backend-ops MODE_PERF analogue.

ref: tests/test-backend-ops.cpp eval_perf :1247 (per-op FLOPS/bandwidth
microbenchmarks). Reports achieved GB/s and GFLOP/s plus % of the chip
rooflines so kernel regressions are visible as a number.

    python -m ggml_gfx906_tpu.utils.perf            # all ops
    python -m ggml_gfx906_tpu.utils.perf --op qmm_q4_K
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np

# v5e per-chip rooflines
HBM_GBS = 819.0
BF16_TFLOPS = 197.0


def _time_fn(fn, x_batch, *extra, iters=20):
    """Time `fn(x, *extra)` per iteration: iterations unrolled inside ONE
    compiled program over distinct inputs. Hard-won measurement rules:
    - per-dispatch host timing measures the axon tunnel (~2-4 ms), not the op
    - weights must be ARGUMENTS: closure-captured device arrays become jit
      constants which this runtime re-uploads per execution
    - distinct inputs per iteration prevent CSE"""
    import jax

    n = x_batch.shape[0]

    def many(xs, *ex):
        return [fn(xs[i], *ex) for i in range(n)]

    f = jax.jit(many)
    out = f(x_batch, *extra)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(3):
        out = f(x_batch, *extra)
    jax.block_until_ready(out)
    return (time.time() - t0) / (3 * iters)


def _random_qt(rng, qtype, n, k):
    """Random packed weights (timing is data-independent; the reference
    quantizer's scale search is far too slow for perf sweeps)."""
    import jax
    from ..ops.quantized import QuantTensor
    from ..quant.types import GGMLType

    if qtype == GGMLType.Q4_K:
        sb = k // 256
        fields = {
            "qs": rng.integers(0, 256, (n, sb * 128), dtype=np.uint8),
            "dsclo": rng.random((n, sb * 4), dtype=np.float32) * 0.01,
            "dschi": rng.random((n, sb * 4), dtype=np.float32) * 0.01,
            "dmlo": rng.random((n, sb * 4), dtype=np.float32) * 0.01,
            "dmhi": rng.random((n, sb * 4), dtype=np.float32) * 0.01,
        }
    elif qtype == GGMLType.Q8_0:
        fields = {"qs": rng.integers(-127, 128, (n, k)).astype(np.int8),
                  "d": rng.random((n, k // 32), dtype=np.float32) * 0.01}
    elif qtype == GGMLType.Q4_0:
        fields = {"qs": rng.integers(0, 256, (n, k // 2), dtype=np.uint8),
                  "d": rng.random((n, k // 32), dtype=np.float32) * 0.01}
    else:
        from ..ops.quantized import QuantTensor as QT
        w = rng.standard_normal((n, k)).astype(np.float32)
        return QT.quantize(qtype, w)
    fields = {kk: jax.device_put(v) for kk, v in fields.items()}
    return QuantTensor(qtype, (n, k), fields, "kernel")


def bench_qmm(qtype_name: str, m: int, n: int, k: int):
    import jax.numpy as jnp
    from ..ops.quantized import QuantTensor, qmatmul
    from ..quant.types import GGMLType

    qtype = GGMLType[qtype_name]
    rng = np.random.default_rng(0)
    iters = 20
    xs = jnp.asarray(rng.standard_normal((iters, m, k)).astype(np.float32))
    qt = _random_qt(rng, qtype, n, k)
    dt = _time_fn(lambda a, q: qmatmul(a, q), xs, qt, iters=iters)
    flops = 2 * m * n * k
    bytes_ = qt.nbytes + 4 * (m * k + m * n)
    return {
        "op": f"qmm_{qtype_name}", "shape": f"{m}x{k}·{n}",
        "ms": dt * 1e3,
        "gflops": flops / dt / 1e9,
        "gbs": bytes_ / dt / 1e9,
        "pct_hbm": 100 * bytes_ / dt / 1e9 / HBM_GBS,
    }


def bench_dequant(qtype_name: str, n: int, k: int):
    from ..ops.quantized import QuantTensor, dequant
    from ..quant.types import GGMLType

    import jax.numpy as jnp

    qtype = GGMLType[qtype_name]
    rng = np.random.default_rng(0)
    qt = _random_qt(rng, qtype, n, k)
    iters = 20
    eps = jnp.asarray(np.arange(iters, dtype=np.float32) * 1e-12)
    dname = "d" if "d" in qt.fields else "dsclo"

    def run(e, q):
        from ..ops.quantized import QuantTensor
        f2 = dict(q.fields)
        f2[dname] = f2[dname] + e  # per-step perturbation prevents hoisting
        return dequant(QuantTensor(q.qtype, q.shape, f2, q.layout))

    dt = _time_fn(run, eps, qt, iters=iters)
    bytes_ = qt.nbytes + 4 * n * k
    return {"op": f"dequant_{qtype_name}", "shape": f"{n}x{k}",
            "ms": dt * 1e3, "gbs": bytes_ / dt / 1e9,
            "pct_hbm": 100 * bytes_ / dt / 1e9 / HBM_GBS}


def bench_attention(b: int, h: int, n: int, m: int, d: int):
    import jax.numpy as jnp
    from .. import ops

    rng = np.random.default_rng(0)
    iters = 10
    qs = jnp.asarray(rng.standard_normal((iters, b, h, n, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, m, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, m, d)).astype(np.float32))
    dt = _time_fn(lambda a, kk, vv: ops.flash_attn_ext(a, kk, vv), qs, k, v,
                  iters=iters)
    flops = 4 * b * h * n * m * d
    return {"op": "flash_attn", "shape": f"b{b}h{h} {n}x{m}x{d}",
            "ms": dt * 1e3, "gflops": flops / dt / 1e9,
            "pct_mxu": 100 * flops / dt / 1e12 / BF16_TFLOPS}


def bench_softmax(rows: int, cols: int):
    import jax
    import jax.numpy as jnp
    from .. import ops

    rng = np.random.default_rng(0)
    iters = 20
    xs = jnp.asarray(rng.standard_normal((iters, rows, cols)).astype(np.float32))
    dt = _time_fn(lambda a: ops.soft_max_ext(a[None]), xs, iters=iters)
    bytes_ = 2 * 4 * rows * cols
    return {"op": "softmax", "shape": f"{rows}x{cols}", "ms": dt * 1e3,
            "gbs": bytes_ / dt / 1e9, "pct_hbm": 100 * bytes_ / dt / 1e9 / HBM_GBS}


ALL = {
    "qmm_q4_K": lambda: bench_qmm("Q4_K", 1, 4096, 4096),
    "qmm_q4_K_gemm": lambda: bench_qmm("Q4_K", 512, 4096, 4096),
    "qmm_q8_0": lambda: bench_qmm("Q8_0", 1, 4096, 4096),
    "qmm_q4_0": lambda: bench_qmm("Q4_0", 1, 4096, 4096),
    "dequant_q4_K": lambda: bench_dequant("Q4_K", 4096, 4096),
    "dequant_q8_0": lambda: bench_dequant("Q8_0", 4096, 4096),
    "flash_attn": lambda: bench_attention(1, 32, 1024, 1024, 128),
    "softmax": lambda: bench_softmax(4096, 4096),
}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--op", action="append", help="subset of ops to run")
    args = ap.parse_args(argv)
    names = args.op or list(ALL)
    import jax

    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    for name in names:
        if name not in ALL:
            print(f"unknown op {name}; have {list(ALL)}", file=sys.stderr)
            return 1
        r = ALL[name]()
        parts = [f"{r['op']:18s}", f"{r['shape']:>18s}", f"{r['ms']:8.3f} ms"]
        for key in ("gflops", "gbs", "pct_hbm", "pct_mxu"):
            if key in r:
                parts.append(f"{key}={r[key]:.1f}")
        print("  ".join(parts))
    return 0


if __name__ == "__main__":
    sys.exit(main())
