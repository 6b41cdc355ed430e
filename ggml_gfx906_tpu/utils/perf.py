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

# v5e per-chip spec rooflines (labels only — roofline percentages use the
# *measured* bandwidth from measure_hbm_bw(); this chip sustains well above
# the 819 GB/s v5e spec, and quoting spec made %HBM numbers incomparable
# between harnesses)
HBM_GBS_SPEC = 819.0
BF16_TFLOPS = 197.0

_MEASURED_BW: list = []  # cached per process


def device_sync(x) -> None:
    """Wait until the computation producing pytree `x` has ACTUALLY run.

    On the axon runtime `block_until_ready()` returns at enqueue time, not
    completion (measured: a 16-pass 2 GB reduction 'blocks' in 0.07 ms and
    then takes 97 ms to deliver its value). Every timed region must end by
    fetching real bytes; this pulls one scalar from the first leaf, which
    forces the producing executable (and everything it depends on) to
    finish."""
    import jax
    import numpy as _np

    leaf = jax.tree.leaves(x)[0]
    _np.asarray(jax.device_get(leaf.ravel()[0] if leaf.ndim else leaf))


def measure_hbm_bw(nbytes: int = 1 << 31) -> float:
    """Effective HBM read bandwidth (bytes/s), measured in-run.

    Slope method over a chained-dependence probe: time `inner` full passes
    over a device-generated random buffer for two values of `inner` and
    divide the extra passes by the extra time — the fixed per-dispatch cost
    (tunnel latency, sync fetch) cancels. Each pass xors the previous
    pass's scalar into the streamed values before reducing, so XLA can
    neither hoist the read out of the loop nor algebraically split it
    (sum(buf + s) simplifies to sum(buf) + n·s and 'measured' 112 TB/s;
    xor does not). Rules learned on hardware: jnp.ones-style buffers
    constant-fold; host data pays a tunnel transfer; identical reads in one
    jit get loop-fused; byte-identical re-dispatches are memoized; and
    block_until_ready returns at ENQUEUE — only device_sync's value fetch
    marks completion. Fresh buffers per timed call + xor chain + slope +
    fetch-sync defeat all five."""
    import jax
    import jax.numpy as jnp

    if _MEASURED_BW:
        return _MEASURED_BW[0]
    n = nbytes // 4

    def make(seed):
        return jax.random.randint(jax.random.PRNGKey(seed), (n,),
                                  -(2 ** 30), 2 ** 30, jnp.int32)

    def mkprobe(inner):
        @jax.jit
        def probe(buf):
            def body(_, s):
                return jnp.sum(jnp.bitwise_xor(buf, s), dtype=jnp.int32)
            return jax.lax.fori_loop(0, inner, body, jnp.int32(0))
        return probe

    def timed(probe, bufs):
        # memoization is keyed on (program, inputs): the same buffer may be
        # reused by the lo and hi probes, but never twice by one probe
        best = float("inf")
        for buf in bufs:
            t0 = time.perf_counter()
            device_sync(probe(buf))
            best = min(best, time.perf_counter() - t0)
        return best

    lo, hi = 8, 40
    p_lo, p_hi = mkprobe(lo), mkprobe(hi)
    warm = make(990)
    device_sync(p_lo(warm))  # lazy compile happens at first fetch
    device_sync(p_hi(warm))
    del warm
    bufs = [make(0), make(1)]
    for b in bufs:
        device_sync(b)
    t_lo, t_hi = timed(p_lo, bufs), timed(p_hi, bufs)
    for b in bufs:
        del b
    bw = nbytes * (hi - lo) / max(t_hi - t_lo, 1e-9)
    _MEASURED_BW.append(bw)
    return bw


def hbm_gbs() -> float:
    """Measured effective HBM GB/s (cached); spec constant on non-TPU."""
    import jax

    if jax.default_backend() != "tpu":
        return HBM_GBS_SPEC
    return measure_hbm_bw() / 1e9


def _time_fn(fn, x_batch, *extra, iters=20, rounds=3):
    """Time `fn(x, *extra)` per iteration via the SLOPE method. Hard-won
    measurement rules:
    - per-dispatch host timing measures the axon tunnel (~2-4 ms), not the
      op — iterations are unrolled inside ONE compiled program
    - a single program's wall time carries a large fixed per-execution
      cost (tunnel launch + value fetch, tens of ms); dividing by iters
      bakes that into the answer. Two programs with different unroll
      counts are timed and the SLOPE Δt/Δiters cancels every
      per-execution term — the same trick as measure_hbm_bw.
    - weights must be ARGUMENTS: closure-captured device arrays become jit
      constants which this runtime re-uploads per execution
    - distinct inputs per iteration prevent CSE *within* the program, and
      every timed round consumes its own slice of x_batch — this runtime
      memoizes byte-identical re-dispatches, so no timed call may repeat
      input data. x_batch must carry (rounds + 1) * iters distinct slices
      (first slice is the compile/warmup call)."""
    import jax

    assert x_batch.shape[0] >= (rounds + 1) * iters, x_batch.shape
    lo = max(1, iters // 4)

    def make(n):
        def many(xs, *ex):
            return [fn(xs[i], *ex) for i in range(n)]
        return jax.jit(many)

    f_lo, f_hi = make(lo), make(iters)
    device_sync(f_lo(x_batch[:lo], *extra))
    device_sync(f_hi(x_batch[:iters], *extra))
    best_lo = best_hi = float("inf")
    for r in range(1, rounds + 1):
        xs = x_batch[r * iters:(r + 1) * iters]
        t0 = time.time()
        device_sync(f_lo(xs[:lo], *extra)[-1])
        best_lo = min(best_lo, time.time() - t0)
        t0 = time.time()
        device_sync(f_hi(xs, *extra)[-1])
        best_hi = min(best_hi, time.time() - t0)
    return max(best_hi - best_lo, 1e-9) / (iters - lo)


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
            "scm": rng.integers(0, 64, (n, sb * 16), dtype=np.uint8),
            "dd": rng.random((n, sb * 2), dtype=np.float32) * 0.01,
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
    iters = 8
    xs = jnp.asarray(rng.standard_normal((4 * iters, m, k)).astype(np.float32))
    qt = _random_qt(rng, qtype, n, k)
    dt = _time_fn(lambda a, q: qmatmul(a, q), xs, qt, iters=iters)
    flops = 2 * m * n * k
    bytes_ = qt.nbytes + 4 * (m * k + m * n)
    return {
        "op": f"qmm_{qtype_name}", "shape": f"{m}x{k}·{n}",
        "ms": dt * 1e3,
        "gflops": flops / dt / 1e9,
        "gbs": bytes_ / dt / 1e9,
        "pct_hbm": 100 * bytes_ / dt / 1e9 / hbm_gbs(),
    }


def bench_dequant(qtype_name: str, n: int, k: int):
    from ..ops.quantized import QuantTensor, dequant
    from ..quant.types import GGMLType

    import jax.numpy as jnp

    qtype = GGMLType[qtype_name]
    rng = np.random.default_rng(0)
    qt = _random_qt(rng, qtype, n, k)
    iters = 20
    eps = jnp.asarray(np.arange(4 * iters, dtype=np.float32) * 1e-12 + 1e-15)
    dname = "d" if "d" in qt.fields else "dd"

    def run(e, q):
        from ..ops.quantized import QuantTensor
        f2 = dict(q.fields)
        f2[dname] = f2[dname] + e  # per-step perturbation prevents hoisting
        return dequant(QuantTensor(q.qtype, q.shape, f2, q.layout))

    dt = _time_fn(run, eps, qt, iters=iters)
    bytes_ = qt.nbytes + 4 * n * k
    return {"op": f"dequant_{qtype_name}", "shape": f"{n}x{k}",
            "ms": dt * 1e3, "gbs": bytes_ / dt / 1e9,
            "pct_hbm": 100 * bytes_ / dt / 1e9 / hbm_gbs()}


def bench_attention(b: int, h: int, n: int, m: int, d: int):
    import jax.numpy as jnp
    from .. import ops

    rng = np.random.default_rng(0)
    iters = 5
    qs = jnp.asarray(rng.standard_normal((4 * iters, b, h, n, d)).astype(np.float32))
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
    iters = 5
    xs = jnp.asarray(rng.standard_normal((4 * iters, rows, cols)).astype(np.float32))
    dt = _time_fn(lambda a: ops.soft_max_ext(a[None]), xs, iters=iters)
    bytes_ = 2 * 4 * rows * cols
    return {"op": "softmax", "shape": f"{rows}x{cols}", "ms": dt * 1e3,
            "gbs": bytes_ / dt / 1e9, "pct_hbm": 100 * bytes_ / dt / 1e9 / hbm_gbs()}


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
