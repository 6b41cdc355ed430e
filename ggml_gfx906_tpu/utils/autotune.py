"""Profiling-driven execution-layout selection.

The reference's scheduler assigns graph splits to backends using measured
costs (src/ggml-backend.cpp sched splits); the analogous decision here is
which quantized-matmul execution layout to run — the packed Pallas
"kernel" layout or the XLA-native tile-major "int8" layout — which
depends on the runtime (on tunnel-virtualized TPUs Pallas DMA caps at
~19 GB/s; on bare-metal it streams at wire density). `choose()` measures
a representative decode-shaped matmul through both paths with the
slope method and returns the faster layout; config weights_layout="auto"
makes the model loaders consult it once per process.

    from ggml_gfx906_tpu.utils import autotune
    layout = autotune.choose()           # 'kernel' | 'int8' (cached)
"""
from __future__ import annotations

import functools
import sys

import numpy as np


@functools.cache
def choose(n: int = 2048, k: int = 2048, verbose: bool = True) -> str:
    import jax
    import jax.numpy as jnp

    from ..ops.quantized import QuantTensor, qmatmul, to_int8_layout
    from ..quant.types import GGMLType
    from .perf import _time_fn

    if jax.default_backend() != "tpu":
        return "kernel"        # tests/CPU: keep the bit-exact path

    rng = np.random.default_rng(0)
    sb = k // 256
    fields = {
        "qs": jnp.asarray(rng.integers(0, 256, (n, sb * 128), dtype=np.uint8)),
        "scm": jnp.asarray(rng.integers(0, 64, (n, sb * 16), dtype=np.uint8)),
        "dd": jnp.asarray(rng.random((n, sb * 2), dtype=np.float32) * 0.002),
    }
    qt = QuantTensor(GGMLType.Q4_K, (n, k), fields, "kernel")
    qt8 = to_int8_layout(qt)
    iters = 12
    xs = jnp.asarray(rng.standard_normal((3 * iters, 1, k)).astype(np.float32))

    def run(w):
        return _time_fn(lambda x, *f: qmatmul(x, w), xs, iters=iters,
                        rounds=2)

    t_kernel = run(qt)
    t_int8 = run(qt8)
    layout = "int8" if t_int8 < t_kernel else "kernel"
    if verbose:
        print(f"autotune: decode qmm kernel={t_kernel*1e3:.3f}ms "
              f"int8={t_int8*1e3:.3f}ms → weights_layout={layout}",
              file=sys.stderr)
    return layout


@functools.cache
def choose_attn(verbose: bool = True) -> str:
    """Measure the flash kernel vs the XLA reference at a decode shape
    (1 query against a long cache — HBM-bound, so the answer tracks the
    runtime's Pallas DMA throughput) and return 'pallas' | 'xla'."""
    import jax
    import jax.numpy as jnp

    from ..ops.attention import causal_flash_attn
    from .perf import _time_fn

    if jax.default_backend() != "tpu":
        return "pallas"

    rng = np.random.default_rng(0)
    B, H, M, D = 1, 32, 1024, 128
    iters = 12
    qs = jnp.asarray(rng.standard_normal((3 * iters, B, H, 1, D))
                     .astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, H, M, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, H, M, D)).astype(np.float32))
    pos = jnp.full((B,), M - 1, jnp.int32)

    t_pal = _time_fn(lambda q, kk, vv: causal_flash_attn(q, kk, vv, pos),
                     qs, k, v, iters=iters, rounds=2)
    t_xla = _time_fn(
        lambda q, kk, vv: causal_flash_attn(q, kk, vv, pos, force_ref=True),
        qs, k, v, iters=iters, rounds=2)
    impl = "xla" if t_xla < t_pal else "pallas"
    if verbose:
        print(f"autotune: decode attn pallas={t_pal*1e3:.3f}ms "
              f"xla={t_xla*1e3:.3f}ms → attn_impl={impl}", file=sys.stderr)
    return impl
