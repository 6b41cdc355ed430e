"""Persistent XLA compilation cache (process-spanning compile reuse).

ref: the reference pre-compiles its kernels at build time (CMake, per-arch
objects) so a process never pays a JIT tax; under XLA every process would
recompile each (program, shape) from scratch — measured 20-40 s per program
on this CPU-starved host, multiplied across the engine's per-(batch,
window, depth) programs and the load path's per-shape conversion programs.
jax's persistent compilation cache removes that: measured on the axon
runtime, a 23 s first compile replays in 2.1 s from a fresh process.

Enabled once per process from the package __init__ (config "xla_cache_dir";
empty string disables). Safe to call any time before the first compile.
"""
from __future__ import annotations

import os

_DONE = [False]


def ensure() -> None:
    if _DONE[0]:
        return
    _DONE[0] = True
    from . import config

    path = str(config.get("xla_cache_dir") or "").strip()
    if not path:
        return
    path = os.path.expanduser(path)
    try:
        import jax

        # never clobber a cache the host application configured itself
        # (jax.config or JAX_COMPILATION_CACHE_DIR) — importing this
        # package must not silently redirect someone else's cache
        if (jax.config.jax_compilation_cache_dir
                or os.environ.get("JAX_COMPILATION_CACHE_DIR")):
            return
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # noqa: BLE001 — cache is an optimization only
        from . import log

        log.warn(f"persistent XLA cache unavailable ({e}); compiles will "
                 "not be reused across processes")
