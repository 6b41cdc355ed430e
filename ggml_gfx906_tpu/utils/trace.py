"""Tracing/profiling — the unified tracer the reference lacks (SURVEY.md §5
lists only scattered pieces: ggml_graph_print timings, GGML_SCHED_DEBUG,
per-node eval callbacks). On TPU this wraps the jax profiler (xprof traces
viewable in TensorBoard/xprof) plus named scopes and a lightweight host-side
section timer.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax

named_scope = jax.named_scope  # annotate ops for xprof (re-export)


@contextlib.contextmanager
def profile(logdir: str = "/tmp/ggml_tpu_trace"):
    """Capture a device trace: `with trace.profile(): step()` →
    tensorboard --logdir /tmp/ggml_tpu_trace."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class SectionTimer:
    """Host-side cumulative section timing (ggml_graph_print analogue:
    per-section totals printed on demand)."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def section(self, name: str, sync: bool = False):
        t0 = time.perf_counter()
        yield
        if sync:
            # ensure device work launched in the section is complete
            (jax.device_put(0.0) + 0).block_until_ready()
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def report(self) -> str:
        lines = ["section                     total_ms     calls   avg_ms"]
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            t, c = self.totals[name] * 1e3, self.counts[name]
            lines.append(f"{name:26s} {t:10.2f} {c:9d} {t / c:8.3f}")
        return "\n".join(lines)


def dump_graph(fn, *args, path: str | None = None, stage: str = "hlo"):
    """Dump the compiled graph of `fn(*args)` — the ggml_graph_dump_dot /
    ggml_graph_print analogue (ref src/ggml.c:6728,6802). stage: "jaxpr"
    (traced ops), "hlo" (StableHLO), or "optimized" (post-XLA passes).
    Returns the text; writes it to `path` when given."""
    import jax

    if stage == "jaxpr":
        text = str(jax.make_jaxpr(fn)(*args))
    else:
        lowered = jax.jit(fn).lower(*args)
        text = (lowered.compile().as_text() if stage == "optimized"
                else lowered.as_text())
    if path:
        with open(path, "w") as f:
            f.write(text)
    return text
