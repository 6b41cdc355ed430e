"""The standing int4-dot re-test (VERDICT r04 missing #5): the probe must
run as code every process and the execution-layout decision must fall back
to the int8 path while the runtime lacks the int4 MXU dot."""
import numpy as np

from ggml_gfx906_tpu.utils import autotune


def test_probe_int4_dot_runs_and_reports():
    ok, msg = autotune.probe_int4_dot(verbose=False)
    assert isinstance(ok, bool)
    assert "int4" in msg
    # cached per process — a second call is the same decision object
    assert autotune.probe_int4_dot(verbose=False) == (ok, msg)
    if ok:
        # if this ever starts passing on a runtime, the probe's contract
        # is that the result is CORRECT (not just compiling)
        assert "COMPILES+RUNS" in msg


def test_fallback_decision_when_int4_unsupported(monkeypatch):
    """Today's decision: with the int4 dot unavailable and Pallas DMA
    pathological, choose() short-circuits to the int8 execution layout —
    the decision the bench production path runs with."""
    from ggml_gfx906_tpu.utils import perf

    monkeypatch.setattr(autotune, "probe_int4_dot",
                        lambda verbose=True: (False, "int4 unavailable"))
    monkeypatch.setattr(autotune, "pallas_dma_gbs", lambda: 19.0)
    monkeypatch.setattr(perf, "measure_hbm_bw", lambda: 747e9)
    import jax

    if jax.default_backend() == "tpu":  # pragma: no cover - CPU in CI
        assert autotune.choose.__wrapped__(verbose=False) == "int8"
    else:
        # CPU backend keeps the bit-exact kernel layout by design
        assert autotune.choose.__wrapped__(verbose=False) == "kernel"
