"""Per-node observation hook — the eval-callback analogue.

ref: ggml_backend_sched_eval_callback (include/ggml-backend.h:282-289):
the scheduler can call back with every computed node for tensor-level
debugging/eval interception. Under jit the equivalent interception point
is `jax.debug.callback`, embedded at named tap points when (and only
when) an observer is installed at trace time:

    def spy(name, value):          # value is a host numpy array
        print(name, value.shape, float(abs(value).mean()))

    with observe.observer(spy):
        logits, _ = llama.forward(cfg, params, toks, kv, 0)   # fresh trace

Taps are free when no observer is active (the branch folds away at
trace time). Because jit caches traces, enter the observer BEFORE the
first call of the function you want to observe (or call its un-jitted
form, as llama.forward is here).
"""
from __future__ import annotations

import contextlib
import threading
from typing import Callable

_state = threading.local()


def _current() -> Callable | None:
    return getattr(_state, "observer", None)


@contextlib.contextmanager
def observer(fn: Callable):
    """Install fn(name: str, value: np.ndarray) for taps traced inside."""
    prev = _current()
    _state.observer = fn
    try:
        yield
    finally:
        _state.observer = prev


def tap(name: str, value):
    """Observation point: forwards `value` to the active observer (host
    callback) and returns it unchanged. No-op (and trace-free) when no
    observer is installed."""
    cb = _current()
    if cb is None:
        return value
    import jax

    jax.debug.callback(lambda v, _name=name: cb(_name, v), value)
    return value
