"""Consolidated runtime configuration with env-var tiering.

ref: the reference scatters tunables across env vars and setters
(GGML_NTHREADS, ggml_backend_*_set_n_threads, the CUDA env knobs in
src/ggml-cuda/ggml-cuda.cu). Here every knob lives in one registry with a
fixed precedence: built-in default < GGML_TPU_<NAME> env var < programmatic
`set()` — and `describe()` lists them all with provenance, so a deployment
can audit exactly what it runs with.

    from ggml_gfx906_tpu.utils import config
    config.get("int8_min_m")          # 64
    config.set("int8_min_m", 128)     # highest precedence
    config.describe()                 # [(name, value, source, help), ...]
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Any, Callable


@dataclass
class _Entry:
    default: Any
    parse: Callable[[str], Any]
    help: str


_REGISTRY: dict[str, _Entry] = {}
_OVERRIDES: dict[str, Any] = {}


def _bool(s: str) -> bool:
    return s.strip().lower() in ("1", "true", "yes", "on")


def register(name: str, default, help: str, parse=None):
    """Declare a knob. parse defaults to the type of `default`."""
    if parse is None:
        parse = _bool if isinstance(default, bool) else type(default)
    _REGISTRY[name] = _Entry(default, parse, help)
    return name


def _env_key(name: str) -> str:
    return "GGML_TPU_" + name.upper()


def get(name: str):
    if name not in _REGISTRY:
        raise KeyError(f"unknown config {name!r}; have {sorted(_REGISTRY)}")
    if name in _OVERRIDES:
        return _OVERRIDES[name]
    raw = os.environ.get(_env_key(name))
    if raw is not None:
        return _REGISTRY[name].parse(raw)
    return _REGISTRY[name].default


def set(name: str, value) -> None:   # noqa: A001 - mirrors ggml setters
    if name not in _REGISTRY:
        raise KeyError(f"unknown config {name!r}; have {sorted(_REGISTRY)}")
    _OVERRIDES[name] = value


def unset(name: str) -> None:
    _OVERRIDES.pop(name, None)


def describe() -> list[tuple[str, Any, str, str]]:
    """[(name, effective value, source, help)] for every registered knob."""
    out = []
    for name, e in sorted(_REGISTRY.items()):
        if name in _OVERRIDES:
            src = "override"
        elif _env_key(name) in os.environ:
            src = f"env:{_env_key(name)}"
        else:
            src = "default"
        out.append((name, get(name), src, e.help))
    return out


# ---------------------------------------------------------------- knobs

register("int8_min_m", 64,
         "batch-size threshold at which quantized matmuls switch from the "
         "f32-expand decode kernels to the integer-MXU prefill kernels "
         "(0 disables the int8 path)")
register("engine_chunk_size", 128,
         "prompt tokens prefilled per engine step during admission "
         "(smaller = steadier decode cadence, larger = faster admission)")
register("engine_harvest_depth", 8,
         "decode steps chained on device per harvest in Engine.run; "
         "windows are pipelined (window k is fetched after window k+1 is "
         "dispatched, overlapping the fetch round-trip with device "
         "execution). Token streams are bit-identical to depth 1 — "
         "completed slots' in-flight extra steps are masked and discarded")
register("engine_scan_window", True,
         "run each harvest window as ONE lax.scan device program when no "
         "admission can occur mid-window (the CUDA-graph-capture analogue, "
         "ref src/ggml-cuda/ggml-cuda.cu:2962): per-window instead of "
         "per-step host dispatch cost. Token streams stay bit-identical — "
         "sampling keys chain on (seed, counter) and the wider attention "
         "window only adds exactly-masked reads. False = per-step "
         "dispatches within pipelined windows")
register("engine_min_window", 32,
         "smallest attention-window bucket the engine dispatches. Every "
         "distinct bucket compiles its own decode step AND scan program "
         "(tens of seconds each at 7B on this host, multiplied again by "
         "the paged gather shapes); raising the floor to the workload's "
         "typical depth (e.g. 256) trades exactly-masked extra KV reads "
         "early in a sequence for 4x fewer compiles at startup")
register("int8_tile", 512,
         "K-tile width of the int8 execution layout (per-tile requant "
         "scale granularity). Measured on hardware (8-layer 7B-shape "
         "decode): 512 streams 623 GB/s vs 454 at 128 (+40% tok/s; fewer "
         "segments fuse better), 1024 ties, 2048 regresses; logits NMSE "
         "is tile-independent (Q4_K's own error dominates the requant)")
register("weights_layout", "kernel",
         "quantized weight execution layout: 'kernel' (packed wire-density "
         "fields + fused Pallas matmuls), 'int8' (tile-major int8 + XLA "
         "segmented integer dots — the fast decode path on runtimes where "
         "Pallas DMA underperforms XLA fusions), or 'auto' (measure both "
         "once per process and pick — utils/autotune.py)")
register("qmm_pipeline", "off",
         "decode matvecs through the manual-DMA pipelined Pallas kernels "
         "(wire-density streaming, ops/pallas/qmm.py::qmm_q4_K_pipelined)."
         " r03 measured per-call 386-413 GB/s of 4.75 bpw wire on aligned"
         " shapes — per-byte competitive — but 0.46x the int8-XLA path on"
         " the full decode step (per-call fixed costs + the K%2048!=0 "
         "variant; docs/PERFORMANCE.md). 'on' enables it on TPU (bare-"
         "metal runtimes without the tunnel's dispatch costs should "
         "re-measure); 'auto' currently equals 'on' for m==1 TPU matvecs")
register("attn_impl", "pallas",
         "causal attention implementation: 'pallas' (fused flash kernel) "
         "or 'xla' (reference path — faster on runtimes where Pallas DMA "
         "underperforms XLA fusions; utils/autotune.choose_attn measures)")
register("kv_quant", False,
         "store serving KV caches as int8 with per-(head,pos) scales")
register("kv_attn_int8_dot", True,
         "quantized-KV attention computes the score dot int8xint8 on the "
         "MXU (q rows activation-quantized per (slot, head); ggml's Q8_1 "
         "analogue, ref vecdotq.cuh) instead of converting the int8 cache "
         "to bf16 inside the dot. Measured 1.4x the postscale score dot "
         "at window 1024 (scripts/exp_kv_long.py); bf16-compute paths "
         "only (f32 keeps exact dots)")
register("engine_window_delta", True,
         "scan-window decode writes each step's K/V rows into a small "
         "per-window delta buffer at a uniform column (1.1 us) instead "
         "of a per-slot scatter into the big cache (41.7 us x 2 x "
         "n_layer per step, measured), and absorbs the whole window "
         "with ONE wide scatter per array; attention merges the two "
         "segments at score level. Numerically equivalent (not bitwise: "
         "softmax/PV reduction order differs); disable for the strict "
         "bit-parity per-step formulation")
register("kv_page_size", 64,
         "positions per page of the paged serving KV pool "
         "(Engine(paged_pages=N); runtime/paged_kv.py)")
register("log_level", "info", "log threshold: debug/info/warn/error")
register("xla_cache_dir", "~/.cache/ggml_gfx906_tpu/xla",
         "persistent XLA compilation cache directory ('' disables). "
         "Measured on the axon runtime: a 23 s first compile replays in "
         "2 s from a second process — this removes the per-process compile "
         "tax from serving startup, the bench sweep, and the load path's "
         "on-device conversion programs")
register("load_chunk_mb", 256,
         "flat host→device upload granularity of the int8 load path "
         "(models/llama.load layout='int8'): raw wire bytes of consecutive "
         "tensors are concatenated into chunks of this size and uploaded "
         "as single 1-D transfers — per-transfer fixed cost (~0.4 s on "
         "the tunnel) amortizes, and small/strided field uploads (measured "
         "0.1 MB/s pathological) are avoided entirely")
