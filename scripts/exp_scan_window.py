"""Measure the scan-window engine program (one lax.scan dispatch per
harvest window) against the per-step dispatch path at b=8.

r03 profiling (exp_engine_profile.py) showed the batched device program
costs only ~8% over single-stream, yet the engine ran ~19 ms/step at b=8 —
host-side per-dispatch cost (params-pytree marshaling, ~2-4 ms) plus the
per-window fetch never fully hides behind an 8-step window. The scan
window pays the dispatch cost once per window (the CUDA-graph-capture
analogue, ref src/ggml-cuda/ggml-cuda.cu:2962).

Run on the real TPU. 8-layer 7B-shape (weights stream scales linearly in
layers, so ratios transfer; host costs are layer-independent, so the
8-layer model UNDERSTATES nothing and amplifies the host-bound signal).
"""
from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax
import numpy as np

from ggml_gfx906_tpu.utils import config

N_LAYER = 8
B = 8
N_NEW = 128


def main():
    from ggml_gfx906_tpu.models import llama
    from ggml_gfx906_tpu.ops.quantized import QuantTensor, to_int8_layout
    from ggml_gfx906_tpu.runtime.engine import Engine

    sys.path.insert(0, os.path.join(_REPO, "scripts"))
    from exp_pipe_model import build_params

    config.set("attn_impl", "xla")
    config.set("qmm_pipeline", "off")
    print(f"backend: {jax.default_backend()}", flush=True)

    cfg = llama.LlamaConfig(
        n_vocab=32000, n_ctx=2048, n_embd=4096, n_head=32, n_kv_head=32,
        n_layer=N_LAYER, n_ff=11008, compute_dtype=jax.numpy.bfloat16)
    t0 = time.time()
    pk = build_params(cfg)
    p8 = jax.tree.map(
        lambda t: to_int8_layout(t) if isinstance(t, QuantTensor) else t,
        pk, is_leaf=lambda t: isinstance(t, QuantTensor))
    del pk
    print(f"params built in {time.time()-t0:.0f}s", flush=True)

    rng = np.random.default_rng(1)

    def engine_run(scan, depth):
        config.set("engine_scan_window", scan)
        config.set("engine_harvest_depth", depth)
        eng = Engine(llama, cfg, p8, max_batch=B, max_seq=512)
        # warm-up: compile every program/bucket the timed run crosses
        eng.submit(rng.integers(1, 1000, 24).tolist(), N_NEW)
        t0 = time.time()
        eng.run()
        print(f"  warm ({time.time()-t0:.0f}s)", flush=True)
        for _ in range(B):
            eng.submit(rng.integers(1, 1000, 24).tolist(), N_NEW)
        t0 = time.time()
        done = eng.run()
        dt = time.time() - t0
        toks = sum(len(r.out) for r in done)
        print(f"scan={scan} depth={depth}: {toks/dt:7.1f} tok/s "
              f"({dt/ (toks/B) *1e3:6.2f} ms/step)", flush=True)
        del eng
        return toks / dt

    engine_run(False, 8)
    engine_run(True, 8)
    engine_run(True, 16)
    engine_run(True, 32)


if __name__ == "__main__":
    main()
