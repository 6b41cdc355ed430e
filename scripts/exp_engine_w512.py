"""Engine-level long-window kv_quant decision run (r05, VERDICT r04 #2).

b=16, max_seq=512, prompts 440 + 64 new tokens (window genuinely full),
min_window pinned to 512: dense bf16 KV vs int8 KV with the postscale
score dot vs int8 KV with the int8ximport8 MXU score dot
(config kv_attn_int8_dot). Prints aggregate + steady tok/s per config.

Run: python scripts/exp_engine_w512.py   (real TPU, ~15 min cold compiles)
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

import bench as bench_mod
from ggml_gfx906_tpu.models import llama
from ggml_gfx906_tpu.runtime.engine import Engine
from ggml_gfx906_tpu.utils import config


def main():
    import jax.numpy as jnp

    cfg = llama.LlamaConfig(
        n_vocab=32000, n_ctx=2048, n_embd=4096, n_head=32, n_kv_head=32,
        n_layer=32, n_ff=11008, compute_dtype=jnp.bfloat16)
    print("building random int8-layout 7B params on device...",
          file=sys.stderr, flush=True)
    params = bench_mod.build_llama7b_params(cfg)
    rng = np.random.default_rng(1)
    config.set("engine_min_window", 512)

    def run_cfg(label, kvq, i8dot):
        config.set("kv_quant", kvq)
        config.set("kv_attn_int8_dot", i8dot)
        try:
            eng = Engine(llama, cfg, params, max_batch=16, max_seq=512)
            # warmups: scan-off (per-step programs), then flood program
            s0 = bool(config.get("engine_scan_window"))
            config.set("engine_scan_window", False)
            try:
                eng.submit(rng.integers(1, 1000, 440).tolist(), 64)
                eng.run()
            finally:
                config.set("engine_scan_window", s0)
            eng.submit(rng.integers(1, 1000, 440).tolist(), 64)
            eng.submit(rng.integers(1, 1000, 440).tolist(), 64)
            eng.run()
            best = None
            for _ in range(2):
                for _ in range(16):
                    eng.submit(rng.integers(1, 1000, 440).tolist(), 64)
                t0 = time.time()
                done = eng.run()
                dt = time.time() - t0
                toks = sum(len(r.out) for r in done)
                rates = [n / s for s, n in eng.window_log if n > 0]
                r = (round(toks / dt, 1),
                     round(float(np.median(rates)), 1))
                print(f"  {label}: {r[0]} tok/s aggregate, {r[1]} steady",
                      flush=True)
                best = max(best or r, r)
            del eng
            return best
        finally:
            config.set("kv_quant", False)
            config.unset("kv_attn_int8_dot")

    dense = run_cfg("dense-bf16", False, False)
    kvq_ps = run_cfg("kvq-postscale", True, False)
    kvq_i8 = run_cfg("kvq-int8dot", True, True)
    print(f"dense {dense}  kvq_postscale {kvq_ps}  kvq_int8dot {kvq_i8}")
    if dense and kvq_i8:
        print(f"int8dot vs dense: {100*(kvq_i8[0]/dense[0]-1):+.1f}% agg, "
              f"{100*(kvq_i8[1]/dense[1]-1):+.1f}% steady")


if __name__ == "__main__":
    main()
