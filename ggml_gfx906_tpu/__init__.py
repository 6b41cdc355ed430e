"""ggml_gfx906_tpu — a TPU-native tensor/inference/training framework.

A from-scratch reimplementation of the capabilities of ggml (as specialized in
skyne98/ggml-gfx906) designed for TPUs: bit-exact ggml/GGUF quantization codecs,
a GGUF loader mapping packed blocks to MXU-friendly layouts, fused dequant+matmul
Pallas kernels, a jit-compiled runtime, continuous batching, training with
optimizer-as-ops, and pjit/GSPMD multi-chip parallelism.

Layer map (mirrors reference SURVEY.md §1, re-architected for TPU):
  quant/     — block quant codecs (ref: src/ggml-quants.c, src/ggml-common.h)
  gguf/      — GGUF file format reader/writer (ref: src/gguf.cpp)
  ops/       — op surface incl. Pallas kernels (ref: include/ggml.h op enum,
               src/ggml-cpu/ops.cpp, src/ggml-cuda/*)
  runtime/   — executor, KV cache, batching (ref: src/ggml-backend.cpp scheduler)
  models/    — model zoo (ref: examples/)
  parallel/  — mesh/sharding/multi-host (ref: split-buffer TP + RPC backend)
  training/  — datasets, AdamW/SGD, fit loops (ref: src/ggml-opt.cpp)
"""

__version__ = "0.1.0"

# process-spanning XLA compile reuse (config "xla_cache_dir" to relocate or
# disable) — the build-time-precompile role of the reference's CMake kernels
from .utils import xla_cache as _xla_cache

_xla_cache.ensure()
del _xla_cache
