"""Pallas TPU kernels — the performance core (replaces ggml's CUDA/gfx906
hand-written kernels: mmvq/mmq/fattn/quantize, ref SURVEY.md §2.8-2.9)."""
