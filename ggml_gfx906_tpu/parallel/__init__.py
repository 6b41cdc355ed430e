"""Multi-chip / multi-host parallelism (ref: CUDA split-buffer TP + RPC
backend → jax.sharding/GSPMD over ICI/DCN)."""
from .mesh import (  # noqa: F401
    GPT2_RULES,
    make_mesh,
    shard_array,
    shard_gpt2_params,
    shard_quant_tensor,
)
