"""Device mesh + sharding rules.

Replaces the reference's multi-device machinery — the CUDA split-buffer
tensor parallelism (ggml_backend_split_buffer_type, src/ggml-cuda/
ggml-cuda.cu:799-1070: each weight's rows sharded across devices with
per-device partial matmuls + gather) and the scheduler's layer-offload
splits (src/ggml-backend.cpp:852-1230) — with jax.sharding: a named Mesh,
PartitionSpecs per parameter, and XLA GSPMD emitting the collectives over
ICI that ggml did with explicit peer copies.

Axes: dp (data/batch), tp (tensor: weight rows/cols), sp (sequence).
"""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.quantized import QuantTensor


def make_mesh(dp: int = 1, tp: int = 1, sp: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = dp * tp * sp
    assert len(devices) >= n, (len(devices), n)
    arr = np.asarray(devices[:n]).reshape(dp, tp, sp)
    return Mesh(arr, ("dp", "tp", "sp"))


def shard_array(mesh: Mesh, x, spec: P):
    return jax.device_put(x, NamedSharding(mesh, spec))


def shard_quant_tensor(mesh: Mesh, qt: QuantTensor, spec: P) -> QuantTensor:
    """Shard a quantized weight. Wire/kernel-layout block fields share the
    row axis layout, so a row-sharded weight (P('tp', None)) shards every
    field on axis 0 — the direct analogue of the CUDA split-buffer row
    ranges. The tile-major int8 execution layout stores rows on axis 1
    (w8t (Kt, N, 128) / dwt (Kt, N)), so its row axis maps there."""
    assert len(spec) <= len(qt.shape)
    row_axis = spec[0] if len(spec) > 0 else None
    if qt.layout == "int8":
        fspec = lambda a: P(None, row_axis, *([None] * (a.ndim - 2)))
    else:
        fspec = lambda a: P(row_axis, *([None] * (a.ndim - 1)))
    fields = {k: jax.device_put(v, NamedSharding(mesh, fspec(v)))
              for k, v in qt.fields.items()}
    return QuantTensor(qt.qtype, qt.shape, fields, qt.layout)


# Sharding rules for transformer param pytrees (gpt2/gptj/llama naming).
# Megatron-style: fused QKV + ffn_up row-split (output features), proj +
# ffn_down col-split (input features) → one psum per block, inserted by GSPMD.
GPT2_RULES = {
    "wte": P(None, None),
    "wpe": P(None, None),
    "lm_head": P("tp", None),
    "ln_f_g": P(None), "ln_f_b": P(None),
    "qkv_w": P("tp", None), "qkv_b": P("tp"),
    "proj_w": P(None, "tp"), "proj_b": P(None),
    "up_w": P("tp", None), "up_b": P("tp"),
    "down_w": P(None, "tp"), "down_b": P(None),
    "ln1_g": P(None), "ln1_b": P(None),
    "ln2_g": P(None), "ln2_b": P(None),
}


def shard_gpt2_params(mesh: Mesh, params: dict, rules: dict | None = None) -> dict:
    """Apply per-name PartitionSpecs to a gpt2-style param pytree."""
    rules = rules or GPT2_RULES

    def place(name, x):
        spec = rules.get(name)
        if spec is None:
            spec = P(*([None] * (x.ndim if not isinstance(x, QuantTensor)
                                 else len(x.shape))))
        if isinstance(x, QuantTensor):
            return shard_quant_tensor(mesh, x, spec)
        return shard_array(mesh, x, spec)

    out = {k: place(k, v) for k, v in params.items() if k != "blocks"}
    out["blocks"] = [{k: place(k, v) for k, v in blk.items()}
                     for blk in params["blocks"]]
    return out
