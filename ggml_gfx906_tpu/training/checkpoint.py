"""Training-state checkpoint/resume (orbax).

The reference checkpoints model weights through GGUF round-trips
(examples/mnist/mnist-common.cpp save/load) but has no optimizer-state
resume; here the full training state — params, AdamW moments, gradient
accumulator, epoch counter, metric history, the numpy RNG state and the
dataset's shuffle permutation — round-trips through orbax, so an
interrupted `fit` continues bit-exactly (same batches, same updates) as
an uninterrupted run.

    from ggml_gfx906_tpu.training import checkpoint as ckpt
    ckpt.save(dir, step, state)            # state: pytree dict
    state = ckpt.restore_latest(dir)       # None if dir empty
"""
from __future__ import annotations

import json
import os
import re

import numpy as np


def _ckptr():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def encode_rng(rng: np.random.Generator) -> np.ndarray:
    """numpy Generator state → uint8 array (orbax leaves must be arrays;
    PCG64 state holds 128-bit ints, so it travels as JSON bytes)."""
    s = json.dumps(rng.bit_generator.state)
    return np.frombuffer(s.encode(), np.uint8).copy()


def decode_rng(buf: np.ndarray) -> np.random.Generator:
    state = json.loads(bytes(np.asarray(buf, np.uint8)).decode())
    rng = np.random.default_rng(0)
    rng.bit_generator.state = state
    return rng


def save(directory: str, step: int, state) -> str:
    """Write checkpoint `step` under directory (keeps the previous one
    until the new write completes, then prunes to the 2 most recent)."""
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"step_{step:08d}")
    _ckptr().save(path, state)
    steps = sorted(all_steps(directory))
    for s in steps[:-2]:
        import shutil

        shutil.rmtree(os.path.join(directory, f"step_{s:08d}"),
                      ignore_errors=True)
    return path


def all_steps(directory: str) -> list[int]:
    if not os.path.isdir(directory):
        return []
    out = []
    for name in os.listdir(directory):
        m = re.fullmatch(r"step_(\d{8})", name)
        if m and os.path.isdir(os.path.join(directory, name)):
            out.append(int(m.group(1)))
    return sorted(out)


def restore(directory: str, step: int):
    return _ckptr().restore(os.path.join(directory, f"step_{step:08d}"))


def restore_latest(directory: str):
    steps = all_steps(directory)
    if not steps:
        return None
    return restore(directory, steps[-1])
