"""Arbitrary param-pytree ↔ GGUF serialization.

The reference serializes each model family with hand-written GGUF tensor
name tables (e.g. examples/sam/convert-pth-to-ggml.py, magika.cpp). Here
one generic mapping covers any nested dict/list/tuple pytree of arrays:
tensor names are the dotted key paths ("enc.blocks.0.qkv_w"), and loading
rebuilds the nesting from the names (integer segments → list positions).

    save_pytree("m.gguf", params, kv={"sam.n_enc_layer": 12})
    params, kv = load_pytree("m.gguf")
"""
from __future__ import annotations

import numpy as np

from .format import GGUFReader, GGUFWriter


def _flatten(tree, prefix=""):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flatten(v, f"{prefix}{k}.")
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            yield from _flatten(v, f"{prefix}{i}.")
    else:
        yield prefix[:-1], tree


def save_pytree(path, params, kv: dict | None = None,
                vtypes: dict | None = None):
    """Write a pytree of arrays to GGUF (f32 tensors; GGUF's 1-D/2-D-first
    layout keeps the original shape in the `ne` field). vtypes: optional
    per-key GGUFValueType overrides for the kv metadata."""
    w = GGUFWriter()
    for key, val in (kv or {}).items():
        w.set(key, val, (vtypes or {}).get(key))
    names = []
    for name, arr in _flatten(params):
        a = np.asarray(arr, np.float32)
        w.add_array_tensor(name, a)
        names.append(name)
    if not names:
        raise ValueError("empty pytree")
    w.write(path)
    return names


def _insert(root: dict, segs: list[str], value):
    cur = root
    for s in segs[:-1]:
        cur = cur.setdefault(s, {})
    cur[segs[-1]] = value


def _listify(node):
    """Convert dicts whose keys are all stringified ints into lists."""
    if not isinstance(node, dict):
        return node
    out = {k: _listify(v) for k, v in node.items()}
    if out and all(k.isdigit() for k in out):
        idx = sorted(out, key=int)
        assert [int(k) for k in idx] == list(range(len(idx))), idx
        return [out[k] for k in idx]
    return out


def load_pytree(path, device_put=True):
    """GGUF → (params pytree, kv metadata dict). Arrays come back f32."""
    r = GGUFReader(path)
    root: dict = {}
    for name in r.tensors:
        arr = r.tensor_float(name)
        if device_put:
            import jax.numpy as jnp

            arr = jnp.asarray(arr)
        _insert(root, name.split("."), arr)
    return _listify(root), dict(r.kv)
