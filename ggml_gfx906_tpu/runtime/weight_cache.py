"""Write-once disk cache of the int8 execution layout, beside the GGUF.

ref: the reference's load path is one mmap + per-tensor upload
(gguf_init_from_file_impl no_alloc, src/gguf.cpp:319) with repack-at-load
(src/ggml-cpu/repack.cpp). Our production serving layout additionally
requantizes every weight to tile-major int8 (ops/quantized.to_int8_layout)
— a full dequant+requant pass over ~7 GB that dominated time-to-first-token
(r04: load 81 s + re-layout 101 s, serial). The transform is a pure
function of (GGUF bytes, int8_tile), so its result is persisted HERE on
first load and mmap-read straight into device uploads on every later load,
skipping both the wire→kernel decode and the device requant entirely.

Validity = (source size, source mtime_ns, int8_tile, cache version),
recorded in a manifest that is written LAST — a partially-written cache is
simply invalid and gets rebuilt. All writes are best-effort: a read-only
filesystem degrades to the uncached path, never to an error.
"""
from __future__ import annotations

import json
import os
from pathlib import Path

import numpy as np

from ..utils import log

VERSION = 1


def cache_dir(gguf_path) -> Path:
    return Path(str(gguf_path) + ".int8cache")


def lookup(gguf_path):
    """{tensor name → zero-arg loader returning an int8-layout QuantTensor}
    when a valid cache exists, else None. Loaders mmap the .npy and upload;
    call them from the load thread pool to overlap uploads."""
    import jax.numpy as jnp

    from ..ops.quantized import QuantTensor
    from ..quant.types import GGMLType
    from ..utils import config

    d = cache_dir(gguf_path)
    try:
        m = json.loads((d / "manifest.json").read_text())
        st = os.stat(gguf_path)
        if (m["version"] != VERSION
                or m["tile"] != int(config.get("int8_tile"))
                or m["src_size"] != st.st_size
                or m["src_mtime_ns"] != st.st_mtime_ns):
            return None
    except (OSError, ValueError, KeyError):
        return None

    def make_loader(info):
        def loader():
            fields = {f: jnp.asarray(np.load(d / fn, mmap_mode="r"))
                      for f, fn in info["fields"].items()}
            return QuantTensor(GGMLType(info["qtype"]),
                               tuple(info["shape"]), fields, "int8")
        return loader

    return {name: make_loader(info) for name, info in m["tensors"].items()}


def store(gguf_path, tensors: dict) -> bool:
    """Persist int8-layout QuantTensors (one device→host fetch per field).
    Returns True when the cache was written."""
    from ..utils import config

    d = cache_dir(gguf_path)
    try:
        st = os.stat(gguf_path)
        d.mkdir(parents=True, exist_ok=True)
        manifest = {"version": VERSION,
                    "tile": int(config.get("int8_tile")),
                    "src_size": st.st_size,
                    "src_mtime_ns": st.st_mtime_ns,
                    "tensors": {}}
        for name, qt in tensors.items():
            assert qt.layout == "int8", (name, qt.layout)
            info = {"qtype": int(qt.qtype), "shape": list(qt.shape),
                    "fields": {}}
            for f, arr in qt.fields.items():
                fn = f"{name}.{f}.npy"
                np.save(d / fn, np.asarray(arr))
                info["fields"][f] = fn
            manifest["tensors"][name] = info
        # manifest last: its presence IS the cache's validity marker
        (d / "manifest.json").write_text(json.dumps(manifest))
        return True
    except OSError as e:  # best-effort: cold path still works
        log.warn(f"int8 weight cache write failed ({e}); continuing uncached")
        return False
