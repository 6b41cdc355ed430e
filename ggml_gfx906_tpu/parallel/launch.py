"""Multi-host launch: jax.distributed bring-up + content-hash model sync.

Replaces the reference's multi-host story (RPC offload, §2.7) with the
TPU-native shape: every host runs the same SPMD program under
jax.distributed; before compute starts, model bytes reach each host exactly
once through the native tensor transport (FNV-1a dedup + local disk cache —
the SET_TENSOR_HASH path). Cross-host collectives ride ICI/DCN via GSPMD;
there is no graph-offload protocol to replicate.

Typical flow:
    coordinator:  serve_model(gguf_path, port)        # host 0
    all hosts:    initialize(coordinator, n_proc, id) # jax.distributed
                  path = sync_model(gguf_path, coordinator_host, port, cache)
                  cfg, params = llama.load(path)      # now sharded via mesh
"""
from __future__ import annotations

import json
import os
from pathlib import Path

from ..utils import log


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None):
    """Bring up jax.distributed (no-op on a single host). Env fallbacks:
    JAX_COORDINATOR, JAX_NUM_PROCESSES, JAX_PROCESS_ID."""
    import jax

    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR")
    if coordinator_address is None:
        log.info("single-host run (no coordinator configured)")
        return False
    num_processes = num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    process_id = process_id if process_id is not None else int(
        os.environ.get("JAX_PROCESS_ID", "0"))
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    log.info(f"jax.distributed up: process {process_id}/{num_processes} "
             f"({jax.process_count()} procs, {len(jax.devices())} devices)")
    return True


HEADER_KEY = "__header__"


def serve_model(gguf_path, port: int = 18515, cache_dir: str | None = None):
    """Host-0 side: start the native transport server and publish the
    model's header (KV metadata + tensor directory, everything before the
    data section) and per-tensor blobs. Returns (server, manifest) where
    manifest maps tensor name → FNV-1a hash plus HEADER_KEY → header hash
    (the serve half of the reference's model-upload loop,
    src/ggml-rpc/ggml-rpc.cpp:1387-1654)."""
    from ..gguf import GGUFReader
    from .transport import TransportClient, TransportServer, distribute_gguf

    srv = TransportServer(port=port, cache_dir=cache_dir)
    with TransportClient(port=srv.port) as c:
        manifest = distribute_gguf(gguf_path, c)
        r = GGUFReader(gguf_path, header_only=True)
        with open(gguf_path, "rb") as f:
            hdr = f.read(r.data_offset)
        h, _ = c.put(hdr)
        manifest[HEADER_KEY] = h
    manifest_path = Path(str(gguf_path) + ".manifest.json")
    manifest_path.write_text(json.dumps(
        {"tensors": {k: str(v) for k, v in manifest.items()}}))
    log.info(f"serving {len(manifest) - 1} tensors on port {srv.port}")
    return srv, manifest


def _validate_local(path: Path, manifest: dict[str, int]) -> bool:
    """FULL hash validation of a cached/rebuilt GGUF: every tensor's bytes
    (and the header when the manifest carries one) must match — a torn or
    partially-written cache file with valid leading tensors must not pass."""
    from ..gguf import GGUFReader
    from .transport import fnv1a

    try:
        r = GGUFReader(path)
    except Exception:
        return False
    names = [n for n in manifest if n != HEADER_KEY]
    if set(names) != set(r.tensors):
        return False
    if HEADER_KEY in manifest:
        with open(path, "rb") as f:
            if fnv1a(f.read(r.data_offset)) != manifest[HEADER_KEY]:
                return False
    return all(fnv1a(bytes(r.tensor_bytes(n))) == manifest[n] for n in names)


def sync_model(gguf_path, host: str, port: int, cache_dir: str,
               manifest: dict[str, int]) -> Path:
    """Worker side: rebuild a byte-identical local GGUF through the
    transport — header fetch → directory parse → per-tensor GET (each blob
    hash-checked) → placement at the original offsets → full-file
    revalidation. A cached copy is reused only if it passes the FULL hash
    validation (replaces the reference's client half of the model-upload
    protocol, src/ggml-rpc/ggml-rpc.cpp:1387-1654)."""
    from ..gguf import GGUFReader
    from .transport import TransportClient, fnv1a

    cache = Path(cache_dir)
    cache.mkdir(parents=True, exist_ok=True)
    local = cache / Path(str(gguf_path)).name
    if local.exists() and _validate_local(local, manifest):
        log.info(f"model already cached at {local}")
        return local

    with TransportClient(host, port) as c:
        hdr = c.get(manifest[HEADER_KEY])
        if hdr is None or fnv1a(hdr) != manifest[HEADER_KEY]:
            raise IOError("header blob missing or corrupt")
        tmp = local.with_suffix(local.suffix + ".part")
        tmp.write_bytes(hdr)
        r = GGUFReader(tmp, header_only=True)
        total = r.data_offset + max(
            (ti.offset + ti.n_bytes for ti in r.tensors.values()), default=0)
        with open(tmp, "r+b") as f:
            f.truncate(total)  # zero-fill = the writer's alignment padding
            for name, ti in r.tensors.items():
                blob = c.get(manifest[name])
                if blob is None or fnv1a(blob) != manifest[name]:
                    raise IOError(f"tensor blob {name} missing or corrupt")
                if len(blob) != ti.n_bytes:
                    raise IOError(f"tensor {name}: size {len(blob)} != "
                                  f"{ti.n_bytes}")
                f.seek(r.data_offset + ti.offset)
                f.write(blob)
    tmp.rename(local)
    if not _validate_local(local, manifest):
        raise IOError("rebuilt GGUF failed full-hash validation")
    log.info(f"model rebuilt at {local} ({total} bytes)")
    return local


def local_topology() -> dict:
    """Device/host inventory (ggml_backend_dev_memory analogue)."""
    import jax

    devs = jax.devices()
    out = {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "n_devices": len(devs),
        "n_local_devices": len(jax.local_devices()),
        "devices": [{"id": d.id, "kind": d.device_kind,
                     "platform": d.platform} for d in devs],
    }
    try:
        stats = jax.local_devices()[0].memory_stats()
        if stats:
            out["memory"] = {k: int(v) for k, v in stats.items()
                            if "bytes" in k}
    except Exception:
        pass
    return out
