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


def serve_model(gguf_path, port: int = 18515, cache_dir: str | None = None):
    """Host-0 side: start the native transport server and publish the model's
    tensor blobs + a manifest. Returns (server, manifest)."""
    from .transport import TransportClient, TransportServer, distribute_gguf

    srv = TransportServer(port=port, cache_dir=cache_dir)
    with TransportClient(port=srv.port) as c:
        manifest = distribute_gguf(gguf_path, c)
    manifest_path = Path(str(gguf_path) + ".manifest.json")
    manifest_path.write_text(json.dumps(
        {"tensors": {k: str(v) for k, v in manifest.items()}}))
    log.info(f"serving {len(manifest)} tensors on port {srv.port}")
    return srv, manifest


def sync_model(gguf_path, host: str, port: int, cache_dir: str,
               manifest: dict[str, int]) -> Path:
    """Worker side: ensure all tensor blobs exist locally (fetched by hash,
    satisfied from cache_dir when already present), then rebuild a local
    GGUF identical to the coordinator's.

    The header (KV metadata + tensor directory) is fetched as its own blob
    keyed under 'header' in the manifest."""
    from ..gguf import GGUFReader, GGUFWriter
    from .transport import TransportClient, fnv1a

    local = Path(cache_dir) / Path(str(gguf_path)).name
    if local.exists():
        try:
            r = GGUFReader(local)
            ok = all(fnv1a(bytes(r.tensor_bytes(n))) == manifest[n]
                     for n in list(r.tensors)[:3])  # spot check
            if ok:
                log.info(f"model already cached at {local}")
                return local
        except Exception:
            pass
    raise NotImplementedError(
        "full remote rebuild lands with real multi-host runs; single-host "
        "path uses the shared filesystem")


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
