"""Multi-host machinery: full model sync over the native transport and a
real two-process jax.distributed bring-up on localhost.

ref: the serve/client roles of src/ggml-rpc/ggml-rpc.cpp:1387-1654 (model
upload by content hash) — here the worker rebuilds a byte-identical GGUF.
"""
import hashlib
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from ggml_gfx906_tpu.gguf import GGUFReader, GGUFWriter
from ggml_gfx906_tpu.parallel import launch
from ggml_gfx906_tpu.quant import GGMLType


def _make_gguf(path, seed=0, n=12):
    w = GGUFWriter()
    w.set("general.architecture", "test")
    w.set("test.block_count", 2)
    rng = np.random.default_rng(seed)
    for i in range(n):
        a = rng.standard_normal((8, 64 * (1 + i % 3))).astype(np.float32)
        w.add_array_tensor(f"t{i}", a)
    # one quantized tensor so the rebuild covers packed block data
    w.add_array_tensor("q", rng.standard_normal((16, 256)).astype(np.float32),
                       GGMLType.Q4_K)
    w.write(path)
    return path


def _sha(p):
    return hashlib.sha256(Path(p).read_bytes()).hexdigest()


def test_sync_model_rebuilds_byte_identical(tmp_path):
    src = _make_gguf(tmp_path / "m.gguf")
    srv, manifest = launch.serve_model(src, port=0)
    try:
        cache = tmp_path / "worker_cache"
        local = launch.sync_model(src, "127.0.0.1", srv.port, cache, manifest)
        assert Path(local) != Path(src)
        assert _sha(local) == _sha(src)
        # cache hit path: second sync returns without refetching
        local2 = launch.sync_model(src, "127.0.0.1", srv.port, cache,
                                   manifest)
        assert Path(local2) == Path(local)
    finally:
        srv.stop()


def test_sync_model_rejects_torn_cache(tmp_path):
    """A cached file whose EARLY tensors are valid but whose tail is torn
    must fail validation and be re-fetched (round-1 spot-check of the first
    3 tensors would have accepted it)."""
    src = _make_gguf(tmp_path / "m.gguf")
    srv, manifest = launch.serve_model(src, port=0)
    try:
        cache = tmp_path / "worker_cache"
        cache.mkdir()
        torn = bytearray(Path(src).read_bytes())
        torn[-7] ^= 0xFF  # corrupt inside the LAST tensor's data
        (cache / "m.gguf").write_bytes(bytes(torn))
        assert not launch._validate_local(cache / "m.gguf", manifest)
        local = launch.sync_model(src, "127.0.0.1", srv.port, cache, manifest)
        assert _sha(local) == _sha(src)
    finally:
        srv.stop()


_DIST_SCRIPT = """
import sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
from ggml_gfx906_tpu.parallel import launch
launch.initialize(sys.argv[1], 2, int(sys.argv[2]))
import numpy as np
from jax.experimental import multihost_utils
assert jax.process_count() == 2, jax.process_count()
got = multihost_utils.process_allgather(np.array([jax.process_index()]))
assert sorted(np.ravel(got).tolist()) == [0, 1], got
top = launch.local_topology()
assert top["process_count"] == 2
print("DIST_OK", jax.process_index())
"""


def test_two_process_jax_distributed():
    """Real 2-process jax.distributed bring-up + cross-process allgather on
    localhost (the multi-host smoke the round-1 launch layer never ran)."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    addr = f"127.0.0.1:{port}"
    repo = str(Path(__file__).resolve().parents[1])
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["JAX_PLATFORMS"] = "cpu"
    script = _DIST_SCRIPT.format(repo=repo)
    procs = [subprocess.Popen(
        [sys.executable, "-c", script, addr, str(i)], env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in (0, 1)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out)
    assert all(p.returncode == 0 for p in procs), "\n---\n".join(outs)
    assert all("DIST_OK" in o for o in outs), outs
