"""Cross-runtime behavioral parity vs the ACTUAL reference runtime.

Builds the reference CPU runtime from /root/reference at test time (cached
in build/ref, same oracle pattern as test_c_oracle.py), drives it through
cpp/ref_gpt2_decode.cpp on GGUF files produced by OUR writer, and asserts:

  1. the reference C reader (src/gguf.cpp:319) accepts our GGUF writer's
     output (exit code 2 = rejected),
  2. greedy decode is token-for-token identical in F32, Q8_0 and Q4_K,
  3. final-step logits agree: NMSE < 1e-5 (f32), < 2e-3 (quantized — the
     reference runs q8_1-activation integer dots, we run dequant+f32 matmul;
     bound calibrated from tests/test-quantize-fns.cpp:23 dot error <= 0.02,
     NMSE ~= err^2).

This is the TPU-native analogue of the reference's own CI smoke
(ci/run.sh downloads gpt-2 and runs examples/gpt-2/main-backend.cpp:786).
"""
import os
import struct
import subprocess
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
REF = Path("/root/reference")
BUILD = REPO / "build"
HARNESS = BUILD / "ref_gpt2_decode"

PROMPT = [5, 17, 29, 3, 101]
N_PREDICT = 32


@pytest.fixture(scope="module")
def harness():
    # flock guards the cold-cache build: under pytest-xdist several workers
    # reach this module fixture concurrently and used to clobber each
    # other's cmake/g++ outputs (same pattern as tests/_oracle_build.py)
    import fcntl

    if not REF.exists():
        pytest.skip("reference tree not available")
    libs = [BUILD / "ref" / "src" / f"libggml{s}.a"
            for s in ("-cpu", "", "-base")]
    BUILD.mkdir(exist_ok=True)
    with open(BUILD / "ref_runtime.lock", "w") as lf:
        fcntl.flock(lf, fcntl.LOCK_EX)
        try:
            if not all(p.exists() for p in libs):
                subprocess.run(
                    ["cmake", "-S", str(REF), "-B", str(BUILD / "ref"),
                     "-DCMAKE_BUILD_TYPE=Release", "-DGGML_BUILD_TESTS=OFF",
                     "-DGGML_BUILD_EXAMPLES=OFF", "-DBUILD_SHARED_LIBS=OFF"],
                    check=True, capture_output=True)
                subprocess.run(
                    ["cmake", "--build", str(BUILD / "ref"),
                     "-j", str(os.cpu_count())],
                    check=True, capture_output=True)
            src = REPO / "cpp" / "ref_gpt2_decode.cpp"
            if (not HARNESS.exists()
                    or HARNESS.stat().st_mtime < src.stat().st_mtime):
                tmp = HARNESS.with_suffix(".tmp")
                subprocess.run(
                    ["g++", "-O2", "-o", str(tmp), str(src),
                     f"-I{REF}/include", *[str(p) for p in libs],
                     "-lm", "-pthread", "-fopenmp"],
                    check=True, capture_output=True)
                tmp.rename(HARNESS)
        finally:
            fcntl.flock(lf, fcntl.LOCK_UN)
    return HARNESS


@pytest.fixture(scope="module")
def tiny_model():
    from ggml_gfx906_tpu.models import gpt2

    cfg = gpt2.GPT2Config(n_vocab=503, n_ctx=160, n_embd=256, n_head=4,
                          n_layer=2)
    return cfg, gpt2.random_params(cfg, seed=7)


def _ref_decode(harness, gguf_path, tmp_path):
    logits_path = tmp_path / "ref_logits.bin"
    r = subprocess.run(
        [str(harness), str(gguf_path), str(N_PREDICT), str(logits_path),
         *[str(t) for t in PROMPT]],
        capture_output=True, text=True, timeout=300)
    assert r.returncode != 2, f"reference C reader REJECTED our GGUF:\n{r.stderr}"
    assert r.returncode == 0, r.stderr
    toks = [int(line) for line in r.stdout.split()]
    logits = np.fromfile(logits_path, dtype=np.float32)
    return toks, logits


def _my_decode(gguf_path):
    import jax.numpy as jnp

    from ggml_gfx906_tpu.models import gpt2
    from ggml_gfx906_tpu.runtime.kv_cache import KVCache

    cfg, params = gpt2.load(gguf_path)
    toks = gpt2.generate(cfg, params, PROMPT, N_PREDICT)
    # the logits vector that produced the LAST token = forward(seq[:-1])[-1]
    seq = toks[:-1]
    kv = KVCache.create(cfg.n_layer, len(seq), cfg.n_head, cfg.head_dim,
                        dtype=cfg.compute_dtype)
    logits, _ = gpt2.forward_jit(cfg, params,
                                 jnp.asarray(seq, dtype=jnp.int32),
                                 kv, jnp.int32(0))
    return toks, np.asarray(logits[-1])


@pytest.mark.parametrize("fmt,nmse_bound", [
    ("F32", 1e-5),
    ("Q8_0", 2e-3),
    ("Q4_K", 2e-3),
])
def test_token_and_logits_parity(harness, tiny_model, tmp_path, fmt,
                                 nmse_bound):
    from ggml_gfx906_tpu.models import gpt2
    from ggml_gfx906_tpu.quant.types import GGMLType

    cfg, params = tiny_model
    qtype = None if fmt == "F32" else GGMLType[fmt]
    gguf_path = tmp_path / f"g2_{fmt}.gguf"
    gpt2.save_gguf(cfg, params, gguf_path, qtype=qtype)

    ref_toks, ref_logits = _ref_decode(harness, gguf_path, tmp_path)
    my_toks, my_logits = _my_decode(gguf_path)

    assert my_toks == ref_toks, (
        f"{fmt}: token divergence\n ref: {ref_toks}\nmine: {my_toks}")
    nmse = float(((my_logits - ref_logits) ** 2).mean()
                 / (ref_logits ** 2).mean())
    assert nmse < nmse_bound, f"{fmt}: logits NMSE {nmse} >= {nmse_bound}"


def test_reader_rejects_garbage(harness, tmp_path):
    """Sanity-check the gate itself: a corrupt file must NOT be accepted."""
    bad = tmp_path / "bad.gguf"
    bad.write_bytes(b"GGUF" + struct.pack("<I", 3) + b"\xff" * 64)
    r = subprocess.run(
        [str(harness), str(bad), "1", str(tmp_path / "x.bin"), "5"],
        capture_output=True, text=True, timeout=60)
    assert r.returncode == 2
