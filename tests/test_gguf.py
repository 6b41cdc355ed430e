"""GGUF reader/writer round-trip tests (ref behavior: src/gguf.cpp)."""
import numpy as np
import pytest

from ggml_gfx906_tpu.gguf import GGUFReader, GGUFWriter, GGUFValueType
from ggml_gfx906_tpu.quant import GGMLType, dequantize, quantize


def test_kv_round_trip(tmp_path):
    w = GGUFWriter()
    w.set("general.architecture", "gpt2")
    w.set("gpt2.context_length", 1024)
    w.set("f", 1.25)
    w.set("flag", True)
    w.set("big", 2**40, GGUFValueType.UINT64)
    w.set("neg", -3, GGUFValueType.INT32)
    w.set("arr_i", [1, 2, 3])
    w.set("arr_s", ["a", "bb", "ccc"])
    w.set("arr_f", [0.5, 1.5])
    w.write(tmp_path / "t.gguf")

    r = GGUFReader(tmp_path / "t.gguf")
    assert r.kv["general.architecture"] == "gpt2"
    assert r.kv["gpt2.context_length"] == 1024
    assert r.kv["f"] == 1.25
    assert r.kv["flag"] is True
    assert r.kv["big"] == 2**40
    assert r.kv["neg"] == -3
    assert r.kv["arr_i"] == [1, 2, 3]
    assert r.kv["arr_s"] == ["a", "bb", "ccc"]
    assert r.kv["arr_f"] == [0.5, 1.5]


def test_tensor_round_trip(tmp_path):
    rng = np.random.default_rng(3)
    a = rng.standard_normal((8, 256)).astype(np.float32)
    b = rng.standard_normal((4, 512)).astype(np.float32)
    c = rng.standard_normal((16,)).astype(np.float32)

    w = GGUFWriter()
    w.add_array_tensor("a.f32", a)
    w.add_array_tensor("a.f16", a, GGMLType.F16)
    w.add_array_tensor("b.q4k", b, GGMLType.Q4_K)
    w.add_array_tensor("b.q8", b, GGMLType.Q8_0)
    w.add_array_tensor("c.f32", c)
    w.write(tmp_path / "t.gguf")

    r = GGUFReader(tmp_path / "t.gguf")
    assert set(r.tensors) == {"a.f32", "a.f16", "b.q4k", "b.q8", "c.f32"}
    assert r.tensors["a.f32"].shape == (8, 256)
    assert r.tensors["a.f32"].ne == (256, 8)
    np.testing.assert_array_equal(r.tensor_float("a.f32"), a)
    np.testing.assert_array_equal(r.tensor_float("a.f16"), a.astype(np.float16).astype(np.float32))
    # quantized: stored bytes must decode exactly like the codec round-trip
    np.testing.assert_array_equal(
        r.tensor_float("b.q4k"), dequantize(GGMLType.Q4_K, quantize(GGMLType.Q4_K, b))
    )
    np.testing.assert_array_equal(
        r.tensor_float("b.q8"), dequantize(GGMLType.Q8_0, quantize(GGMLType.Q8_0, b))
    )
    # struct-of-arrays block view works and offsets are aligned
    blocks = r.tensor_blocks("b.q4k")
    assert blocks.shape == (4, 2)
    for ti in r.tensors.values():
        assert ti.offset % r.alignment == 0


def test_rejects_garbage(tmp_path):
    p = tmp_path / "bad.gguf"
    p.write_bytes(b"NOTGGUF_________")
    with pytest.raises(ValueError, match="magic"):
        GGUFReader(p)


def test_rejects_truncated(tmp_path):
    w = GGUFWriter()
    w.add_array_tensor("x", np.zeros((4, 32), np.float32))
    w.write(tmp_path / "t.gguf")
    raw = (tmp_path / "t.gguf").read_bytes()
    (tmp_path / "trunc.gguf").write_bytes(raw[:20])
    with pytest.raises(Exception):
        GGUFReader(tmp_path / "trunc.gguf")
