"""Native tensor-transport tests (localhost server+client, ref: the RPC
backend's testability-by-loopback, SURVEY.md §4.6)."""
import numpy as np
import pytest

from ggml_gfx906_tpu.parallel import transport


@pytest.fixture(scope="module")
def server():
    with transport.TransportServer() as srv:
        yield srv


def test_fnv1a_matches_reference_constants():
    # FNV-1a 64 known-answer tests
    assert transport.fnv1a(b"") == 0xcbf29ce484222325
    assert transport.fnv1a(b"a") == 0xaf63dc4c8601ec8c
    assert transport.fnv1a(b"foobar") == 0x85944171f73967e8


def test_put_get_round_trip(server):
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, 100_000, dtype=np.uint8).tobytes()
    with transport.TransportClient(port=server.port) as c:
        h, deduped = c.put(data)
        assert not deduped
        assert c.check(h)
        assert c.get(h) == data
        # second upload of identical content is skipped (SET_TENSOR_HASH dedup)
        h2, deduped2 = c.put(data)
        assert h2 == h and deduped2
        n, total = c.stat()
        assert n >= 1 and total >= len(data)


def test_missing_hash(server):
    with transport.TransportClient(port=server.port) as c:
        assert c.get(0xdeadbeef) is None
        assert not c.check(0xdeadbeef)


def test_disk_cache(tmp_path):
    data = b"persistent tensor bytes" * 1000
    with transport.TransportServer(cache_dir=str(tmp_path)) as srv:
        with transport.TransportClient(port=srv.port) as c:
            h, _ = c.put(data)
    # new server over the same cache dir serves the blob from disk
    with transport.TransportServer(cache_dir=str(tmp_path)) as srv2:
        with transport.TransportClient(port=srv2.port) as c2:
            assert c2.check(h)
            assert c2.get(h) == data


def test_gguf_distribution(tmp_path, server):
    from ggml_gfx906_tpu.gguf import GGUFReader, GGUFWriter

    w = GGUFWriter()
    rng = np.random.default_rng(1)
    a = rng.standard_normal((8, 64)).astype(np.float32)
    b = rng.standard_normal((4, 32)).astype(np.float32)
    w.add_array_tensor("a", a)
    w.add_array_tensor("b", b)
    path = tmp_path / "m.gguf"
    w.write(path)

    with transport.TransportClient(port=server.port) as c:
        manifest = transport.distribute_gguf(path, c)
        fetched = transport.fetch_manifest(manifest, c)
    r = GGUFReader(path)
    for name in ("a", "b"):
        assert fetched[name] == np.ascontiguousarray(r.tensor_bytes(name)).tobytes()
