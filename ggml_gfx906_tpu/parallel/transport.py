"""Python binding for the native tensor transport (cpp/tensor_transport.cc).

The multi-host weight-distribution fabric: content-addressed PUT/GET over
TCP with FNV-1a dedup — the TPU-native replacement for the reference RPC
backend's SET_TENSOR_HASH weight upload path (src/ggml-rpc/ggml-rpc.cpp:
569-592). Execution offload is NOT done over this channel; SPMD compute is
jax.distributed's job. Typical use: the coordinator serves the GGUF tensor
blobs; each worker fetches-by-hash with a local disk cache, then memmaps.
"""
from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_LIB_PATH = Path(__file__).resolve().parents[2] / "cpp" / "libtensor_transport.so"
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        subprocess.run(["make", "-C", str(_LIB_PATH.parent)], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.tt_fnv1a.restype = ctypes.c_uint64
    lib.tt_fnv1a.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
    lib.tt_server_start.restype = ctypes.c_void_p
    lib.tt_server_start.argtypes = [ctypes.c_uint16, ctypes.c_char_p,
                                    ctypes.POINTER(ctypes.c_uint16)]
    lib.tt_server_stop.argtypes = [ctypes.c_void_p]
    lib.tt_connect.restype = ctypes.c_void_p
    lib.tt_connect.argtypes = [ctypes.c_char_p, ctypes.c_uint16]
    lib.tt_close.argtypes = [ctypes.c_void_p]
    lib.tt_check.restype = ctypes.c_int
    lib.tt_check.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
    lib.tt_put.restype = ctypes.c_int
    lib.tt_put.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint64]
    lib.tt_get.restype = ctypes.c_int64
    lib.tt_get.argtypes = [ctypes.c_void_p, ctypes.c_uint64, ctypes.c_void_p,
                           ctypes.c_uint64]
    lib.tt_stat.restype = ctypes.c_int
    lib.tt_stat.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint64),
                            ctypes.POINTER(ctypes.c_uint64)]
    lib.tt_shutdown.restype = ctypes.c_int
    lib.tt_shutdown.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def fnv1a(data: bytes | np.ndarray) -> int:
    """FNV-1a 64 — same constants as the reference (ggml-rpc.cpp:223)."""
    lib = _load()
    buf = np.frombuffer(data, dtype=np.uint8) if isinstance(data, bytes) \
        else np.ascontiguousarray(data).view(np.uint8).reshape(-1)
    return int(lib.tt_fnv1a(buf.ctypes.data, buf.size))


class TransportServer:
    """In-process native server (accept loop runs on a C++ thread)."""

    def __init__(self, port: int = 0, cache_dir: str | None = None):
        lib = _load()
        actual = ctypes.c_uint16(0)
        self._h = lib.tt_server_start(
            port, cache_dir.encode() if cache_dir else None,
            ctypes.byref(actual))
        if not self._h:
            raise OSError("failed to start transport server")
        self.port = actual.value

    def stop(self):
        if self._h:
            _load().tt_server_stop(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.stop()


class TransportClient:
    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        self._c = _load().tt_connect(host.encode(), port)
        if not self._c:
            raise ConnectionError(f"cannot connect to {host}:{port}")

    def check(self, hash_: int) -> bool:
        r = _load().tt_check(self._c, hash_)
        if r < 0:
            raise ConnectionError("check failed")
        return bool(r)

    def put(self, data: bytes | np.ndarray) -> tuple[int, bool]:
        """Upload (deduped). Returns (hash, was_deduped)."""
        buf = np.frombuffer(data, dtype=np.uint8) if isinstance(data, bytes) \
            else np.ascontiguousarray(data).view(np.uint8).reshape(-1)
        h = fnv1a(buf)
        r = _load().tt_put(self._c, buf.ctypes.data, buf.size)
        if r < 0:
            raise ConnectionError("put failed")
        return h, r == 2

    def get(self, hash_: int) -> bytes | None:
        lib = _load()
        n = lib.tt_get(self._c, hash_, None, 0)
        if n < 0:
            return None
        out = np.empty(n, np.uint8)
        n2 = lib.tt_get(self._c, hash_, out.ctypes.data, out.size)
        assert n2 == n, (n, n2)
        return out.tobytes()

    def stat(self) -> tuple[int, int]:
        a, b = ctypes.c_uint64(), ctypes.c_uint64()
        if _load().tt_stat(self._c, ctypes.byref(a), ctypes.byref(b)) != 0:
            raise ConnectionError("stat failed")
        return a.value, b.value

    def shutdown_server(self):
        _load().tt_shutdown(self._c)

    def close(self):
        if self._c:
            _load().tt_close(self._c)
            self._c = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def distribute_gguf(path, client: TransportClient) -> dict[str, int]:
    """Push every tensor blob of a GGUF to the store (content-deduped);
    returns name→hash manifest — the coordinator half of multi-host model
    distribution."""
    from ..gguf import GGUFReader

    r = GGUFReader(path)
    manifest = {}
    for name in r.tensors:
        h, _ = client.put(np.ascontiguousarray(r.tensor_bytes(name)))
        manifest[name] = h
    return manifest


def fetch_manifest(manifest: dict[str, int], client: TransportClient) -> dict[str, bytes]:
    """Worker half: fetch tensor blobs by hash."""
    return {name: client.get(h) for name, h in manifest.items()}
