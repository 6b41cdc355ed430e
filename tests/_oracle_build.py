"""Shared cached build of the reference C codec oracle.

Three test modules (test_c_oracle / test_iq_oracle / test_imatrix_oracle)
compile /root/reference/src/ggml-quants.c with small stub files; each
compile costs 6-40 s and under pytest-xdist every worker used to redo it.
Cache the .so in build/oracles keyed by (stubs, source mtime), guarded by
an flock so concurrent workers build it once.
"""
from __future__ import annotations

import fcntl
import hashlib
import shutil
import subprocess
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
REF = Path("/root/reference")
CACHE = REPO / "build" / "oracles"


def cached_oracle_so(tag: str, stubs: str) -> Path | None:
    """Build (or reuse) ggml-quants.c + stubs as a shared object.

    Returns the .so path, or None when no compiler/reference exists
    (callers pytest.skip)."""
    cc = shutil.which("gcc") or shutil.which("cc")
    src = REF / "src" / "ggml-quants.c"
    if cc is None or not src.exists():
        return None
    key = hashlib.sha256(
        stubs.encode() + str(src.stat().st_mtime_ns).encode()).hexdigest()[:16]
    CACHE.mkdir(parents=True, exist_ok=True)
    so = CACHE / f"{tag}-{key}.so"
    lock = CACHE / f"{tag}-{key}.lock"
    with open(lock, "w") as lf:
        fcntl.flock(lf, fcntl.LOCK_EX)
        try:
            if not so.exists():
                stub_c = CACHE / f"{tag}-{key}-stubs.c"
                stub_c.write_text(stubs)
                tmp = so.with_suffix(".so.tmp")
                res = subprocess.run(
                    [cc, "-shared", "-fPIC", "-O2", f"-I{REF}/include",
                     f"-I{REF}/src", str(src), str(stub_c), "-o", str(tmp),
                     "-lm"],
                    capture_output=True, text=True)
                if res.returncode != 0:
                    raise RuntimeError(f"oracle build failed: "
                                       f"{res.stderr[-400:]}")
                tmp.rename(so)
        finally:
            fcntl.flock(lf, fcntl.LOCK_UN)
    return so
