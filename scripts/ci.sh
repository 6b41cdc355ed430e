#!/usr/bin/env bash
# CI entry point: conformance suite + entry-point compile checks + native
# build. Mirrors what the round driver checks (tests green, graft entry
# importable, multichip dryrun on a virtual mesh, transport builds).
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== native transport build =="
make -C cpp

echo "== conformance suite (CPU, 8 virtual devices, 4-way parallel) =="
# FAST=1 skips @pytest.mark.slow (heavy fixtures); default runs everything.
# xdist workers share the cached reference-library/oracle builds in build/.
if [ "${FAST:-0}" = "1" ]; then
    python -m pytest tests/ -q -n 4 -m "not slow" --maxfail=1
else
    python -m pytest tests/ -q -n 4 --maxfail=1
fi

echo "== entry + multi-chip dryrun (8-device virtual mesh) =="
python - <<'EOF'
import os, sys
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
    " --xla_force_host_platform_device_count=8"
sys.path.insert(0, ".")
import jax
jax.config.update("jax_platforms", "cpu")
import importlib
ge = importlib.import_module("__graft_entry__")
fn, args = ge.entry()
out = jax.jit(fn, donate_argnums=2)(*args)
print("entry ok:", out[0].shape)
ge.dryrun_multichip(8)
EOF

echo "== CI green =="
