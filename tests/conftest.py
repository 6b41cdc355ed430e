"""Test configuration: force a virtual 8-device CPU mesh before jax imports.

Real-TPU benchmarking happens via bench.py (not under pytest); tests validate
numerics + sharding on the host CPU platform, mirroring the reference's
CPU-only CI (ref: .github/workflows/ci.yml:12-49).
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
prev = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in prev:
    os.environ["XLA_FLAGS"] = (
        prev + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon TPU plugin ignores the JAX_PLATFORMS env var on this image; the
# config knob does stick. Force CPU before any test imports jax.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()
