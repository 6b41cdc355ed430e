"""Command-line tools (conformance harness, perf — see backend_ops.py)."""
