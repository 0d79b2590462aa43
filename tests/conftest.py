"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The real TPU chip is reserved for benchmarks; unit tests validate numerics
and sharding on host CPU (mirrors the reference's CPU-first test strategy,
tests/test_models/test_forward.py).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
