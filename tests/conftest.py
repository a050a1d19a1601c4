"""Test config: run everything on CPU with 8 virtual devices so that
multi-chip sharding logic is exercised without TPU hardware (the TPU
analog of a fake backend — see SURVEY.md §4)."""

import os

# Must be set before jax is imported anywhere.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
