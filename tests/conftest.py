"""Test config: run everything on CPU with 8 virtual devices so that
multi-chip sharding logic is exercised without TPU hardware (the TPU
analog of a fake backend — see SURVEY.md §4).

Note: the environment's sitecustomize imports jax at interpreter start
and pins JAX_PLATFORMS=axon (the TPU tunnel), so mutating os.environ
here is too late — we must go through jax.config, which wins as long as
no backend has been initialized yet (it hasn't at conftest time).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax

jax.config.update("jax_platforms", "cpu")
# Parity tests compare fp32 against torch-CPU references; make XLA use
# true fp32 matmuls (the default "bfloat16_3x"-style passes lose ~1e-3).
jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compilation cache: OPT-IN ONLY (VISIONLLM_TEST_CACHE=1).
# Warm reruns of compile-heavy tests are near-instant with it, but on
# this host XLA:CPU AOT cache reloads record compile-machine
# pseudo-features (+prefer-no-gather/scatter) that the load-time check
# doesn't report, and the re-loaded MULTI-DEVICE executables then lose a
# device thread inside a collective -> 40 s rendezvous abort (SIGABRT,
# reproduced 3/3 warm on __graft_entry__'s pose task, 0/3 cold). A
# single pytest process never re-loads entries it wrote itself (the
# in-memory executable cache wins), so first runs are safe either way;
# re-runs with a warm cache are not.
if os.environ.get("VISIONLLM_TEST_CACHE") == "1":
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-minute compile-heavy tests "
        "(deselect with -m 'not slow')")
