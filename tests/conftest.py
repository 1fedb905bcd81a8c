"""Test configuration: run everything on an 8-device virtual CPU mesh.

Sharding/collective tests need multiple devices; the build machine has one
TPU chip, so tests spoof 8 CPU devices (SURVEY.md §4 test strategy).

NOTE: the `axon` TPU plugin on this machine sets jax_platforms="axon,cpu"
at import, overriding the JAX_PLATFORMS env var — we must override it with
jax.config.update BEFORE any backend initialization.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache makes repeated test runs fast.  Only programs
# that took >= 1 s to compile are cached: the full suite loads hundreds of
# executables, and on this build VM the XLA:CPU AOT deserializer
# reproducibly corrupts the process after ~250 loads (SIGSEGV/SIGABRT at
# the next compile — crash point moves with test order, classic heap
# corruption; every half-suite run passes).  Caching only the expensive
# programs keeps retries fast AND stays far below the load count that
# triggers it.
cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update(
    "jax_persistent_cache_min_compile_time_secs",
    float(os.environ.get("JAX_PERSISTENT_CACHE_MIN_COMPILE_SECS", "0.0")))

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _release_executables_between_modules():
    """Free compiled executables after every test module.

    On this build VM the XLA:CPU runtime reproducibly corrupts the process
    heap once a few hundred executables are live (SIGSEGV/SIGABRT at the
    next compile/cache-load; the crash point moves with test order and
    every half-suite run passes).  Dropping the jit caches per module keeps
    the live-executable count low; the persistent disk cache makes the
    recompiles cheap."""
    yield
    jax.clear_caches()
