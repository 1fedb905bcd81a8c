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
# persistent compile cache makes repeated test runs fast
cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
