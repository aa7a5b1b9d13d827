"""Test harness: force JAX onto CPU with 8 virtual devices so sharding
tests exercise a real multi-device mesh without TPU hardware.

The environment's sitecustomize force-registers the axon TPU platform and
sets jax_platforms='axon,cpu'; overriding the config after import is the
reliable way to pin tests to CPU."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: the heavy DA-step/backbone graphs compile once
# and re-load on subsequent test runs.
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache_cpu")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
