"""Test harness: force JAX onto CPU with 8 virtual devices so sharding
tests exercise a real multi-device mesh without TPU hardware.

The environment's sitecustomize force-registers the axon TPU platform and
sets jax_platforms='axon,cpu'; overriding the config after import is the
reliable way to pin tests to CPU."""

import os

# torch and jax share one process in the parity/conversion tests; their
# OpenMP runtimes sporadically SIGABRT long-lived multi-program processes
# unless thread pools are pinned down (single-core host anyway).
os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ.setdefault("MKL_NUM_THREADS", "1")
os.environ.setdefault("KMP_DUPLICATE_LIB_OK", "TRUE")

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# NOTE: no persistent compilation cache for CPU tests. XLA:CPU cache
# entries are AOT-compiled executables pinned to the build machine's CPU
# features; reloading them on a host with different features (this
# workspace migrates between heterogeneous machines) SIGABRTs the process
# (cpu_aot_loader "machine type ... doesn't match" -> fatal). Observed as
# sporadic aborts in test_multichip/test_dp_cli; cold-compiling is slower
# but correct. The TPU cache (.jax_cache) is unaffected — its entries are
# device binaries.
