"""Test harness: force an 8-device virtual CPU platform so multi-chip
sharding paths are exercised without TPU hardware (SURVEY.md §4(d))."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: shell may set axon/tpu
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# jax may have been imported (and JAX_PLATFORMS captured) before this
# conftest runs; force the config too — backends initialize lazily, so this
# takes effect as long as no array op has run yet.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
