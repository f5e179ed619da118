"""Test configuration: run everything on an 8-device virtual CPU mesh so
multi-chip sharding code paths are exercised without TPU hardware (the
standard JAX trick — SURVEY.md §4).

Note: this environment's sitecustomize registers a remote TPU (axon) PJRT
plugin that overrides the JAX_PLATFORMS env var, so the CPU platform must
be forced through jax.config AFTER importing jax."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: scan/while-heavy MCMC programs take a while
# to compile; cache them across pytest invocations.
jax.config.update("jax_compilation_cache_dir", "/tmp/amt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
