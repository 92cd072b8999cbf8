"""Test configuration: run everything on an 8-device virtual CPU mesh.

The axon sitecustomize pins JAX_PLATFORMS=axon (single real TPU chip via a
tunnel); tests instead use the CPU backend with 8 virtual devices so sharding
and collectives are exercised without TPU hardware (SURVEY.md §4).
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

# Most suite wall-time is XLA compilation; persist it across runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/ilqr_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
