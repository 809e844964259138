"""Test harness: run everything on a virtual 8-device CPU mesh.

The reference validates distributed code only on real GPU clusters; here we use
JAX's host-platform device multiplexing as a deterministic fake backend
(SURVEY.md §4), so every sharding/collective path is exercised in CI.
"""

import os

# The session's sitecustomize imports jax at interpreter start with
# JAX_PLATFORMS=axon (the real-TPU tunnel), so env vars set here are too late
# for jax's import-time default — override via jax.config instead. XLA_FLAGS is
# still read lazily at backend init, which hasn't happened yet.
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
