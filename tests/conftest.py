"""Test configuration: force CPU with 8 virtual devices so sharding tests
run without TPU hardware (SURVEY.md §4).

The dev box's TPU plugin ('axon') overrides the JAX_PLATFORMS env var, so
the platform must be forced via jax.config before the backend initializes.
bench.py uses the real chip; tests never do.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
