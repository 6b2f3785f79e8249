"""Test configuration: force JAX onto a virtual 8-device CPU mesh so all
sharding/collective logic is exercised without TPU hardware (SURVEY.md §4c).

The container's sitecustomize imports jax and pins JAX_PLATFORMS=axon (the
real-TPU tunnel) before pytest loads this file, so plain env mutation is
too late — we must update jax.config before any backend initializes."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
