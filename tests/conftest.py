"""Test harness: force an 8-device virtual CPU mesh.

Mirrors the multi-chip simulation strategy from SURVEY.md §4: tests validate
sharding/collective behavior without TPU hardware.

Note: in some environments JAX is pre-imported (and a TPU plugin registered)
by a sitecustomize hook before pytest starts, so setting JAX_PLATFORMS via
os.environ here is too late — we must override through jax.config instead.
XLA_FLAGS still takes effect because the CPU backend has not been initialized
yet at conftest-import time.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
