"""Test harness config: run on CPU with 8 virtual devices so sharding tests
exercise a multi-chip mesh without TPU hardware.

Note: the axon TPU plugin force-registers itself and overrides the
JAX_PLATFORMS env var, so we must override back via jax.config after import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
