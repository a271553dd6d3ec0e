"""Test configuration: force JAX onto 8 virtual CPU devices so multi-chip
sharding paths are exercised without TPU hardware.

Note: the environment's sitecustomize pins JAX_PLATFORMS to the TPU plugin,
so the env var alone is not enough — we must override via jax.config after
import."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
