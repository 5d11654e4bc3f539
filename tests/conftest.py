"""Test configuration.

Tests run on the CPU backend with 8 virtual devices so multi-chip sharding
logic is exercised without TPU hardware (SURVEY.md §4: "Multi-host without a
cluster").  The container force-registers the TPU backend via sitecustomize,
so we must both set the env and override jax's platform config before any
device is touched.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
