"""Test harness: force CPU platform with 8 virtual devices so multi-chip
sharding paths compile and run without TPU hardware."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (import after env setup)

# the axon sitecustomize force-registers the TPU platform; override it here
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
