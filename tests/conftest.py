"""Test environment: CPU backend with 8 virtual devices (distributed tests
without a cluster) and x64 enabled (oracle comparisons in f64)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize prepends its TPU platform; tests run on host CPU.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
