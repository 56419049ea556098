"""Test configuration: force CPU backend with 8 virtual devices.

Multi-chip sharding tests run on a virtual CPU mesh
(xla_force_host_platform_device_count), per the TPU-less CI contract.
Must run before jax initializes a backend.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
