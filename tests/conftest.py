"""Test configuration: force an 8-device virtual CPU mesh.

The container's sitecustomize registers the remote-TPU ("axon") PJRT
backend and programmatically selects it, overriding `JAX_PLATFORMS` from
the environment — so we must override back via `jax.config` after import.
Multi-chip sharding is validated on virtual CPU devices
(`--xla_force_host_platform_device_count=8`), mirroring how the driver
dry-runs the multi-chip path.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.devices()[0].platform == "cpu", jax.devices()
