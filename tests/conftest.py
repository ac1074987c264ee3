"""Test configuration: run JAX on 8 virtual CPU devices.

Multi-chip sharding paths are exercised on a fake CPU mesh (the standard JAX
trick; the reference never needed this because it has no cross-host
communication — SURVEY §4). x64 is enabled so the physics engine can be
validated against the MuJoCo C oracle at f64 precision.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
  os.environ["XLA_FLAGS"] = (
      flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# NOTE: the env-var JAX_PLATFORMS is ignored when the axon TPU plugin is
# present; the config call reliably forces CPU.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
