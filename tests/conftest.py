"""Test configuration: CPU backend with a virtual 8-device mesh + float64.

The reference's CI runs everything single-process on CPU (test.sh:14-20); our
equivalent is the jax CPU backend with x64 enabled so golden values match the
reference's double-precision C kernels. Sharding tests use the virtual
8-device host platform.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
  os.environ["XLA_FLAGS"] = (
      flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment may pre-register a TPU platform and prepend it to
# jax_platforms; tests must run on the host CPU backend, so override the
# config directly (env vars alone are not enough).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
