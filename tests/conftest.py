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


def _ensure_native_rewind():
  """Build the native _rewind extension in-place if it's missing.

  The native ring is the one C++ component (mirror of the reference's
  ekf_sym.cc:119-156); in a bare checkout the package silently fell back
  to Python and the native-vs-Python parity test skipped. Build it here
  so the parity test always runs; REDNOSE_ALLOW_NO_NATIVE=1 opts out
  (e.g. no C++ toolchain).
  """
  import importlib
  import pathlib
  import subprocess
  import sys

  if os.environ.get("REDNOSE_ALLOW_NO_NATIVE") == "1":
    return
  root = pathlib.Path(__file__).resolve().parents[1]
  ext_dir = root / "rednose_tpu" / "runtime"
  # check by glob, NOT by import: a failed import here would cache
  # rednose_tpu.runtime.rewind with HAVE_NATIVE=False before the build
  if list(ext_dir.glob("_rewind*.so")) or list(ext_dir.glob("_rewind*.pyd")):
    return
  proc = subprocess.run(
      [sys.executable, "setup.py", "build_ext", "--inplace"],
      cwd=root, capture_output=True, text=True)
  importlib.invalidate_caches()
  if not (list(ext_dir.glob("_rewind*.so"))
          or list(ext_dir.glob("_rewind*.pyd"))):
    raise RuntimeError(
        "native _rewind extension is missing and the in-place build failed "
        "(set REDNOSE_ALLOW_NO_NATIVE=1 to run with the Python fallback):\n"
        f"{proc.stdout}\n{proc.stderr}")


_ensure_native_rewind()
