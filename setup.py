"""Build config for the native runtime extensions.

The C++ pieces are optional accelerators of host-side bookkeeping (the
numeric path is XLA-compiled); if no C++ toolchain is available the package
installs pure-Python and rednose_tpu.runtime.rewind falls back transparently.
"""

from setuptools import Extension, setup
from setuptools.command.build_ext import build_ext


class OptionalBuildExt(build_ext):
  def run(self):
    try:
      super().run()
    except Exception as e:  # noqa: BLE001
      print(f"warning: native extension build skipped: {e}")

  def build_extension(self, ext):
    try:
      super().build_extension(ext)
    except Exception as e:  # noqa: BLE001
      print(f"warning: building {ext.name} failed, using Python fallback: {e}")


setup(
    ext_modules=[
        Extension(
            "rednose_tpu.runtime._rewind",
            sources=["rednose_tpu/runtime/_rewind.cc"],
            language="c++",
            extra_compile_args=["-O2", "-std=c++17"],
        ),
    ],
    cmdclass={"build_ext": OptionalBuildExt},
)
