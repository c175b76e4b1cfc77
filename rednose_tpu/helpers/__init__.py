"""`rednose.helpers` import-path mirror.

Reference filters import from `rednose.helpers.*` (e.g. live_kf.py:5-12);
this package keeps those paths working under a one-token rename
(`rednose.` -> `rednose_tpu.`): kalmanfilter / ekf_sym / ekf_sym_pyx /
sympy_helpers / chi2_lookup submodules plus KalmanError here. The
reference's `load_code`/`write_code` (cffi + generated-C file IO,
rednose/helpers/__init__.py:5-31) have no meaning without codegen
artifacts and are intentionally absent — gen_code returns a live spec
instead.
"""

from rednose_tpu.runtime.driver import KalmanError  # noqa: F401
