"""Drop-in migration surface for reference (commaai/rednose) users.

The reference workflow is: define the filter symbolically, call
`gen_code(generated_dir, name, ...)` at build time to emit + compile C
(rednose/helpers/ekf_sym.py:29-217), then construct
`EKF_sym(folder, name, Q, x0, P0, ...)` (ekf_sym.py:221) or its Cython twin
`EKF_sym_pyx` (ekf_sym_pyx.pyx:85-111) against the generated library.

This module keeps both call sites working verbatim with zero generated
artifacts: `gen_code` lowers the same symbolic inputs to a jnp FilterSpec
(frontend/sympy_spec.py) and caches it in-process under `name`;
`EKF_sym` / `EKF_sym_pyx` look the spec up and run it on the TPU-native
engine (runtime/driver.FilterEngine), which implements the reference
engine's full public surface (init_state, predict, predict_and_update_batch
with rewind/replay, augment, maha_test, rts_smooth, set_global, ...).

A reference filter class ports by changing only its imports:

    from rednose_tpu.compat import gen_code, EKF_sym_pyx
    from rednose_tpu.models.kalman_filter import KalmanFilter

`generated_dir` is accepted and ignored everywhere (there is nothing to
generate); `generate_code` + `__init__` can run in the same process in any
order as long as gen_code runs first.
"""

from __future__ import annotations

import logging

import numpy as np

from rednose_tpu.core.spec import FilterSpec
from rednose_tpu.frontend.sympy_spec import spec_from_sympy
from rednose_tpu.runtime.driver import FilterEngine, KalmanError  # noqa: F401

# name -> spec built by gen_code in this process (the analog of the on-disk
# generated/lib{name}.so the reference's EKF_sym dlopens)
_GENERATED: dict[str, FilterSpec] = {}


def gen_code(folder, name, f_sym, dt_sym, x_sym, obs_eqs, dim_x, dim_err,
             eskf_params=None, msckf_params=None, maha_test_kinds=(),
             quaternion_idxs=(), global_vars=None, extra_routines=()):
  """Reference gen_code signature (ekf_sym.py:29-30); `folder` ignored.

  Returns the FilterSpec (and caches it for EKF_sym construction)."""
  del folder
  spec = spec_from_sympy(
      name, f_sym, dt_sym, x_sym, obs_eqs, dim_x, dim_err,
      eskf_params=eskf_params, msckf_params=msckf_params,
      maha_test_kinds=tuple(maha_test_kinds),
      quaternion_idxs=tuple(quaternion_idxs),
      global_vars=global_vars, extra_routines=tuple(extra_routines))
  _GENERATED[name] = spec
  return spec


def generated_spec(name: str) -> FilterSpec:
  """Fetch a spec built by gen_code (the compat analog of ekf_lookup)."""
  if name not in _GENERATED:
    raise KeyError(
        f"no generated filter {name!r}: call compat.gen_code (the filter "
        f"class's generate_code) in this process first; "
        f"generated: {sorted(_GENERATED)}")
  return _GENERATED[name]


class EKF_sym(FilterEngine):
  """Reference EKF_sym constructor signature (ekf_sym.py:221-222) on the
  TPU-native engine. maha_test_kinds / quaternion_idxs / global_vars are
  baked into the spec by gen_code (as in the reference's generated C) and
  accepted here only for signature compatibility."""

  def __init__(self, folder, name, Q, x_initial, P_initial, dim_main,
               dim_main_err, N=0, dim_augment=0, dim_augment_err=0,
               maha_test_kinds=(), quaternion_idxs=(), global_vars=None,
               max_rewind_age: float = 1.0, logger=logging):
    del folder, maha_test_kinds, quaternion_idxs, global_vars
    spec = generated_spec(name)
    x_initial = np.asarray(x_initial).reshape(-1)
    # the reference ctor's dim assertions (ekf_sym.py:234-239)
    assert dim_main + dim_augment * N == x_initial.shape[0] == spec.dim_x
    assert dim_main_err + dim_augment_err * N == np.asarray(
        P_initial).shape[0] == spec.dim_err
    assert (spec.dim_main, spec.dim_augment, spec.n_augment) == \
        (dim_main, dim_augment, N)
    super().__init__(spec, Q, x_initial, P_initial,
                     max_rewind_age=max_rewind_age, logger=logger)

  # host-side quaternion renorm helpers (reference: ekf_sym.py:405-410)
  def normalize_slice(self, slice_start, slice_end_ex):
    import jax.numpy as jnp

    q = self.x[slice_start:slice_end_ex]
    self.x = self.x.at[slice_start:slice_end_ex].set(
        q / jnp.linalg.norm(q))

  def normalize_quaternions(self):
    for idx in self.spec.quaternion_idxs:
      self.normalize_slice(idx, idx + 4)


# The Cython engine's Python-visible class (ekf_sym_pyx.pyx:85): identical
# construction surface, so reference call sites need only the import change.
EKF_sym_pyx = EKF_sym
