"""Sequential streaming filter engine with out-of-order observation handling.

TPU-native equivalent of both reference runtime engines (the Python EKF_sym,
rednose/helpers/ekf_sym.py:220-690, and the C++ EKFSym,
rednose/helpers/ekf_sym.{h,cc}): a single host-side class orchestrates time
bookkeeping, the rewind/replay checkpoint ring, and MSCKF augmentation, while
every numeric step dispatches into jit-compiled XLA kernels from core/step.py.

Like the reference, rewinding is inherently data-dependent (how far back we go
depends on the observation timestamp), so the timeline logic lives on the host
— exactly where the reference keeps it (ekf_sym.cc:83-156) — and only the
dense predict/update math runs on device. Device state (x, P) is immutable, so
checkpoints are free references rather than the reference's np.copy snapshots
(ekf_sym.py:443).
"""

from __future__ import annotations

import logging
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from rednose_tpu.core import step as step_ops
from rednose_tpu.core.spec import FilterSpec
from rednose_tpu.ops.quaternion import normalize_slices
from rednose_tpu.runtime.rewind import REWIND_TO_KEEP, RewindRing


class KalmanError(Exception):
  """Filter divergence (mirrors rednose/helpers/__init__.py:34)."""


class Estimate(tuple):
  """9-tuple estimate (xk_km1, xk_k, Pk_km1, Pk_k, t, kind, y, z, extra_args),
  mirroring the reference's return (ekf_sym.py:531, ekf_sym.h:32-42)."""
  __slots__ = ()


class FilterEngine:
  """Drop-in functional equivalent of the reference's EKF_sym / EKFSym."""

  def __init__(self, spec: FilterSpec, Q, x_initial, P_initial,
               params=None, max_rewind_age: float = 1.0, logger=logging,
               dtype=None):
    self.spec = spec
    self.logger = logger
    self.max_rewind_age = max_rewind_age
    self.dtype = dtype or jnp.zeros(0).dtype  # default jax dtype (x64 aware)

    x_initial = np.asarray(x_initial).reshape(-1)
    assert x_initial.shape[0] == spec.dim_x
    assert np.asarray(P_initial).shape == (spec.dim_err, spec.dim_err)
    assert np.asarray(Q).shape == (spec.dim_err, spec.dim_err)

    self.Q = jnp.asarray(Q, dtype=self.dtype)
    self.params = params if params is not None else dict(spec.default_params)

    # rewind checkpoint ring: native C++ when built, Python otherwise
    # (runtime/rewind.py). Device arrays are immutable, so checkpoints hold
    # references rather than the reference's np.copy snapshots.
    self.ring = RewindRing(REWIND_TO_KEEP)

    self.init_state(x_initial, P_initial, None)

  # ------------------------------------------------------------------ state

  def init_state(self, state, covs, filter_time):
    """Re-seed the filter (reference: ekf_sym.py:351-358) — used by callers
    for warm-starts / resume."""
    self.x = jnp.asarray(np.asarray(state).reshape(-1), dtype=self.dtype)
    self.P = jnp.asarray(covs, dtype=self.dtype)
    self.filter_time = filter_time
    self.augment_times = [0.0] * self.spec.n_augment
    self.reset_rewind()

  def reset_rewind(self):
    self.ring.clear()

  def state(self):
    return np.asarray(jax.device_get(self.x)).flatten()

  def covs(self):
    return np.asarray(jax.device_get(self.P))

  def get_filter_time(self):
    return self.filter_time

  def set_filter_time(self, t):
    self.filter_time = t

  def get_augment_times(self):
    return self.augment_times

  def normalize_quaternions(self):
    """Renormalize every quaternion block of the nominal state
    (reference: ekf_sym.py:405-407). Delegates to the one implementation
    of the renormalization contract (ops/quaternion.normalize_slices)."""
    self.x = normalize_slices(self.x, self.spec.quaternion_idxs)

  def normalize_slice(self, slice_start, slice_end_ex):
    """Unit-normalize x[slice_start:slice_end_ex] (ekf_sym.py:409-410)."""
    seg = self.x[slice_start:slice_end_ex]
    self.x = self.x.at[slice_start:slice_end_ex].set(
        seg / jnp.linalg.norm(seg))

  def get_extra_routine(self, name):
    """Fetch a spec-shipped auxiliary function, jitted (reference:
    EKFSym::get_extra_routine, ekf_sym.cc:221-223). ParamsRoutine-wrapped
    routines receive the engine's params as they are at each CALL — so
    set_global updates reach them, like the reference's generated routines
    reading the live C globals."""
    if name not in self.spec.extra_routines:
      raise KeyError(
          f"no extra routine {name!r}; available: "
          f"{sorted(self.spec.extra_routines)}")
    fn = self.spec.extra_routines[name]
    from rednose_tpu.core.spec import ParamsRoutine

    if isinstance(fn, ParamsRoutine):
      jitted = jax.jit(fn.fn)
      return lambda *args: jitted(self.params, *args)
    return jax.jit(fn)

  def set_global(self, name, val):
    """Runtime-tunable parameter update (replaces the reference's C-global
    set_<var> setters, ekf_sym.py:415-416). Params are traced arguments, so
    this never triggers recompilation. Requires mapping-style params; for
    other pytrees assign engine.params directly."""
    import collections.abc

    if not isinstance(self.params, collections.abc.Mapping):
      raise TypeError(
          f"set_global needs mapping params, got {type(self.params).__name__};"
          " assign engine.params directly for non-mapping pytrees")
    self.params = dict(self.params)
    self.params[name] = val

  # ------------------------------------------------------------------ rewind

  def rewind(self, t):
    """Roll state back to just before t; return observations to replay
    (reference: ekf_sym.py:418-438)."""
    t_restore, state, replay = self.ring.rewind(t)
    self.filter_time = t_restore
    self.x, self.P = state
    return replay

  def checkpoint(self, obs):
    self.ring.checkpoint(self.filter_time, (self.x, self.P), obs)

  # ------------------------------------------------------------------- steps

  def predict(self, t):
    """Advance to time t with no measurement (reference: ekf_sym.py:452-462)."""
    if self.filter_time is None:
      self.filter_time = t
    dt = t - self.filter_time
    assert dt >= 0
    fn = step_ops.jit_predict(self.spec)
    self.x, self.P = fn(self.params, self.x, self.P, self.Q,
                        jnp.asarray(dt, dtype=self.dtype))
    self.filter_time = t

  def predict_and_update_batch(self, t, kind, z, R, extra_args=None,
                               augment=False):
    """Out-of-order-safe predict + batched update (reference:
    ekf_sym.py:464-482): too-old observations are rejected, in-window late
    observations trigger rewind + replay."""
    if self.filter_time is not None and t < self.filter_time:
      if not self.ring.can_rewind(t, self.max_rewind_age):
        self.logger.error(
            f"observation too old at {t:.3f} with filter at "
            f"{self.filter_time:.3f}, ignoring")
        return None
      replay = self.rewind(t)
    else:
      replay = []

    ret = self._predict_and_update_batch(t, kind, z, R, extra_args, augment)
    for r in replay:
      self._predict_and_update_batch(*r)
    return ret

  def _predict_and_update_batch(self, t, kind, z, R, extra_args, augment=False):
    z = np.asarray(z, dtype=np.float64).reshape(-1, self.spec.obs[kind].dz)
    R = np.asarray(R, dtype=np.float64).reshape(
        -1, self.spec.obs[kind].dz, self.spec.obs[kind].dz)
    n = z.shape[0]
    assert R.shape[0] == n and z.shape[1] == R.shape[1] == R.shape[2]
    om = self.spec.obs[kind]
    ea_dim = max(om.ea_len, 1)  # keep a dummy lane so shapes stay static
    if extra_args is None or (hasattr(extra_args, "__len__") and len(extra_args) == 0):
      ea = np.zeros((n, ea_dim))
    else:
      ea = np.asarray(extra_args, dtype=np.float64).reshape(n, -1)

    if self.filter_time is None:
      self.filter_time = t
    dt = t - self.filter_time
    assert dt >= 0

    # Bucket n to the next power of two with masked (bit-exact no-op) pad
    # rows, so one compiled program serves every n in the bucket — a camera
    # feeding variable track counts would otherwise thrash the jit cache
    # (the reference's C path handles any n with one binary).
    z_real, R_real = z, R  # unpadded views: checkpointed for replay
    valid = None
    if n:
      bucket = 1 << (n - 1).bit_length()
      if bucket > n:
        pad = bucket - n
        dz = z.shape[1]
        z = np.concatenate([z, np.zeros((pad, dz))])
        R = np.concatenate([R, np.tile(np.eye(dz)[None], (pad, 1, 1))])
        ea = np.concatenate([ea, np.zeros((pad, ea.shape[1]))])
      valid = jnp.asarray(np.arange(bucket) < n)

    fn = step_ops.jit_predict_and_update_batch(self.spec, kind)
    x_pred, P_pred, x_post, P_post, y = fn(
        self.params, self.x, self.P, self.Q,
        jnp.asarray(dt, dtype=self.dtype),
        jnp.asarray(z, dtype=self.dtype),
        jnp.asarray(R, dtype=self.dtype),
        jnp.asarray(ea, dtype=self.dtype),
        valid)
    self.x, self.P = x_post, P_post
    self.filter_time = t

    if augment:
      self.augment()

    self.checkpoint((t, kind, z_real, R_real, extra_args))
    # Estimate fields stay as device arrays: no host sync on the hot path
    # (device->host transfers are the dominant cost when the device is a
    # remote TPU). Callers index/np.asarray lazily. y is the stacked
    # (n, dz') innovation array with pad rows sliced off.
    return Estimate((x_pred, x_post, P_pred, P_post,
                     t, kind, y[:n], z_real, extra_args))

  def augment(self):
    """MSCKF pose-window augmentation (reference: ekf_sym.py:365-391)."""
    assert self.spec.is_msckf
    fn = step_ops.jit_augment(self.spec)
    self.x, self.P = fn(self.x, self.P)
    self.augment_times = self.augment_times[1:] + [self.filter_time]

  def maha_test(self, x, P, kind, z, R, extra_args=None, maha_thresh=0.95):
    """Standalone outlier test (reference: ekf_sym.py:626-649)."""
    om = self.spec.obs[kind]
    ea_dim = max(om.ea_len, 1)
    ea = (np.zeros(ea_dim) if extra_args is None or len(extra_args) == 0
          else np.asarray(extra_args))
    ok = step_ops.maha_test(
        self.spec, kind, self.params,
        jnp.asarray(np.asarray(x).reshape(-1), dtype=self.dtype),
        jnp.asarray(P, dtype=self.dtype),
        jnp.asarray(np.asarray(z).reshape(-1), dtype=self.dtype),
        jnp.asarray(R, dtype=self.dtype),
        jnp.asarray(ea, dtype=self.dtype),
        maha_thresh=maha_thresh)
    return bool(ok)

  def rts_smooth(self, estimates, norm_quats=False, parallel=False,
                 refine=None, reference_seed=False):
    """Offline RTS smoothing of a list of Estimates (reference:
    ekf_sym.py:651-690). Delegates to the smoothing module; `parallel=True`
    selects the associative-scan parallel-in-time formulation (`refine`:
    Newton re-linearization passes for ESKF specs, see
    smoothing/rts.rts_smooth_parallel). `reference_seed=True` (sequential
    only) reproduces the reference's last-predicted-state boundary condition
    for migration-exact tails (see smoothing/rts.rts_smooth)."""
    from rednose_tpu.smoothing.rts import smooth_estimates

    return smooth_estimates(self.spec, self.params, estimates,
                            norm_quats=norm_quats, parallel=parallel,
                            dtype=self.dtype, refine=refine,
                            reference_seed=reference_seed)
