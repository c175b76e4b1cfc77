"""Declarative filter specification.

This replaces the reference's entire build-time layer (sympy symbolic models +
gen_code C emission + SCons compilation, rednose/helpers/ekf_sym.py:29-217):
a filter is specified as pure jax-traceable Python functions, Jacobians are
derived by jax.jacfwd at trace time, and XLA compilation replaces the C
compiler. ESKF error-state machinery (err/inv_err/H_mod, eskf_params in
ekf_sym.py:36-53) and MSCKF augmentation dims (msckf_params, ekf_sym.py:57-73)
are carried as spec fields.

Canonical function signatures (params is an arbitrary pytree of runtime-tunable
values — the TPU-native replacement for the reference's mutable C globals +
set_<var> setters, ekf_sym.py:129-132):

  f(params, x, dt)          -> x_new          state propagation (dim_x,)
  f_err(params, x, dx, dt)  -> dx_new         error-state propagation (dim_err,)
  h(params, x, ea)          -> z_pred         observation model (dz,)
  err(params, x, dx)        -> x_true         error injection (dim_x,)
  inv_err(params, nom, tru) -> dx             error extraction (dim_err,)
  H_mod(params, x)          -> (dim_x, dim_err) ESKF observation-matrix modifier
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Mapping, Sequence

import jax.numpy as jnp

from rednose_tpu.utils.chi2 import chi2_ppf

Array = Any


@dataclasses.dataclass(frozen=True)
class ObservationModel:
  """One observation kind: the TPU-native analog of an obs_eqs entry
  (reference: ekf_sym.py:84-89, one [h_sym, kind, ea_sym] triple)."""

  kind: int
  h: Callable  # h(params, x, ea) -> (dz,)
  dz: int
  # >0 marks an MSCKF feature-track kind whose update nullspace-projects the
  # feature-position error out (reference: He jacobian, ekf_sym.py:86-87).
  ea_dim: int = 0
  # Length of the extra-args vector h() expects. Distinct from ea_dim: the
  # reference's loc_kf pseudorange family passes extra args (sat_pos) to
  # NON-feature kinds (kind not in feature_track_kinds, ekf_sym.py:84-89) —
  # those have ea_len > 0 but ea_dim == 0 (no nullspace projection). Every
  # placeholder an internal path builds for h is sized from ea_len. None
  # defaults to ea_dim (feature kinds consume exactly the projected dims).
  ea_len: int | None = None
  # Mahalanobis outlier gate (reference: maha_test_kinds + baked chi2 threshold,
  # ekf_sym.py:144-152).
  maha_test: bool = False
  maha_thresh: float | None = None

  def __post_init__(self):
    if self.maha_thresh is None:
      # Threshold baked from the *unprojected* observation dim, matching the
      # reference codegen (ekf_sym.py:144 uses h_sym.shape[0]).
      object.__setattr__(self, "maha_thresh", chi2_ppf(0.95, self.dz))
    if self.ea_len is None:
      object.__setattr__(self, "ea_len", self.ea_dim)
    assert self.ea_len >= self.ea_dim, (self.ea_len, self.ea_dim)

  @property
  def is_feature(self) -> bool:
    return self.ea_dim > 0


class ParamsRoutine:
  """Extra routine that takes the LIVE params pytree as its first argument.

  FilterEngine.get_extra_routine partially applies the engine's *current*
  params at every call, so set_global updates reach the routine — matching
  the reference, where generated extra routines read the live C globals
  (ekf_sym.py:109-113, 129-132). Plain callables in extra_routines are
  returned as-is (no params threading)."""

  __slots__ = ("fn",)

  def __init__(self, fn):
    self.fn = fn

  def __call__(self, params, *args):
    return self.fn(params, *args)


def _default_err(params, x, dx):
  del params
  return x + dx


def _default_inv_err(params, nom_x, true_x):
  del params
  return true_x - nom_x


@dataclasses.dataclass(frozen=True, eq=False)  # eq=False: identity hash for jit caching
class FilterSpec:
  """Complete declarative description of one (E|MSC)KF.

  Mirrors the information content of the reference's gen_code signature
  (ekf_sym.py:29-30) plus the EKF_sym constructor dims (ekf_sym.py:221-222),
  but as plain Python the whole spec is static metadata for XLA.
  """

  name: str
  dim_x: int
  dim_err: int
  f: Callable  # f(params, x, dt) -> (dim_x,)
  obs: Mapping[int, ObservationModel]

  # --- ESKF (None => additive error state, identity H_mod; mirrors the
  # defaults built in ekf_sym.py:42-53) ---
  err: Callable = _default_err
  inv_err: Callable = _default_inv_err
  H_mod: Callable | None = None  # H_mod(params, x) -> (dim_x, dim_err)
  f_err: Callable | None = None  # error dynamics; F = d f_err / d dx at dx=0
  quaternion_idxs: Sequence[int] = ()

  # Optional closed-form lane-major state-transition Jacobian:
  # F_lane(params, x_slab (dim_x, *b), dt scalar-or-(*b)) -> (de, de, *b).
  # Per-step jacfwd of rotation-chain dynamics dominates the generic bank
  # predict and the smoother-gain pass (measured ~95% of lane predict for
  # live_kf); a spec that supplies the closed form (the analog of the
  # reference's sympy-derived F, ekf_sym.py:76) lets those paths skip
  # autodiff. Must equal jacfwd exactly — parity-tested for shipped models.
  F_lane: Callable | None = None

  # --- MSCKF sliding-window augmentation (mirrors msckf_params,
  # ekf_sym.py:57-66); defaults = no augmentation ---
  dim_main: int | None = None
  dim_main_err: int | None = None
  dim_augment: int = 0
  dim_augment_err: int = 0
  n_augment: int = 0

  # Default runtime-tunable parameter pytree (replaces reference global_vars).
  default_params: Any = dataclasses.field(default_factory=dict)

  # Named auxiliary jittable functions shipped with the filter (TPU-native
  # analog of gen_code's extra_routines, ekf_sym.py:109-113, exposed at
  # runtime like EKFSym::get_extra_routine, ekf_sym.cc:221-223).
  extra_routines: Mapping[str, Callable] = dataclasses.field(
      default_factory=dict)

  def __post_init__(self):
    if self.dim_main is None:
      object.__setattr__(self, "dim_main", self.dim_x)
    if self.dim_main_err is None:
      object.__setattr__(self, "dim_main_err", self.dim_err)
    assert self.dim_main + self.dim_augment * self.n_augment == self.dim_x
    assert self.dim_main_err + self.dim_augment_err * self.n_augment == self.dim_err
    obs = dict(self.obs)
    object.__setattr__(self, "obs", obs)

  @property
  def is_eskf(self) -> bool:
    return self.H_mod is not None

  @property
  def is_msckf(self) -> bool:
    return self.n_augment > 0

  def F(self, params, x, dt):
    """State-transition Jacobian F(x, dt) = d f_err / d dx |_{dx=0}.

    For ESKF specs this evaluates the error-dynamics Jacobian at zero error —
    the autodiff equivalent of the reference's symbolic
    `f_err_sym.jacobian(x_err_sym)` followed by subs(x_err -> 0)
    (ekf_sym.py:76-80). For additive filters it is plain d f / d x.
    """
    import jax

    if self.f_err is not None:
      # zero seed derived from x, not jnp.zeros: array constants built
      # inside Pallas kernels are rejected ("captured constant"), and this
      # Jacobian is traced in-kernel by ops/pallas_bank.py
      zeros = x[: self.dim_err] * 0.0
      return jax.jacfwd(lambda dx: self.f_err(params, x, dx, dt))(zeros)
    return jax.jacfwd(lambda xx: self.f(params, xx, dt))(x)

  def H(self, kind: int, params, x, ea):
    """Observation Jacobian H = dh/dx (reference: ekf_sym.py:85)."""
    import jax

    return jax.jacfwd(lambda xx: self.obs[kind].h(params, xx, ea))(x)

  def He(self, kind: int, params, x, ea):
    """Feature-position Jacobian He = dh/dea for MSCKF kinds (ekf_sym.py:86-87)."""
    import jax

    return jax.jacfwd(lambda e: self.obs[kind].h(params, x, e))(ea)

  def H_mod_at(self, params, x):
    if self.H_mod is None:
      return jnp.eye(self.dim_x, self.dim_err, dtype=x.dtype)
    return self.H_mod(params, x)
