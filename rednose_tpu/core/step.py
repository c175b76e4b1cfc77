"""Pure-functional EKF predict / update steps.

These are the TPU-native equivalents of the reference's generated C kernels
(rednose/templates/ekf_c.c): `predict` implements ekf_c.c:8-33 semantics
(block main-state covariance propagation with static MSCKF clone blocks,
P += dt*Q) and `update` implements ekf_c.c:38-121 (innovation, optional MSCKF
nullspace projection, ESKF H·H_mod, Mahalanobis soft gate by R inflation,
LU-free small solve, Joseph-form covariance update, error injection).

Everything is a pure function of (x, P, ...) so the same code path serves:
  - the sequential host driver (runtime/driver.py),
  - vmapped filter banks (runtime/bank.py),
  - lax.scan streaming (runtime/scan.py),
  - and the float64 CPU oracle used in tests.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp

from rednose_tpu.core.spec import FilterSpec
from rednose_tpu.ops.quaternion import normalize_slices

Array = Any

# Soft-rejection factor for gated outliers. The reference uses 1.0e16 in the
# production C kernel (ekf_c.c:92) and 10e16 in the Python engine
# (ekf_sym.py:605); we match the C kernel.
MAHA_R_INFLATION = 1.0e16


def _symmetrize(P: Array) -> Array:
  """Covariance conditioning: roundoff asymmetry compounds over sequential
  float32 updates until P goes indefinite and gains explode (the reference
  never hits this because it is float64-only; our TPU production dtype is
  float32). Enforcing symmetry after every covariance-modifying op keeps the
  Joseph form's PSD guarantee effective."""
  return 0.5 * (P + P.T)


def _solve(a: Array, b: Array) -> Array:
  """Small linear solve, closed-form for d <= 3.

  The reference's C kernel LU-solves tiny systems with Eigen (ekf_c.c:101);
  on TPU, batched LU-with-pivoting is catastrophically slow (it serializes on
  the scalar unit), while the adjugate closed form is a handful of fused
  elementwise ops that vmap freely over a bank axis — SURVEY.md §7 step 4.
  Every shipped observation kind has dz <= 3 after projection. Fast path for
  1x1 mirrors ekf_sym.py:14-18.
  """
  d = a.shape[0]
  if d == 1:
    return b / a[0, 0]
  if d == 2:
    det = a[0, 0] * a[1, 1] - a[0, 1] * a[1, 0]
    inv = jnp.stack([
        jnp.stack([a[1, 1], -a[0, 1]]),
        jnp.stack([-a[1, 0], a[0, 0]]),
    ]) / det
    return inv @ b
  if d == 3:
    c00 = a[1, 1] * a[2, 2] - a[1, 2] * a[2, 1]
    c01 = a[1, 2] * a[2, 0] - a[1, 0] * a[2, 2]
    c02 = a[1, 0] * a[2, 1] - a[1, 1] * a[2, 0]
    c10 = a[0, 2] * a[2, 1] - a[0, 1] * a[2, 2]
    c11 = a[0, 0] * a[2, 2] - a[0, 2] * a[2, 0]
    c12 = a[0, 1] * a[2, 0] - a[0, 0] * a[2, 1]
    c20 = a[0, 1] * a[1, 2] - a[0, 2] * a[1, 1]
    c21 = a[0, 2] * a[1, 0] - a[0, 0] * a[1, 2]
    c22 = a[0, 0] * a[1, 1] - a[0, 1] * a[1, 0]
    det = a[0, 0] * c00 + a[0, 1] * c01 + a[0, 2] * c02
    inv = jnp.stack([
        jnp.stack([c00, c10, c20]),
        jnp.stack([c01, c11, c21]),
        jnp.stack([c02, c12, c22]),
    ]) / det
    return inv @ b
  return jnp.linalg.solve(a, b)


def predict(spec: FilterSpec, params, x: Array, P: Array, Q: Array,
            dt: Array, normalize: bool = True):
  """One prediction step: x <- f(x, dt), P <- F P F^T (main block) + dt*Q.

  Mirrors templates/ekf_c.c:8-33: only the top-left dim_main_err block of P
  gets the full F P F^T; rows/cols coupling MSCKF clone states get one-sided
  F multiplication (clone states are static).
  """
  # full-f32 matmuls: TPU's default (bf16-based) matmul precision visibly
  # corrupts covariance propagation; exactness vs the f64 oracle is a
  # framework invariant (tests/test_precision.py).
  with jax.named_scope(f"rednose/{spec.name}/predict"), \
       jax.default_matmul_precision('float32'):
    return _predict_impl(spec, params, x, P, Q, dt, normalize)


def _predict_impl(spec, params, x, P, Q, dt, normalize):
  x_new = spec.f(params, x, dt)
  F = spec.F(params, x, dt)
  m = spec.dim_main_err
  if m == spec.dim_err:
    P_new = F @ P @ F.T
  else:
    Fm = F[:m, :m]
    # Promote before the scatters: writing an f64 product into an f32 P is
    # an unsafe-cast scatter (a FutureWarning today, an error in future JAX).
    P_new = P.astype(jnp.result_type(P.dtype, Fm.dtype))
    P_new = P_new.at[:m, :m].set(Fm @ P[:m, :m] @ Fm.T)
    P_new = P_new.at[:m, m:].set(Fm @ P[:m, m:])
    P_new = P_new.at[m:, :m].set(P[m:, :m] @ Fm.T)
  P_new = _symmetrize(P_new + dt * Q)
  if normalize:
    x_new = normalize_slices(x_new, spec.quaternion_idxs)
  return x_new, P_new


def update(spec: FilterSpec, kind: int, params, x: Array, P: Array,
           z: Array, R: Array, ea: Array, normalize: bool = True):
  """One measurement update. Returns (x, P, y) with y the (projected) innovation.

  Mirrors templates/ekf_c.c:38-121. All shapes are static: dz and ea_dim come
  from the ObservationModel, and the MSCKF nullspace has static dimension
  dz - ea_dim via complete QR (the reference's dynamic-dimension nullspace
  failure branch, ekf_sym.py:588-591, cannot occur here).
  """
  with jax.named_scope(f"rednose/{spec.name}/update_{kind}"), \
       jax.default_matmul_precision('float32'):
    return _update_impl(spec, kind, params, x, P, z, R, ea, normalize)


def _update_impl(spec, kind, params, x, P, z, R, ea, normalize):
  om = spec.obs[kind]
  h = om.h(params, x, ea)
  H = spec.H(kind, params, x, ea)
  y = z - h

  if om.is_feature:
    # MSCKF: project the feature-position error out of the update
    # (ekf_c.c:66-77). A is an orthonormal basis of the left null space of
    # He; any full-rank basis yields the identical filter update, so QR
    # replaces the reference's LU kernel for stability.
    He = spec.He(kind, params, x, ea)  # (dz, ea_dim)
    q_full, _ = jnp.linalg.qr(He, mode="complete")  # (dz, dz)
    A = q_full[:, om.ea_dim:]  # (dz, dz - ea_dim)
    y = A.T @ y
    H = A.T @ H
    R = A.T @ R @ A

  if spec.is_eskf:
    H = H @ spec.H_mod_at(params, x)  # (dz', dim_err), ekf_c.c:83-85

  S = H @ P @ H.T + R
  K = _solve(S, H @ P.T).T  # (dim_err, dz'), ekf_c.c:100-101

  if om.maha_test:
    # Outlier rejection when the Mahalanobis distance of the innovation
    # exceeds the baked chi2 threshold (ekf_c.c:88-94). The reference
    # soft-rejects by inflating R by 1e16; zeroing the gain is that
    # inflation's exact R->inf limit (K->0, P unchanged) and — unlike the
    # inflation — cannot overflow the float32 closed-form solves
    # (1e16*R makes adjugate cofactor products exceed f32 max).
    maha_dist = y @ _solve(S, y)
    K = jnp.where(maha_dist > om.maha_thresh, 0.0, K)
  I_KH = jnp.eye(spec.dim_err, dtype=P.dtype) - K @ H
  dx = K @ y
  x_new = spec.err(params, x, dx)  # error injection, ekf_c.c:108-112
  P_new = _symmetrize(I_KH @ P @ I_KH.T + K @ R @ K.T)  # Joseph, ekf_c.c:115
  if normalize:
    x_new = normalize_slices(x_new, spec.quaternion_idxs)
  return x_new, P_new, y


def update_batch(spec: FilterSpec, kind: int, params, x: Array, P: Array,
                 z: Array, R: Array, ea: Array, valid: Array | None = None):
  """Apply n measurements of one kind sequentially (reference:
  ekf_sym.py:513-522 loop). n is static; the loop unrolls at trace time.

  `valid` (n,) bool marks real rows; rows with valid[i]=False leave (x, P)
  bit-exactly unchanged. This lets the host driver pad a variable-length
  measurement batch to a fixed bucket size so one compiled program serves
  every n in the bucket (the reference's C path handles any n with one
  binary, ekf_sym.cc:158-184)."""
  n = z.shape[0]
  ys = []
  for i in range(n):
    x_new, P_new, y = update(spec, kind, params, x, P, z[i], R[i], ea[i])
    if valid is None:
      x, P = x_new, P_new
    else:
      x = jnp.where(valid[i], x_new, x)
      P = jnp.where(valid[i], P_new, P)
    ys.append(y)
  return x, P, jnp.stack(ys) if ys else jnp.zeros((0,), dtype=x.dtype)


def predict_and_update_batch(spec: FilterSpec, kind: int, params,
                             x: Array, P: Array, Q: Array, dt: Array,
                             z: Array, R: Array, ea: Array,
                             valid: Array | None = None):
  """Fused predict + batched update: the hot path (reference:
  ekf_sym.py:484-531 / ekf_sym.cc:158-184).

  Returns (x_pred, P_pred, x_post, P_post, y) — the device-side portion of
  the reference's 9-tuple Estimate.
  """
  x_pred, P_pred = predict(spec, params, x, P, Q, dt)
  x_post, P_post, y = update_batch(spec, kind, params, x_pred, P_pred, z, R,
                                   ea, valid)
  return x_pred, P_pred, x_post, P_post, y


def maha_test(spec: FilterSpec, kind: int, params, x: Array, P: Array,
              z: Array, R: Array, ea: Array, maha_thresh: float = 0.95):
  """Standalone Mahalanobis acceptance test (reference: ekf_sym.py:626-649).

  Returns a traced boolean: True when the measurement is NOT an outlier.
  """
  from rednose_tpu.utils.chi2 import chi2_ppf

  om = spec.obs[kind]
  h = om.h(params, x, ea)
  H = spec.H(kind, params, x, ea)
  y = z - h
  if spec.is_eskf:
    H = H @ spec.H_mod_at(params, x)
  S = H @ P @ H.T + R
  maha_dist = y @ _solve(S, y)
  return maha_dist <= chi2_ppf(maha_thresh, om.dz)


def augment(spec: FilterSpec, x: Array, P: Array):
  """MSCKF state augmentation: clone the current pose into the newest slot of
  the sliding window, dropping the oldest (reference: ekf_sym.py:365-391).

  All slicing is static, so this jits into pure data movement.
  """
  assert spec.is_msckf
  d1, d2 = spec.dim_main, spec.dim_main_err
  d3, d4 = spec.dim_augment, spec.dim_augment_err

  # Shift the augment window left and clone the current pose into the last slot.
  x_new = jnp.concatenate([x[:d1], x[d1 + d3:], x[:d3]])

  # Covariance: delete the oldest augment block's rows/cols, then re-inject
  # the main-state pose covariance into the newest slot via the projection
  # to_mult (ekf_sym.py:381-388).
  keep = jnp.concatenate([jnp.arange(d2), jnp.arange(d2 + d4, spec.dim_err)])
  P_reduced = P[jnp.ix_(keep, keep)]
  to_mult = jnp.zeros((spec.dim_err, spec.dim_err - d4), dtype=P.dtype)
  to_mult = to_mult.at[:-d4, :].set(jnp.eye(spec.dim_err - d4, dtype=P.dtype))
  to_mult = to_mult.at[-d4:, :d4].set(jnp.eye(d4, dtype=P.dtype))
  P_new = _symmetrize(to_mult @ P_reduced @ to_mult.T)
  return x_new, P_new


@functools.lru_cache(maxsize=None)
def jit_predict(spec: FilterSpec):
  return jax.jit(functools.partial(predict, spec))


@functools.lru_cache(maxsize=None)
def jit_predict_and_update_batch(spec: FilterSpec, kind: int):
  return jax.jit(functools.partial(predict_and_update_batch, spec, kind))


@functools.lru_cache(maxsize=None)
def jit_augment(spec: FilterSpec):
  return jax.jit(functools.partial(augment, spec))
