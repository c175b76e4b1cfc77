"""`rednose_tpu.helpers` mirror package: import paths + formula agreement.

Reference filters migrate with the one-token rename `rednose.` ->
`rednose_tpu.` (live_kf.py:5-12 imports); every symbolic builder must agree
with its jnp twin in ops/quaternion.py (the framework's single source of
truth for rotation math)."""

import numpy as np
import sympy as sp

import jax.numpy as jnp

from rednose_tpu.helpers import KalmanError
from rednose_tpu.helpers import sympy_helpers as sh
from rednose_tpu.ops import quaternion as q_ops


def test_import_surface():
  """The reference's import lines work after the package rename."""
  from rednose_tpu.helpers.kalmanfilter import KalmanFilter
  from rednose_tpu.helpers.ekf_sym import gen_code, EKF_sym
  from rednose_tpu.helpers.ekf_sym_pyx import EKF_sym_pyx
  from rednose_tpu.helpers.sympy_helpers import (
      euler_rotate, quat_matrix_r, quat_rotate)
  from rednose_tpu.helpers.chi2_lookup import chi2_ppf

  assert issubclass(KalmanError, Exception)
  assert EKF_sym is EKF_sym_pyx or issubclass(EKF_sym_pyx, EKF_sym) or \
      EKF_sym_pyx is EKF_sym
  assert abs(chi2_ppf(0.95, 1) - 3.8414588) < 1e-5
  assert callable(gen_code) and callable(euler_rotate)
  assert callable(quat_matrix_r) and callable(quat_rotate)
  assert KalmanFilter is not None


def _rand_quats(rng, n):
  q = rng.randn(n, 4)
  return q / np.linalg.norm(q, axis=1, keepdims=True)


def test_numeric_helpers_match_jnp():
  rng = np.random.RandomState(0)
  quats = _rand_quats(rng, 5)
  # batch + single shapes, vs the jnp single-item implementation
  R_b = sh.quat2rot(quats)
  assert R_b.shape == (5, 3, 3)
  for i in range(5):
    np.testing.assert_allclose(R_b[i], np.asarray(q_ops.quat_to_rot(quats[i])),
                               rtol=1e-12)
  np.testing.assert_allclose(sh.quat2rot(quats[0]), R_b[0], rtol=1e-12)
  assert sh.rotations_from_quats is sh.quat2rot

  eulers = 0.5 * rng.randn(4, 3)
  Q_b = sh.euler2quat(eulers)
  assert Q_b.shape == (4, 4)
  assert (Q_b[:, 0] >= 0).all()
  for i in range(4):
    np.testing.assert_allclose(Q_b[i], np.asarray(q_ops.euler_to_quat(eulers[i])),
                               rtol=1e-12)
  np.testing.assert_allclose(
      sh.euler2rot(eulers[0]), np.asarray(q_ops.euler_to_rot(eulers[0])),
      rtol=1e-10, atol=1e-12)
  np.testing.assert_allclose(
      sh.rot_matrix(0.1, -0.2, 0.3),
      np.asarray(q_ops.euler_to_rot(np.array([0.1, -0.2, 0.3]))), rtol=1e-12)


def test_symbolic_builders_match_jnp():
  """Every sympy builder, lambdified, equals its ops/quaternion twin."""
  rng = np.random.RandomState(1)
  qs = sp.symbols('q0:4')
  v = sp.symbols('v0:3')
  e = sp.symbols('e0:3')

  lam_rot = sp.lambdify(qs, sh.quat_rotate(*qs), 'numpy')
  lam_cross = sp.lambdify(v, sh.cross(v), 'numpy')
  lam_euler = sp.lambdify(e, sh.euler_rotate(*e), 'numpy')
  lam_ml = sp.lambdify(qs, sh.quat_matrix_l(qs), 'numpy')
  lam_mr = sp.lambdify(qs, sh.quat_matrix_r(qs), 'numpy')

  for _ in range(3):
    quat = _rand_quats(rng, 1)[0]
    vec = rng.randn(3)
    eul = 0.5 * rng.randn(3)
    np.testing.assert_allclose(lam_rot(*quat),
                               np.asarray(q_ops.quat_to_rot(quat)), rtol=1e-12)
    np.testing.assert_allclose(lam_cross(*vec), np.asarray(q_ops.skew(vec)),
                               rtol=1e-12)
    np.testing.assert_allclose(lam_euler(*eul),
                               np.asarray(q_ops.euler_to_rot(eul)),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(lam_ml(*quat),
                               np.asarray(q_ops.quat_matrix_l(quat)),
                               rtol=1e-12)
    np.testing.assert_allclose(lam_mr(*quat),
                               np.asarray(q_ops.quat_matrix_r(quat)),
                               rtol=1e-12)

  # rot_to_euler inverts euler_rotate (principal range)
  eul = np.array([0.3, -0.4, 0.5])
  R = sp.Matrix(np.asarray(q_ops.euler_to_rot(eul)))
  rec = np.array(sh.rot_to_euler(R), dtype=np.float64).ravel()
  np.testing.assert_allclose(rec, eul, rtol=1e-8)


def test_reference_style_eskf_through_helper_imports():
  """A miniature quaternion ESKF written exactly the reference way — model
  built from helpers.sympy_helpers, generated via helpers.ekf_sym.gen_code,
  run via helpers.ekf_sym_pyx.EKF_sym_pyx — converges on an attitude
  observation stream."""
  from rednose_tpu.helpers.ekf_sym import gen_code
  from rednose_tpu.helpers.ekf_sym_pyx import EKF_sym_pyx
  from rednose_tpu.helpers.sympy_helpers import euler_rotate, quat_matrix_r

  dim_x, dim_err = 4, 3  # quaternion nominal state, euler error state
  xs = sp.symbols('ax0:4')
  x = sp.Matrix(xs)
  dt = sp.Symbol('dt')
  f_sym = sp.Matrix(xs)  # static attitude

  dxs = sp.symbols('adx0:3')
  dx = sp.Matrix(dxs)
  f_err_sym = dx  # static error dynamics

  nom = sp.symbols('anom0:4')
  delta = sp.symbols('adelta0:3')
  true = sp.symbols('atrue0:4')
  delta_quat = sp.Matrix([sp.Integer(1), delta[0] / 2, delta[1] / 2,
                          delta[2] / 2])
  err_expr = quat_matrix_r(nom) * delta_quat
  inv_expr = 2 * (quat_matrix_r(nom).T * sp.Matrix(true))[1:, 0]
  H_mod = sp.Rational(1, 2) * quat_matrix_r(xs)[:, 1:]

  # observe the body-frame directions of two known reference vectors
  # (one leaves yaw unobservable — the accel+mag classic)
  Rt = sh.quat_rotate(*xs).T
  h_sym = sp.Matrix.vstack(Rt * sp.Matrix([0, 0, 1]),
                           Rt * sp.Matrix([1, 0, 0]))
  obs_eqs = [[h_sym, 1, None]]
  eskf = ([err_expr, nom, delta], [sp.Matrix(inv_expr), nom, true], H_mod,
          f_err_sym, dxs)
  gen_code(None, 'mini_eskf', f_sym, dt, xs, obs_eqs, dim_x, dim_err,
           eskf_params=eskf, quaternion_idxs=[0])

  import numpy as np

  from rednose_tpu.ops.quaternion import euler_to_quat, quat_to_rot

  q_true = np.asarray(euler_to_quat(np.array([0.2, -0.1, 0.3])))
  RT = np.asarray(quat_to_rot(q_true)).T
  z_true = np.concatenate([RT @ np.array([0.0, 0.0, 1.0]),
                           RT @ np.array([1.0, 0.0, 0.0])])

  kf = EKF_sym_pyx(None, 'mini_eskf', np.eye(3) * 1e-4,
                   np.array([1.0, 0.0, 0.0, 0.0]), np.eye(3) * 0.5, 4, 3)
  rng = np.random.RandomState(0)
  for i in range(60):
    z = z_true + 0.01 * rng.randn(6)
    kf.predict_and_update_batch(0.01 * (i + 1), 1, [z],
                                np.eye(6)[None] * 1e-4)
  q_est = kf.state()
  # quaternion sign-invariant agreement
  dot = abs(float(np.dot(q_est, q_true)))
  assert dot > 0.9999, (q_est, q_true, dot)
