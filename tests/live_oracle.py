"""Independent numpy+sympy oracle for the live_kf ESKF.

This plays the role of the reference's generated-C engine in test_compare
(examples/test_compare.py): a second, independently-implemented engine that
the jax filter must agree with. Jacobians here come from *symbolic*
differentiation (sympy lambdify), so agreement with the jax filter validates
the jacfwd-derived F/H end to end — the exact dual-implementation pattern
SURVEY.md §4 prescribes.

Test-only code: slow, simple, no jax.
"""

import numpy as np
import sympy as sp

EARTH_GM = 3.986005e14


def _sym_quat_rot(q0, q1, q2, q3):
  """Body->ECEF rotation matrix from a scalar-first quaternion."""
  return sp.Matrix([
      [q0**2 + q1**2 - q2**2 - q3**2, 2 * (q1 * q2 - q0 * q3), 2 * (q1 * q3 + q0 * q2)],
      [2 * (q1 * q2 + q0 * q3), q0**2 - q1**2 + q2**2 - q3**2, 2 * (q2 * q3 - q0 * q1)],
      [2 * (q1 * q3 - q0 * q2), 2 * (q2 * q3 + q0 * q1), q0**2 - q1**2 - q2**2 + q3**2],
  ])


def _sym_euler_rot(roll, pitch, yaw):
  rr = sp.Matrix([[1, 0, 0],
                  [0, sp.cos(roll), -sp.sin(roll)],
                  [0, sp.sin(roll), sp.cos(roll)]])
  rp = sp.Matrix([[sp.cos(pitch), 0, sp.sin(pitch)],
                  [0, 1, 0],
                  [-sp.sin(pitch), 0, sp.cos(pitch)]])
  ry = sp.Matrix([[sp.cos(yaw), -sp.sin(yaw), 0],
                  [sp.sin(yaw), sp.cos(yaw), 0],
                  [0, 0, 1]])
  return ry * rp * rr


def _sym_quat_matrix_r(p):
  return sp.Matrix([[p[0], -p[1], -p[2], -p[3]],
                    [p[1], p[0], p[3], -p[2]],
                    [p[2], -p[3], p[0], p[1]],
                    [p[3], p[2], -p[1], p[0]]])


class SympyLiveOracle:
  """Symbolically-derived live_kf model: f, F, per-kind h/H, H_mod, err/inv_err."""

  def __init__(self):
    xs = sp.symbols('x0:23')
    dxs = sp.symbols('dx0:22')
    dt = sp.Symbol('dt')
    x = sp.Matrix(xs)
    dx = sp.Matrix(dxs)

    p = x[0:3, 0]
    q = x[3:7, 0]
    v = x[7:10, 0]
    omega = x[10:13, 0]
    bias = x[13:16, 0]
    odo_scale = x[16]
    accel = x[17:20, 0]
    imu_off = x[20:23, 0]

    quat_rot = _sym_quat_rot(q[0], q[1], q[2], q[3])

    # nominal dynamics: first-order integrator
    omega_mat = sp.Rational(1, 2) * sp.Matrix([
        [0, -omega[0], -omega[1], -omega[2]],
        [omega[0], 0, omega[2], -omega[1]],
        [omega[1], -omega[2], 0, omega[0]],
        [omega[2], omega[1], -omega[0], 0]])
    x_dot = sp.zeros(23, 1)
    x_dot[0:3, 0] = v
    x_dot[3:7, 0] = omega_mat * q
    x_dot[7:10, 0] = quat_rot * accel
    f = x + dt * x_dot
    self.f = sp.lambdify((xs, dt), list(f), modules='numpy')

    # error dynamics -> F = d f_err / d dx at dx = 0
    err_rot = _sym_euler_rot(dx[3], dx[4], dx[5])
    dx_dot = sp.zeros(22, 1)
    dx_dot[0:3, 0] = dx[6:9, 0]
    dx_dot[3:6, 0] = err_rot * quat_rot * (omega + dx[9:12, 0])
    dx_dot[6:9, 0] = err_rot * quat_rot * (accel + dx[16:19, 0])
    f_err = dx + dt * dx_dot
    F = f_err.jacobian(dx).subs([(d, 0) for d in dxs])
    self.F = sp.lambdify((xs, dt), F, modules='numpy')

    # H_mod
    H_mod = sp.zeros(23, 22)
    H_mod[0:3, 0:3] = sp.eye(3)
    H_mod[3:7, 3:6] = sp.Rational(1, 2) * _sym_quat_matrix_r(q)[:, 1:]
    H_mod[7:, 6:] = sp.eye(16)
    self.H_mod = sp.lambdify((xs,), H_mod, modules='numpy')

    # observation models
    imu_rot = _sym_euler_rot(imu_off[0], imu_off[1], imu_off[2])
    r2 = p[0]**2 + p[1]**2 + p[2]**2
    gravity = quat_rot.T * ((EARTH_GM / r2**sp.Rational(3, 2)) * p)
    hs = {
        'odo_speed': sp.Matrix([sp.sqrt(v[0]**2 + v[1]**2 + v[2]**2) * odo_scale]),
        'gyro': imu_rot * (omega + bias),
        'phone_rot': sp.Matrix(omega),
        'acc': imu_rot * (gravity + accel),
        'pos': sp.Matrix(p),
        'rel_motion': quat_rot.T * sp.Matrix(v),
        'imu_frame': sp.Matrix(imu_off),
    }
    self.h = {}
    self.H = {}
    for name, h_sym in hs.items():
      self.h[name] = sp.lambdify((xs,), list(h_sym), modules='numpy')
      self.H[name] = sp.lambdify((xs,), h_sym.jacobian(x), modules='numpy')

  # numeric err/inv_err (simple enough to write directly)
  @staticmethod
  def err(nom, dx):
    out = np.array(nom, dtype=float)
    out[0:3] += dx[0:3]
    dq = np.concatenate([[1.0], 0.5 * dx[3:6]])
    p = nom[3:7]
    R = np.array([[p[0], -p[1], -p[2], -p[3]],
                  [p[1], p[0], p[3], -p[2]],
                  [p[2], -p[3], p[0], p[1]],
                  [p[3], p[2], -p[1], p[0]]])
    out[3:7] = R @ dq
    out[7:] = nom[7:] + dx[6:]
    return out


class NumpyLiveEKF:
  """Plain-numpy ESKF loop over the sympy oracle model (Joseph form)."""

  def __init__(self, x0, P0, Q):
    self.model = SympyLiveOracle()
    self.x = np.array(x0, dtype=float)
    self.P = np.array(P0, dtype=float)
    self.Q = np.array(Q, dtype=float)
    self.t = None

  def _renorm(self):
    self.x[3:7] /= np.linalg.norm(self.x[3:7])

  def predict(self, dt):
    F = np.asarray(self.model.F(self.x, dt), dtype=float)
    self.x = np.asarray(self.model.f(self.x, dt), dtype=float).reshape(-1)
    self.P = F @ self.P @ F.T + dt * self.Q
    self._renorm()

  def update(self, kind_name, z, R):
    h = np.asarray(self.model.h[kind_name](self.x), dtype=float).reshape(-1)
    H = np.asarray(self.model.H[kind_name](self.x), dtype=float)
    H = H @ np.asarray(self.model.H_mod(self.x), dtype=float)
    y = z - h
    S = H @ self.P @ H.T + R
    K = self.P @ H.T @ np.linalg.inv(S)
    I_KH = np.eye(22) - K @ H
    self.P = I_KH @ self.P @ I_KH.T + K @ R @ K.T
    self.x = self.model.err(self.x, K @ y)
    self._renorm()

  def predict_and_observe(self, t, kind_name, z, R):
    if self.t is None:
      self.t = t
    self.predict(t - self.t)
    self.t = t
    self.update(kind_name, np.atleast_1d(z), R)
