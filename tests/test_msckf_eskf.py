"""MSCKF x ESKF composition vs an independent sympy-Jacobian numpy oracle.

The oracle mirrors the REFERENCE engine semantics end to end
(rednose/helpers/ekf_sym.py): symbolic F/H/He (lambdified), SVD left-null
projection of He (ekf_sym.py:576-591 null(He.T)), H <- H @ H_mod
(ekf_sym.py:594-596), Joseph covariance + err_fun injection
(ekf_sym.py:613-623), block main-state propagation, and the augment shift
(ekf_sym.py:365-391). The jax filter uses jacfwd Jacobians and a QR-complete
nullspace — agreement validates the whole composed path: augment +
He-nullspace + H_mod + error injection in one filter.
"""

import numpy as np
import sympy as sp

from rednose_tpu.models.msckf_eskf import (
    DIM_AUG,
    DIM_AUG_ERR,
    DIM_ERR,
    DIM_MAIN,
    DIM_MAIN_ERR,
    DIM_X,
    MSCKFEskf,
    N_AUGMENT,
    ObservationKind,
)


def _np_quat_r(p):
  return np.array([[p[0], -p[1], -p[2], -p[3]],
                   [p[1], p[0], p[3], -p[2]],
                   [p[2], -p[3], p[0], p[1]],
                   [p[3], p[2], -p[1], p[0]]])


def _sym_quat_rot(q):
  q0, q1, q2, q3 = q
  return sp.Matrix([
      [q0**2 + q1**2 - q2**2 - q3**2, 2 * (q1 * q2 - q0 * q3), 2 * (q1 * q3 + q0 * q2)],
      [2 * (q1 * q2 + q0 * q3), q0**2 - q1**2 + q2**2 - q3**2, 2 * (q2 * q3 - q0 * q1)],
      [2 * (q1 * q3 - q0 * q2), 2 * (q2 * q3 + q0 * q1), q0**2 - q1**2 - q2**2 + q3**2],
  ])


def _sym_euler_rot(e):
  roll, pitch, yaw = e
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


def _null(H, eps=1e-12):
  """Reference nullspace helper (ekf_sym.py:21-26)."""
  u, s, vh = np.linalg.svd(H)
  padding = max(0, H.shape[1] - s.shape[0])
  null_mask = np.concatenate([s <= eps, np.ones((padding,), dtype=bool)])
  return vh[null_mask].T.conj()


class _Oracle:
  """Sympy-derived model + reference-semantics numpy engine."""

  def __init__(self):
    xs = sp.symbols(f'x0:{DIM_X}')
    dxs = sp.symbols(f'dx0:{DIM_ERR}')
    eas = sp.symbols('ea0:3')
    dt = sp.Symbol('dt')
    x = sp.Matrix(xs)

    q, v, w = x[3:7, 0], x[7:10, 0], x[10:13, 0]
    omega = sp.Rational(1, 2) * sp.Matrix([
        [0, -w[0], -w[1], -w[2]],
        [w[0], 0, w[2], -w[1]],
        [w[1], -w[2], 0, w[0]],
        [w[2], w[1], -w[0], 0]])
    x_dot = sp.zeros(DIM_X, 1)
    x_dot[0:3, 0] = v
    x_dot[3:7, 0] = omega * q
    f_sym = x + dt * x_dot
    self.f = sp.lambdify((xs, dt), list(f_sym), modules='numpy')

    dx = sp.Matrix(dxs)
    att_err, v_err, w_err = dx[3:6, 0], dx[6:9, 0], dx[9:12, 0]
    dx_dot = sp.zeros(DIM_ERR, 1)
    dx_dot[0:3, 0] = v_err
    dx_dot[3:6, 0] = _sym_euler_rot(att_err) * _sym_quat_rot(q) * (w + w_err)
    f_err_sym = dx + dt * dx_dot
    F_sym = f_err_sym.jacobian(dx).subs([(d, 0) for d in dxs])
    self.F = sp.lambdify((xs, dt), F_sym, modules='numpy')

    rows = []
    for a in range(N_AUGMENT):
      o = DIM_MAIN + DIM_AUG * a
      p_a, q_a = x[o:o + 3, 0], x[o + 3:o + 7, 0]
      d = _sym_quat_rot(q_a).T * (sp.Matrix(eas) - p_a)
      rows += [d[0] / d[2], d[1] / d[2]]
    h_sym = sp.Matrix(rows)
    self.h_feat = sp.lambdify((xs, eas), list(h_sym), modules='numpy')
    self.H_feat = sp.lambdify((xs, eas), h_sym.jacobian(x), modules='numpy')
    self.He_feat = sp.lambdify((xs, eas), h_sym.jacobian(sp.Matrix(eas)),
                               modules='numpy')

  @staticmethod
  def H_mod(x):
    H = np.zeros((DIM_X, DIM_ERR))
    H[0:3, 0:3] = np.eye(3)
    H[3:7, 3:6] = 0.5 * _np_quat_r(x[3:7])[:, 1:]
    H[7:13, 6:12] = np.eye(6)
    for a in range(N_AUGMENT):
      no, eo = DIM_MAIN + DIM_AUG * a, DIM_MAIN_ERR + DIM_AUG_ERR * a
      H[no:no + 3, eo:eo + 3] = np.eye(3)
      H[no + 3:no + 7, eo + 3:eo + 6] = 0.5 * _np_quat_r(x[no + 3:no + 7])[:, 1:]
    return H

  @staticmethod
  def err(nom, dx):
    out = np.array(nom, dtype=float)
    out[0:3] += dx[0:3]
    out[3:7] = _np_quat_r(nom[3:7]) @ np.concatenate([[1.0], 0.5 * dx[3:6]])
    out[7:13] += dx[6:12]
    for a in range(N_AUGMENT):
      no, eo = DIM_MAIN + DIM_AUG * a, DIM_MAIN_ERR + DIM_AUG_ERR * a
      out[no:no + 3] += dx[eo:eo + 3]
      out[no + 3:no + 7] = _np_quat_r(nom[no + 3:no + 7]) @ np.concatenate(
          [[1.0], 0.5 * dx[eo + 3:eo + 6]])
    return out


class _OracleEngine:
  def __init__(self, x0, P0, Q):
    self.m = _Oracle()
    self.x = np.array(x0, dtype=float)
    self.P = np.array(P0, dtype=float)
    self.Q = np.array(Q, dtype=float)
    self.t = None

  def _renorm(self):
    self.x[3:7] /= np.linalg.norm(self.x[3:7])
    for a in range(N_AUGMENT):
      o = DIM_MAIN + DIM_AUG * a + 3
      self.x[o:o + 4] /= np.linalg.norm(self.x[o:o + 4])

  def predict(self, dt):
    """Block main-state propagation (templates/ekf_c.c:8-33)."""
    F = np.asarray(self.m.F(self.x, dt), dtype=float)
    self.x = np.asarray(self.m.f(self.x, dt), dtype=float).reshape(-1)
    d2 = DIM_MAIN_ERR
    Fm = F[:d2, :d2]
    P = self.P.copy()
    P[:d2, :d2] = Fm @ self.P[:d2, :d2] @ Fm.T
    P[:d2, d2:] = Fm @ self.P[:d2, d2:]
    P[d2:, :d2] = self.P[d2:, :d2] @ Fm.T
    self.P = P + dt * self.Q
    self._renorm()

  def update_pos(self, z, R):
    H = np.zeros((3, DIM_X))
    H[:, 0:3] = np.eye(3)
    self._update(z - self.x[0:3], H, R)

  def update_feature(self, z, R, ea):
    """Reference MSCKF update (ekf_sym.py:576-624): SVD left-null of He."""
    h = np.asarray(self.m.h_feat(self.x, ea), dtype=float).reshape(-1)
    H = np.asarray(self.m.H_feat(self.x, ea), dtype=float)
    He = np.asarray(self.m.He_feat(self.x, ea), dtype=float)
    A = _null(He.T)
    self._update(A.T @ (z - h), A.T @ H, A.T @ R @ A)

  def _update(self, y, H, R):
    H = H @ self.m.H_mod(self.x)
    S = H @ self.P @ H.T + R
    K = self.P @ H.T @ np.linalg.inv(S)
    I_KH = np.eye(DIM_ERR) - K @ H
    self.P = I_KH @ self.P @ I_KH.T + K @ R @ K.T
    self.x = self.m.err(self.x, K @ y)
    self._renorm()

  def augment(self):
    """Reference pose-window shift (ekf_sym.py:365-391)."""
    d1, d2 = DIM_MAIN, DIM_MAIN_ERR
    d3, d4 = DIM_AUG, DIM_AUG_ERR
    x = self.x.copy()
    x[d1:-d3] = self.x[d1 + d3:]
    x[-d3:] = self.x[:d3]
    self.x = x
    keep = np.concatenate([np.arange(d2), np.arange(d2 + d4, DIM_ERR)])
    P_red = self.P[np.ix_(keep, keep)]
    to_mult = np.zeros((DIM_ERR, DIM_ERR - d4))
    to_mult[:-d4, :] = np.eye(DIM_ERR - d4)
    to_mult[-d4:, :d4] = np.eye(d4)
    self.P = to_mult @ P_red @ to_mult.T

  def step(self, t, kind, z, R, ea=None, augment=False):
    if self.t is None:
      self.t = t
    self.predict(t - self.t)
    self.t = t
    if kind == ObservationKind.POSITION:
      self.update_pos(np.asarray(z, float), np.asarray(R, float))
    else:
      self.update_feature(np.asarray(z, float), np.asarray(R, float),
                          np.asarray(ea, float))
    if augment:
      self.augment()


def test_msckf_eskf_composition_matches_oracle():
  kf = MSCKFEskf()
  # spread the clone window: nonzero velocity + mild rotation so clone poses
  # (and thus He) are well-conditioned
  x0 = MSCKFEskf.initial_x.copy()
  x0[7:10] = [2.0, 1.0, 0.5]
  x0[10:13] = [0.05, -0.03, 0.08]
  kf.init_state(x0, covs_diag=MSCKFEskf.initial_P_diag)
  oracle = _OracleEngine(x0, np.diag(MSCKFEskf.initial_P_diag), MSCKFEskf.Q)

  rng = np.random.RandomState(7)
  lm = np.array([1.0, -2.0, 12.0])
  R_pos = np.diag([0.5**2] * 3)
  R_feat = np.diag([0.01**2] * (2 * N_AUGMENT))

  t = 0.0
  for frame in range(12):
    t += 0.1
    if frame % 3 == 2:
      # feature-track update + augment: the composed MSCKF x ESKF path
      z = (np.asarray(oracle.m.h_feat(oracle.x, lm), dtype=float).reshape(-1)
           + 0.001 * rng.randn(2 * N_AUGMENT))
      kf.filter.predict_and_update_batch(
          t, ObservationKind.MSCKF_FEATURE, z, R_feat[None],
          extra_args=lm[None], augment=True)
      oracle.step(t, ObservationKind.MSCKF_FEATURE, z, R_feat, ea=lm,
                  augment=True)
    else:
      # position frames also clone (camera-rate augment) so the window
      # spreads and He is full-rank by the first feature update
      z = oracle.x[0:3] + 0.1 * rng.randn(3)
      kf.filter.predict_and_update_batch(t, ObservationKind.POSITION, z,
                                         R_pos[None], augment=True)
      oracle.step(t, ObservationKind.POSITION, z, R_pos, augment=True)

    np.testing.assert_allclose(kf.filter.state(), oracle.x,
                               rtol=1e-8, atol=1e-10,
                               err_msg=f"state diverged at frame {frame}")
    np.testing.assert_allclose(kf.filter.covs(), oracle.P,
                               rtol=1e-6, atol=1e-10,
                               err_msg=f"cov diverged at frame {frame}")

  # the window actually rotated: clone quats are no longer identity
  x_final = kf.filter.state()
  for a in range(N_AUGMENT):
    o = DIM_MAIN + DIM_AUG * a + 3
    assert abs(np.linalg.norm(x_final[o:o + 4]) - 1.0) < 1e-9
  assert abs(x_final[DIM_MAIN + 3]) < 1.0 - 1e-6 or \
      np.any(np.abs(x_final[DIM_MAIN + 4:DIM_MAIN + 7]) > 1e-4)


def test_extra_routine_surface():
  """The spec ships compute_pos as an extra routine (the reference ships
  compute_pos.c exactly this way, pyproject.toml:33-34 / ekf_sym.cc:221-223);
  get_extra_routine must return a working jitted triangulator."""
  import jax.numpy as jnp
  import pytest

  kf = MSCKFEskf()
  fn = kf.filter.get_extra_routine('compute_pos')
  with pytest.raises(KeyError):
    kf.filter.get_extra_routine('nope')

  # clones spread along x, landmark ahead at z=10
  lm = np.array([0.5, -0.3, 10.0])
  poses = np.zeros((N_AUGMENT, 7))
  poses[:, 0] = np.arange(N_AUGMENT) * 1.0
  poses[:, 3] = 1.0
  obs = np.stack([(lm - poses[a, 0:3])[:2] / (lm - poses[a, 0:3])[2]
                  for a in range(N_AUGMENT)])
  pos, ok = fn(jnp.eye(3), jnp.asarray(poses[None]), jnp.asarray(obs[None]))
  assert bool(ok[0])
  np.testing.assert_allclose(np.asarray(pos[0]), lm, rtol=1e-6, atol=1e-6)


def test_camera_frame_pipeline_end_to_end():
  """observe_camera_frame: triangulate -> nullspace update -> augment."""
  kf = MSCKFEskf()
  x0 = MSCKFEskf.initial_x.copy()
  x0[7:10] = [5.0, 0.0, 0.0]  # spread clones for baseline
  kf.init_state(x0, covs_diag=MSCKFEskf.initial_P_diag)
  for k in range(N_AUGMENT):
    kf.observe_camera_frame(0.1 * (k + 1), np.zeros((0, N_AUGMENT, 2)))

  lm = np.array([2.0, 1.0, 15.0])
  x = kf.filter.state()
  tracks = []
  for a in range(N_AUGMENT):
    o = DIM_MAIN + DIM_AUG * a
    d = lm - x[o:o + 3]
    tracks.append(d[:2] / d[2])
  # twin filter sees an EMPTY frame at the same t: the feature update must
  # leave strictly less uncertainty than predicting + cloning alone
  kf_empty = MSCKFEskf()
  kf_empty.init_state(x0, covs_diag=MSCKFEskf.initial_P_diag)
  for k in range(N_AUGMENT):
    kf_empty.observe_camera_frame(0.1 * (k + 1), np.zeros((0, N_AUGMENT, 2)))

  t_before = list(kf.filter.get_augment_times())
  t_frame = 0.1 * (N_AUGMENT + 1)
  est = kf.observe_camera_frame(t_frame, np.asarray(tracks)[None])
  kf_empty.observe_camera_frame(t_frame, np.zeros((0, N_AUGMENT, 2)))
  assert est is not None
  assert kf.filter.get_augment_times() != t_before  # window advanced
  assert np.all(np.isfinite(kf.filter.state()))
  assert (np.trace(kf.filter.covs()) <
          np.trace(kf_empty.filter.covs()))  # the feature added information