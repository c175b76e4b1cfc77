"""Migration-surface tests: sympy front-end + reference-signature compat.

Proves a reference (commaai/rednose) user can bring their symbolic filter
definition over unchanged: gen_code's exact input surface
(rednose/helpers/ekf_sym.py:29-113) lowers to a FilterSpec via sympy
lambdify, and the EKF_sym constructor signature (ekf_sym.py:221-222) runs it
on FilterEngine. Acceptance oracles: the reference's own kinematic golden
values end-to-end, and the in-repo live ESKF model function-by-function.
"""

import numpy as np
import pytest
import sympy as sp

from rednose_tpu import compat
from rednose_tpu.models.kalman_filter import KalmanFilter


class _Kind:
  POSITION = 1


class SympyKinematic(KalmanFilter):
  """The reference's kinematic example restated in its own build style
  (examples/kinematic_kf.py:36-76): sympy dynamics -> gen_code -> EKF_sym."""

  name = 'kinematic_compat'
  initial_x = np.array([0.5, 0.0])
  initial_P_diag = np.array([1.0, 1.0])
  Q = np.diag([0.1**2, 2.0**2])
  obs_noise = {_Kind.POSITION: np.atleast_2d(0.1**2)}

  @staticmethod
  def generate_code(generated_dir):
    dim = 2
    x_sym = sp.MatrixSymbol('x', dim, 1)
    xm = sp.Matrix(x_sym)
    dt = sp.Symbol('dt')
    f_sym = sp.Matrix([xm[0, 0] + dt * xm[1, 0], xm[1, 0]])
    obs_eqs = [[sp.Matrix([xm[0, 0]]), _Kind.POSITION, None]]
    compat.gen_code(generated_dir, SympyKinematic.name, f_sym, dt, x_sym,
                    obs_eqs, dim, dim)

  def __init__(self, generated_dir=None):
    self.generate_code(generated_dir)
    self.filter = compat.EKF_sym_pyx(
        generated_dir, self.name, self.Q, self.initial_x,
        np.diag(self.initial_P_diag), 2, 2)


def test_compat_kinematic_reproduces_reference_goldens():
  """Full migration path hits the reference's published golden values
  (examples/test_kinematic_kf.py:52-55) to 7 decimals."""
  np.random.seed(0)
  kf = SympyKinematic()
  dt = 0.01
  ts = np.arange(0, 5, step=dt)
  vs = np.sin(ts * 5)
  x = 0.0
  for t, v in zip(ts, vs):
    kf.predict_and_observe(t, _Kind.POSITION, [np.random.normal(x, 0.1)])
    x += v * dt
  state, std = kf.x, np.sqrt(kf.P)
  np.testing.assert_almost_equal(state[0], -0.010866289677966417)
  np.testing.assert_almost_equal(std[0, 0], 0.04477103863330089)
  np.testing.assert_almost_equal(state[1], -0.8553720537261753)
  np.testing.assert_almost_equal(std[1, 1], 0.6695762270974388)


def test_compat_rewind_and_maha_surface():
  """Out-of-order + engine surface parity on the compat engine."""
  np.random.seed(2)
  kf = SympyKinematic()
  for i, t in enumerate(np.arange(0, 1.0, 0.01)):
    kf.predict_and_observe(t, _Kind.POSITION, [np.random.normal(0, 0.1)])
  # in-window late observation rewinds + replays
  est = kf.predict_and_observe(0.5, _Kind.POSITION, [0.1])
  assert est is not None
  assert kf.t == 0.99
  # too-old observation rejected
  assert kf.predict_and_observe(-5.0, _Kind.POSITION, [0.0]) is None
  # standalone maha test runs
  ok = kf.filter.maha_test(kf.x, kf.P, _Kind.POSITION, [0.0],
                           kf.get_R(_Kind.POSITION, 1)[0])
  assert ok in (True, False)


def _live_sympy_pieces():
  """The live ESKF restated symbolically, reusing the in-repo sympy oracle's
  expression builders (tests/live_oracle.py) — an independent source from
  models/live.py's jnp code."""
  from tests import live_oracle as lo

  xs = sp.symbols('x0:23')
  dxs = sp.symbols('dx0:22')
  dt = sp.Symbol('dt')
  x = sp.Matrix(xs)

  p, q, v = x[0:3, 0], x[3:7, 0], x[7:10, 0]
  omega = x[10:13, 0]
  acc = x[17:20, 0]

  omega_mat = sp.Rational(1, 2) * sp.Matrix([
      [0, -omega[0], -omega[1], -omega[2]],
      [omega[0], 0, omega[2], -omega[1]],
      [omega[1], -omega[2], 0, omega[0]],
      [omega[2], omega[1], -omega[0], 0]])
  quat_rot = lo._sym_quat_rot(q[0], q[1], q[2], q[3])

  x_dot = sp.zeros(23, 1)
  x_dot[0:3, 0] = v
  x_dot[3:7, 0] = omega_mat * sp.Matrix(q)
  x_dot[7:10, 0] = quat_rot * sp.Matrix(acc)
  f_sym = x + dt * x_dot

  # error dynamics (function of state + error state)
  dx = sp.Matrix(dxs)
  v_err, omega_err, acc_err = dx[6:9, 0], dx[9:12, 0], dx[16:19, 0]
  err_rot = lo._sym_euler_rot(dx[3], dx[4], dx[5])
  dx_dot = sp.zeros(22, 1)
  dx_dot[0:3, 0] = v_err
  dx_dot[3:6, 0] = err_rot * quat_rot * (sp.Matrix(omega) + omega_err)
  dx_dot[6:9, 0] = err_rot * quat_rot * (sp.Matrix(acc) + acc_err)
  f_err_sym = dx + dt * dx_dot

  # error injection / extraction / H_mod
  nom = sp.symbols('nom0:23')
  delta = sp.symbols('delta0:22')
  true = sp.symbols('true0:23')
  nom_m, delta_m, true_m = sp.Matrix(nom), sp.Matrix(delta), sp.Matrix(true)
  delta_quat = sp.Matrix([sp.Integer(1), delta[3] / 2, delta[4] / 2,
                          delta[5] / 2])
  err_expr = sp.zeros(23, 1)
  err_expr[0:3, 0] = nom_m[0:3, 0] + delta_m[0:3, 0]
  err_expr[3:7, 0] = lo._sym_quat_matrix_r(nom[3:7]) * delta_quat
  err_expr[7:, 0] = nom_m[7:, 0] + delta_m[6:, 0]

  inv_expr = sp.zeros(22, 1)
  inv_expr[0:3, 0] = true_m[0:3, 0] - nom_m[0:3, 0]
  dq = lo._sym_quat_matrix_r(nom[3:7]).T * true_m[3:7, 0]
  inv_expr[3:6, 0] = 2 * dq[1:, 0]
  inv_expr[6:, 0] = true_m[7:, 0] - nom_m[7:, 0]

  H_mod = sp.zeros(23, 22)
  H_mod[0:3, 0:3] = sp.eye(3)
  H_mod[3:7, 3:6] = sp.Rational(1, 2) * lo._sym_quat_matrix_r(q)[:, 1:]
  H_mod[7:, 6:] = sp.eye(16)

  obs_eqs = [[sp.Matrix(p), 12, None]]  # ECEF_POS (models/live.py:52)
  eskf = ([err_expr, nom, delta], [inv_expr, nom, true], H_mod, f_err_sym,
          dxs)
  return f_sym, dt, xs, obs_eqs, eskf


@pytest.mark.slow
def test_compat_eskf_matches_jnp_live_model():
  """sympy-frontend ESKF spec agrees with models/live.py's jnp spec on
  f, F, err, inv_err, H_mod, h/H at random states — the dual-implementation
  pattern of the reference's test_compare (examples/test_compare.py)."""
  import jax.numpy as jnp

  from rednose_tpu.models.live import LiveKalman, ObservationKind as K

  f_sym, dt_sym, xs, obs_eqs, eskf = _live_sympy_pieces()
  spec_sym = compat.gen_code(
      None, 'live_compat', f_sym, dt_sym, xs, obs_eqs, 23, 22,
      eskf_params=eskf, quaternion_idxs=[3])
  spec_jnp = LiveKalman.build_spec()

  rng = np.random.RandomState(0)
  for _ in range(3):
    x = np.asarray(LiveKalman.initial_x, np.float64).copy()
    x *= 1.0 + 0.05 * rng.randn(23)
    x += 0.05 * rng.randn(23)
    x[3:7] /= np.linalg.norm(x[3:7])
    xj = jnp.asarray(x)
    dt = 0.037
    np.testing.assert_allclose(
        np.asarray(spec_sym.f({}, xj, dt)),
        np.asarray(spec_jnp.f({}, xj, dt)), rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(spec_sym.F({}, xj, dt)),
        np.asarray(spec_jnp.F({}, xj, dt)), rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(spec_sym.H_mod_at({}, xj)),
        np.asarray(spec_jnp.H_mod_at({}, xj)), rtol=1e-12, atol=0)
    dx = 0.01 * rng.randn(22)
    np.testing.assert_allclose(
        np.asarray(spec_sym.err({}, xj, jnp.asarray(dx))),
        np.asarray(spec_jnp.err({}, xj, jnp.asarray(dx))),
        rtol=1e-10, atol=1e-12)
    tru = np.asarray(spec_jnp.err({}, xj, jnp.asarray(dx)))
    np.testing.assert_allclose(
        np.asarray(spec_sym.inv_err({}, xj, jnp.asarray(tru))),
        np.asarray(spec_jnp.inv_err({}, xj, jnp.asarray(tru))),
        rtol=1e-9, atol=1e-12)
    ea = jnp.zeros((1,))
    np.testing.assert_allclose(
        np.asarray(spec_sym.obs[12].h({}, xj, ea)),
        np.asarray(spec_jnp.obs[int(K.ECEF_POS)].h({}, xj, ea)),
        rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(spec_sym.H(12, {}, xj, ea)),
        np.asarray(spec_jnp.H(int(K.ECEF_POS), {}, xj, ea)), rtol=1e-10,
        atol=1e-12)


def test_compat_global_vars_and_extra_routines():
  """global_vars become runtime-settable params (no recompile — the
  reference's set_<name> C-global semantics, ekf_sym.py:129-132);
  extra_routines ship on the spec (ekf_sym.py:109-113)."""
  lever = sp.Symbol('lever_arm')
  x_sym = sp.MatrixSymbol('x', 2, 1)
  xm = sp.Matrix(x_sym)
  dt = sp.Symbol('dt')
  f_sym = sp.Matrix([xm[0, 0] + dt * xm[1, 0], xm[1, 0]])
  # observation shifted by the global: h = pos + lever_arm
  obs_eqs = [[sp.Matrix([xm[0, 0] + lever]), 1, None]]
  extra = [('double_vel', sp.Matrix([2 * xm[1, 0]]), [x_sym])]
  compat.gen_code(None, 'glob_compat', f_sym, dt, x_sym, obs_eqs, 2, 2,
                  global_vars=[lever], extra_routines=extra)
  eng = compat.EKF_sym(None, 'glob_compat', np.eye(2) * 1e-4,
                       np.array([1.0, 0.0]), np.eye(2), 2, 2)
  # default: C-global semantics -> 0.0
  h0 = eng.spec.obs[1].h(eng.params, np.array([1.0, 0.0]), None)
  np.testing.assert_allclose(np.asarray(h0), [1.0])
  eng.set_global('lever_arm', 0.25)
  h1 = eng.spec.obs[1].h(eng.params, np.array([1.0, 0.0]), None)
  np.testing.assert_allclose(np.asarray(h1), [1.25])
  # the filter actually uses it: update pulls state toward z - lever
  est = eng.predict_and_update_batch(0.0, 1, [[1.25]],
                                     np.atleast_3d([1e-6]))
  assert est is not None
  np.testing.assert_allclose(eng.state()[0], 1.0, atol=1e-3)
  fn = eng.get_extra_routine('double_vel')
  np.testing.assert_allclose(np.asarray(fn(np.array([0.0, 3.0]))), [6.0])


@pytest.mark.slow
def test_compat_msckf_matches_jnp_engine():
  """msckf_params + feature-kind obs_eqs (ea_sym, He nullspace) through the
  compat path: the sympy-restated MSCKF VO model must track the jnp model
  engine-for-engine through position updates, a feature update, and
  augmentation — the reference's dual-engine test_compare pattern."""
  from rednose_tpu.models import msckf_vo as mv

  N, DM, DA = mv.N_AUGMENT, mv.DIM_MAIN, mv.DIM_AUG
  DIM = mv.DIM_X
  xs = sp.symbols('mx0:%d' % DIM)
  x = sp.Matrix(xs)
  dt = sp.Symbol('dt')
  f_sym = x.copy()
  f_sym[0:3, 0] = x[0:3, 0] + dt * x[3:6, 0]

  ea = sp.MatrixSymbol('ea', 3, 1)
  eam = sp.Matrix(ea)
  rows = []
  for a in range(N):
    cp = x[DM + DA * a: DM + DA * (a + 1), 0]
    d = eam - cp
    rows += [d[0] / d[2], d[1] / d[2]]
  h_feat = sp.Matrix(rows)

  obs_eqs = [
      [sp.Matrix(x[0:3, 0]), mv.ObservationKind.POSITION, None],
      [h_feat, mv.ObservationKind.MSCKF_TEST, ea],
  ]
  spec_sym = compat.gen_code(
      None, 'msckf_compat', f_sym, dt, xs, obs_eqs, DIM, DIM,
      msckf_params=(DM, DA, DM, DA, N, [mv.ObservationKind.MSCKF_TEST]),
      maha_test_kinds=[mv.ObservationKind.MSCKF_TEST])
  assert (spec_sym.dim_main, spec_sym.dim_augment, spec_sym.n_augment) == \
      (DM, DA, N)
  assert spec_sym.obs[mv.ObservationKind.MSCKF_TEST].ea_dim == 3
  assert spec_sym.obs[mv.ObservationKind.MSCKF_TEST].maha_test

  from rednose_tpu.runtime.driver import FilterEngine

  eng_sym = compat.EKF_sym(
      None, 'msckf_compat', mv.MSCKFVisualOdometry.Q,
      mv.MSCKFVisualOdometry.initial_x,
      np.diag(mv.MSCKFVisualOdometry.initial_P_diag), DM, DM,
      N=N, dim_augment=DA, dim_augment_err=DA)
  eng_jnp = FilterEngine(
      mv.MSCKFVisualOdometry.build_spec(), mv.MSCKFVisualOdometry.Q,
      mv.MSCKFVisualOdometry.initial_x,
      np.diag(mv.MSCKFVisualOdometry.initial_P_diag))

  rng = np.random.RandomState(3)
  R_pos = mv.MSCKFVisualOdometry.obs_noise[mv.ObservationKind.POSITION]
  R_feat = mv.MSCKFVisualOdometry.obs_noise[mv.ObservationKind.MSCKF_TEST]
  t = 0.0
  for i in range(6):
    t += 0.1
    z = rng.randn(3) * 0.1
    for eng in (eng_sym, eng_jnp):
      eng.predict_and_update_batch(t, mv.ObservationKind.POSITION,
                                   [z], R_pos[None], augment=True)
    np.testing.assert_allclose(eng_sym.state(), eng_jnp.state(),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(eng_sym.covs(), eng_jnp.covs(),
                               rtol=1e-8, atol=1e-12)

  # one nullspace-projected feature update on both engines
  feat = np.array([0.5, -0.3, 8.0])
  zf = []
  x_now = eng_jnp.state()
  for a in range(N):
    cp = x_now[DM + DA * a: DM + DA * (a + 1)]
    d = feat - cp
    zf += [d[0] / d[2], d[1] / d[2]]
  zf = np.asarray(zf) + 1e-3 * rng.randn(2 * N)
  t += 0.1
  for eng in (eng_sym, eng_jnp):
    eng.predict_and_update_batch(t, mv.ObservationKind.MSCKF_TEST,
                                 [zf], R_feat[None], extra_args=[feat])
  np.testing.assert_allclose(eng_sym.state(), eng_jnp.state(),
                             rtol=1e-9, atol=1e-12)
  np.testing.assert_allclose(eng_sym.covs(), eng_jnp.covs(),
                             rtol=1e-8, atol=1e-12)


def test_compat_eskf_trajectory_matches_jnp_engine():
  """Trajectory-level dual-engine equivalence (the literal test_compare
  analog, examples/test_compare.py:115-120): the sympy-frontend live spec
  and the jnp live spec run the same noisy measurement stream — including
  an out-of-order observation — through two FilterEngines; state/cov must
  agree at every step."""
  from rednose_tpu.models.live import LiveKalman
  from rednose_tpu.runtime.driver import FilterEngine

  f_sym, dt_sym, xs, obs_eqs, eskf = _live_sympy_pieces()
  spec_sym = compat.gen_code(
      None, 'live_compat_traj', f_sym, dt_sym, xs, obs_eqs, 23, 22,
      eskf_params=eskf, quaternion_idxs=[3])
  spec_jnp = LiveKalman.build_spec()

  engines = [
      FilterEngine(s, LiveKalman.Q, LiveKalman.initial_x,
                   np.diag(LiveKalman.initial_P_diag))
      for s in (spec_sym, spec_jnp)]
  rng = np.random.RandomState(7)
  R = np.diag([25.0] * 3)
  t = 0.0
  for i in range(60):
    t += 0.01
    z = LiveKalman.initial_x[0:3] + 3.0 * rng.randn(3)
    for eng in engines:
      eng.predict_and_update_batch(t, 12, [z], R[None])
    if i == 40:  # out-of-order: rewind + replay on both engines
      z_late = LiveKalman.initial_x[0:3] + 3.0 * rng.randn(3)
      for eng in engines:
        est = eng.predict_and_update_batch(t - 0.15, 12, [z_late], R[None])
        assert est is not None
    np.testing.assert_allclose(engines[0].state(), engines[1].state(),
                               rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(engines[0].covs(), engines[1].covs(),
                               rtol=1e-7, atol=1e-9)


def test_extra_routine_reads_live_globals():
  """Extra routines must see set_global updates (the reference's generated
  routines read the live C globals, ekf_sym.py:109-113) — not the 0.0
  defaults frozen at spec-build time (advisor r2 finding)."""
  lever = sp.Symbol('lever_arm')
  x_sym = sp.MatrixSymbol('x', 2, 1)
  xm = sp.Matrix(x_sym)
  dt = sp.Symbol('dt')
  f_sym = sp.Matrix([xm[0, 0] + dt * xm[1, 0], xm[1, 0]])
  obs_eqs = [[sp.Matrix([xm[0, 0]]), 1, None]]
  extra = [('vel_plus_lever', sp.Matrix([xm[1, 0] + lever]), [x_sym])]
  compat.gen_code(None, 'live_glob', f_sym, dt, x_sym, obs_eqs, 2, 2,
                  global_vars=[lever], extra_routines=extra)
  eng = compat.EKF_sym(None, 'live_glob', np.eye(2) * 1e-4,
                       np.array([1.0, 0.0]), np.eye(2), 2, 2)
  # fetch BEFORE set_global: the binding must still be live afterwards
  fn = eng.get_extra_routine('vel_plus_lever')
  np.testing.assert_allclose(np.asarray(fn(np.array([0.0, 3.0]))), [3.0])
  eng.set_global('lever_arm', 0.25)
  np.testing.assert_allclose(np.asarray(fn(np.array([0.0, 3.0]))), [3.25])


def test_non_feature_kind_with_extra_args():
  """The reference loc_kf pseudorange family: obs_eqs entries with extra
  args (sat_pos) whose kind is NOT a feature-track kind (ekf_sym.py:84-89).
  ea_len must size every placeholder (advisor r2 finding: ea_dim=0 made
  paths build 1-wide placeholders that crashed the lambdified reshape),
  and the engine must thread the real extra args through the update."""
  PSEUDORANGE = 6
  x_sym = sp.MatrixSymbol('x', 3, 1)
  xm = sp.Matrix(x_sym)
  sat = sp.MatrixSymbol('sat_pos', 3, 1)
  sm = sp.Matrix(sat)
  dt = sp.Symbol('dt')
  f_sym = sp.Matrix([xm[0, 0], xm[1, 0], xm[2, 0]])  # static receiver
  d = xm - sm
  h_pr = sp.Matrix([sp.sqrt(d[0, 0]**2 + d[1, 0]**2 + d[2, 0]**2)])
  obs_eqs = [[h_pr, PSEUDORANGE, sat],
             [sp.Matrix([xm[0, 0], xm[1, 0], xm[2, 0]]), 1, None]]
  compat.gen_code(None, 'pr_compat', f_sym, dt, x_sym, obs_eqs, 3, 3)
  eng = compat.EKF_sym(None, 'pr_compat', np.eye(3) * 1e-4,
                       np.array([0.0, 0.0, 0.0]), np.eye(3) * 100.0, 3, 3)
  om = eng.spec.obs[PSEUDORANGE]
  assert om.ea_len == 3 and om.ea_dim == 0 and not om.is_feature

  # truth at [3,4,0]; ranges from three satellites pin the position
  truth = np.array([3.0, 4.0, 0.0])
  sats = np.array([[100.0, 0.0, 0.0], [0.0, 100.0, 0.0], [0.0, 0.0, 100.0]])
  for it in range(25):
    t = 0.01 * (it + 1)
    for s in sats:
      rng = np.linalg.norm(truth - s)
      est = eng.predict_and_update_batch(
          t, PSEUDORANGE, [[rng]], np.atleast_3d([1e-4]), extra_args=[s])
      assert est is not None
  np.testing.assert_allclose(eng.state(), truth, atol=1e-2)
