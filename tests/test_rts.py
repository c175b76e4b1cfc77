"""RTS smoother tests.

The reference ships an RTS smoother (rednose/helpers/ekf_sym.py:651-690) but
never tests it — SURVEY.md §4 flags that as a coverage gap to close. Strategy
here follows the survey's test-pattern prescription: (a) dual-implementation
equivalence against an independently-written numpy RTS, (b) parallel
(associative-scan) vs sequential (lax.scan) agreement, (c) a behavioral check
that smoothing reduces RMSE vs the filtered trajectory.
"""

import numpy as np
import pytest

from rednose_tpu.models.kinematic import KinematicKalman, ObservationKind
from rednose_tpu.smoothing.rts import smooth_estimates


def _run_filter(T=300, seed=0):
  np.random.seed(seed)
  kf = KinematicKalman()
  dt = 0.01
  ts = np.arange(0, T * dt, step=dt)
  vs = np.sin(ts * 5)
  x = 0.0
  estimates, truth = [], []
  for t, v in zip(ts, vs):
    meas = np.random.normal(x, 0.1)
    est = kf.predict_and_observe(t, ObservationKind.POSITION, [meas])
    estimates.append(est)
    truth.append(x)
    x += v * dt
  return kf, estimates, np.array(truth)


def _numpy_rts(estimates):
  """Textbook RTS smoother, written independently in numpy as the oracle."""
  x_pred = np.stack([np.asarray(e[0]).reshape(-1) for e in estimates])
  x_post = np.stack([np.asarray(e[1]).reshape(-1) for e in estimates])
  P_pred = np.stack([np.asarray(e[2]) for e in estimates])
  P_post = np.stack([np.asarray(e[3]) for e in estimates])
  t = np.array([e[4] for e in estimates])
  T = len(estimates)
  xs, Ps = x_post.copy(), P_post.copy()
  for k in range(T - 2, -1, -1):
    dt = t[k + 1] - t[k]
    F = np.array([[1.0, dt], [0.0, 1.0]])  # kinematic transition jacobian
    C = P_post[k] @ F.T @ np.linalg.inv(P_pred[k + 1])
    xs[k] = x_post[k] + C @ (xs[k + 1] - x_pred[k + 1])
    Ps[k] = P_post[k] + C @ (Ps[k + 1] - P_pred[k + 1]) @ C.T
  return xs, Ps


def test_rts_matches_numpy_oracle():
  kf, estimates, _ = _run_filter()
  smoothed = kf.filter.rts_smooth(estimates)
  xs_np, Ps_np = _numpy_rts(estimates)
  xs = np.stack([s[0] for s in smoothed])
  Ps = np.stack([s[1] for s in smoothed])
  np.testing.assert_allclose(xs, xs_np, rtol=1e-9, atol=1e-12)
  np.testing.assert_allclose(Ps, Ps_np, rtol=1e-9, atol=1e-12)


def test_parallel_rts_matches_sequential():
  # T=600 so the chunked long-log branch of _suffix_scan_lane (the
  # production path for T-1 >= 512) is exercised through the full smoother
  kf, estimates, _ = _run_filter(T=600)
  seq = kf.filter.rts_smooth(estimates)
  par = kf.filter.rts_smooth(estimates, parallel=True)
  xs_seq = np.stack([s[0] for s in seq])
  xs_par = np.stack([s[0] for s in par])
  Ps_seq = np.stack([s[1] for s in seq])
  Ps_par = np.stack([s[1] for s in par])
  # Additive error state => the affine formulation is exact (roundoff only).
  np.testing.assert_allclose(xs_par, xs_seq, rtol=1e-8, atol=1e-10)
  np.testing.assert_allclose(Ps_par, Ps_seq, rtol=1e-8, atol=1e-10)


def _numpy_rts_reference(estimates):
  """The REFERENCE's recursion (ekf_sym.py:651-690), independently rewritten:
  seeds the backward pass from the last PREDICTED state, so the final
  measurement is dropped from the smoothed tail."""
  x_pred = np.stack([np.asarray(e[0]).reshape(-1) for e in estimates])
  x_post = np.stack([np.asarray(e[1]).reshape(-1) for e in estimates])
  P_pred = np.stack([np.asarray(e[2]) for e in estimates])
  P_post = np.stack([np.asarray(e[3]) for e in estimates])
  t = np.array([e[4] for e in estimates])
  T = len(estimates)
  xs, Ps = x_post.copy(), P_post.copy()
  xs[T - 1], Ps[T - 1] = x_pred[T - 1], P_pred[T - 1]
  for k in range(T - 2, -1, -1):
    dt = t[k + 1] - t[k]
    F = np.array([[1.0, dt], [0.0, 1.0]])
    C = P_post[k] @ F.T @ np.linalg.inv(P_pred[k + 1])
    xs[k] = x_post[k] + C @ (xs[k + 1] - x_pred[k + 1])
    Ps[k] = P_post[k] + C @ (Ps[k + 1] - P_pred[k + 1]) @ C.T
  return xs, Ps


def test_reference_seed_matches_reference_recursion():
  """reference_seed=True reproduces ekf_sym.rts_smooth's boundary condition
  (seed = last predicted state) for migration diffs; the default (posterior
  seed) must differ at the tail."""
  kf, estimates, _ = _run_filter()
  ref = kf.filter.rts_smooth(estimates, reference_seed=True)
  xs_ref = np.stack([s[0] for s in ref])
  Ps_ref = np.stack([s[1] for s in ref])
  xs_np, Ps_np = _numpy_rts_reference(estimates)
  np.testing.assert_allclose(xs_ref, xs_np, rtol=1e-9, atol=1e-12)
  np.testing.assert_allclose(Ps_ref, Ps_np, rtol=1e-9, atol=1e-12)
  # and the default seed keeps the final measurement: tails differ
  default = kf.filter.rts_smooth(estimates)
  assert not np.allclose(default[-1][0], xs_ref[-1])
  np.testing.assert_allclose(default[-1][0],
                             np.asarray(estimates[-1][1]).reshape(-1))


def test_smoothing_reduces_rmse():
  kf, estimates, truth = _run_filter()
  smoothed = kf.filter.rts_smooth(estimates)
  filtered_pos = np.array([np.asarray(e[1]).reshape(-1)[0] for e in estimates])
  smoothed_pos = np.array([s[0][0] for s in smoothed])
  rmse_f = np.sqrt(np.mean((filtered_pos - truth) ** 2))
  rmse_s = np.sqrt(np.mean((smoothed_pos - truth) ** 2))
  assert rmse_s < rmse_f


def test_smooth_estimates_short_inputs():
  kf, estimates, _ = _run_filter(T=1)
  out = smooth_estimates(kf.spec, {}, estimates)
  assert len(out) == 1
  np.testing.assert_allclose(out[0][0], np.asarray(estimates[0][1]).reshape(-1))


@pytest.mark.slow
def test_bank_smoothing_matches_per_trajectory():
  """rts_smooth_parallel_bank == per-trajectory rts_smooth_parallel."""
  import jax.numpy as jnp

  from rednose_tpu.models.kinematic import KinematicKalman, ObservationKind
  from rednose_tpu.core import step as step_ops
  from rednose_tpu.smoothing import rts

  spec = KinematicKalman.build_spec()
  rng = np.random.RandomState(0)
  B, T = 3, 20
  Q = jnp.asarray(KinematicKalman.Q)
  xp = np.zeros((B, T, 2))
  Pp = np.zeros((B, T, 2, 2))
  xf = np.zeros((B, T, 2))
  Pf = np.zeros((B, T, 2, 2))
  ts = np.tile(0.01 * (1 + np.arange(T)), (B, 1))
  for b in range(B):
    x = jnp.asarray(KinematicKalman.initial_x, jnp.float64)
    P = jnp.asarray(np.diag(KinematicKalman.initial_P_diag), jnp.float64)
    for k in range(T):
      x1, P1 = step_ops.predict(spec, {}, x, P, Q, jnp.asarray(0.01))
      x, P, _ = step_ops.update(
          spec, ObservationKind.POSITION, {}, x1, P1,
          jnp.asarray([0.1 * rng.randn()]), jnp.asarray([[0.01]]),
          jnp.zeros((1,)))
      xp[b, k], Pp[b, k] = np.asarray(x1), np.asarray(P1)
      xf[b, k], Pf[b, k] = np.asarray(x), np.asarray(P)

  xs_bank, Ps_bank = rts.rts_smooth_parallel_bank(
      spec, {}, jnp.asarray(xp), jnp.asarray(Pp), jnp.asarray(xf),
      jnp.asarray(Pf), jnp.asarray(ts))
  for b in range(B):
    xs, Ps = rts.rts_smooth_parallel(
        spec, {}, jnp.asarray(xp[b]), jnp.asarray(Pp[b]),
        jnp.asarray(xf[b]), jnp.asarray(Pf[b]), jnp.asarray(ts[b]))
    np.testing.assert_allclose(np.asarray(xs_bank[b]), np.asarray(xs),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(Ps_bank[b]), np.asarray(Ps),
                               rtol=1e-10, atol=1e-12)


@pytest.mark.slow
def test_chunked_suffix_scan_matches_associative_scan():
  """_suffix_scan_lane (the layout-aware two-level scan used for long logs)
  == jax.lax.associative_scan on the same affine elements, including a
  non-multiple-of-128 length (identity padding)."""
  import jax
  import jax.numpy as jnp

  from rednose_tpu.smoothing.rts import _affine_combine_lane, _suffix_scan_lane

  rng = np.random.RandomState(0)
  d = 5
  for T in (700, 1024):
    A = jnp.asarray(0.1 * rng.randn(d, d, T) +
                    np.eye(d)[:, :, None] * 0.9)
    b = jnp.asarray(0.1 * rng.randn(d, 1, T))
    V = jnp.asarray(0.01 * rng.randn(d, d, T))
    ref = jax.lax.associative_scan(_affine_combine_lane, (A, b, V),
                                   reverse=True, axis=2)
    out = _suffix_scan_lane(A, b, V)
    for r, o in zip(ref, out):
      np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                 rtol=1e-9, atol=1e-11)
