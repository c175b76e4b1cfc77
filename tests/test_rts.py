"""RTS smoother tests.

The reference ships an RTS smoother (rednose/helpers/ekf_sym.py:651-690) but
never tests it — SURVEY.md §4 flags that as a coverage gap to close. Strategy
here follows the survey's test-pattern prescription: (a) dual-implementation
equivalence against an independently-written numpy RTS, (b) parallel
(associative-scan) vs sequential (lax.scan) agreement, (c) a behavioral check
that smoothing reduces RMSE vs the filtered trajectory.
"""

import numpy as np

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
  kf, estimates, _ = _run_filter()
  seq = kf.filter.rts_smooth(estimates)
  par = kf.filter.rts_smooth(estimates, parallel=True)
  xs_seq = np.stack([s[0] for s in seq])
  xs_par = np.stack([s[0] for s in par])
  Ps_seq = np.stack([s[1] for s in seq])
  Ps_par = np.stack([s[1] for s in par])
  # Additive error state => the affine formulation is exact (roundoff only).
  np.testing.assert_allclose(xs_par, xs_seq, rtol=1e-8, atol=1e-10)
  np.testing.assert_allclose(Ps_par, Ps_seq, rtol=1e-8, atol=1e-10)


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
