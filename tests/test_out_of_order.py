"""Out-of-order observation handling (rewind/replay).

The reference exercises this by swapping observations 20<->40 in a stream and
asserting two engines agree (examples/test_compare.py:104-120). We assert the
stronger property the rewind mechanism guarantees: processing the swapped
stream must yield exactly the same filter trajectory as processing the sorted
stream, because rewind + replay reconstructs in-order processing.
"""

import numpy as np

from rednose_tpu.models.kinematic import KinematicKalman, ObservationKind


def _simulate(seed=0):
  np.random.seed(seed)
  dt = 0.01
  ts = np.arange(0, 5, step=dt)
  xs = np.empty(ts.shape)
  x = 0.0
  for i, v in enumerate(np.sin(ts * 5)):
    xs[i] = x
    x += v * dt
  meas = np.array([np.random.normal(xv, 0.1) for xv in xs])
  return ts, meas


def test_rewind_replay_matches_in_order():
  ts, meas = _simulate()

  # swapped stream (reference: test_compare.py:104-106)
  ts_sw, meas_sw = ts.copy(), meas.copy()
  i, j = 20, 40
  ts_sw[i], ts_sw[j] = ts_sw[j], ts_sw[i]
  meas_sw[i], meas_sw[j] = meas_sw[j], meas_sw[i]

  kf_inorder = KinematicKalman()
  kf_swapped = KinematicKalman()

  order = np.argsort(ts_sw, kind="stable")
  for t, m in zip(ts_sw[order], meas_sw[order]):
    kf_inorder.filter.predict_and_update_batch(
        t, ObservationKind.POSITION, np.array([[m]]),
        kf_inorder.get_R(ObservationKind.POSITION, 1))
  for t, m in zip(ts_sw, meas_sw):
    kf_swapped.filter.predict_and_update_batch(
        t, ObservationKind.POSITION, np.array([[m]]),
        kf_swapped.get_R(ObservationKind.POSITION, 1))

  assert kf_inorder.filter.get_filter_time() == kf_swapped.filter.get_filter_time()
  np.testing.assert_allclose(kf_inorder.x, kf_swapped.x, rtol=1e-12, atol=1e-14)
  np.testing.assert_allclose(kf_inorder.P, kf_swapped.P, rtol=1e-12, atol=1e-14)


def test_too_old_observation_rejected():
  """Observations older than max_rewind_age (or before the rewind window)
  are dropped, mirroring ekf_sym.py:468-471."""
  kf = KinematicKalman(max_rewind_age=1.0)
  for t in np.arange(0, 3, 0.01):
    kf.predict_and_observe(t, ObservationKind.POSITION, [0.0])
  x_before = kf.x.copy()
  ret = kf.predict_and_observe(0.5, ObservationKind.POSITION, [100.0])
  assert ret is None
  np.testing.assert_array_equal(kf.x, x_before)
