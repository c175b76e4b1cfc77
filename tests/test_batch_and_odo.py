"""Multi-measurement batches (n>1 per predict_and_update_batch, reference:
ekf_sym.py:513-522) and the camera-odometry measurement-supplied-R path
(live_kf.py:325-337)."""

import numpy as np

from rednose_tpu.models.kinematic import KinematicKalman, ObservationKind as KK
from rednose_tpu.models.live import LiveKalman, ObservationKind as LK


def test_multi_measurement_batch_equals_sequential_updates():
  """A batch of n measurements at one timestamp must equal n sequential
  updates at that timestamp (the reference loops them through the same
  update kernel)."""
  z3 = np.array([[0.1], [0.2], [0.15]])
  R3 = np.tile(np.atleast_2d(0.01), (3, 1, 1))

  kf_batch = KinematicKalman()
  kf_batch.filter.set_filter_time(0.0)
  est = kf_batch.filter.predict_and_update_batch(0.1, KK.POSITION, z3, R3)
  assert len(est[6]) == 3  # one innovation per measurement

  kf_seq = KinematicKalman()
  kf_seq.filter.set_filter_time(0.0)
  # first call advances time, the rest are dt=0 updates
  for i in range(3):
    kf_seq.filter.predict_and_update_batch(0.1, KK.POSITION, z3[i:i + 1],
                                           R3[i:i + 1])
  np.testing.assert_allclose(kf_batch.x, kf_seq.x, rtol=1e-12)
  np.testing.assert_allclose(kf_batch.P, kf_seq.P, rtol=1e-12)


def test_camera_odo_measurement_supplied_R():
  """CAMERA_ODO_* kinds carry their std devs in columns 3:6; the filter must
  build R from them (live_kf.py:325-337) and tighter stds must pull harder."""
  def run(std):
    kf = LiveKalman()
    t = 0.0
    for _ in range(10):
      t += 0.1
      # velocity measurement of 2 m/s forward with supplied std
      data = np.concatenate([[2.0, 0.0, 0.0], [std] * 3])
      kf.predict_and_observe(t, LK.CAMERA_ODO_TRANSLATION, [data])
    return kf

  kf_tight = run(0.05)
  kf_loose = run(5.0)
  v_tight = np.asarray(kf_tight.x[7:10])
  v_loose = np.asarray(kf_loose.x[7:10])
  # tight R converges to the measured velocity much harder
  assert abs(v_tight[0] - 2.0) < 0.1
  assert abs(v_tight[0] - 2.0) < abs(v_loose[0] - 2.0)
  # covariance reflects the supplied noise
  assert kf_tight.P[6, 6] < kf_loose.P[6, 6]


def test_camera_odo_rotation_supplied_R():
  kf = LiveKalman()
  data = np.concatenate([[0.1, 0.0, 0.0], [0.01] * 3])
  kf.predict_and_observe(0.1, LK.CAMERA_ODO_ROTATION, [data])
  assert abs(kf.x[10] - 0.1) < 0.05  # angular velocity pulled to measurement
