"""Golden regression for the kinematic filter.

Reproduces the reference's acceptance oracle exactly (examples/
test_kinematic_kf.py:10-55): 5 s of sinusoidal motion at dt=0.01, numpy seed
0, noisy position measurements, and the four published golden values asserted
to 7 decimals.
"""

import numpy as np

from rednose_tpu.models.kinematic import KinematicKalman, ObservationKind, States


def test_kinematic_golden():
  np.random.seed(0)

  kf = KinematicKalman()

  dt = 0.01
  ts = np.arange(0, 5, step=dt)
  vs = np.sin(ts * 5)

  x = 0.0
  xs_kf, vs_kf, xs_kf_std, vs_kf_std = [], [], [], []

  for t, v in zip(ts, vs):
    meas = np.random.normal(x, 0.1)
    kf.predict_and_observe(t, ObservationKind.POSITION, [meas])

    state = kf.x
    xs_kf.append(float(state[States.POSITION].item()))
    vs_kf.append(float(state[States.VELOCITY].item()))
    std = np.sqrt(kf.P)
    xs_kf_std.append(float(std[States.POSITION, States.POSITION].item()))
    vs_kf_std.append(float(std[States.VELOCITY, States.VELOCITY].item()))

    x += v * dt

  # Golden values from the reference test (examples/test_kinematic_kf.py:52-55).
  np.testing.assert_almost_equal(xs_kf[-1], -0.010866289677966417)
  np.testing.assert_almost_equal(xs_kf_std[-1], 0.04477103863330089)
  np.testing.assert_almost_equal(vs_kf[-1], -0.8553720537261753)
  np.testing.assert_almost_equal(vs_kf_std[-1], 0.6695762270974388)
