"""End-to-end MSCKF visual-odometry pipeline test: triangulation ->
nullspace-projected feature update -> pose-window augmentation, over a
simulated constant-velocity trajectory with static landmarks.

Monocular VO observes velocity only up to scale (the classic scale
ambiguity), so the assertion splits the velocity error into the component
parallel to the true velocity (unobservable: must merely stay bounded) and
the perpendicular component (observable: must collapse)."""

import numpy as np
import pytest

from rednose_tpu.models.msckf_vo import (
    MSCKFVisualOdometry,
    N_AUGMENT,
    ObservationKind,
)


def _project(cam_pos, landmark):
  d = landmark - cam_pos
  return d[:2] / d[2]


@pytest.mark.slow
def test_msckf_vo_pipeline():
  rng = np.random.default_rng(0)
  dt = 0.2
  v_true = np.array([1.0, 0.5, 0.2])
  noise = 2e-4
  landmarks = rng.uniform([-3, -3, 2.5], [3, 3, 8], size=(16, 3))

  kf = MSCKFVisualOdometry()
  kf.obs_noise = dict(kf.obs_noise)
  kf.obs_noise[ObservationKind.MSCKF_TEST] = np.diag(
      [noise**2] * (2 * N_AUGMENT))
  # initial state: correct position, WRONG velocity (VO must fix direction)
  x0 = np.zeros(kf.spec.dim_x)
  x0[3:6] = v_true + np.array([0.4, -0.3, 0.15])
  kf.init_state(x0, covs=np.diag(kf.initial_P_diag))

  true_pos_hist = []
  t, pos = 0.0, np.zeros(3)
  for _ in range(N_AUGMENT):  # warm-up: fill the clone window
    t += dt
    pos = pos + dt * v_true
    true_pos_hist.append(pos.copy())
    kf.observe_camera_frame(t, np.zeros((0, N_AUGMENT, 2)))

  u = v_true / np.linalg.norm(v_true)
  e0 = kf.x[3:6] - v_true
  perp_before = np.linalg.norm(e0 - (e0 @ u) * u)

  for frame in range(40):
    t += dt
    pos = pos + dt * v_true
    true_pos_hist.append(pos.copy())
    window = np.stack(true_pos_hist[-(N_AUGMENT + 1):-1])  # clone positions
    # keep landmarks in front of the advancing camera
    lms = landmarks + np.floor(pos[2]) * np.array([0.0, 0.0, 1.0])
    tracks = np.stack([
        np.stack([_project(window[k], lm) + rng.normal(0, noise, 2)
                  for k in range(N_AUGMENT)])
        for lm in lms])
    est = kf.observe_camera_frame(t, tracks)
    assert est is not None

  e = kf.x[3:6] - v_true
  perp_after = np.linalg.norm(e - (e @ u) * u)
  par_after = abs(e @ u)

  # observable (direction) error collapses by >100x
  assert perp_after < 0.01 * perp_before, (perp_before, perp_after)
  # unobservable (scale) error merely stays bounded
  assert par_after < 2.0 * np.linalg.norm(e0)
  assert np.all(np.isfinite(kf.x)) and np.all(np.isfinite(kf.P))


def test_msckf_vo_augment_rotates_window():
  kf = MSCKFVisualOdometry()
  t = 0.0
  for _ in range(3):
    t += 0.1
    kf.observe_camera_frame(t, np.zeros((0, N_AUGMENT, 2)))
  # newest clone equals current position estimate
  x = kf.x
  np.testing.assert_allclose(x[-3:], x[0:3])
  assert kf.filter.get_augment_times()[-1] == t
