"""MSCKF visual-odometry filter: the end-to-end sliding-window pipeline.

The reference ships the MSCKF *machinery* (state augmentation ekf_sym.py:
365-391, He jacobians + nullspace-projected updates ekf_sym.py:86-87/576-591,
GN triangulation and track-store C templates) but no in-repo filter that uses
it — downstream openpilot's loc_kf wires it together. This module provides
that wiring as a shipped model: a position/velocity filter whose state
carries a sliding window of past position clones; camera frames triangulate
feature tracks (msckf/triangulation.py), apply nullspace-projected feature
updates across the clone window (ObservationKind.MSCKF_TEST, mirroring the
reference's test kind live_kf.py:34), then clone the current pose into the
window (augment).

Camera model: normalized pinhole looking along +z of the (identity-attitude)
body frame; tracks observe static world landmarks.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from rednose_tpu.core.spec import FilterSpec, ObservationModel
from rednose_tpu.models.kalman_filter import KalmanFilter
from rednose_tpu.registry import register
from rednose_tpu.msckf.triangulation import compute_pos_batch


class ObservationKind:
  POSITION = 12       # direct position fix (ECEF_POS analog)
  MSCKF_TEST = 16     # feature-track update (live_kf.py:34)

  names = {12: 'Position', 16: 'MSCKF feature track'}

  @classmethod
  def to_string(cls, kind):
    return cls.names[kind]


N_AUGMENT = 4     # sliding-window length (pose clones kept in state)
DIM_MAIN = 6      # position (3) + velocity (3)
DIM_AUG = 3       # each clone: position
DIM_X = DIM_MAIN + DIM_AUG * N_AUGMENT


def _f(params, x, dt):
  """Constant-velocity kinematics on the main state; clones are static
  (the block-propagation structure of templates/ekf_c.c:8-33)."""
  del params
  # keep the scatter value in x's dtype: a float64 dt (host timestamps)
  # otherwise promotes the product and trips JAX's unsafe-cast scatter error
  return x.at[0:3].add(jnp.asarray(dt * x[3:6], x.dtype))


def _h_position(params, x, ea):
  del params, ea
  return x[0:3]


def _h_feature(params, x, ea):
  """Normalized image coordinates of feature ea (3,) from every clone in the
  window: dz = 2 * N_AUGMENT, nullspace-projects the 3 feature-position error
  dims out at update time (ea_dim=3)."""
  del params
  outs = []
  for a in range(N_AUGMENT):
    cp = x[DIM_MAIN + DIM_AUG * a: DIM_MAIN + DIM_AUG * (a + 1)]
    d = ea - cp
    outs.append(jnp.stack([d[0] / d[2], d[1] / d[2]]))
  return jnp.concatenate(outs)


def build_msckf_vo_spec() -> FilterSpec:
  obs = {
      ObservationKind.POSITION: ObservationModel(
          kind=ObservationKind.POSITION, h=_h_position, dz=3),
      # maha_test: gate confidently-wrong feature updates (bad triangulation
      # under f32 rounding) exactly as the reference gates feature kinds
      # (maha_test_kinds, ekf_sym.py:144-152)
      ObservationKind.MSCKF_TEST: ObservationModel(
          kind=ObservationKind.MSCKF_TEST, h=_h_feature, dz=2 * N_AUGMENT,
          ea_dim=3, maha_test=True),
  }
  return FilterSpec(
      name='msckf_vo', dim_x=DIM_X, dim_err=DIM_X, f=_f, obs=obs,
      dim_main=DIM_MAIN, dim_main_err=DIM_MAIN,
      dim_augment=DIM_AUG, dim_augment_err=DIM_AUG, n_augment=N_AUGMENT)


@register
class MSCKFVisualOdometry(KalmanFilter):
  """Facade running the full MSCKF camera-frame pipeline."""

  name = 'msckf_vo'

  initial_x = np.zeros(DIM_X)
  initial_P_diag = np.concatenate([
      np.full(3, 1.0**2), np.full(3, 1.0**2),
      np.full(DIM_AUG * N_AUGMENT, 1.0**2)])
  Q = np.diag(np.concatenate([
      np.full(3, 0.05**2), np.full(3, 0.5**2),
      np.full(DIM_AUG * N_AUGMENT, 1e-12)]))  # clones are static
  obs_noise = {
      ObservationKind.POSITION: np.diag([1.0**2] * 3),
      ObservationKind.MSCKF_TEST: np.diag([0.01**2] * (2 * N_AUGMENT)),
  }

  _spec_cache = None

  @classmethod
  def build_spec(cls) -> FilterSpec:
    if cls._spec_cache is None:
      cls._spec_cache = build_msckf_vo_spec()
    return cls._spec_cache

  def observe_camera_frame(self, t, tracks_img):
    """Process one camera frame: for each complete feature track (K =
    N_AUGMENT observations of one landmark from the clone window), GN-
    triangulate the landmark, run the nullspace-projected feature update,
    then clone the current pose into the window (augment=True, matching the
    reference's predict_and_update_batch(..., augment=True) flow,
    ekf_sym.py:525-526).

    tracks_img: (n_tracks, N_AUGMENT, 2) normalized image observations,
    row k observed from clone k (oldest first).
    """
    tracks_img = np.asarray(tracks_img, dtype=np.float64)
    if tracks_img.ndim == 2:  # single track -> promote to a batch of one
      tracks_img = tracks_img[None]
    assert tracks_img.ndim == 3 and tracks_img.shape[1:] == (N_AUGMENT, 2), \
        tracks_img.shape
    n = tracks_img.shape[0]
    if n == 0:
      return self.filter.predict_and_update_batch(
          t, ObservationKind.POSITION, np.zeros((0, 3)),
          np.zeros((0, 3, 3)), augment=True)

    # clone-window camera poses (identity attitude): (N_AUGMENT, 7)
    x = self.filter.state()
    to_c = jnp.eye(3)
    quat_id = np.array([1.0, 0, 0, 0])
    poses = np.stack([
        np.concatenate([x[DIM_MAIN + DIM_AUG * a: DIM_MAIN + DIM_AUG * (a + 1)],
                        quat_id])
        for a in range(N_AUGMENT)])

    # one fused GN solve over all tracks (jitted batch kernel)
    poses_b = jnp.broadcast_to(jnp.asarray(poses), (n,) + poses.shape)
    pos, ok = compute_pos_batch(to_c, poses_b, jnp.asarray(tracks_img))
    ok = np.asarray(ok)
    if not ok.any():
      # every triangulation failed: skip the measurements (ekf_sym.py:588-591)
      # but STILL predict to t and clone the pose — otherwise the clone
      # window desyncs from the camera-frame cadence and every later track
      # is matched against stale clones
      return self.filter.predict_and_update_batch(
          t, ObservationKind.POSITION, np.zeros((0, 3)),
          np.zeros((0, 3, 3)), augment=True)

    z = tracks_img[ok].reshape(ok.sum(), -1)
    R = self.get_R(ObservationKind.MSCKF_TEST, int(ok.sum()))
    return self.filter.predict_and_update_batch(
        t, ObservationKind.MSCKF_TEST, z, R,
        extra_args=np.asarray(pos)[ok], augment=True)
