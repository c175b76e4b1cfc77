"""End-to-end visual-odometry pipeline: simulated tracker detections ->
track store -> harvest -> triangulation -> MSCKF x ESKF update."""

import numpy as np

from rednose_tpu.models.msckf_eskf import (
    DIM_AUG,
    DIM_MAIN,
    MSCKFEskf,
    N_AUGMENT,
)
from rednose_tpu.msckf import feature_handler as fh
from rednose_tpu.msckf.pipeline import VisualOdometryPipeline


class _SimTracker:
  """Ground-truth camera at the filter's clone poses observing static
  landmarks; re-detects each landmark every frame and carries the ids the
  pipeline assigns."""

  def __init__(self, landmarks, rng):
    self.landmarks = landmarks
    self.ids = np.full(len(landmarks), -1, dtype=np.int64)
    self.rng = rng

  def detect(self, cam_pos):
    uvs = []
    for lm in self.landmarks:
      d = lm - cam_pos
      uvs.append(d[:2] / d[2] + self.rng.normal(0, 0.002, 2))
    return self.ids.copy(), np.asarray(uvs)

  def update_ids(self, ids_out):
    self.ids = ids_out.copy()


def test_pipeline_end_to_end_reduces_uncertainty():
  rng = np.random.RandomState(0)
  kf = MSCKFEskf()
  x0 = MSCKFEskf.initial_x.copy()
  x0[7:10] = [4.0, 0.0, 0.0]  # cruise: spreads the clone window
  kf.init_state(x0, covs_diag=MSCKFEskf.initial_P_diag)

  kf_blind = MSCKFEskf()  # twin that never sees features
  kf_blind.init_state(x0, covs_diag=MSCKFEskf.initial_P_diag)

  landmarks = np.column_stack([
      rng.uniform(-4, 30, 10), rng.uniform(-5, 5, 10),
      rng.uniform(10, 18, 10)])
  pipe = VisualOdometryPipeline(kf, n_tracks=64)
  tracker = _SimTracker(landmarks, rng)

  t, n_feature_updates = 0.0, 0
  for frame in range(3 * N_AUGMENT):
    t += 0.1
    cam_pos = kf.x[0:3]  # detections from the current (nominal) camera pose
    ids, uvs = tracker.detect(cam_pos)
    est, ids_out = pipe.process_frame(t, ids, uvs)
    tracker.update_ids(ids_out)
    kf_blind.observe_camera_frame(t, np.zeros((0, N_AUGMENT, 2)))
    if est is not None and len(est[7]):  # z nonempty -> feature update ran
      n_feature_updates += 1

  # tracks completed and fed the filter more than once
  assert n_feature_updates >= 2, n_feature_updates
  assert np.all(np.isfinite(kf.x)) and np.all(np.isfinite(kf.P))
  # features added real information vs the blind twin
  assert np.trace(kf.P) < np.trace(kf_blind.P)
  # store did not leak: harvested slots were reused, none dropped
  assert pipe.dropped_total == 0
  assert pipe.live_track_count <= len(landmarks) + 1  # +1: reserved slot 0


def test_pipeline_id_slot_invariant_and_reissue():
  """Track ids equal their store slots; stale ids are transparently
  re-issued; slot 0 is never allocated."""
  kf = MSCKFEskf()
  pipe = VisualOdometryPipeline(kf, n_tracks=16)
  uv = np.array([[0.1, 0.2], [0.3, 0.4]])
  _, ids1 = pipe.process_frame(0.1, [-1, -1], uv)
  assert np.all(ids1 > 0)  # slot 0 reserved
  tr = np.asarray(pipe.tracks)
  for i in ids1:
    assert tr[i, 0, fh.H_COUNT] == 1 and tr[i, 0, fh.H_LAST_ID] == i

  # continuing: same ids append
  _, ids2 = pipe.process_frame(0.2, ids1, uv + 0.01)
  np.testing.assert_array_equal(ids2, ids1)
  tr = np.asarray(pipe.tracks)
  assert np.all(tr[ids2, 0, fh.H_COUNT] == 2)

  # a stale id (track never existed) is re-issued as a new track
  _, ids3 = pipe.process_frame(0.3, [9, ids1[1]], uv + 0.02)
  assert ids3[0] != 9 or np.asarray(pipe.tracks)[9, 0, fh.H_COUNT] == 1
  assert ids3[1] == ids1[1]

  # duplicate ids in one frame: first claims the track, second re-issued
  _, ids4 = pipe.process_frame(0.4, [ids1[1], ids1[1]], uv + 0.03)
  assert ids4[0] == ids1[1] and ids4[1] != ids1[1]


def test_pipeline_harvest_frees_slots():
  """After a track completes (K observations) its slot frees up and is
  reallocated to a later track."""
  kf = MSCKFEskf()
  pipe = VisualOdometryPipeline(kf, n_tracks=8)
  # one landmark straight ahead: smooth track that passes sane()
  ids = np.array([-1])
  t = 0.0
  for k in range(N_AUGMENT):
    t += 0.1
    uv = np.array([[0.1 + 0.01 * k, 0.2 + 0.01 * k]])
    _, ids = pipe.process_frame(t, ids, uv)
  # track reached K observations -> harvested -> store empty again
  assert pipe.live_track_count == 0
  # next new detection can reuse the same slot
  _, ids_new = pipe.process_frame(t + 0.1, [-1], np.array([[0.5, 0.5]]))
  assert ids_new[0] == ids[0]
