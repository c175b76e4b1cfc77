"""End-to-end visual-odometry pipeline: simulated tracker detections ->
track store -> harvest -> triangulation -> MSCKF x ESKF update."""

import numpy as np
import pytest

from rednose_tpu.models.msckf_eskf import (
    DIM_AUG,
    DIM_MAIN,
    MSCKFEskf,
    N_AUGMENT,
)
from rednose_tpu.msckf import feature_handler as fh
from rednose_tpu.msckf.pipeline import VisualOdometryPipeline


@pytest.mark.slow
def test_pipeline_end_to_end_reduces_uncertainty():
  """Ground-truth camera on a straight constant-velocity trajectory,
  identity attitude, static landmarks. Detections at frame f are generated
  from the TRUE pose at t_f; thanks to harvest-first alignment every
  harvested observation row pairs with the clone holding exactly that
  frame's pose estimate."""
  rng = np.random.RandomState(0)
  v0 = np.array([4.0, 0.0, 0.0])
  x0 = MSCKFEskf.initial_x.copy()
  x0[7:10] = v0

  kf = MSCKFEskf()
  # filter_time=0 so the first frame predicts a real dt (otherwise the
  # first observation only initializes the clock, reference semantics)
  kf.init_state(x0, covs_diag=MSCKFEskf.initial_P_diag, filter_time=0.0)
  kf_blind = MSCKFEskf()  # twin that never sees features
  kf_blind.init_state(x0, covs_diag=MSCKFEskf.initial_P_diag,
                      filter_time=0.0)

  landmarks = np.column_stack([
      rng.uniform(-4, 30, 10), rng.uniform(-5, 5, 10),
      rng.uniform(10, 18, 10)])
  pipe = VisualOdometryPipeline(kf, n_tracks=64, max_features=16)
  ids = np.full(len(landmarks), -1, dtype=np.int64)

  t, n_feature_updates = 0.0, 0
  for frame in range(3 * N_AUGMENT):
    t += 0.1
    true_pos = v0 * t  # ground truth at this frame's timestamp
    uvs = np.stack([(lm - true_pos)[:2] / (lm - true_pos)[2]
                    + rng.normal(0, 0.002, 2) for lm in landmarks])
    est, ids = pipe.process_frame(t, ids, uvs)
    kf_blind.observe_camera_frame(t, np.zeros((0, N_AUGMENT, 2)))
    if est is not None and len(est[7]):  # z nonempty -> feature update ran
      n_feature_updates += 1

  # tracks completed and fed the filter more than once
  assert n_feature_updates >= 2, n_feature_updates
  assert np.all(np.isfinite(kf.x)) and np.all(np.isfinite(kf.P))
  # features added real information vs the blind twin...
  assert np.trace(kf.P) < np.trace(kf_blind.P)
  # ...and the estimate tracks the true trajectory to pixel-noise scale.
  # THE alignment regression detector: pairing observations with one-frame-
  # old clone poses biases the estimate by ~|v|*dt = 0.4 m (measured 0.41 m
  # on the pre-fix pipeline); the aligned pipeline sits at ~0.05 m.
  err = np.linalg.norm(kf.x[0:3] - v0 * t)
  assert err < 0.2, err
  # store did not leak and no detections were dropped
  assert pipe.dropped_total == 0
  assert pipe.live_track_count <= len(landmarks) + 1


def test_pipeline_id_slot_invariant_and_reissue():
  """Track ids equal their store slots; stale ids are transparently
  re-issued; slot 0 is never allocated; store exhaustion is counted."""
  kf = MSCKFEskf()
  pipe = VisualOdometryPipeline(kf, n_tracks=16, max_features=8)
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

  # store exhaustion: a 4-slot store (slot 0 reserved, 3 usable) cannot
  # take 5 new tracks — the overflow is counted and returned as -1
  pipe_small = VisualOdometryPipeline(kf, n_tracks=4, max_features=8)
  _, ids5 = pipe_small.process_frame(0.1, [-1] * 5, np.zeros((5, 2)))
  assert (ids5 >= 0).sum() == 3 and (ids5 == -1).sum() == 2
  assert pipe_small.dropped_total == 2


def test_pipeline_harvest_frees_slots_next_frame():
  """A track completing at frame f is harvested (and its slot freed) at the
  START of frame f+1 — the alignment rule pairing its observations with the
  poses of frames f-K+1..f (module docstring)."""
  kf = MSCKFEskf()
  pipe = VisualOdometryPipeline(kf, n_tracks=8, max_features=4)
  ids = np.array([-1])
  t = 0.0
  for k in range(N_AUGMENT):
    t += 0.1
    uv = np.array([[0.1 + 0.01 * k, 0.2 + 0.01 * k]])
    _, ids = pipe.process_frame(t, ids, uv)
  # complete but not yet harvested (harvest happens next frame, pre-merge)
  assert pipe.live_track_count == 1
  tr = np.asarray(pipe.tracks)
  assert tr[ids[0], 0, fh.H_COMPLETE] == 1.0

  # next frame: harvested first, slot freed, new detection reuses it
  # (the zero-baseline clones make triangulation fail here, so the filter
  # takes its empty-frame fallback — feature updates are exercised by the
  # end-to-end test; this one checks the store bookkeeping)
  est, ids_new = pipe.process_frame(t + 0.1, [-1], np.array([[0.5, 0.5]]))
  assert ids_new[0] == ids[0]  # smallest empty slot again
  assert est is not None  # frame processed (window advanced)
  assert pipe.live_track_count == 1  # only the new track remains