"""Frame-to-filter visual-odometry pipeline: the glue the reference leaves
to its downstream consumer (openpilot's locationd).

The reference ships a fixed-capacity track store (feature_handler.c) and a
triangulation kernel (compute_pos.c) but no code connecting camera frames
to filter updates. This module is that wiring on top of OUR equivalents:

  detections --(id bookkeeping)--> feature_handler.merge_features
             --(harvest complete+valid tracks)--> kf.observe_camera_frame
                                                   (triangulate + MSCKF
                                                    nullspace update +
                                                    window augment)

POSE/OBSERVATION ALIGNMENT: the filter clones the pose of frame f into its
window AFTER frame f's update (driver augment ordering, ekf_sym.py:525-526),
so at frame f the window holds the poses of frames f-K..f-1. A track
harvested at the START of frame f therefore aligns exactly: it completed at
frame f-1 with observations from frames f-K..f-1. Harvesting after merging
frame f's detections (so the track's newest row is frame f) would pair
every observation with a one-frame-old clone pose, biasing triangulation
and the MSCKF residuals.

Id/slot contract (implied by the C lookup `track[match].last_id == match`,
feature_handler.c:33): a track lives at the store slot EQUAL to its
feature id and keeps that id for life. The pipeline maintains the contract
by (a) allocating ids for new detections from the empty slots in
allocation-rank order — exactly the order merge_features' cumsum allocator
consumes empty_idxs — and (b) validating continuing ids on the host
(live track at that slot, no duplicates this frame) so that every row it
classifies as "append" really appends and every "new" row really consumes
the next empty slot. Slot 0 is reserved: an empty slot 0 would satisfy the
append check for id 0 (last_id == 0 == match) and silently skip the
allocator, shifting every later allocation.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from rednose_tpu.msckf import feature_handler as fh


class VisualOdometryPipeline:
  """Owns the track store for one camera feeding one MSCKF filter.

  `kf` is a facade with `observe_camera_frame(t, tracks_img)` whose window
  length defines the complete-track size K (models/msckf_eskf.MSCKFEskf or
  models/msckf_vo.MSCKFVisualOdometry). `max_features` caps detections per
  frame; frames are padded to it so the jitted merge compiles ONCE (a
  per-frame detection count would otherwise recompile every new n).
  """

  def __init__(self, kf, n_tracks: int = fh.DEFAULT_N_TRACKS,
               max_features: int = 256):
    self.kf = kf
    self.K = kf.spec.n_augment
    self.n_tracks = n_tracks
    self.max_features = max_features
    tracks = fh.empty_tracks(self.K, n_tracks)
    # reserve slot 0 (module docstring): count = -1 is never empty and the
    # host-side continuing-id validation (count > 0) never appends to it
    self.tracks = tracks.at[0, 0, fh.H_COUNT].set(-1.0)
    self.dropped_total = 0  # detections lost to store exhaustion

  def process_frame(self, t, ids, uvs):
    """Ingest one camera frame and run the filter.

    Args:
      ids: (n,) int persistent feature ids from the upstream tracker; -1
        marks a brand-new detection (an id will be allocated for it). An id
        whose track is gone (harvested/stale) is transparently re-issued.
      uvs: (n, 2) normalized image coordinates captured at time t.
    Returns (estimate, ids_out): the filter's Estimate (or None if it
    rejected the frame as too old) and the (n,) ids each detection carries
    from now on — feed these back as `ids` when the same feature is
    re-observed next frame (-1 where the store was full).
    """
    ids = np.asarray(ids, dtype=np.int64)
    uvs = np.asarray(uvs, dtype=np.float64)
    n = ids.shape[0]
    assert uvs.shape == (n, 2), uvs.shape
    assert n <= self.max_features, (n, self.max_features)

    # ---- harvest FIRST (pose/observation alignment, module docstring) ----
    # only the (n_tracks, 5) header crosses the device boundary; completed
    # track rows transfer individually (a full-store pull is multi-MB)
    hdr = np.array(self.tracks[:, 0, :])  # mutable host copy
    complete_rows = np.flatnonzero(hdr[:, fh.H_COMPLETE] == 1.0)
    if complete_rows.size:
      data = np.asarray(self.tracks[jnp.asarray(complete_rows)])
      valid = hdr[complete_rows, fh.H_VALID] == 1.0
      tracks_img = data[valid][:, 1:, 2:4]  # (m, K, 2), oldest first
      self.tracks = self.tracks.at[jnp.asarray(complete_rows)].set(0.0)
      hdr[complete_rows] = 0.0  # keep the host header view in sync
    else:
      tracks_img = np.zeros((0, self.K, 2))

    # ---- classify detections (host bookkeeping on the header) -----------
    # append to a LIVE track at slot == id (first claim wins), else allocate
    # a fresh id from the empty slots in rank order so merge's cumsum
    # allocator lands it at slot == new id
    empty = np.flatnonzero(hdr[:, fh.H_COUNT] == 0.0)
    ids_out = np.full(n, -1, dtype=np.int64)
    claimed: set[int] = set()
    alloc_slots: list[int] = []  # slots for NEW rows, in row order
    rank = 0
    for row in range(n):
      i = int(ids[row])
      live = (0 < i < self.n_tracks and hdr[i, fh.H_COUNT] > 0
              and hdr[i, fh.H_LAST_ID] == i and i not in claimed)
      if live:
        ids_out[row] = i
        claimed.add(i)
      elif rank < empty.shape[0]:
        slot = int(empty[rank])
        ids_out[row] = slot
        alloc_slots.append(slot)
        rank += 1
      else:
        self.dropped_total += 1  # store full: detection lost

    # ---- merge (fixed shapes: compiles once) -----------------------------
    features = np.full((self.max_features, 5), -1.0)  # pad rows: match < 0
    features[:n, 0] = 0.0
    features[:n, 1] = ids_out  # next_id: the id the track keeps
    features[:n, 2:4] = uvs
    features[:n, 4] = ids_out  # match: continuing rows append, new rows miss
    empty_arg = np.full((self.max_features,), self.n_tracks, dtype=np.int64)
    empty_arg[:len(alloc_slots)] = alloc_slots
    self.tracks = fh.reset_seen(self.tracks)
    self.tracks, _ = fh.merge_features(
        self.tracks, jnp.asarray(features), jnp.asarray(empty_arg))

    est = self.kf.observe_camera_frame(t, tracks_img)
    return est, ids_out

  @property
  def live_track_count(self) -> int:
    return int((np.asarray(self.tracks[:, 0, fh.H_COUNT]) > 0).sum())
