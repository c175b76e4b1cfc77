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
  models/msckf_vo.MSCKFVisualOdometry).
  """

  def __init__(self, kf, n_tracks: int = fh.DEFAULT_N_TRACKS):
    self.kf = kf
    self.K = kf.spec.n_augment
    self.n_tracks = n_tracks
    tracks = fh.empty_tracks(self.K, n_tracks)
    # reserve slot 0 (module docstring): count = -1 is never empty and the
    # host-side continuing-id validation (count > 0) never appends to it
    self.tracks = tracks.at[0, 0, fh.H_COUNT].set(-1.0)
    self.dropped_total = 0  # new tracks lost to store exhaustion

  def process_frame(self, t, ids, uvs):
    """Ingest one camera frame and run the filter.

    Args:
      ids: (n,) int persistent feature ids from the upstream tracker; -1
        marks a brand-new detection (an id will be allocated for it). An id
        whose track is gone (harvested/stale) is transparently re-issued.
      uvs: (n, 2) normalized image coordinates.
    Returns (estimate, ids_out): the filter's Estimate (or None if it
    rejected the frame as too old) and the (n,) ids each detection carries
    from now on — feed these back as `ids` when the same feature is
    re-observed next frame (-1 where the store was full).
    """
    ids = np.asarray(ids, dtype=np.int64)
    uvs = np.asarray(uvs, dtype=np.float64)
    n = ids.shape[0]
    assert uvs.shape == (n, 2), uvs.shape

    self.tracks = fh.reset_seen(self.tracks)
    hdr = np.asarray(self.tracks[:, 0, :])
    empty = np.asarray(fh.empty_slots(self.tracks, max(n, 1)))

    # classify each detection: append to a LIVE track at slot == id (first
    # claim wins), else allocate a fresh id from the empty slots in rank
    # order so merge's cumsum allocator lands it at slot == new id
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
      else:
        while rank < empty.shape[0] and empty[rank] >= self.n_tracks:
          rank += 1
        if rank < empty.shape[0]:
          slot = int(empty[rank])
          ids_out[row] = slot
          alloc_slots.append(slot)
          rank += 1
        # else: store full -> row stays -1 (padding; merge ignores it)

    features = np.zeros((n, 5))
    features[:, 1] = ids_out  # next_id: the id the track keeps
    features[:, 2:4] = uvs
    features[:, 4] = ids_out  # match: continuing rows append, new rows miss

    # merge's cumsum allocator consumes empty_idxs in the exact row order
    # of new rows, which is the order alloc_slots was built in
    self.tracks, n_dropped = fh.merge_features(
        self.tracks, jnp.asarray(features),
        jnp.asarray(np.asarray(alloc_slots or [self.n_tracks],
                               dtype=np.int64)))
    self.dropped_total += int(n_dropped)

    # harvest complete tracks: valid ones feed the filter, all leave the
    # store (their slots free up for reallocation)
    tr = np.asarray(self.tracks)
    complete = tr[:, 0, fh.H_COMPLETE] == 1.0
    valid = complete & (tr[:, 0, fh.H_VALID] == 1.0)
    tracks_img = tr[valid][:, 1:, 2:4]  # (m, K, 2), oldest first
    if complete.any():
      self.tracks = self.tracks.at[
          jnp.asarray(np.flatnonzero(complete))].set(0.0)

    est = self.kf.observe_camera_frame(
        t, tracks_img if tracks_img.size else np.zeros((0, self.K, 2)))
    return est, ids_out

  @property
  def live_track_count(self) -> int:
    return int((np.asarray(self.tracks)[:, 0, fh.H_COUNT] > 0).sum())
