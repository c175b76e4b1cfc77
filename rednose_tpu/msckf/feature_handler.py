"""MSCKF feature-track bookkeeping: fixed-capacity, fully-vectorized.

TPU-native rebuild of the reference template (rednose/templates/
feature_handler.c): a fixed store of N_TRACKS tracks x (K+1) slots x 5
doubles where slot 0 is a header [count, last_feature_id, seen_this_frame,
complete, valid] and slots 1..K hold raw feature rows. The reference's
sequential C loop (one feature at a time, shared empty_idx counter) becomes
a data-parallel scatter: first-match detection via segment_min, new-track
slot allocation via an exclusive cumsum into the caller-provided empty_idxs
— identical results, no sequential dependence, jit/vmap-friendly.

Semantics matched to merge_features (feature_handler.c:22-56):
  - a feature appends to track `match` iff that track's last_feature_id ==
    match AND the track was not already updated this frame; otherwise it
    starts a new track at the next empty slot.
  - when a C-loop would append two features to one track, only the FIRST
    (lowest index) appends; later ones start new tracks — reproduced here
    with the segment_min first-occurrence mask.
  - a track reaching K observations is labeled complete, and valid iff
    sane() accepts its motion (feature_handler.c:38-45).
One deliberate deviation: appends beyond K observations are dropped (the C
code would write out of bounds, feature_handler.c:36-37).

Feature rows are [x, next_id, u, v, match_idx] (cols 1..4 used, matching the
reference's memcpy of the full 5-double row).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# header column indices (slot 0)
H_COUNT, H_LAST_ID, H_SEEN, H_COMPLETE, H_VALID = 0, 1, 2, 3, 4

DEFAULT_N_TRACKS = 6000
DEFAULT_N_FEATURES = 3000


def empty_tracks(K: int, n_tracks: int = DEFAULT_N_TRACKS,
                 dtype=jnp.float64):
  return jnp.zeros((n_tracks, K + 1, 5), dtype=dtype)


def sane(track):
  """Reject erratic inter-frame motion (feature_handler.c:1-20): adjacent
  |du|/|dv| ratios outside [0.5, 2] while either exceeds 0.05."""
  u = track[1:, 2]  # (K,) image-x per observation slot
  v = track[1:, 3]
  dx = jnp.abs(u[1:] - u[:-1])  # (K-1,)
  dy = jnp.abs(v[1:] - v[:-1])

  def bad(d):
    cur, prev = d[1:], d[:-1]
    big = jnp.logical_or(cur > 0.05, prev > 0.05)
    ratio = jnp.logical_or(cur > 2.0 * prev, cur < 0.5 * prev)
    return jnp.any(jnp.logical_and(big, ratio))

  return jnp.logical_not(jnp.logical_or(bad(dx), bad(dy)))


def reset_seen(tracks):
  """Clear the per-frame 'seen' header bit before merging a new frame."""
  return tracks.at[:, 0, H_SEEN].set(0.0)


@jax.jit
def merge_features(tracks, features, empty_idxs):
  """Merge one frame of features into the track store.

  Args:
    tracks: (n_tracks, K+1, 5) store.
    features: (n_features, 5) rows [x, next_id, u, v, match_idx]; rows with
      match_idx < 0 are padding and ignored.
    empty_idxs: int indices of currently-empty track slots, consumed in
      order by new tracks; entries >= n_tracks are sentinels for "no slot"
      (empty_slots pads with them when the store is nearly full).
  Returns (tracks, n_dropped): the updated store and the number of NEW
  tracks that could not start because the supplied empty slots ran out
  (the reference C bounds allocation by the caller's counter,
  feature_handler.c:46-52; silently colliding on the last slot is not an
  option, so overflowing tracks are dropped and counted).
  """
  n_tracks, K_plus_1, _ = tracks.shape
  K = K_plus_1 - 1
  nf = features.shape[0]
  dtype = tracks.dtype

  match = features[:, 4].astype(jnp.int32)
  live = match >= 0
  match_c = jnp.clip(match, 0, n_tracks - 1)

  hdr = tracks[match_c, 0]  # (nf, 5)
  matched = (hdr[:, H_LAST_ID] == match_c.astype(dtype)) & \
            (hdr[:, H_SEEN] == 0.0) & live
  appendable = matched & (hdr[:, H_COUNT] < K)
  # features matching an already-complete track are dropped entirely (the C
  # loop would write out of bounds here, feature_handler.c:36-37; the caller
  # is expected to harvest complete tracks before the next merge)
  dropped_full = matched & (hdr[:, H_COUNT] >= K)

  # first feature index claiming each track (C loop order: lowest i wins)
  order = jnp.arange(nf, dtype=jnp.int32)
  claim = jnp.where(appendable, match_c, n_tracks)  # non-claims -> overflow bin
  first = jax.ops.segment_min(order, claim, num_segments=n_tracks + 1,
                              indices_are_sorted=False)
  is_append = appendable & (first[match_c] == order)

  # ---- appends -------------------------------------------------------------
  tgt = jnp.where(is_append, match_c, n_tracks)  # out-of-bounds rows dropped
  new_count = hdr[:, H_COUNT] + 1.0
  slot = new_count.astype(jnp.int32)
  tracks = tracks.at[tgt, 0, H_COUNT].set(new_count, mode='drop')
  tracks = tracks.at[tgt, 0, H_LAST_ID].set(features[:, 1], mode='drop')
  tracks = tracks.at[tgt, 0, H_SEEN].set(1.0, mode='drop')
  tracks = tracks.at[tgt, slot].set(features, mode='drop')

  completed = is_append & (new_count == float(K))
  tracks = tracks.at[jnp.where(completed, match_c, n_tracks),
                     0, H_COMPLETE].set(1.0, mode='drop')
  # validity: sane() over the post-append track, only where just completed
  sane_all = jax.vmap(sane)(tracks[match_c])
  tracks = tracks.at[jnp.where(completed & sane_all, match_c, n_tracks),
                     0, H_VALID].set(1.0, mode='drop')

  # ---- new tracks ----------------------------------------------------------
  is_new = live & jnp.logical_not(is_append) & jnp.logical_not(dropped_full)
  rank = jnp.cumsum(is_new.astype(jnp.int32)) - 1
  n_slots = empty_idxs.shape[0]
  in_range = is_new & (rank < n_slots)
  slot_idx = empty_idxs[jnp.clip(rank, 0, n_slots - 1)]
  slot_idx = jnp.where(in_range, slot_idx, n_tracks).astype(jnp.int32)
  # dropped: ran past the supplied slots, or landed on a sentinel pad entry
  n_dropped = jnp.sum(is_new & (slot_idx >= n_tracks))
  hdr_new = jnp.stack([
      jnp.ones((nf,), dtype), features[:, 1], jnp.ones((nf,), dtype),
      jnp.zeros((nf,), dtype), jnp.zeros((nf,), dtype)], axis=1)
  tracks = tracks.at[slot_idx, 0].set(hdr_new, mode='drop')
  tracks = tracks.at[slot_idx, 1].set(features, mode='drop')
  return tracks, n_dropped


@functools.partial(jax.jit, static_argnums=(1,))
def empty_slots(tracks, n_features: int = DEFAULT_N_FEATURES):
  """Indices of up-to-n_features empty track slots (count == 0), the host-side
  bookkeeping the reference leaves to the caller."""
  is_empty = tracks[:, 0, H_COUNT] == 0.0
  # stable top-k trick: empty slots keep their index, others sort to the end
  n_tracks = tracks.shape[0]
  keys = jnp.where(is_empty, jnp.arange(n_tracks), n_tracks)
  return jnp.sort(keys)[:n_features].astype(jnp.int32)
