"""MSCKF subsystem tests: triangulation, feature tracks, augment, and the
nullspace-projected feature update — all reference coverage gaps (SURVEY.md
§4 lists the MSCKF paths as untested in-repo)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rednose_tpu.core import step as step_ops
from rednose_tpu.core.spec import FilterSpec, ObservationModel
from rednose_tpu.msckf import feature_handler as fh
from rednose_tpu.msckf.triangulation import compute_pos, compute_pos_batch
from rednose_tpu.ops.quaternion import euler_to_quat, quat_to_rot


# ---------------------------------------------------------------- triangulation

def _make_track(K=8, seed=0):
  """Synthesize a camera sweeping past a fixed ECEF feature point."""
  rng = np.random.default_rng(seed)
  to_c = np.eye(3)
  feature = np.array([1.0, 2.0, 10.0])
  poses = np.zeros((K, 7))
  img = np.zeros((K, 2))
  for k in range(K):
    pos = np.array([0.2 * k, -0.1 * k, 0.0])
    q = np.asarray(euler_to_quat(jnp.asarray([0.01 * k, -0.02 * k, 0.03 * k])))
    poses[k, 0:3] = pos
    poses[k, 3:7] = q
    p_c = to_c @ np.asarray(quat_to_rot(jnp.asarray(q))).T @ (feature - pos)
    img[k] = p_c[:2] / p_c[2] + rng.normal(0, 1e-5, 2)
  return to_c, poses, img, feature


def test_triangulation_recovers_feature():
  to_c, poses, img, feature = _make_track()
  pos, ok = compute_pos(jnp.asarray(to_c), jnp.asarray(poses), jnp.asarray(img))
  assert bool(ok)
  np.testing.assert_allclose(np.asarray(pos), feature, atol=1e-2)


def test_triangulation_batch():
  tracks = [_make_track(seed=s) for s in range(4)]
  to_c = jnp.asarray(tracks[0][0])
  poses = jnp.stack([jnp.asarray(t[1]) for t in tracks])
  img = jnp.stack([jnp.asarray(t[2]) for t in tracks])
  pos, ok = compute_pos_batch(to_c, poses, img)
  assert pos.shape == (4, 3) and bool(jnp.all(ok))
  for i, t in enumerate(tracks):
    np.testing.assert_allclose(np.asarray(pos[i]), t[3], atol=1e-2)


# ---------------------------------------------------------------- feature store

def _merge_oracle(tracks, features, empty_idxs, K):
  """Sequential python mirror of the C loop (feature_handler.c:22-56)."""
  tracks = np.array(tracks)
  empty_i = 0
  for i in range(features.shape[0]):
    f = features[i]
    m = int(f[4])
    if m < 0:
      continue
    if tracks[m, 0, 1] == m and tracks[m, 0, 2] == 0:
      if tracks[m, 0, 0] >= K:
        continue  # full track: feature dropped (documented deviation)
      tracks[m, 0, 0] += 1
      tracks[m, 0, 1] = f[1]
      tracks[m, 0, 2] = 1
      idx = int(tracks[m, 0, 0])
      tracks[m, idx] = f
      if idx == K:
        tracks[m, 0, 3] = 1
        if _sane_oracle(tracks[m], K):
          tracks[m, 0, 4] = 1
    else:
      s = int(empty_idxs[empty_i])
      tracks[s, 0] = [1, f[1], 1, 0, 0]
      tracks[s, 1] = f
      empty_i += 1
  return tracks


def _sane_oracle(track, K):
  dx = [abs(track[i + 2][2] - track[i + 1][2]) for i in range(K - 1)]
  dy = [abs(track[i + 2][3] - track[i + 1][3]) for i in range(K - 1)]
  for i in range(1, K - 1):
    if (((dx[i] > 0.05 or dx[i - 1] > 0.05)
         and (dx[i] > 2 * dx[i - 1] or dx[i] < 0.5 * dx[i - 1]))
        or ((dy[i] > 0.05 or dy[i - 1] > 0.05)
            and (dy[i] > 2 * dy[i - 1] or dy[i] < 0.5 * dy[i - 1]))):
      return False
  return True


def test_merge_features_matches_sequential_oracle():
  K, n_tracks, nf = 4, 32, 12
  rng = np.random.default_rng(3)
  tracks = np.zeros((n_tracks, K + 1, 5))
  # pre-seed some tracks in various states
  for m, count in [(2, 1), (5, 2), (7, K - 1), (9, 3)]:
    tracks[m, 0] = [count, m, 0, 0, 0]
    for s in range(1, count + 1):
      tracks[m, s] = [0, m, 0.1 * s + 0.01 * m, 0.1 * s, m]

  features = np.zeros((nf, 5))
  for i in range(nf):
    # mix: appends to the seeded tracks (incl. a duplicate match), new tracks
    match = [2, 5, 7, 9, 2, -1, 11, 12, 13, 14, 15, 16][i]
    features[i] = [0, 100 + i, rng.normal(0, 0.02), rng.normal(0, 0.02), match]

  empty = np.array(sorted(set(range(n_tracks))
                          - {2, 5, 7, 9}), dtype=np.int64)[:nf]
  got, n_dropped = fh.merge_features(
      jnp.asarray(tracks), jnp.asarray(features), jnp.asarray(empty))
  want = _merge_oracle(tracks, features, empty, K)
  np.testing.assert_allclose(np.asarray(got), want)
  assert int(n_dropped) == 0


def test_merge_features_overflow_is_counted_not_collided():
  """More new tracks than supplied empty slots: the overflow is dropped and
  counted; the last empty slot holds exactly one track (no last-wins
  collision) and every other store entry is untouched."""
  K, n_tracks = 3, 16
  tracks = np.zeros((n_tracks, K + 1, 5))
  nf = 6  # 6 new tracks, only 2 empty slots supplied
  features = np.zeros((nf, 5))
  for i in range(nf):
    features[i] = [0, 100 + i, 0.1 * i, 0.2 * i, 5 + i]  # no matches -> new
  empty = np.array([3, 8], dtype=np.int64)
  out, n_dropped = fh.merge_features(
      jnp.asarray(tracks), jnp.asarray(features), jnp.asarray(empty))
  out = np.asarray(out)
  assert int(n_dropped) == 4
  np.testing.assert_allclose(out[3, 1], features[0])  # first new track
  np.testing.assert_allclose(out[8, 1], features[1])  # second new track
  untouched = [i for i in range(n_tracks) if i not in (3, 8)]
  assert np.all(out[untouched] == 0)

  # sentinel pad entries (>= n_tracks, as emitted by empty_slots on a nearly
  # full store) count as dropped too
  empty_pad = np.array([3, n_tracks, n_tracks], dtype=np.int64)
  out2, n_dropped2 = fh.merge_features(
      jnp.asarray(tracks), jnp.asarray(features), jnp.asarray(empty_pad))
  assert int(n_dropped2) == 5
  assert np.all(np.asarray(out2)[[i for i in range(n_tracks) if i != 3]] == 0)


def test_sane_matches_oracle():
  K = 6
  rng = np.random.default_rng(0)
  for trial in range(20):
    track = np.zeros((K + 1, 5))
    track[1:, 2] = np.cumsum(rng.normal(0, 0.05, K))
    track[1:, 3] = np.cumsum(rng.normal(0, 0.05, K))
    got = bool(fh.sane(jnp.asarray(track)))
    want = _sane_oracle(track, K)
    assert got == want, f"trial {trial}"


def test_empty_slots():
  K = 3
  tracks = np.zeros((10, K + 1, 5))
  tracks[[1, 4, 7], 0, 0] = 2  # occupied
  slots = np.asarray(fh.empty_slots(jnp.asarray(tracks), 5))
  np.testing.assert_array_equal(slots, [0, 2, 3, 5, 6])


def test_empty_slots_pads_with_sentinel_when_store_nearly_full():
  """Fewer empty slots than requested: the tail pads with n_tracks, the
  sentinel merge_features drops on (sort-free _compact_indices path)."""
  K = 3
  n_tracks = 10
  tracks = np.zeros((n_tracks, K + 1, 5))
  tracks[:, 0, 0] = 2          # all occupied...
  tracks[[3, 8], 0, 0] = 0.0   # ...except two
  slots = np.asarray(fh.empty_slots(jnp.asarray(tracks), 6))
  np.testing.assert_array_equal(
      slots, [3, 8, n_tracks, n_tracks, n_tracks, n_tracks])


def test_harvest_complete():
  """harvest_complete pulls complete+valid tracks ascending (padded with
  n_tracks), returns their observation rows oldest-first, and clears EVERY
  complete row (valid or not) while leaving incomplete tracks untouched."""
  K, n_tracks = 4, 12
  rng = np.random.default_rng(7)
  tracks = np.zeros((n_tracks, K + 1, 5))
  # 9: complete+valid, 2: complete+invalid, 5: complete+valid, 4: incomplete
  for m, (complete, valid) in [(9, (1, 1)), (2, (1, 0)), (5, (1, 1)),
                               (4, (0, 0))]:
    count = K if complete else 2
    tracks[m, 0] = [count, m, 0, complete, valid]
    tracks[m, 1:1 + count, 2:4] = rng.normal(0, 0.02, (count, 2))
  idxs, uv, out = fh.harvest_complete(jnp.asarray(tracks), 4)
  idxs, uv, out = np.asarray(idxs), np.asarray(uv), np.asarray(out)
  np.testing.assert_array_equal(idxs, [5, 9, n_tracks, n_tracks])
  np.testing.assert_allclose(uv[0], tracks[5, 1:, 2:4])
  np.testing.assert_allclose(uv[1], tracks[9, 1:, 2:4])
  assert np.all(out[[2, 5, 9]] == 0)           # complete rows cleared
  np.testing.assert_allclose(out[4], tracks[4])  # incomplete untouched
  # cleared slots are immediately re-allocatable
  slots = np.asarray(fh.empty_slots(jnp.asarray(out), 3))
  np.testing.assert_array_equal(slots, [0, 1, 2])


# ------------------------------------------------------- augment + feature update

def _msckf_spec(n_aug=3):
  """Tiny MSCKF: 6-dim main state (pos+vel), 3-dim pose clones."""
  dim_main, dim_aug = 6, 3
  dim_x = dim_main + dim_aug * n_aug

  def f(params, x, dt):
    del params
    return x.at[0:3].add(dt * x[3:6])

  def h_feat(params, x, ea):
    """Each clone observes the 2D projection offsets to feature ea (3,)."""
    del params
    outs = []
    for a in range(n_aug):
      cp = x[dim_main + 3 * a: dim_main + 3 * (a + 1)]
      d = ea - cp
      outs.append(jnp.stack([d[0] / d[2], d[1] / d[2]]))
    return jnp.concatenate(outs)

  obs = {15: ObservationModel(kind=15, h=h_feat, dz=2 * n_aug, ea_dim=3)}
  return FilterSpec(
      name='mini_msckf', dim_x=dim_x, dim_err=dim_x, f=f, obs=obs,
      dim_main=dim_main, dim_main_err=dim_main,
      dim_augment=dim_aug, dim_augment_err=dim_aug, n_augment=n_aug)


def test_augment_shifts_window():
  spec = _msckf_spec()
  rng = np.random.default_rng(0)
  x = jnp.asarray(rng.normal(size=(spec.dim_x,)))
  P = np.eye(spec.dim_err) + 0.1
  x2, P2 = step_ops.augment(spec, x, jnp.asarray(P))
  x2 = np.asarray(x2)
  # main state unchanged; clones shifted left; newest clone = current pose
  np.testing.assert_allclose(x2[:6], np.asarray(x[:6]))
  np.testing.assert_allclose(x2[6:9], np.asarray(x[9:12]))
  np.testing.assert_allclose(x2[9:12], np.asarray(x[12:15]))
  np.testing.assert_allclose(x2[12:15], np.asarray(x[:3]))
  # newest clone covariance == current pose covariance block
  P2 = np.asarray(P2)
  np.testing.assert_allclose(P2[12:15, 12:15], P[0:3, 0:3])
  np.testing.assert_allclose(P2[12:15, :6], P[0:3, :6])
  # P stays symmetric
  np.testing.assert_allclose(P2, P2.T)


def test_feature_update_nullspace_matches_svd_oracle():
  """QR-complete nullspace (jax path) vs an SVD-nullspace numpy oracle:
  any orthonormal left-nullspace basis must give the identical posterior
  (ekf_c.c:66-77 / ekf_sym.py:576-591 semantics)."""
  spec = _msckf_spec()
  rng = np.random.default_rng(1)
  x = np.zeros(spec.dim_x)
  x[3:6] = [0.1, 0.2, 0.0]
  for a in range(3):
    x[6 + 3 * a:9 + 3 * a] = [0.5 * a, -0.2 * a, 0.0]
  P = np.eye(spec.dim_err) * 0.5
  ea = np.array([1.0, 2.0, 10.0])
  import jax.numpy as jnp_
  z = np.asarray(spec.obs[15].h({}, jnp_.asarray(x), jnp_.asarray(ea)))
  z = z + rng.normal(0, 0.01, z.shape)
  R = np.eye(6) * 0.01**2

  x_jax, P_jax, y_jax = step_ops.update(
      spec, 15, {}, jnp_.asarray(x), jnp_.asarray(P), jnp_.asarray(z),
      jnp_.asarray(R), jnp_.asarray(ea))

  # numpy oracle with SVD nullspace
  H = np.asarray(spec.H(15, {}, jnp_.asarray(x), jnp_.asarray(ea)))
  He = np.asarray(spec.He(15, {}, jnp_.asarray(x), jnp_.asarray(ea)))
  h0 = np.asarray(spec.obs[15].h({}, jnp_.asarray(x), jnp_.asarray(ea)))
  u, s, _ = np.linalg.svd(He, full_matrices=True)
  A = u[:, 3:]  # left nullspace of He (dz=6, ea_dim=3 -> 3 cols)
  y = A.T @ (z - h0)
  Hp = A.T @ H
  Rp = A.T @ R @ A
  S = Hp @ P @ Hp.T + Rp
  Kg = P @ Hp.T @ np.linalg.inv(S)
  I_KH = np.eye(spec.dim_err) - Kg @ Hp
  P_np = I_KH @ P @ I_KH.T + Kg @ Rp @ Kg.T
  x_np = x + Kg @ y

  np.testing.assert_allclose(np.asarray(x_jax), x_np, rtol=1e-8, atol=1e-10)
  np.testing.assert_allclose(np.asarray(P_jax), P_np, rtol=1e-8, atol=1e-10)
  # the projected update must kill sensitivity to the feature position:
  # He^T A == 0
  np.testing.assert_allclose(He.T @ A, 0, atol=1e-12)


def test_feature_update_insensitive_to_feature_error():
  """After projection, perturbing the feature position along He's column
  space must not change the posterior state (the MSCKF depth-feedback fix,
  README.md:36-39)."""
  spec = _msckf_spec()
  x = np.zeros(spec.dim_x)
  x[3:6] = [0.1, 0.2, 0.0]
  for a in range(3):
    x[6 + 3 * a:9 + 3 * a] = [0.5 * a, -0.2 * a, 0.0]
  P = np.eye(spec.dim_err) * 0.5
  ea = np.array([1.0, 2.0, 10.0])
  import jax.numpy as jnp_
  z = np.asarray(spec.obs[15].h({}, jnp_.asarray(x), jnp_.asarray(ea)))
  R = np.eye(6) * 0.01**2

  x1, _, _ = step_ops.update(spec, 15, {}, jnp_.asarray(x), jnp_.asarray(P),
                             jnp_.asarray(z), jnp_.asarray(R), jnp_.asarray(ea))
  # z consistent with ea: innovation zero -> posterior == prior state
  np.testing.assert_allclose(np.asarray(x1), x, atol=1e-10)


def test_feature_store_at_reference_design_point():
  """The reference templates are sized 6000 tracks x 3000 features/frame
  (feature_handler.c:23-26); the vectorized store must handle that exact
  design point: two full frames, all 3000 tracks created then extended."""
  import jax.numpy as jnp

  from rednose_tpu.msckf import feature_handler as fh

  K = 4
  tracks = fh.empty_tracks(K)  # defaults: 6000 tracks
  assert tracks.shape == (6000, K + 1, 5)
  nf = fh.DEFAULT_N_FEATURES
  assert nf == 3000

  rng = np.random.RandomState(0)
  uv = rng.rand(nf, 2)
  # frame 1: all-new features (match points at a stale slot -> new track;
  # match < 0 would mean padding). next_id i lands (cumsum allocation over
  # the in-order empty slots of a fresh store) in slot i, so last_id ==
  # slot — the id/slot discipline the VO pipeline maintains
  # (msckf/pipeline.py)
  feats1 = np.column_stack([
      np.zeros(nf), np.arange(nf, dtype=np.float64),
      uv[:, 0], uv[:, 1], np.arange(nf, 2 * nf, dtype=np.float64)])
  tracks, dropped1 = fh.merge_features(
      tracks, jnp.asarray(feats1), fh.empty_slots(tracks))
  assert int(dropped1) == 0
  assert int(jnp.sum(tracks[:, 0, fh.H_COUNT] > 0)) == nf

  # frame 2: every feature matches its frame-1 track (match = slot = id)
  feats2 = np.column_stack([
      np.zeros(nf), np.arange(nf, dtype=np.float64),
      uv[:, 0] + 0.01, uv[:, 1] + 0.01,
      np.arange(nf, dtype=np.float64)])
  tracks = fh.reset_seen(tracks)
  tracks, dropped2 = fh.merge_features(
      tracks, jnp.asarray(feats2), fh.empty_slots(tracks))
  assert int(dropped2) == 0
  counts = np.asarray(tracks[:, 0, fh.H_COUNT])
  assert (counts[counts > 0] == 2.0).all()
  assert int((counts > 0).sum()) == nf
