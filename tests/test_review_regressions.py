"""Regression tests for defects found in code review: float32 gate overflow,
feature kinds in heterogeneous streams, empty observation batches, epoch
timestamps, single-track input shape, registry completeness, full-track
feature drops."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from rednose_tpu import registry
from rednose_tpu.core import step as step_ops
from rednose_tpu.models.kinematic import KinematicKalman
from rednose_tpu.models.kinematic import ObservationKind as KK
from rednose_tpu.models.msckf_vo import (
    MSCKFVisualOdometry,
    N_AUGMENT,
    build_msckf_vo_spec,
)
from rednose_tpu.models.msckf_vo import ObservationKind as MK
from rednose_tpu.runtime.scan import build_scan_stream, pad_log


def test_gated_outlier_float32_no_nan():
  """A gated outlier with large R in float32 must not overflow the
  closed-form solve (was: 1e16 R inflation -> adjugate products -> inf/NaN).
  The gate must leave state and covariance exactly unchanged."""
  spec = KinematicKalman.build_spec()
  om = spec.obs[KK.POSITION]
  spec = dataclasses.replace(
      spec, obs={KK.POSITION: dataclasses.replace(om, maha_test=True)})

  x = jnp.asarray([0.0, 0.0], jnp.float32)
  P = jnp.asarray(np.diag([0.01, 0.01]), jnp.float32)
  R = jnp.asarray([[1.0e4]], jnp.float32)  # 100 m GPS std
  z = jnp.asarray([1.0e4], jnp.float32)    # wild outlier -> gated
  x2, P2, y = step_ops.update(spec, KK.POSITION, {}, x, P, z, R,
                              jnp.zeros((1,), jnp.float32))
  assert np.all(np.isfinite(np.asarray(x2)))
  np.testing.assert_allclose(np.asarray(x2), np.asarray(x))
  np.testing.assert_allclose(np.asarray(P2), np.asarray(P))

  # and a 3-dim gated kind through the same closed-form path
  from rednose_tpu.models.live import LiveKalman, ObservationKind as LK
  lspec = LiveKalman.build_spec()
  lom = lspec.obs[LK.ECEF_POS]
  lspec = dataclasses.replace(
      lspec, obs={**dict(lspec.obs),
                  LK.ECEF_POS: dataclasses.replace(lom, maha_test=True)})
  xl = jnp.asarray(LiveKalman.initial_x, jnp.float32)
  Pl = jnp.asarray(np.diag(LiveKalman.initial_P_diag), jnp.float32)
  Rl = jnp.asarray(np.diag([1e4] * 3), jnp.float32)
  zl = xl[0:3] + 1e6  # gross outlier
  x2, P2, _ = step_ops.update(lspec, LK.ECEF_POS, {}, xl, Pl, zl, Rl,
                              jnp.zeros((1,), jnp.float32))
  assert np.all(np.isfinite(np.asarray(x2)))
  assert np.all(np.isfinite(np.asarray(P2)))


def test_scan_stream_with_feature_kind():
  """Heterogeneous stream mixing a plain kind with an MSCKF feature kind
  must build and run (was: lax.switch branch shape mismatch)."""
  spec = build_msckf_vo_spec()
  kinds = (MK.POSITION, MK.MSCKF_TEST)
  scan_fn, _ = build_scan_stream(spec, kinds)

  ea = np.array([1.0, 2.0, 10.0])
  x0 = np.zeros(spec.dim_x)
  h_feat = np.asarray(spec.obs[MK.MSCKF_TEST].h({}, jnp.asarray(x0),
                                                jnp.asarray(ea)))
  log = [
      (0.1, MK.POSITION, np.zeros(3), np.eye(3), None),
      (0.2, MK.MSCKF_TEST, h_feat, np.eye(2 * N_AUGMENT) * 1e-4, ea),
      (0.3, MK.POSITION, np.zeros(3), np.eye(3), None),
  ]
  dts, ki, zs, Rs, eas = pad_log(spec, kinds, log, t0=0.0)
  (x_f, P_f), _ = scan_fn(
      {}, jnp.asarray(x0), jnp.asarray(np.eye(spec.dim_err)),
      jnp.asarray(np.eye(spec.dim_err) * 1e-4),
      jnp.asarray(dts), jnp.asarray(ki), jnp.asarray(zs), jnp.asarray(Rs),
      jnp.asarray(eas))
  assert np.all(np.isfinite(np.asarray(x_f)))
  assert np.all(np.isfinite(np.asarray(P_f)))


def test_empty_observation_batch_is_noop_update():
  """predict_and_observe with an empty batch must predict + checkpoint, not
  crash (was: atleast_2d([]) -> (1, 0) -> assertion)."""
  kf = KinematicKalman()
  kf.predict_and_observe(0.0, KK.POSITION, [[0.5]])
  est = kf.predict_and_observe(1.0, KK.POSITION, [])
  assert est is not None
  assert kf.t == 1.0
  assert len(est[6]) == 0  # no innovations


def test_epoch_timestamps_preserve_dt():
  """Unix-epoch timestamps must not quantize dt through a float32 cast
  (was: on-device t[k]-t[k-1] in f32 -> dt of 0 or 256 s)."""
  spec = KinematicKalman.build_spec()
  t0 = 1.7e9
  log = [(t0 + (i + 1) * 0.01, KK.POSITION, [0.0], np.atleast_2d(0.01), None)
         for i in range(10)]
  dts, ki, zs, Rs, eas = pad_log(spec, (KK.POSITION,), log, t0=t0)
  # f64 epoch spacing at 1.7e9 is ~2.4e-7 s, so ~1e-8 error is inherent
  # (identical in the reference, which is also float64)
  np.testing.assert_allclose(dts, 0.01, atol=1e-7)
  # and they survive the f32 cast because they are already small deltas
  assert abs(float(jnp.asarray(dts, jnp.float32)[0]) - 0.01) < 1e-7


def test_single_track_shape_promotion():
  kf = MSCKFVisualOdometry()
  kf.observe_camera_frame(0.1, np.zeros((0, N_AUGMENT, 2)))
  # a single 2-D track must be treated as one track, not N_AUGMENT tracks
  one_track = np.full((N_AUGMENT, 2), 0.1)
  est = kf.observe_camera_frame(0.2, one_track)
  # triangulation of a degenerate zero-baseline track may fail (None) but it
  # must not crash or mis-shape; a 3-D batch of one behaves identically
  est2 = kf.observe_camera_frame(0.3, one_track[None])
  del est, est2


def test_registry_includes_all_shipped_models():
  names = set(registry.registered_filters())
  assert {'kinematic', 'live', 'msckf_vo'} <= names
  assert registry.lookup('msckf_vo') is MSCKFVisualOdometry


def test_full_track_features_are_dropped():
  """A feature matching a complete (count==K) track is dropped — it neither
  appends out of bounds nor burns an empty slot."""
  from rednose_tpu.msckf import feature_handler as fh

  K, n_tracks = 3, 8
  tracks = np.zeros((n_tracks, K + 1, 5))
  tracks[2, 0] = [K, 2, 0, 1, 0]  # full track, id 2
  features = np.zeros((2, 5))
  features[0] = [0, 100, 0.1, 0.1, 2]   # matches the full track -> dropped
  features[1] = [0, 101, 0.2, 0.2, -1]  # padding
  empty = np.array([0, 1, 3, 4], dtype=np.int64)
  out, _ = fh.merge_features(
      jnp.asarray(tracks), jnp.asarray(features), jnp.asarray(empty))
  out = np.asarray(out)
  np.testing.assert_allclose(out[2, 0, 0], K)     # count unchanged
  assert np.all(out[[0, 1, 3, 4], 0, 0] == 0)      # no new track spawned


def test_all_failed_triangulation_still_advances_window():
  """A frame whose triangulations all fail must still predict + augment
  (was: early None return desynced the clone window)."""
  kf = MSCKFVisualOdometry()
  kf.observe_camera_frame(0.1, np.zeros((0, N_AUGMENT, 2)))
  t_before = list(kf.filter.get_augment_times())
  # zero-baseline clones -> degenerate geometry -> all triangulations fail
  kf.observe_camera_frame(0.2, np.full((2, N_AUGMENT, 2), 0.1))
  assert kf.t == 0.2
  t_after = kf.filter.get_augment_times()
  assert t_after != t_before and t_after[-1] == 0.2


def test_pad_log_rejects_out_of_order():
  spec = KinematicKalman.build_spec()
  log = [(0.2, KK.POSITION, [0.0], np.atleast_2d(0.01), None),
         (0.1, KK.POSITION, [0.0], np.atleast_2d(0.01), None)]
  with pytest.raises(ValueError, match="non-decreasing"):
    pad_log(spec, (KK.POSITION,), log, t0=0.0)


def test_checkpoint_roundtrips_augment_times(tmp_path):
  from rednose_tpu.runtime.checkpoint import load_filter, save_filter

  kf = MSCKFVisualOdometry()
  for k in range(3):
    kf.observe_camera_frame(0.1 * (k + 1), np.zeros((0, N_AUGMENT, 2)))
  path = tmp_path / "msckf.npz"
  save_filter(path, kf.filter)
  kf2 = MSCKFVisualOdometry()
  load_filter(path, kf2.filter)
  assert kf2.filter.get_augment_times() == kf.filter.get_augment_times()


def test_bank_epoch_time_advances():
  """Epoch-scale t0 must not freeze bank time in float32 (was: t stored as
  absolute f32, ulp(1.7e9)=256 s)."""
  from rednose_tpu.runtime import bank as bank_ops

  spec = KinematicKalman.build_spec()
  state = bank_ops.init_bank(
      spec, KinematicKalman.initial_x, np.diag(KinematicKalman.initial_P_diag),
      batch=4, t0=1.7e9, dtype=jnp.float32)
  z = jnp.zeros((4, 1), jnp.float32)
  R = jnp.full((4, 1, 1), 0.01, jnp.float32)
  ea = jnp.zeros((4, 1), jnp.float32)
  Q = jnp.asarray(KinematicKalman.Q, jnp.float32)
  state2, _ = bank_ops.bank_predict_and_update(
      spec, KK.POSITION, {}, state, Q, jnp.asarray(0.01, jnp.float32), z, R, ea)
  np.testing.assert_allclose(state2.absolute_t(), 1.7e9 + 0.01)


def test_set_global_rejects_non_mapping_params():
  from rednose_tpu.runtime.driver import FilterEngine

  spec = KinematicKalman.build_spec()
  eng = FilterEngine(spec, KinematicKalman.Q, KinematicKalman.initial_x,
                     np.diag(KinematicKalman.initial_P_diag),
                     params=(0.5, 0.2))
  with pytest.raises(TypeError, match="mapping"):
    eng.set_global('gain', 1.0)


def test_variable_batch_n_buckets_one_compile():
  """Variable measurement counts n must reuse one compiled program per
  power-of-two bucket (pad rows are masked, bit-exact no-ops), and results
  must equal the unbucketed per-row oracle."""
  import jax

  from rednose_tpu.models.kinematic import KinematicKalman

  kf = KinematicKalman()
  spec = kf.spec
  fn = step_ops.jit_predict_and_update_batch(spec, KK.POSITION)
  cache_before = fn._cache_size()  # other tests share this lru-cached fn
  rng = np.random.RandomState(0)

  # oracle: plain sequential updates (no padding) in parallel bookkeeping
  x_ref = jnp.asarray(KinematicKalman.initial_x, jnp.float64)
  P_ref = jnp.asarray(np.diag(KinematicKalman.initial_P_diag), jnp.float64)
  Q = jnp.asarray(KinematicKalman.Q, jnp.float64)

  t = 0.0
  first = True
  for n in [1, 2, 3, 4, 5, 3, 1, 7]:
    t += 0.25  # exactly representable: dt = t - filter_time stays bit-exact
    z = rng.randn(n, 1)
    R = np.tile(np.eye(1)[None] * 0.04, (n, 1, 1))
    est = kf.filter.predict_and_update_batch(t, KK.POSITION, z, R)
    assert len(est[6]) == n  # innovations trimmed to the real rows

    # first observation initializes filter_time -> dt = 0 (reference
    # semantics, ekf_sym.py:472-476)
    x_ref, P_ref = step_ops.predict(spec, {}, x_ref, P_ref, Q,
                                    jnp.asarray(0.0 if first else 0.25))
    first = False
    for i in range(n):
      x_ref, P_ref, _ = step_ops.update(
          spec, KK.POSITION, {}, x_ref, P_ref, jnp.asarray(z[i]),
          jnp.asarray(R[i]), jnp.zeros((1,)))
    # fused-vs-separate jit programs may differ by an ulp (FMA contraction)
    np.testing.assert_allclose(kf.filter.state(), np.asarray(x_ref),
                               rtol=1e-12, atol=1e-15)
    np.testing.assert_allclose(kf.filter.covs(), np.asarray(P_ref),
                               rtol=1e-12, atol=1e-15)

  # n in {1..7} -> buckets {1, 2, 4, 8}: at most 4 new compiled programs...
  cache_after = fn._cache_size()
  assert cache_after - cache_before <= 4, (cache_before, cache_after)
  # ...and re-feeding every n in [1, 8] compiles nothing new
  for n in range(1, 9):
    t += 0.25
    kf.filter.predict_and_update_batch(
        t, KK.POSITION, rng.randn(n, 1), np.tile(np.eye(1)[None], (n, 1, 1)))
  assert fn._cache_size() == cache_after, fn._cache_size()

  # masked pad rows are bit-exact no-ops: same compiled program, same real
  # rows, different pad-row garbage -> identical outputs
  x0 = jnp.asarray(KinematicKalman.initial_x, jnp.float64)
  P0 = jnp.asarray(np.diag(KinematicKalman.initial_P_diag), jnp.float64)
  zr = rng.randn(3, 1)
  args = lambda pad: (jnp.asarray(np.concatenate([zr, [[pad]]])),
                      jnp.asarray(np.tile(np.eye(1)[None], (4, 1, 1))),
                      jnp.zeros((4, 1)),
                      jnp.asarray([True, True, True, False]))
  outs_a = fn({}, x0, P0, Q, jnp.asarray(0.25), *args(0.0))
  outs_b = fn({}, x0, P0, Q, jnp.asarray(0.25), *args(9.9e9))
  np.testing.assert_array_equal(np.asarray(outs_a[2]), np.asarray(outs_b[2]))
  np.testing.assert_array_equal(np.asarray(outs_a[3]), np.asarray(outs_b[3]))
