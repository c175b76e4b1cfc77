"""LiveKalmanBank facade: path selection, parity with the ops-level scans,
time bookkeeping, checkpoint round trip."""

import jax.numpy as jnp
import numpy as np
import pytest

from rednose_tpu.models.live import LiveKalman, ObservationKind as K
from rednose_tpu.ops import live_lane
from rednose_tpu.runtime.live_bank import LiveKalmanBank


def _stream(B, T, seed=0):
  rng = np.random.RandomState(seed)
  dts = np.full((T,), 0.01)
  zs = LiveKalman.initial_x[0:3] + 5.0 * rng.randn(T, B, 3)
  return dts, zs


def test_run_matches_lane_scan_and_tracks_time():
  B, T = 16, 12
  dts, zs = _stream(B, T)
  bank = LiveKalmanBank(batch=B, t0=100.0)
  assert not bank.use_pallas  # CPU backend -> jnp lane path
  bank.run(dts, zs)

  x_ref, P_ref = live_lane.jit_live_lane_scan()(
      jnp.tile(jnp.asarray(LiveKalman.initial_x, jnp.float32), (B, 1)),
      jnp.tile(jnp.asarray(np.diag(LiveKalman.initial_P_diag),
                           jnp.float32)[:, :, None], (1, 1, B)),
      jnp.asarray(LiveKalman.Q, jnp.float32),
      jnp.asarray(dts, jnp.float32), jnp.asarray(zs, jnp.float32),
      jnp.asarray(LiveKalman.obs_noise[K.ECEF_POS], jnp.float32))
  np.testing.assert_array_equal(np.asarray(bank.x), np.asarray(x_ref))
  np.testing.assert_array_equal(np.asarray(bank.P),
                                np.asarray(P_ref).transpose(2, 0, 1))
  assert abs(bank.t - 100.12) < 1e-9


def test_pallas_interpret_path_matches_jnp_path():
  """Force the Pallas path (interpret-capable shapes) and compare."""
  B, T = 16, 8
  dts, zs = _stream(B, T, seed=1)
  jnp_bank = LiveKalmanBank(batch=B, use_pallas=False)
  jnp_bank.run(dts, zs)
  # the pallas path on CPU only works in interpret mode, which
  # live_bank_scan exposes; patch the facade call through it
  import functools

  from rednose_tpu.ops import pallas_live

  pl_bank = LiveKalmanBank(batch=B, use_pallas=True)
  orig = pallas_live.live_bank_scan
  try:
    pallas_live.live_bank_scan = functools.partial(orig, interpret=True)
    pl_bank.run(dts, zs)
  finally:
    pallas_live.live_bank_scan = orig
  np.testing.assert_array_equal(np.asarray(pl_bank.x), np.asarray(jnp_bank.x))
  np.testing.assert_array_equal(np.asarray(pl_bank.P), np.asarray(jnp_bank.P))


def test_run_mixed_and_checkpoint_roundtrip(tmp_path):
  B, T = 8, 8
  rng = np.random.RandomState(2)
  kinds = (K.PHONE_GYRO, K.ECEF_POS)
  dts = np.full((T,), 0.01)
  kind_idx = np.arange(T) % 2
  zs = np.where((kind_idx == 1)[:, None, None],
                LiveKalman.initial_x[0:3] + rng.randn(T, B, 3),
                0.02 * rng.randn(T, B, 3))
  bank = LiveKalmanBank(batch=B)
  bank.run_mixed(dts, kind_idx, zs, kinds)
  assert np.all(np.isfinite(np.asarray(bank.x)))

  path = tmp_path / "bank.npz"
  bank.save(path)
  bank2 = LiveKalmanBank(batch=B).load(path)
  np.testing.assert_array_equal(np.asarray(bank2.x), np.asarray(bank.x))
  np.testing.assert_array_equal(np.asarray(bank2.P), np.asarray(bank.P))
  assert bank2.t == bank.t

  # and the restored bank keeps running
  bank2.run(dts, LiveKalman.initial_x[0:3] + rng.randn(T, B, 3))
  assert np.all(np.isfinite(np.asarray(bank2.x)))


def test_review_findings_regressions(tmp_path):
  """Code-review regressions: off-diagonal Q path safety, missing per-kind R,
  empty stream no-op, standstill odometer update, checkpoint single-leaf
  container params."""
  import pytest

  B = 8
  # off-diagonal Q: auto path selection must avoid the (diagonal-only)
  # Pallas kernel, and forcing it must refuse loudly
  Q_od = np.asarray(LiveKalman.Q).copy()
  Q_od[0, 6] = Q_od[6, 0] = 1e-3
  bank = LiveKalmanBank(batch=B, Q=Q_od)
  assert not bank.use_pallas
  with pytest.raises(ValueError, match="diagonal Q"):
    LiveKalmanBank(batch=B, Q=Q_od, use_pallas=True)

  # camera-odo kinds have no obs_noise default: explicit error, not KeyError
  bank = LiveKalmanBank(batch=B)
  with pytest.raises(ValueError, match="per-measurement noise"):
    bank.run_mixed(np.full(2, 0.01), np.zeros(2, np.int32),
                   np.zeros((2, B, 3)),
                   (K.CAMERA_ODO_TRANSLATION, K.ECEF_POS))

  # empty stream: exact no-op (both paths share the early return)
  x_before = np.asarray(bank.x)
  bank.run(np.zeros((0,)), np.zeros((0, B, 3)))
  bank.run_mixed(np.zeros((0,)), np.zeros((0,), np.int32),
                 np.zeros((0, B, 3)), (K.ECEF_POS,))
  np.testing.assert_array_equal(np.asarray(bank.x), x_before)
  assert bank.t == 0.0

  # ODOMETRIC_SPEED at standstill (v = 0 in the default initial state) must
  # not NaN the bank: the |v| clamp degrades it to information-free
  bank = LiveKalmanBank(batch=B)
  bank.run_mixed(np.full(2, 0.01), np.zeros(2, np.int32),
                 np.zeros((2, B, 3)), (K.ODOMETRIC_SPEED,))
  assert np.all(np.isfinite(np.asarray(bank.x)))
  assert np.all(np.isfinite(np.asarray(bank.P)))

  # checkpoint: dict params whose value is a single-leaf CONTAINER must not
  # round-trip as a bare leaf (structure silently stripped)
  from rednose_tpu.models.kinematic import KinematicKalman
  from rednose_tpu.runtime.checkpoint import load_filter, save_filter

  kf = KinematicKalman(params={"gain": (np.asarray(2.0),)})
  path = tmp_path / "f.npz"
  save_filter(path, kf.filter)
  kf2 = KinematicKalman(params={"gain": (np.asarray(0.0),)})
  with pytest.raises(ValueError, match="treedef"):
    load_filter(path, kf2.filter)  # no self-describing keys, no treedef


@pytest.mark.slow
def test_streamed_per_step_R_matches_driver_oracle():
  """CAMERA_ODO_TRANSLATION with measurement-supplied per-step variances
  (the reference's columns 3:6 pattern, live_kf.py:325-337) through the
  mixed scan's r_stream — must equal sequential core/step updates with the
  same per-step R, on both the jnp and (interpret) Pallas paths."""
  import functools

  import jax

  from rednose_tpu.core import step as step_ops
  from rednose_tpu.models.live import build_live_spec
  from rednose_tpu.ops import pallas_live

  spec = build_live_spec()
  rng = np.random.RandomState(3)
  B, T = 8, 8
  kinds = (K.CAMERA_ODO_TRANSLATION, K.ECEF_POS)
  dts = np.full((T,), 0.01)
  kind_idx = (np.arange(T) % 2).astype(np.int32)
  stds = 0.05 + 0.1 * rng.rand(T, 3)  # per-step camera-odo std devs
  r_stream = stds**2
  zs = np.where((kind_idx == 1)[:, None, None],
                LiveKalman.initial_x[0:3] + rng.randn(T, B, 3),
                0.1 * rng.randn(T, B, 3))

  bank = LiveKalmanBank(batch=B, use_pallas=False)
  bank.run_mixed(dts, kind_idx, zs, kinds, r_stream=r_stream,
                 stream_kinds=(K.CAMERA_ODO_TRANSLATION,))

  # sequential oracle with literal per-step R
  Q = jnp.asarray(LiveKalman.Q, jnp.float32)
  ea = jnp.zeros((1, 1), jnp.float32)
  for i in range(B):
    xo = jnp.asarray(LiveKalman.initial_x, jnp.float32)
    Po = jnp.asarray(np.diag(LiveKalman.initial_P_diag), jnp.float32)
    for t in range(T):
      kind = kinds[kind_idx[t]]
      R_t = (np.diag(r_stream[t]) if kind == K.CAMERA_ODO_TRANSLATION
             else LiveKalman.obs_noise[kind])
      _, _, xo, Po, _ = step_ops.predict_and_update_batch(
          spec, kind, {}, xo, Po, Q, jnp.asarray(dts[t], jnp.float32),
          jnp.asarray(zs[t, i][None], jnp.float32),
          jnp.asarray(R_t, jnp.float32)[None], ea)
    # f32 + differently-fused XLA programs: a few 1e-4-scale ulps accumulate
    np.testing.assert_allclose(np.asarray(bank.x[i]), np.asarray(xo),
                               rtol=2e-3, atol=5e-4)

  # pallas interpret path bitwise vs the jnp path
  pl_bank = LiveKalmanBank(batch=B, use_pallas=True)
  orig = pallas_live.live_bank_scan_mixed
  try:
    pallas_live.live_bank_scan_mixed = functools.partial(orig, interpret=True)
    pl_bank.run_mixed(dts, kind_idx, zs, kinds, r_stream=r_stream,
                      stream_kinds=(K.CAMERA_ODO_TRANSLATION,))
  finally:
    pallas_live.live_bank_scan_mixed = orig
  np.testing.assert_array_equal(np.asarray(pl_bank.x), np.asarray(bank.x))
  np.testing.assert_array_equal(np.asarray(pl_bank.P), np.asarray(bank.P))


def test_diverged_detection_and_reset():
  """Divergence detection + per-lane elastic recovery: poisoned lanes are
  flagged and re-seeded, healthy lanes bit-identical untouched."""
  import jax.numpy as jnp

  bank = LiveKalmanBank(batch=16, use_pallas=False, dtype=jnp.float64)
  T = 4
  rng = np.random.RandomState(0)
  dts = np.full((T,), 0.01)
  zs = LiveKalman.initial_x[:3] + rng.randn(T, 16, 3)
  bank.run(jnp.asarray(dts), jnp.asarray(zs))
  assert int(jnp.sum(bank.diverged())) == 0

  # poison lane 3 with NaN state and lane 7 with a collapsed quaternion
  x = np.asarray(bank.x).copy()
  x[3, 0] = np.nan
  x[7, 3:7] = 1e-3
  bank._x = jnp.asarray(x)
  bad = np.asarray(bank.diverged())
  assert bad[3] and bad[7] and bad.sum() == 2

  healthy_x = np.asarray(bank.x)[[i for i in range(16) if i not in (3, 7)]]
  healthy_P = np.asarray(bank.P)[[i for i in range(16) if i not in (3, 7)]]
  n = bank.reset_diverged()
  assert n == 2
  assert int(jnp.sum(bank.diverged())) == 0
  np.testing.assert_array_equal(
      np.asarray(bank.x)[[i for i in range(16) if i not in (3, 7)]],
      healthy_x)
  np.testing.assert_array_equal(
      np.asarray(bank.P)[[i for i in range(16) if i not in (3, 7)]],
      healthy_P)
  np.testing.assert_allclose(np.asarray(bank.x)[3], LiveKalman.initial_x)
  np.testing.assert_allclose(np.asarray(bank.P)[7],
                             np.diag(LiveKalman.initial_P_diag))


def test_reset_diverged_2d_x0_reseeds_from_banks_own_first_row():
  """With a per-lane (B, 23) x0, reset_diverged must re-seed from the
  bank's OWN first row (same rule as KalmanBank), not the model default —
  regression for the facade falling back to LiveKalman.initial_x."""
  B = 8
  x0 = np.tile(LiveKalman.initial_x, (B, 1))
  x0[:, 0] += 100.0 + np.arange(B)   # distinguishable from the default
  bank = LiveKalmanBank(batch=B, x0=x0, use_pallas=False,
                        dtype=jnp.float64)
  x = np.asarray(bank.x).copy()
  x[5, 3:7] = 0.0                    # collapsed quaternion -> diverged
  bank._x = jnp.asarray(x)
  assert int(np.sum(np.asarray(bank.diverged()))) == 1
  assert bank.reset_diverged() == 1
  np.testing.assert_allclose(np.asarray(bank.x)[5], x0[0])
  assert not np.allclose(np.asarray(bank.x)[5], LiveKalman.initial_x)
  np.testing.assert_array_equal(np.asarray(bank.x)[4], x0[4])


@pytest.mark.slow
def test_run_epochs_on_live_facade_matches_hand_path_and_generic_facade():
  """LiveKalmanBank.run_epochs (shared BankFacadeBase implementation on
  the entry-level generic kernels) must agree with the HAND-derived live
  path on a single-slot position epoch — a real cross-implementation
  parity check — and track the generic facade exactly on a heterogeneous
  gyro+pos epoch."""
  from rednose_tpu.runtime.generic_bank import KalmanBank

  B, T = 8, 4
  rng = np.random.RandomState(3)
  dts = np.full((T,), 0.01)
  zs_pos = LiveKalman.initial_x[0:3] + 5.0 * rng.randn(T, B, 3)

  hand = LiveKalmanBank(batch=B, use_pallas=False, dtype=jnp.float64)
  hand.run(dts, zs_pos)

  epoch = LiveKalmanBank(batch=B, use_pallas=False, dtype=jnp.float64)
  epoch.run_epochs(dts, zs_pos[:, None], (int(K.ECEF_POS),))
  assert epoch.t == hand.t
  np.testing.assert_allclose(np.asarray(epoch.x), np.asarray(hand.x),
                             rtol=1e-9, atol=1e-12)
  np.testing.assert_allclose(np.asarray(epoch.P), np.asarray(hand.P),
                             rtol=1e-7, atol=1e-12)

  # heterogeneous all-sensors-style epoch: gyro + pos per tick, the two
  # facades must be bit-identical (same base implementation, same spec)
  zs_ep = np.stack([0.01 * rng.randn(T, B, 3), zs_pos], axis=1)
  slots = (int(K.PHONE_GYRO), int(K.ECEF_POS))
  live_b = LiveKalmanBank(batch=B, use_pallas=False, dtype=jnp.float64)
  gen_b = KalmanBank(LiveKalman, batch=B, use_pallas=False,
                     dtype=jnp.float64)
  live_b.run_epochs(dts, zs_ep, slots)
  gen_b.run_epochs(dts, zs_ep, slots)
  np.testing.assert_array_equal(np.asarray(live_b.x), np.asarray(gen_b.x))
  np.testing.assert_array_equal(np.asarray(live_b.P), np.asarray(gen_b.P))
