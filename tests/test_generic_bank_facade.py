"""KalmanBank (runtime/generic_bank.py): the production facade for wide
banks of arbitrary specs — run/run_mixed/observe with ea streams, vs the
core/step oracle; OOO shuffled==sorted; save/load; divergence recovery."""

import numpy as np
import jax.numpy as jnp
import pytest

from rednose_tpu.core import step as step_ops
from rednose_tpu.models.kinematic import KinematicKalman
from rednose_tpu.models.kinematic import ObservationKind as KK
from rednose_tpu.models.live import ObservationKind as OK
from rednose_tpu.models.loc import LocKalman
from rednose_tpu.runtime.generic_bank import KalmanBank


def _oracle(spec, schedule, x0, P0, Q):
  """schedule: list of (dt, kind, z (B, dz), R, ea (B, m) | None)."""
  B = x0.shape[0]
  xs, Ps = [], []
  for i in range(B):
    x, P = jnp.asarray(x0[i]), jnp.asarray(P0[i])
    for dt, kind, z, R, ea in schedule:
      x, P = step_ops.predict(spec, {}, x, P, jnp.asarray(Q),
                              jnp.asarray(dt))
      eai = jnp.zeros((1,)) if ea is None else jnp.asarray(ea[i])
      x, P, _ = step_ops.update(spec, kind, {}, x, P, jnp.asarray(z[i]),
                                jnp.asarray(R), eai)
    xs.append(np.asarray(x))
    Ps.append(np.asarray(P))
  return np.stack(xs), np.stack(Ps)


def test_run_matches_oracle_kinematic():
  B, T = 8, 12
  rng = np.random.RandomState(0)
  bank = KalmanBank(KinematicKalman, batch=B, dtype=jnp.float64)
  assert not bank.use_pallas  # CPU: lane path
  dts = np.full((T,), 0.01)
  zs = 0.5 * rng.randn(T, B, 1)
  R = KinematicKalman.obs_noise[KK.POSITION]
  bank.run(dts, zs, KK.POSITION)

  spec = KinematicKalman.build_spec()
  x0 = np.tile(KinematicKalman.initial_x, (B, 1))
  P0 = np.tile(np.diag(KinematicKalman.initial_P_diag), (B, 1, 1))
  sched = [(dts[t], int(KK.POSITION), zs[t], R, None) for t in range(T)]
  x_ref, P_ref = _oracle(spec, sched, x0, P0, KinematicKalman.Q)
  np.testing.assert_allclose(np.asarray(bank.x), x_ref, rtol=1e-9,
                             atol=1e-12)
  np.testing.assert_allclose(np.asarray(bank.P), P_ref, rtol=1e-8,
                             atol=1e-12)
  assert bank.t == pytest.approx(dts.sum())


def test_run_mixed_with_eas_matches_oracle_loc():
  """GNSS schedule (pseudorange ea=3 / rate ea=6 interleaved) through the
  facade's padded ea stream on the lane path."""
  B, T = 8, 6
  rng = np.random.RandomState(5)
  kinds = (int(OK.PSEUDORANGE_GPS), int(OK.PSEUDORANGE_RATE_GPS))
  spec = LocKalman.build_spec()
  x0 = np.tile(LocKalman.initial_x, (B, 1)) + rng.randn(B, 11)
  bank = KalmanBank(LocKalman, batch=B, x0=x0, dtype=jnp.float64)
  dts = np.full((T,), 0.1)
  kind_idx = np.arange(T, dtype=np.int32) % 2
  sat_pos = LocKalman.initial_x[:3][None, None] + 2.0e7 * rng.randn(T, B, 3)
  sat_vel = 3e3 * rng.randn(T, B, 3)
  eas = np.concatenate([sat_pos, sat_vel], axis=-1)
  d = x0[None, :, :3] - sat_pos
  u = d / np.linalg.norm(d, axis=-1, keepdims=True)
  zs = np.where(
      (kind_idx % 2 == 0)[:, None],
      np.linalg.norm(d, axis=-1) + x0[None, :, 6] + 2.0 * rng.randn(T, B),
      np.sum(u * (x0[None, :, 3:6] - sat_vel), axis=-1) + x0[None, :, 7]
      + 0.05 * rng.randn(T, B))[..., None]
  R_list = [LocKalman.obs_noise[k] for k in kinds]
  bank.run_mixed(dts, kind_idx, zs, kinds, eas=eas)

  P0 = np.tile(np.diag(LocKalman.initial_P_diag), (B, 1, 1))
  sched = [(dts[t], kinds[kind_idx[t]], zs[t], R_list[kind_idx[t]],
            eas[t, :, :spec.obs[kinds[kind_idx[t]]].ea_len])
           for t in range(T)]
  x_ref, P_ref = _oracle(spec, sched, x0, P0, LocKalman.Q)
  np.testing.assert_allclose(np.asarray(bank.x), x_ref, rtol=1e-8,
                             atol=1e-8)
  np.testing.assert_allclose(np.asarray(bank.P), P_ref, rtol=1e-7,
                             atol=1e-8)


def test_run_epochs_no_ea_single_slot_equals_run():
  """A 1-slot epoch with no extra args is exactly predict+update per step,
  i.e. run(); covers the lane epoch scan's ea-free branch."""
  B, T = 8, 8
  rng = np.random.RandomState(3)
  dts = np.full((T,), 0.01)
  zs = 0.5 * rng.randn(T, B, 1)
  a = KalmanBank(KinematicKalman, batch=B, dtype=jnp.float64)
  a.run(dts, zs, KK.POSITION)
  b = KalmanBank(KinematicKalman, batch=B, dtype=jnp.float64)
  b.run_epochs(dts, zs[:, None], (int(KK.POSITION),))
  np.testing.assert_allclose(np.asarray(a.x), np.asarray(b.x),
                             rtol=1e-12, atol=1e-14)
  np.testing.assert_allclose(np.asarray(a.P), np.asarray(b.P),
                             rtol=1e-12, atol=1e-14)


def test_run_epochs_matches_oracle_loc():
  """run_epochs (one predict + K slot updates per step — the reference's
  predict_and_update_batch shape, ekf_sym.py:484-531) on a GNSS epoch of
  2 pseudoranges + 2 rates, lane path vs the core/step oracle."""
  B, T = 8, 5
  rng = np.random.RandomState(7)
  slot_kinds = (int(OK.PSEUDORANGE_GPS),) * 2 \
      + (int(OK.PSEUDORANGE_RATE_GPS),) * 2
  K = len(slot_kinds)
  spec = LocKalman.build_spec()
  x0 = np.tile(LocKalman.initial_x, (B, 1)) + rng.randn(B, 11)
  bank = KalmanBank(LocKalman, batch=B, x0=x0, dtype=jnp.float64)
  assert not bank.use_pallas  # CPU: lane path
  dts = np.full((T,), 0.1)
  sat_pos = LocKalman.initial_x[:3][None, None, None] \
      + 2.0e7 * rng.randn(T, K, B, 3)
  sat_vel = 3e3 * rng.randn(T, K, B, 3)
  eas = np.concatenate([sat_pos, sat_vel], axis=-1)
  d = x0[None, None, :, :3] - sat_pos
  u = d / np.linalg.norm(d, axis=-1, keepdims=True)
  rho = np.linalg.norm(d, axis=-1) + x0[None, None, :, 6] \
      + 2.0 * rng.randn(T, K, B)
  rate = np.sum(u * (x0[None, None, :, 3:6] - sat_vel), axis=-1) \
      + x0[None, None, :, 7] + 0.05 * rng.randn(T, K, B)
  zs = np.where((np.arange(K) < 2)[None, :, None], rho, rate)[..., None]
  bank.run_epochs(dts, zs, slot_kinds, eas=eas)

  R_list = [np.atleast_2d(LocKalman.obs_noise[k]) for k in slot_kinds]
  P0 = np.tile(np.diag(LocKalman.initial_P_diag), (B, 1, 1))
  for i in range(B):
    x, P = jnp.asarray(x0[i]), jnp.asarray(P0[i])
    for t in range(T):
      x, P = step_ops.predict(spec, {}, x, P, jnp.asarray(LocKalman.Q),
                              jnp.asarray(dts[t]))
      for k, kind in enumerate(slot_kinds):
        om = spec.obs[kind]
        x, P, _ = step_ops.update(spec, kind, {}, x, P,
                                  jnp.asarray(zs[t, k, i, :om.dz]),
                                  jnp.asarray(R_list[k]),
                                  jnp.asarray(eas[t, k, i, :om.ea_len]))
    np.testing.assert_allclose(np.asarray(bank.x[i]), np.asarray(x),
                               rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(np.asarray(bank.P[i]), np.asarray(P),
                               rtol=1e-7, atol=1e-8)
  assert bank.t == pytest.approx(dts.sum())


def test_observe_out_of_order_equals_sorted():
  """Within-window shuffled observe() stream == the sorted stream,
  including an extra-args kind (pseudorange) — bank-scale rewind+replay
  with ea payloads preserved."""
  B = 8
  rng = np.random.RandomState(2)
  kinds = [int(OK.PSEUDORANGE_GPS), int(OK.PSEUDORANGE_RATE_GPS)]
  obs = []
  for i in range(12):
    t = 0.1 * (i + 1)
    k = kinds[i % 2]
    m = 3 if i % 2 == 0 else 6
    ea = LocKalman.initial_x[:3] + 2.0e7 * rng.randn(B, 3)
    if m == 6:
      ea = np.concatenate([ea, 3e3 * rng.randn(B, 3)], axis=1)
    z = 2.5e7 * np.ones((B, 1)) if i % 2 == 0 else rng.randn(B, 1)
    obs.append((t, k, z, ea))

  def run(stream):
    bank = KalmanBank(LocKalman, batch=B, dtype=jnp.float64, ckpt_every=2,
                      max_rewind_age=10.0)
    for t, k, z, ea in stream:
      assert bank.observe(t, k, z, ea=ea) is not None
    return bank

  sorted_bank = run(obs)
  shuffled = list(obs)
  shuffled[4], shuffled[7] = shuffled[7], shuffled[4]  # late within window
  shuffled_bank = run(shuffled)
  np.testing.assert_array_equal(np.asarray(sorted_bank.x),
                                np.asarray(shuffled_bank.x))
  np.testing.assert_array_equal(np.asarray(sorted_bank.P),
                                np.asarray(shuffled_bank.P))

  # too old: outside max_rewind_age -> dropped
  tight = KalmanBank(LocKalman, batch=B, dtype=jnp.float64,
                     max_rewind_age=0.05)
  t, k, z, ea = obs[0]
  tight.observe(t, k, z, ea=ea)
  assert tight.observe(t - 1.0, k, z, ea=ea) is None


def test_save_load_divergence_roundtrip(tmp_path):
  B = 8
  rng = np.random.RandomState(1)
  bank = KalmanBank(KinematicKalman, batch=B, dtype=jnp.float64)
  bank.run(np.full((4,), 0.01), 0.1 * rng.randn(4, B, 1), KK.POSITION)
  path = tmp_path / "bank.npz"
  bank.save(path)
  bank2 = KalmanBank(KinematicKalman, batch=B, dtype=jnp.float64)
  bank2.load(path)
  np.testing.assert_array_equal(np.asarray(bank.x), np.asarray(bank2.x))
  assert bank2.t == bank.t

  # poison one lane; only it is reset
  x = np.array(bank2.x)
  x[3] = np.nan
  bank2._x = jnp.asarray(x)
  assert int(jnp.sum(bank2.diverged())) == 1
  assert bank2.reset_diverged() == 1
  assert int(jnp.sum(bank2.diverged())) == 0
  np.testing.assert_array_equal(np.asarray(bank2.x)[3],
                                KinematicKalman.initial_x)


def test_reset_diverged_accepts_per_lane_x0():
  """reset_diverged(x0=(B, dim_x)) re-seeds each bad lane from ITS OWN row
  — regression for the (B, dim_x) x0 silently broadcasting self._x to
  rank 3 (review r3)."""
  B = 8
  bank = KalmanBank(KinematicKalman, batch=B, dtype=jnp.float64)
  x = np.array(bank.x)
  x[2] = np.nan
  x[6] = np.nan
  bank._x = jnp.asarray(x)
  seeds = np.arange(B * 2, dtype=np.float64).reshape(B, 2)
  assert bank.reset_diverged(x0=seeds) == 2
  assert bank._x.shape == (B, 2)          # no rank-3 broadcast corruption
  np.testing.assert_array_equal(np.asarray(bank.x)[2], seeds[2])
  np.testing.assert_array_equal(np.asarray(bank.x)[6], seeds[6])
  np.testing.assert_array_equal(np.asarray(bank.x)[0], x[0])  # healthy kept


def test_run_accepts_scalar_and_diag_R():
  """The bulk run paths accept the same R shapes observe() does: a scalar
  for dz=1 kinds and a (dz,) diagonal — regression for `for row in
  np.asarray(R)` crashing on 0-d arrays (review r3)."""
  B, T = 8, 4
  rng = np.random.RandomState(7)
  dts = np.full((T,), 0.01)
  zs = 0.5 * rng.randn(T, B, 1)
  R_full = np.asarray(KinematicKalman.obs_noise[KK.POSITION])
  scalar_R = float(R_full[0, 0])

  b_full = KalmanBank(KinematicKalman, batch=B, dtype=jnp.float64)
  b_scalar = KalmanBank(KinematicKalman, batch=B, dtype=jnp.float64)
  b_diag = KalmanBank(KinematicKalman, batch=B, dtype=jnp.float64)
  b_full.run(dts, zs, KK.POSITION, R=R_full)
  b_scalar.run(dts, zs, KK.POSITION, R=scalar_R)
  b_diag.run(dts, zs, KK.POSITION, R=np.asarray([scalar_R]))
  np.testing.assert_array_equal(np.asarray(b_full.x), np.asarray(b_scalar.x))
  np.testing.assert_array_equal(np.asarray(b_full.x), np.asarray(b_diag.x))

  # mixed + epochs take the same contract per kind/slot
  b_mixed = KalmanBank(KinematicKalman, batch=B, dtype=jnp.float64)
  b_mixed.run_mixed(dts, np.zeros((T,), np.int32), zs, (int(KK.POSITION),),
                    R_by_kind={int(KK.POSITION): scalar_R})
  np.testing.assert_array_equal(np.asarray(b_full.x), np.asarray(b_mixed.x))
  b_ep = KalmanBank(KinematicKalman, batch=B, dtype=jnp.float64)
  b_ep.run_epochs(dts, zs[:, None], (int(KK.POSITION),),
                  R_by_slot=[scalar_R])
  np.testing.assert_allclose(np.asarray(b_full.x), np.asarray(b_ep.x),
                             rtol=1e-12, atol=1e-14)
