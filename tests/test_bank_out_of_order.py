"""Bank-level out-of-order handling (LiveKalmanBank.observe): a
within-window shuffled stream must equal the sorted stream for the FULL
bank — the bank analog of the reference's test_compare swap test
(examples/test_compare.py:104-120) over the sparse-snapshot rewind ring
(runtime/rewind.BankRewindRing)."""

import numpy as np
import pytest

from rednose_tpu.models.live import LiveKalman, ObservationKind as K
from rednose_tpu.runtime.live_bank import LiveKalmanBank
from rednose_tpu.runtime.rewind import BankRewindRing

B = 8


def _stream(T=60, seed=0):
  rng = np.random.RandomState(seed)
  pos0 = LiveKalman.initial_x[:3]
  obs = []
  for i in range(T):
    t = 0.01 * (i + 1)
    k = (K.ECEF_POS, K.PHONE_GYRO, K.NO_ROT)[i % 3]
    if k == K.ECEF_POS:
      z = pos0[None] + rng.normal(0, 1.0, (B, 3))
      R = np.diag([25.0] * 3)
    elif k == K.PHONE_GYRO:
      z = np.array([0.3, -0.2, 0.1])[None] + rng.normal(0, 0.01, (B, 3))
      R = np.diag([0.025**2] * 3)
    else:
      z = np.zeros((B, 3))
      R = np.diag([0.25**2] * 3)
    obs.append((t, int(k), z, R))
  return obs


def _run(obs, **bank_kw):
  bank = LiveKalmanBank(batch=B, P_diag=np.ones(22) * 1e-2, **bank_kw)
  applied = 0
  for t, k, z, R in obs:
    if bank.observe(t, k, z, R=R) is not None:
      applied += 1
  return bank, applied


@pytest.mark.slow
def test_shuffled_within_window_equals_sorted():
  """Swap several observation pairs (inside the snapshot window): the bank
  must rewind + replay to the bit-identical sorted-stream state."""
  obs = _stream()
  bank_sorted, n_sorted = _run(obs)

  shuffled = list(obs)
  # swaps at varying distances, incl. across a snapshot boundary (every 16)
  for a, b in ((20, 23), (33, 40), (45, 46), (14, 17)):
    shuffled[a], shuffled[b] = shuffled[b], shuffled[a]
  bank_shuf, n_shuf = _run(shuffled)

  assert n_sorted == n_shuf == len(obs)
  np.testing.assert_array_equal(np.asarray(bank_sorted.x),
                                np.asarray(bank_shuf.x))
  np.testing.assert_array_equal(np.asarray(bank_sorted.P),
                                np.asarray(bank_shuf.P))
  assert bank_sorted.t == bank_shuf.t


def test_too_old_observation_dropped():
  """An observation older than max_rewind_age (or the snapshot window) is
  dropped and leaves the bank bit-identical (reference: reject-too-old,
  ekf_sym.py:468-472)."""
  obs = _stream()
  bank, _ = _run(obs, max_rewind_age=0.05)
  x_before = np.asarray(bank.x)
  assert bank.observe(bank.t - 0.2, int(K.ECEF_POS),
                      LiveKalman.initial_x[:3]) is None
  np.testing.assert_array_equal(x_before, np.asarray(bank.x))


def test_rewind_across_many_snapshots():
  """A late observation landing several snapshots back still replays to
  the exact sorted result."""
  obs = _stream(T=80)
  bank_sorted, _ = _run(obs, max_rewind_age=10.0)
  shuffled = list(obs)
  # move observation 75 back to position 38 (~37 ticks late, crossing two
  # snapshot boundaries at ckpt_every=16)
  late = shuffled.pop(38)
  shuffled.insert(74, late)
  bank_shuf, n = _run(shuffled, max_rewind_age=10.0)
  assert n == len(obs)
  np.testing.assert_array_equal(np.asarray(bank_sorted.x),
                                np.asarray(bank_shuf.x))
  np.testing.assert_array_equal(np.asarray(bank_sorted.P),
                                np.asarray(bank_shuf.P))


def test_bank_ring_window_bound():
  """Ring memory is bounded: at most ckpt_keep snapshots and
  ckpt_keep * ckpt_every buffered observations survive a long stream."""
  ring = BankRewindRing(ckpt_every=4, ckpt_keep=3)
  for i in range(100):
    ring.record(float(i), ("state", i), ("obs", i))
  assert len(ring._ckpt_t) <= 3
  assert len(ring) <= 3 * 4 + 4
  # rewind to just after the oldest retained snapshot works...
  t0 = ring._ckpt_t[0]
  t_r, state, replay = ring.rewind(t0 + 0.5)
  assert t_r == t0 and state[1] == int(t0)
  assert [o[1] for o in replay] == list(range(int(t0) + 1, 100))
  # ...and older than the ring raises
  with pytest.raises(ValueError):
    ring.rewind(t0 - 50.0)


def test_state_time_contract_and_load_clears_ring(tmp_path):
  """Review r3 regressions: BankState.t is seconds SINCE epoch
  (absolute_t() == bank clock, not twice it), and load() resets the
  rewind ring so observations after a restore never trip the
  non-decreasing-time invariant with pre-save snapshots."""
  obs = _stream(T=40)
  bank, _ = _run(obs)
  st = bank.state()
  assert float(np.asarray(st.absolute_t()).max()) == bank.t
  path = tmp_path / "bank.npz"
  bank.save(path)
  t_saved = bank.t
  # advance past the save point, then restore and continue from t_saved
  for t, k, z, R in _stream(T=10, seed=9):
    bank.observe(t_saved + t, k, z, R=R)
  bank.load(path)
  assert bank.t == t_saved
  t, k, z, R = _stream(T=1, seed=11)[0]
  assert bank.observe(t_saved + t, k, z, R=R) is not None


def test_reset_diverged_clears_ring():
  """A late observation after an elastic reset must not replay through a
  pre-reset snapshot and resurrect diverged lanes."""
  obs = _stream(T=20)
  bank, _ = _run(obs)
  # poison one lane, reset it
  bad_x = np.asarray(bank.x).copy()
  bad_x[0] = np.nan
  bank._x = np.asarray(bad_x)
  import jax.numpy as jnp
  bank._x = jnp.asarray(bad_x, bank.dtype)
  assert bank.reset_diverged() == 1
  # a late observation inside the old window is now DROPPED (ring cleared)
  assert bank.observe(bank.t - 0.05, int(K.ECEF_POS),
                      LiveKalman.initial_x[:3]) is None
  assert np.all(np.isfinite(np.asarray(bank.x)))


def test_bank_ring_every_observation_cadence():
  """ckpt_every=1 keeps snapshotting every record even after a rewind
  (review r3: _since_ckpt must reduce mod the cadence)."""
  ring = BankRewindRing(ckpt_every=1, ckpt_keep=8)
  for i in range(6):
    ring.record(float(i), ("s", i), ("o", i))
  ring.rewind(3.0)
  for i in range(4, 8):
    ring.record(float(i), ("s", i), ("o", i))
  # every retained observation has its own snapshot
  assert len(ring._ckpt_t) == min(8, len(ring))
