"""Full-scope live acceptance stream — the reference's examples/test_compare.py
analog (test_compare.py:104-120), widened to this framework's three engines.

ONE long randomized stream covering all 8 shipped live_kf observation kinds,
with (a) out-of-order swaps inside the rewind window, (b) camera-odometry
R-from-measurement rows (live_kf.py:325-337), and (c) a mid-stream divergence
+ per-lane elastic reset event, is driven through:

  1. FilterEngine via the LiveKalman facade (host rewind/replay driver),
  2. LiveKalmanBank.observe() (bank-scale OOO on the sparse-snapshot ring),
  3. the bulk mixed-kind kernel path (LiveKalmanBank.run_mixed, lax.switch
     dispatch — the same branch closures the Pallas mixed kernel uses),

and every engine is asserted against the independent sympy/numpy oracle
(tests/live_oracle.py) at synchronization points where the delivered set
equals the sorted prefix — the cross-engine-equivalence pattern of the
reference's test_compare, as one harness.
"""

import jax.numpy as jnp
import numpy as np

from rednose_tpu.models.live import LiveKalman, ObservationKind as K

from live_oracle import NumpyLiveEKF, SympyLiveOracle

KIND_TO_ORACLE = {
    K.ODOMETRIC_SPEED: 'odo_speed',
    K.PHONE_GYRO: 'gyro',
    K.NO_ROT: 'phone_rot',
    K.PHONE_ACCEL: 'acc',
    K.ECEF_POS: 'pos',
    K.CAMERA_ODO_TRANSLATION: 'rel_motion',
    K.CAMERA_ODO_ROTATION: 'phone_rot',
    K.IMU_FRAME: 'imu_frame',
}
CAMERA_KINDS = (K.CAMERA_ODO_TRANSLATION, K.CAMERA_ODO_ROTATION)
ALL_KINDS = tuple(KIND_TO_ORACLE)

# measurement noise added on top of h(x0), and the std-dev range for the
# camera kinds' measurement-supplied noise rows
NOISE = {
    K.ODOMETRIC_SPEED: 0.1,
    K.PHONE_GYRO: 0.01,
    K.NO_ROT: 1e-4,
    K.PHONE_ACCEL: 0.05,
    K.ECEF_POS: 2.0,
    K.CAMERA_ODO_TRANSLATION: 0.05,
    K.CAMERA_ODO_ROTATION: 0.02,
    K.IMU_FRAME: 0.005,
}
STD_RANGE = {
    K.CAMERA_ODO_TRANSLATION: (0.05, 0.3),
    K.CAMERA_ODO_ROTATION: (0.01, 0.1),
}

N_OBS = 200
DT = 0.01
# swap regions (delivery-order index): each contains OOO pairs; outside
# them the delivered set equals the sorted prefix, so engines and the
# (sorted-order) oracle are comparable there
SWAP_REGIONS = ((30, 90), (150, 190))
SYNC_POINTS = (100, 140, N_OBS)
RESET_AT = 140   # divergence + elastic reset event (outside swap regions)


def _initial_state():
  """Nonzero velocity/rates so every kind's Jacobian is smooth (|v| has a
  kink at v=0 that would NaN the odometric-speed rows)."""
  x0 = np.array(LiveKalman.initial_x, dtype=float)
  x0[7:10] = [5.0, 1.0, 0.5]       # velocity
  x0[10:13] = [0.02, -0.01, 0.03]  # angular velocity
  x0[13:16] = [0.01, -0.02, 0.005]  # gyro bias
  x0[17:20] = [0.1, -0.05, 0.2]    # acceleration
  return x0


def _build_stream(oracle, x0, rng):
  """Sorted randomized all-kind stream: list of dicts with t, kind, z,
  stds (camera kinds), R (what the oracle/bank use)."""
  obs = []
  for i in range(N_OBS):
    kind = ALL_KINDS[int(rng.integers(len(ALL_KINDS)))] if i >= 8 \
        else ALL_KINDS[i]  # first 8: one of each, deterministic coverage
    h0 = np.asarray(oracle.h[KIND_TO_ORACLE[kind]](x0), dtype=float).reshape(-1)
    z = h0 + NOISE[kind] * rng.standard_normal(h0.shape[0])
    if kind in CAMERA_KINDS:
      lo, hi = STD_RANGE[kind]
      stds = rng.uniform(lo, hi, 3)
      R = np.diag(stds**2)
    else:
      stds = None
      R = np.atleast_2d(np.asarray(LiveKalman.obs_noise[kind], dtype=float))
    obs.append({'i': i, 't': (i + 1) * DT, 'kind': kind, 'z': z,
                'stds': stds, 'R': R})
  return obs


def _delivery_order(rng):
  """Identity order with OOO swaps confined to SWAP_REGIONS: pairs (j, j+k),
  k in [3, 15] — well inside the 1 s rewind window (k*DT <= 0.15 s)."""
  order = list(range(N_OBS))
  for lo, hi in SWAP_REGIONS:
    j = lo
    while j < hi - 15:
      if rng.random() < 0.35:
        k = int(rng.integers(3, 16))
        order[j], order[j + k] = order[j + k], order[j]
        j += k + 1
      else:
        j += 1
  return order


def test_full_scope_acceptance_stream():
  oracle_model = SympyLiveOracle()
  x0 = _initial_state()
  P_diag = np.array(LiveKalman.initial_P_diag, dtype=float)
  rng = np.random.default_rng(12345)
  stream = _build_stream(oracle_model, x0, rng)
  order = _delivery_order(rng)
  assert order != list(range(N_OBS)), "stream must actually contain swaps"

  # --- engine 0: the independent numpy/sympy oracle, sorted order
  ref = NumpyLiveEKF(x0, np.diag(P_diag), LiveKalman.Q)
  ref.t = 0.0
  oracle_at = {}
  for ob in stream:
    ref.predict_and_observe(ob['t'], KIND_TO_ORACLE[ob['kind']], ob['z'],
                            ob['R'])
    if ob['i'] + 1 in SYNC_POINTS:
      oracle_at[ob['i'] + 1] = (ref.x.copy(), ref.P.copy())

  # --- engine 1: FilterEngine (rewind/replay), delivered OOO
  kf = LiveKalman()
  kf.init_state(x0, covs_diag=P_diag, filter_time=0.0)
  # --- engine 2: LiveKalmanBank.observe (bank OOO ring), delivered OOO
  B = 4
  bank = LiveKalmanBank_f64(B, x0)

  delivered = 0
  reset_lane_done = False
  for pos, j in enumerate(order):
    ob = stream[j]
    if ob['kind'] in CAMERA_KINDS:
      data = [np.concatenate([ob['z'], ob['stds']])]
    else:
      data = [ob['z']]
    kf.predict_and_observe(ob['t'], ob['kind'], data)
    bank.observe(ob['t'], int(ob['kind']), ob['z'], R=ob['R'])
    delivered += 1

    if delivered == RESET_AT and not reset_lane_done:
      # fault injection: collapse lane 2's quaternion; detection must flag
      # exactly that lane, the elastic reset must leave healthy lanes
      # bit-identical (the bank analog of KalmanError + caller re-seed)
      xb = np.asarray(bank.x).copy()
      xb[2, 3:7] = 1e-3
      bank._x = jnp.asarray(xb)
      bad = np.asarray(bank.diverged())
      assert bad[2] and bad.sum() == 1
      healthy = [i for i in range(B) if i != 2]
      hx = np.asarray(bank.x)[healthy].copy()
      assert bank.reset_diverged(x0=np.tile(x0, (B, 1))) == 1
      np.testing.assert_array_equal(np.asarray(bank.x)[healthy], hx)
      reset_lane_done = True

    if delivered in SYNC_POINTS:
      ox, oP = oracle_at[delivered]
      np.testing.assert_allclose(
          kf.x, ox, rtol=1e-5, atol=1e-7,
          err_msg=f'FilterEngine diverged from oracle at obs {delivered}')
      np.testing.assert_allclose(
          np.asarray(bank.x)[0], ox, rtol=1e-5, atol=1e-7,
          err_msg=f'bank.observe diverged from oracle at obs {delivered}')
      if delivered < RESET_AT:
        # pre-reset: every lane saw identical inputs -> identical states
        np.testing.assert_array_equal(np.asarray(bank.x)[1],
                                      np.asarray(bank.x)[0])

  # final covariances too (test_compare asserts covs alongside state)
  ox, oP = oracle_at[N_OBS]
  np.testing.assert_allclose(kf.P, oP, rtol=1e-5, atol=1e-8)
  np.testing.assert_allclose(np.asarray(bank.P)[0], oP, rtol=1e-5, atol=1e-8)
  # the reset lane: re-seeded mid-stream, must be healthy and converging
  # (ECEF fixes since the reset pull it toward the stream's position)
  assert not bool(np.asarray(bank.diverged())[2])
  assert np.all(np.isfinite(np.asarray(bank.x)[2]))

  # --- engine 3: the bulk mixed-kind kernel path over the SORTED stream
  # (one compiled program, camera kinds' noise streamed per step)
  bank2 = LiveKalmanBank_f64(2, x0)
  kinds = tuple(int(k) for k in ALL_KINDS)
  kind_idx = np.array([kinds.index(int(ob['kind'])) for ob in stream],
                      dtype=np.int32)
  zs = np.zeros((N_OBS, 2, 3))
  r_stream = np.zeros((N_OBS, 3))
  for ob in stream:
    dz = ob['z'].shape[0]
    zs[ob['i'], :, :dz] = ob['z']
    if ob['stds'] is not None:
      r_stream[ob['i']] = ob['stds']**2
  dts = np.full((N_OBS,), DT)
  bank2.run_mixed(dts, kind_idx, zs, kinds,
                  stream_kinds=tuple(int(k) for k in CAMERA_KINDS),
                  r_stream=r_stream)
  np.testing.assert_allclose(np.asarray(bank2.x)[0], ox, rtol=1e-5,
                             atol=1e-7)
  np.testing.assert_allclose(np.asarray(bank2.P)[0], oP, rtol=1e-5,
                             atol=1e-8)


def LiveKalmanBank_f64(batch, x0):
  from rednose_tpu.runtime.live_bank import LiveKalmanBank

  return LiveKalmanBank(batch=batch, x0=np.tile(x0, (batch, 1)),
                        use_pallas=False, dtype=jnp.float64)
