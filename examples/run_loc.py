#!/usr/bin/env python3
"""GNSS localizer demo (the downstream loc_kf pattern): a moving receiver
tracked from pseudoranges + pseudorange rates alone — the PSEUDORANGE
observation kinds the reference enumerates (live_kf.py:24-41), with
per-measurement satellite states threaded through the non-feature
extra-args path."""

import jax
import numpy as np

from rednose_tpu.models.live import ObservationKind as K
from rednose_tpu.models.loc import LocKalman


def main():
  rng = np.random.RandomState(0)
  kf = LocKalman()
  eng = kf.filter

  truth_p0 = LocKalman.initial_x[:3] + np.array([120.0, -80.0, 45.0])
  truth_v = np.array([4.0, -2.5, 1.0])
  truth_bias, truth_drift = 230.0, 1.1
  sat_dirs = rng.randn(7, 3)
  sat_dirs /= np.linalg.norm(sat_dirs, axis=1, keepdims=True)
  sat_vels = 120.0 * rng.randn(7, 3)

  dt, T = 0.1, 250
  for i in range(T):
    t = dt * (i + 1)
    pos = truth_p0 + truth_v * t
    bias = truth_bias + truth_drift * t
    for s in range(7):
      sp = sat_dirs[s] * 2.66e7 + sat_vels[s] * t
      d = pos - sp
      u = d / np.linalg.norm(d)
      rho = np.linalg.norm(d) + bias + 2.0 * rng.randn()
      rate = u @ (truth_v - sat_vels[s]) + truth_drift + 0.05 * rng.randn()
      eng.predict_and_update_batch(t, int(K.PSEUDORANGE_GPS), [[rho]],
                                   [np.atleast_2d(4.0)], extra_args=[sp])
      eng.predict_and_update_batch(
          t, int(K.PSEUDORANGE_RATE_GPS), [[rate]],
          [np.atleast_2d(0.05**2)], extra_args=[np.concatenate([sp,
                                                                sat_vels[s]])])

  x = eng.state()
  pos_true = truth_p0 + truth_v * dt * T
  pos_err = np.linalg.norm(x[:3] - pos_true)
  vel_err = np.linalg.norm(x[3:6] - truth_v)
  bias_err = abs(x[6] - (truth_bias + truth_drift * dt * T))
  drift_err = abs(x[7] - truth_drift)
  print(f"run_loc: after {T} epochs x 7 satellites — position error "
        f"{pos_err:.2f} m, velocity error {vel_err:.3f} m/s, clock bias "
        f"error {bias_err:.2f} m, drift error {drift_err:.3f} m/s")
  # Pseudoranges live at 2.66e7 m, where a float32 ulp is ~2 m: the z - h
  # residual is a cancellation of two quantized big numbers, so on the f32
  # production path position/clock-bias accuracy is quantization-limited
  # (tens of metres) while velocity/drift (small-scale states) stay tight.
  # Under float64 (the test suite; CPU) position converges to metres.
  f64 = jax.config.read('jax_enable_x64')
  pos_tol, bias_tol = (5.0, 5.0) if f64 else (80.0, 25.0)
  assert pos_err < pos_tol and bias_err < bias_tol
  assert vel_err < 0.5 and drift_err < 0.3

  bank_demo()


def bank_demo():
  """The same GNSS workload at bank scale: B independent receivers through
  KalmanBank's mixed-schedule path (the entry-level generic Pallas kernel
  on TPU, lane scan elsewhere), pseudorange + rate epochs interleaved with
  per-lane satellite states."""
  from rednose_tpu.runtime.generic_bank import KalmanBank

  rng = np.random.RandomState(1)
  B, T = 64, 16
  bank = KalmanBank(LocKalman, batch=B)
  kinds = (int(K.PSEUDORANGE_GPS), int(K.PSEUDORANGE_RATE_GPS))
  kind_idx = np.arange(T, dtype=np.int32) % 2
  truth = LocKalman.initial_x[:3] + 50.0 * rng.randn(B, 3)
  sat_pos = LocKalman.initial_x[:3][None, None] + 2.66e7 * rng.randn(T, B, 3)
  sat_vel = 3e3 * rng.randn(T, B, 3)
  eas = np.concatenate([sat_pos, sat_vel], axis=-1)
  d = truth[None] - sat_pos
  u = d / np.linalg.norm(d, axis=-1, keepdims=True)
  zs = np.where(
      (kind_idx % 2 == 0)[:, None],
      np.linalg.norm(d, axis=-1) + LocKalman.initial_x[6]
      + 2.0 * rng.randn(T, B),
      np.sum(u * (0.0 - sat_vel), axis=-1) + LocKalman.initial_x[7]
      + 0.05 * rng.randn(T, B))[..., None]
  bank.run_mixed(np.full(T, 0.1), kind_idx, zs, kinds, eas=eas)
  x = np.asarray(bank.x)
  assert np.isfinite(x).all()
  err0 = np.linalg.norm(LocKalman.initial_x[None, :3] - truth, axis=1).mean()
  err1 = np.linalg.norm(x[:, :3] - truth, axis=1).mean()
  print(f"run_loc bank: {B} receivers x {T} mixed epochs "
        f"(pallas={bank.use_pallas}) — mean position error "
        f"{err0:.1f} -> {err1:.1f} m")
  assert err1 < err0


if __name__ == "__main__":
  main()
