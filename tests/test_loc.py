"""GNSS localizer (models/loc.py): the downstream loc_kf family — the
pseudorange kinds the reference enumerates (live_kf.py:24-41) consumed by
a native filter through the non-feature extra-args path."""

import numpy as np
import pytest

import jax.numpy as jnp

from rednose_tpu.models.live import ObservationKind as K
from rednose_tpu.models.loc import LocKalman
from rednose_tpu.ops import lane_bank


def _sim(T=200, seed=0, dt=0.1):
  """Moving receiver + 6 satellites in wide orbits; returns per-epoch
  (t, truth_pos, truth_vel, sat states, pseudoranges, rates)."""
  rng = np.random.RandomState(seed)
  bias_true, drift_true = 120.0, 0.8
  p0 = LocKalman.initial_x[:3] + np.array([40.0, -30.0, 25.0])
  v_true = np.array([3.0, -2.0, 1.5])
  sat_dirs = rng.randn(6, 3)
  sat_dirs /= np.linalg.norm(sat_dirs, axis=1, keepdims=True)
  sat_r = 2.66e7
  sat_vels = 100.0 * rng.randn(6, 3)
  epochs = []
  for i in range(T):
    t = dt * (i + 1)
    pos = p0 + v_true * t
    bias = bias_true + drift_true * t
    sats = []
    for s in range(6):
      sp = sat_dirs[s] * sat_r + sat_vels[s] * t
      d = pos - sp
      rho = np.linalg.norm(d) + bias
      u = d / np.linalg.norm(d)
      rate = u @ (v_true - sat_vels[s]) + drift_true
      sats.append((sp, sat_vels[s], rho, rate))
    epochs.append((t, pos, v_true, bias, sats))
  return epochs


def test_loc_converges_on_pseudoranges():
  """Pseudorange + rate stream pins position, velocity, clock bias and
  drift of a moving receiver (no direct position fixes)."""
  kf = LocKalman()
  eng = kf.filter
  rng = np.random.RandomState(1)
  epochs = _sim()
  for t, pos, vel, bias, sats in epochs:
    for sp, sv, rho, rate in sats:
      est = eng.predict_and_update_batch(
          t, int(K.PSEUDORANGE_GPS), [[rho + 2.0 * rng.randn()]],
          [np.atleast_2d(4.0)], extra_args=[sp])
      assert est is not None
      est = eng.predict_and_update_batch(
          t, int(K.PSEUDORANGE_RATE_GPS), [[rate + 0.05 * rng.randn()]],
          [np.atleast_2d(0.05**2)], extra_args=[np.concatenate([sp, sv])])
      assert est is not None
  x = eng.state()
  t_last, pos, vel, bias, _ = epochs[-1]
  assert np.linalg.norm(x[:3] - pos) < 5.0, x[:3] - pos
  assert np.linalg.norm(x[3:6] - vel) < 0.5, x[3:6] - vel
  assert abs(x[6] - bias) < 5.0, (x[6], bias)
  assert abs(x[7] - 0.8) < 0.3, x[7]


def test_loc_gate_rejects_multipath():
  """A wildly wrong pseudorange (multipath) is soft-rejected by the
  Mahalanobis gate once the filter has converged."""
  kf = LocKalman()
  eng = kf.filter
  rng = np.random.RandomState(2)
  epochs = _sim(T=120)
  for t, pos, vel, bias, sats in epochs:
    for sp, sv, rho, rate in sats:
      eng.predict_and_update_batch(
          t, int(K.PSEUDORANGE_GPS), [[rho + 2.0 * rng.randn()]],
          [np.atleast_2d(4.0)], extra_args=[sp])
  x_before = eng.state()
  t, pos, vel, bias, sats = epochs[-1]
  sp, sv, rho, rate = sats[0]
  eng.predict_and_update_batch(
      t + 0.1, int(K.PSEUDORANGE_GPS), [[rho + 5000.0]],
      [np.atleast_2d(4.0)], extra_args=[sp])
  # gated: position barely moves (predict-only drift allowed)
  assert np.linalg.norm(eng.state()[:3] - x_before[:3]) < 2.0


def test_loc_lane_bank_pseudorange():
  """The loc spec's pseudorange update through the lane bank with per-lane
  satellite extra args — parity vs core/step.update."""
  from rednose_tpu.core import step as step_ops

  spec = LocKalman.build_spec()
  kind = int(K.PSEUDORANGE_GPS)
  B = 5
  rng = np.random.RandomState(3)
  x0 = np.tile(LocKalman.initial_x, (B, 1)) + rng.randn(B, 11)
  P0 = np.tile(np.eye(11) * 10.0, (B, 1, 1))
  sats = LocKalman.initial_x[:3][None] + 2.0e7 * rng.randn(B, 3)
  z = np.abs(2.6e7 + 1e5 * rng.randn(B, 1))
  R = np.atleast_2d(4.0)

  xl, Pl, _ = lane_bank.lane_update(
      spec, kind, {}, jnp.asarray(x0), jnp.asarray(P0.transpose(1, 2, 0)),
      jnp.asarray(z), jnp.asarray(R), ea=jnp.asarray(sats))
  for i in range(B):
    xo, Po, _ = step_ops.update(spec, kind, {}, jnp.asarray(x0[i]),
                                jnp.asarray(P0[i]), jnp.asarray(z[i]),
                                jnp.asarray(R), jnp.asarray(sats[i]))
    np.testing.assert_allclose(np.asarray(xl[i]), np.asarray(xo),
                               rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(np.asarray(Pl[:, :, i]), np.asarray(Po),
                               rtol=1e-7, atol=1e-8)
