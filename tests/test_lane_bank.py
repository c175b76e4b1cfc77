"""Lane-major generic bank parity vs the vmapped reference path (the
dual-implementation pattern applied to the generic-bank hot path)."""

import jax.numpy as jnp
import numpy as np
import pytest

from rednose_tpu.models.kinematic import KinematicKalman
from rednose_tpu.models.kinematic import ObservationKind as KK
from rednose_tpu.models.live import LiveKalman
from rednose_tpu.models.live import ObservationKind as LK
from rednose_tpu.ops import lane_bank
from rednose_tpu.runtime import bank as bank_ops


def _reference_final(model, kind, state, Q, dts, zs, R):
  T, B = zs.shape[0], state.batch
  Rs = jnp.broadcast_to(jnp.asarray(R)[None, None], (T, B) + R.shape)
  final, _ = bank_ops.run_bank(model.build_spec(), kind, {}, state, Q,
                               dts, zs, Rs)
  return np.asarray(final.x), np.asarray(final.P)


def _lane_final(model, kind, state, Q, dts, zs, R):
  spec = model.build_spec()
  x, P = lane_bank.lane_bank_scan(
      spec, kind, {}, state.x, lane_bank.to_lane(state.P), Q, dts, zs,
      jnp.asarray(R))
  return np.asarray(x), np.asarray(lane_bank.from_lane(P))


def _setup(model, T, B, dz, seed=0):
  rng = np.random.default_rng(seed)
  spec = model.build_spec()
  state = bank_ops.init_bank(spec, model.initial_x,
                             np.diag(model.initial_P_diag), batch=B,
                             dtype=jnp.float64)
  Q = jnp.asarray(model.Q)
  dts = jnp.full((T,), 0.01)
  return state, Q, dts, rng


def test_lane_bank_matches_generic_kinematic():
  T, B = 64, 16
  state, Q, dts, rng = _setup(KinematicKalman, T, B, 1)
  zs = jnp.asarray(rng.normal(0, 0.5, size=(T, B, 1)))
  R = np.atleast_2d(0.01)
  xg, Pg = _reference_final(KinematicKalman, KK.POSITION, state, Q, dts, zs, R)
  xl, Pl = _lane_final(KinematicKalman, KK.POSITION, state, Q, dts, zs, R)
  np.testing.assert_allclose(xl, xg, rtol=1e-9, atol=1e-12)
  np.testing.assert_allclose(Pl, Pg, rtol=1e-9, atol=1e-12)


def test_lane_bank_matches_generic_live_eskf():
  """Full 23/22-dim ESKF (quaternions, H_mod, error injection) through the
  lane-major path must match the vmapped path."""
  T, B = 32, 8
  state, Q, dts, rng = _setup(LiveKalman, T, B, 3)
  pos0 = LiveKalman.initial_x[0:3]
  zs = jnp.asarray(pos0[None, None] + rng.normal(0, 2.0, size=(T, B, 3)))
  R = np.diag([25.0] * 3)
  xg, Pg = _reference_final(LiveKalman, LK.ECEF_POS, state, Q, dts, zs, R)
  xl, Pl = _lane_final(LiveKalman, LK.ECEF_POS, state, Q, dts, zs, R)
  np.testing.assert_allclose(xl, xg, rtol=1e-8, atol=1e-10)
  np.testing.assert_allclose(Pl, Pg, rtol=1e-7, atol=1e-9)


def test_lane_bank_maha_gate_matches():
  import dataclasses

  spec = KinematicKalman.build_spec()
  om = spec.obs[KK.POSITION]
  gated = dataclasses.replace(spec, obs={KK.POSITION: dataclasses.replace(
      om, maha_test=True)})

  T, B = 64, 16
  rng = np.random.default_rng(5)
  state = bank_ops.init_bank(gated, KinematicKalman.initial_x,
                             np.diag(KinematicKalman.initial_P_diag),
                             batch=B, dtype=jnp.float64)
  Q = jnp.asarray(KinematicKalman.Q)
  dts = jnp.full((T,), 0.01)
  zs = jnp.asarray(rng.normal(0, 3.0, size=(T, B, 1)))  # many outliers
  R = np.atleast_2d(0.05**2)
  Rs = jnp.broadcast_to(jnp.asarray(R)[None, None], (T, B, 1, 1))
  ref, _ = bank_ops.run_bank(gated, KK.POSITION, {}, state, Q, dts, zs, Rs)
  xl, Pl = lane_bank.lane_bank_scan(
      gated, KK.POSITION, {}, state.x, lane_bank.to_lane(state.P), Q, dts,
      zs, jnp.asarray(R))
  np.testing.assert_allclose(np.asarray(xl), np.asarray(ref.x), rtol=1e-9)
  np.testing.assert_allclose(np.asarray(lane_bank.from_lane(Pl)),
                             np.asarray(ref.P), rtol=1e-9)


@pytest.mark.slow
def test_blocked_cholesky_matches_lapack_oracle():
  """cholesky_lane_blocked / cho_solve_lane_blocked (the smoother gains
  pass's critical-path fix) vs the LAPACK oracle across dims that
  exercise 1..3 panels and ragged tails."""
  rng = np.random.RandomState(0)
  for d in (3, 8, 13, 22):
    B = 5
    As = []
    for _ in range(B):
      M = rng.randn(d, d)
      As.append(M @ M.T + d * np.eye(d))
    A = jnp.asarray(np.stack(As, axis=-1))
    Brhs = jnp.asarray(rng.randn(d, 4, B))
    L = lane_bank.cholesky_lane_blocked(A, r=8)
    X = lane_bank.cho_solve_lane_blocked(L, Brhs, r=8)
    for i in range(B):
      np.testing.assert_allclose(
          np.asarray(L[:, :, i]),
          np.linalg.cholesky(np.asarray(A[:, :, i])), atol=1e-9)
      np.testing.assert_allclose(
          np.asarray(X[:, :, i]),
          np.linalg.solve(np.asarray(A[:, :, i]),
                          np.asarray(Brhs[:, :, i])), atol=1e-9)


def test_generic_mixed_bank_scan_matches_oracle():
  """lane_mixed_bank_scan (heterogeneous kinds over a bank, ANY spec) ==
  per-lane sequential core/step oracle; mixes dz=3 and dz=1 kinds so the
  padding path is exercised."""
  from rednose_tpu.core import step as step_ops

  spec = LiveKalman.build_spec()
  kinds = (int(LK.ECEF_POS), int(LK.ODOMETRIC_SPEED))
  B, T = 5, 8
  rng = np.random.RandomState(3)
  x0 = np.tile(LiveKalman.initial_x, (B, 1))
  x0[:, 7:10] += rng.randn(B, 3)          # nonzero velocity for odo speed
  P0 = np.tile(np.diag(LiveKalman.initial_P_diag) * 1e-2, (B, 1, 1))
  Q = jnp.asarray(LiveKalman.Q)
  dts = np.full((T,), 0.01)
  ki = np.asarray([0, 1] * (T // 2), np.int32)
  zs = np.zeros((T, B, 3))
  zs[ki == 0] = LiveKalman.initial_x[:3][None, None] + rng.randn(
      (ki == 0).sum(), B, 3)
  zs[ki == 1, :, 0] = np.abs(1.0 + 0.1 * rng.randn((ki == 1).sum(), B))
  R_pos = np.diag([25.0] * 3)
  R_odo = np.asarray([[0.05**2]])

  xl, Pl = lane_bank.lane_mixed_bank_scan(
      spec, kinds, {}, jnp.asarray(x0), jnp.asarray(P0.transpose(1, 2, 0)),
      Q, jnp.asarray(dts), jnp.asarray(ki), jnp.asarray(zs),
      (jnp.asarray(R_pos), jnp.asarray(R_odo)))

  ea = jnp.zeros((1,))
  for i in range(B):
    x, P = jnp.asarray(x0[i]), jnp.asarray(P0[i])
    for t in range(T):
      x, P = step_ops.predict(spec, {}, x, P, Q, dts[t])
      k = kinds[ki[t]]
      dz = spec.obs[k].dz
      R = R_pos if dz == 3 else R_odo
      x, P, _ = step_ops.update(spec, k, {}, x, P,
                                jnp.asarray(zs[t, i, :dz]),
                                jnp.asarray(R), ea)
    np.testing.assert_allclose(np.asarray(xl[i]), np.asarray(x),
                               rtol=1e-7, atol=1e-7)
    np.testing.assert_allclose(np.asarray(Pl[:, :, i]), np.asarray(P),
                               rtol=1e-6, atol=1e-7)
