"""Interpret-mode parity of the fused live Pallas kernel (ops/pallas_live.py)
against the pure-jnp specialized scan it shares its math with — and,
transitively (tests/test_live_lane.py), against the core/step.py oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from rednose_tpu.models.live import LiveKalman
from rednose_tpu.ops import live_lane, pallas_live


def _workload(B, T, dtype):
  rng = np.random.RandomState(0)
  x = np.tile(LiveKalman.initial_x, (B, 1)).astype(dtype)
  x[:, 0:3] += rng.randn(B, 3)
  P = np.tile(np.diag(LiveKalman.initial_P_diag),
              (B, 1, 1)).transpose(1, 2, 0).astype(dtype)
  dts = (0.01 + 0.001 * rng.rand(T)).astype(dtype)
  zs = (LiveKalman.initial_x[0:3] + 5.0 * rng.randn(T, B, 3)).astype(dtype)
  R = np.diag([25.0, 16.0, 9.0]).astype(dtype)
  return x, P, dts, zs, R


def test_pack_unpack_roundtrip():
  x, P, _, _, _ = _workload(24, 1, np.float32)
  xp, Pp = pallas_live.pack_live_state(jnp.asarray(x), jnp.asarray(P))
  xu, Pu = pallas_live.unpack_live_state(xp, Pp)
  np.testing.assert_array_equal(np.asarray(xu), x)
  np.testing.assert_array_equal(np.asarray(Pu), P)


@pytest.mark.parametrize("gate", [False, True])
def test_kernel_matches_lane_scan(gate):
  """Kernel (interpret mode) vs the jnp lane scan: identical math, so the
  results must agree to roundoff; multi-tile grid + t_chunking exercised."""
  B, T = 32, 8
  x, P, dts, zs, R = _workload(B, T, np.float32)
  if gate:  # make half the measurements wild outliers
    zs[:, ::2, :] += 1e4

  x_ref, P_ref = live_lane.live_lane_scan(
      jnp.asarray(x), jnp.asarray(P), jnp.asarray(LiveKalman.Q, jnp.float32),
      jnp.asarray(dts), jnp.asarray(zs), jnp.asarray(R), gate=gate)

  xp, Pp = pallas_live.pack_live_state(jnp.asarray(x), jnp.asarray(P))
  zsp = pallas_live.pack_measurements(jnp.asarray(zs))
  q_diag = tuple(float(v) for v in np.diag(LiveKalman.Q))
  r_mat = tuple(tuple(float(v) for v in row) for row in R)
  xo, Po = pallas_live.live_bank_scan(
      xp, Pp, zsp, jnp.asarray(dts), q_diag=q_diag, r_mat=r_mat, gate=gate,
      t_chunk=4, tile_b=16, interpret=True)
  xu, Pu = pallas_live.unpack_live_state(xo, Po)

  np.testing.assert_allclose(np.asarray(xu), np.asarray(x_ref),
                             rtol=1e-6, atol=1e-5)
  np.testing.assert_allclose(np.asarray(Pu), np.asarray(P_ref),
                             rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_mixed_kernel_matches_mixed_scan():
  """Heterogeneous-kind kernel (interpret mode) vs the jnp mixed scan."""
  from rednose_tpu.models.live import ObservationKind as K

  kinds = (K.PHONE_GYRO, K.PHONE_ACCEL, K.CAMERA_ODO_ROTATION, K.ECEF_POS)
  R_by_kind = {
      K.PHONE_GYRO: np.diag([0.025**2] * 3).astype(np.float32),
      K.PHONE_ACCEL: np.diag([0.5**2] * 3).astype(np.float32),
      K.CAMERA_ODO_ROTATION: np.diag([0.05**2] * 3).astype(np.float32),
      K.ECEF_POS: np.diag([25.0] * 3).astype(np.float32),
  }
  B, T = 16, 8
  x, P, dts, zs, _ = _workload(B, T, np.float32)
  kind_idx = (np.arange(T) % len(kinds)).astype(np.int32)
  # keep gyro/accel/rot measurements small-scale, positions near the prior
  for t in range(T):
    if kinds[kind_idx[t]] == K.ECEF_POS:
      zs[t] = LiveKalman.initial_x[0:3] + np.random.RandomState(t).randn(B, 3)
    else:
      zs[t] = 0.05 * np.random.RandomState(t).randn(B, 3)

  R_list = tuple(jnp.asarray(R_by_kind[k]) for k in kinds)
  x_ref, P_ref = live_lane.jit_live_mixed_scan(kinds)(
      jnp.asarray(x), jnp.asarray(P), jnp.asarray(LiveKalman.Q, jnp.float32),
      jnp.asarray(dts), jnp.asarray(kind_idx), jnp.asarray(zs), R_list)

  xp, Pp = pallas_live.pack_live_state(jnp.asarray(x), jnp.asarray(P))
  zsp = pallas_live.pack_measurements(jnp.asarray(zs))
  q_diag = tuple(float(v) for v in np.diag(LiveKalman.Q))
  r_mats = tuple(tuple(tuple(float(v) for v in row) for row in R_by_kind[k])
                 for k in kinds)
  xo, Po = pallas_live.live_bank_scan_mixed(
      xp, Pp, zsp, jnp.asarray(dts), jnp.asarray(kind_idx),
      q_diag=q_diag, kinds=kinds, r_mats=r_mats,
      t_chunk=4, tile_b=16, interpret=True)
  xu, Pu = pallas_live.unpack_live_state(xo, Po)

  np.testing.assert_allclose(np.asarray(xu), np.asarray(x_ref),
                             rtol=1e-6, atol=1e-5)
  np.testing.assert_allclose(np.asarray(Pu), np.asarray(P_ref),
                             rtol=1e-5, atol=1e-5)
