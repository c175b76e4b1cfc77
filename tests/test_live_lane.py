"""Parity of the structure-exploiting live lane step (ops/live_lane.py)
against the core/step.py semantics oracle, in float64 on CPU."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rednose_tpu.core import step as step_ops
from rednose_tpu.models.live import LiveKalman, ObservationKind, build_live_spec
from rednose_tpu.ops import live_lane
from rednose_tpu.ops.quaternion import quat_to_rot, skew


def _random_states(rng, B):
  """Plausible random live states + SPD covariances."""
  x = rng.randn(B, 23)
  x[:, 0:3] = LiveKalman.initial_x[0:3] + 10.0 * rng.randn(B, 3)
  x[:, 3:7] /= np.linalg.norm(x[:, 3:7], axis=1, keepdims=True)
  A = 0.1 * rng.randn(B, 22, 22)
  P = A @ np.swapaxes(A, 1, 2) + np.eye(22) * 0.5
  return x, P


def test_closed_form_F_matches_jacfwd():
  """The hand-derived block-sparse F (module docstring) must equal the
  autodiff F = d f_err / d dx at dx=0 for arbitrary states."""
  spec = build_live_spec()
  rng = np.random.RandomState(0)
  x, _ = _random_states(rng, 8)
  for i in range(8):
    dt = 0.07 * (i + 1)
    F = np.asarray(spec.F({}, jnp.asarray(x[i]), dt))
    q, w, a = x[i, 3:7], x[i, 10:13], x[i, 17:20]
    Rq = np.asarray(quat_to_rot(jnp.asarray(q)))
    A = np.zeros((22, 22))
    A[0:3, 6:9] = np.eye(3)
    A[3:6, 3:6] = -np.asarray(skew(jnp.asarray(Rq @ w)))
    A[3:6, 9:12] = Rq
    A[6:9, 3:6] = -np.asarray(skew(jnp.asarray(Rq @ a)))
    A[6:9, 16:19] = Rq
    np.testing.assert_allclose(F, np.eye(22) + dt * A, rtol=1e-12, atol=1e-13)


@pytest.mark.slow
def test_predict_parity():
  spec = build_live_spec()
  rng = np.random.RandomState(1)
  B = 16
  x, P = _random_states(rng, B)
  Q = jnp.asarray(LiveKalman.Q)
  dt = 0.013
  xs, Ps = live_lane.live_predict_slab(
      jnp.asarray(x.T), jnp.asarray(P.transpose(1, 2, 0)), Q, dt)
  for i in range(B):
    xo, Po = step_ops.predict(spec, {}, jnp.asarray(x[i]), jnp.asarray(P[i]),
                              Q, jnp.asarray(dt))
    np.testing.assert_allclose(np.asarray(xs[:, i]), np.asarray(xo),
                               rtol=1e-11, atol=1e-11)
    np.testing.assert_allclose(np.asarray(Ps[:, :, i]), np.asarray(Po),
                               rtol=1e-9, atol=1e-10)


@pytest.mark.parametrize("gate", [False, True])
def test_update_parity(gate):
  spec = build_live_spec()
  if gate:
    om = spec.obs[ObservationKind.ECEF_POS]
    spec = dataclasses.replace(
        spec, obs={**dict(spec.obs),
                   ObservationKind.ECEF_POS: dataclasses.replace(
                       om, maha_test=True)})
  rng = np.random.RandomState(2)
  B = 16
  x, P = _random_states(rng, B)
  # half the measurements near the prior (accepted), half far (gated)
  z = x[:, 0:3] + np.where(np.arange(B)[:, None] % 2 == 0,
                           0.1 * rng.randn(B, 3), 500.0 + rng.randn(B, 3))
  R = np.diag([4.0, 5.0, 6.0])
  xs, Ps, ys = live_lane.live_update_pos_slab(
      jnp.asarray(x.T), jnp.asarray(P.transpose(1, 2, 0)),
      jnp.asarray(z.T), jnp.asarray(R), gate=gate)
  ea = jnp.zeros((1,))
  for i in range(B):
    xo, Po, yo = step_ops.update(
        spec, ObservationKind.ECEF_POS, {}, jnp.asarray(x[i]),
        jnp.asarray(P[i]), jnp.asarray(z[i]), jnp.asarray(R), ea)
    np.testing.assert_allclose(np.asarray(xs[:, i]), np.asarray(xo),
                               rtol=1e-10, atol=1e-11)
    np.testing.assert_allclose(np.asarray(Ps[:, :, i]), np.asarray(Po),
                               rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(np.asarray(ys[:, i]), np.asarray(yo),
                               rtol=1e-12, atol=1e-12)


@pytest.mark.slow
def test_scan_parity_vs_sequential_oracle():
  """T fused steps through the lane scan == T sequential oracle steps."""
  spec = build_live_spec()
  rng = np.random.RandomState(3)
  B, T = 4, 25
  x, P = _random_states(rng, B)
  Q = jnp.asarray(LiveKalman.Q)
  dts = 0.01 + 0.001 * rng.rand(T)
  zs = np.tile(x[None, :, 0:3], (T, 1, 1)) + 2.0 * rng.randn(T, B, 3)
  R = np.diag([25.0, 25.0, 25.0])

  xs, Ps = live_lane.jit_live_lane_scan()(
      jnp.asarray(x), jnp.asarray(P.transpose(1, 2, 0)), Q,
      jnp.asarray(dts), jnp.asarray(zs), jnp.asarray(R))

  ea = jnp.zeros((1, 1))
  for i in range(B):
    xo, Po = jnp.asarray(x[i]), jnp.asarray(P[i])
    for k in range(T):
      _, _, xo, Po, _ = step_ops.predict_and_update_batch(
          spec, ObservationKind.ECEF_POS, {}, xo, Po, Q,
          jnp.asarray(dts[k]), jnp.asarray(zs[k, i][None]),
          jnp.asarray(R)[None], ea)
    np.testing.assert_allclose(np.asarray(xs[i]), np.asarray(xo),
                               rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(np.asarray(Ps[:, :, i]), np.asarray(Po),
                               rtol=1e-7, atol=1e-8)


def test_scan_matches_generic_lane_bank():
  """Same workload through the generic lane bank and the specialized path."""
  from rednose_tpu.ops import lane_bank

  spec = build_live_spec()
  rng = np.random.RandomState(4)
  B, T = 4, 10
  x, P = _random_states(rng, B)
  Q = jnp.asarray(LiveKalman.Q)
  dts = np.full((T,), 0.01)
  zs = np.tile(x[None, :, 0:3], (T, 1, 1)) + rng.randn(T, B, 3)
  R = np.diag([25.0, 25.0, 25.0])

  x_fast, P_fast = live_lane.jit_live_lane_scan()(
      jnp.asarray(x), jnp.asarray(P.transpose(1, 2, 0)), Q,
      jnp.asarray(dts), jnp.asarray(zs), jnp.asarray(R))
  x_gen, P_gen = lane_bank.jit_lane_bank_scan(
      spec, ObservationKind.ECEF_POS)(
          {}, jnp.asarray(x), jnp.asarray(P.transpose(1, 2, 0)), Q,
          jnp.asarray(dts), jnp.asarray(zs), jnp.asarray(R))
  np.testing.assert_allclose(np.asarray(x_fast), np.asarray(x_gen),
                             rtol=1e-9, atol=1e-10)
  np.testing.assert_allclose(np.asarray(P_fast), np.asarray(P_gen),
                             rtol=1e-7, atol=1e-8)


ALL_LANE_KINDS = sorted(live_lane.LANE_KINDS)


@pytest.mark.parametrize("kind", ALL_LANE_KINDS)
def test_closed_form_H_all_kinds(kind):
  """Every kind's closed-form sparse H blocks must reproduce the autodiff
  H_raw @ H_mod exactly (machine epsilon) at arbitrary states."""
  spec = build_live_spec()
  rng = np.random.RandomState(10 + kind)
  x, _ = _random_states(rng, 6)
  dz, builder = live_lane.LANE_KINDS[kind]
  ea = jnp.zeros((1,))
  for i in range(6):
    xj = jnp.asarray(x[i])
    H_ref = np.asarray(spec.H(kind, {}, xj, ea)) @ \
        np.asarray(spec.H_mod_at({}, xj))
    h_slab, blocks = builder(jnp.asarray(x[i][:, None]))
    H = np.zeros((dz, 22))
    for c, w, Hb in blocks:
      H[:, c:c + w] = np.eye(dz, w) if Hb is None else np.asarray(Hb[..., 0])
    scale = max(np.abs(H_ref).max(), 1e-30)
    np.testing.assert_allclose(H / scale, H_ref / scale, rtol=0, atol=1e-13)
    h_ref = np.asarray(spec.obs[kind].h({}, xj, ea))
    np.testing.assert_allclose(np.asarray(h_slab[..., 0]), h_ref,
                               rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("kind", ALL_LANE_KINDS)
def test_update_parity_all_kinds(kind):
  """live_update_slab == core/step.update for every kind, random states."""
  spec = build_live_spec()
  rng = np.random.RandomState(20 + kind)
  B = 8
  x, P = _random_states(rng, B)
  dz = live_lane.LANE_KINDS[kind][0]
  ea = jnp.zeros((1,))
  # measurements near the prediction so gains stay moderate
  z = np.stack([
      np.asarray(spec.obs[kind].h({}, jnp.asarray(x[i]), ea)) +
      0.01 * rng.randn(dz) for i in range(B)])
  R = np.diag(1.0 + rng.rand(dz))

  xs, Ps, ys = live_lane.live_update_slab(
      kind, jnp.asarray(x.T), jnp.asarray(P.transpose(1, 2, 0)),
      jnp.asarray(z.T), jnp.asarray(R))
  for i in range(B):
    xo, Po, yo = step_ops.update(
        spec, kind, {}, jnp.asarray(x[i]), jnp.asarray(P[i]),
        jnp.asarray(z[i]), jnp.asarray(R), ea)
    np.testing.assert_allclose(np.asarray(xs[:, i]), np.asarray(xo),
                               rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(np.asarray(Ps[:, :, i]), np.asarray(Po),
                               rtol=1e-7, atol=1e-8)
    np.testing.assert_allclose(np.asarray(ys[:, i]), np.asarray(yo),
                               rtol=1e-11, atol=1e-12)


@pytest.mark.slow
def test_mixed_scan_matches_sequential_oracle():
  """Heterogeneous gyro/accel/rot/pos stream through live_mixed_scan == the
  same stream stepped sequentially through the core/step oracle."""
  from rednose_tpu.models.live import ObservationKind as K

  spec = build_live_spec()
  rng = np.random.RandomState(5)
  B, T = 3, 16
  kinds = (K.PHONE_GYRO, K.PHONE_ACCEL, K.CAMERA_ODO_ROTATION, K.ECEF_POS)
  R_by_kind = {
      K.PHONE_GYRO: np.diag([0.025**2] * 3),
      K.PHONE_ACCEL: np.diag([0.5**2] * 3),
      K.CAMERA_ODO_ROTATION: np.diag([0.05**2] * 3),
      K.ECEF_POS: np.diag([25.0] * 3),
  }
  x, P = _random_states(rng, B)
  Q = jnp.asarray(LiveKalman.Q)
  dts = 0.009 + 0.002 * rng.rand(T)
  kind_idx = np.arange(T, dtype=np.int32) % len(kinds)
  ea = jnp.zeros((1, 1))

  # synthesize measurements near each filter's own h (keeps gains sane)
  zs = np.zeros((T, B, 3))
  x_orc = [jnp.asarray(x[i]) for i in range(B)]
  P_orc = [jnp.asarray(P[i]) for i in range(B)]
  for t in range(T):
    kind = kinds[kind_idx[t]]
    dz = spec.obs[kind].dz
    for i in range(B):
      xp, _ = step_ops.predict(spec, {}, x_orc[i], P_orc[i], Q,
                               jnp.asarray(dts[t]))
      zs[t, i, :dz] = np.asarray(
          spec.obs[kind].h({}, xp, jnp.zeros((1,)))) + 0.01 * rng.randn(dz)
    for i in range(B):
      _, _, x_orc[i], P_orc[i], _ = step_ops.predict_and_update_batch(
          spec, kind, {}, x_orc[i], P_orc[i], Q, jnp.asarray(dts[t]),
          jnp.asarray(zs[t, i, :dz][None]),
          jnp.asarray(R_by_kind[kind])[None], ea)

  R_list = tuple(jnp.asarray(R_by_kind[k]) for k in kinds)
  xs, Ps = live_lane.jit_live_mixed_scan(kinds)(
      jnp.asarray(x), jnp.asarray(P.transpose(1, 2, 0)), Q,
      jnp.asarray(dts), jnp.asarray(kind_idx), jnp.asarray(zs), R_list)
  for i in range(B):
    np.testing.assert_allclose(np.asarray(xs[i]), np.asarray(x_orc[i]),
                               rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(np.asarray(Ps[:, :, i]), np.asarray(P_orc[i]),
                               rtol=1e-6, atol=1e-8)


def test_f32_long_stream_stays_conditioned():
  """Production numerics: 2048 sequential float32 steps through the
  specialized live path must keep the covariance exactly symmetric with
  positive variances (the conditioning invariants CLAUDE.md mandates — f32
  covariances drift asymmetric and then indefinite without per-op
  symmetrization) and keep tracking the measurement stream.

  NOTE pathwise f32-vs-f64 agreement is NOT asserted at this horizon: with
  attitude/acceleration unobserved, the filter is chaotic enough that
  rounding-scale perturbations decorrelate the sample paths within a few
  hundred steps (measured ~5 sigma by T=1024 even with near-origin
  positions); the f64 run is just another sample path. Pathwise parity is
  covered at update granularity by the oracle tests above."""
  rng = np.random.RandomState(9)
  B, T = 8, 2048
  x0 = np.tile(LiveKalman.initial_x, (B, 1))
  P0 = np.tile(np.diag(LiveKalman.initial_P_diag), (B, 1, 1)).transpose(1, 2, 0)
  dts = np.full((T,), 0.01)
  zs = LiveKalman.initial_x[0:3] + 5.0 * rng.randn(T, B, 3)
  R = np.diag([25.0] * 3)

  x32, P32 = live_lane.jit_live_lane_scan()(
      jnp.asarray(x0, jnp.float32), jnp.asarray(P0, jnp.float32),
      jnp.asarray(LiveKalman.Q, jnp.float32), jnp.asarray(dts, jnp.float32),
      jnp.asarray(zs, jnp.float32), jnp.asarray(R, jnp.float32))
  x32, P32 = np.asarray(x32), np.asarray(P32)

  assert np.all(np.isfinite(x32)) and np.all(np.isfinite(P32))
  # exact symmetry (enforced by _sym every op) and positive variances
  np.testing.assert_array_equal(P32, P32.transpose(1, 0, 2))
  diag = P32[np.arange(22), np.arange(22)]
  assert np.all(diag > 0)
  # position variance converged far below its 1e8 prior
  assert np.all(diag[0:3] < 10.0)
  # still tracking: posterior position within a few sigma of the measured
  # mean (a statistical invariant every correct sample path satisfies)
  sigma = np.sqrt(diag[0:3]).T
  err = np.abs(x32[:, 0:3] - LiveKalman.initial_x[0:3])
  assert np.all(err < 8.0 * sigma + 1.0), (err / sigma).max()
  # quaternions stay unit
  np.testing.assert_allclose(np.linalg.norm(x32[:, 3:7], axis=1), 1.0,
                             rtol=0, atol=1e-6)
