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
