"""MSCKF machinery at lane-bank speed (round-3: feature-track updates,
block predict, and augmentation on the lane-major bank layout), parity vs
the core/step.py oracle (reference semantics: templates/ekf_c.c:17-29
block propagation, ekf_c.c:66-77 nullspace-projected feature update,
ekf_sym.py:365-391 augment)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rednose_tpu.core import step as step_ops
from rednose_tpu.models.msckf_vo import (
    ObservationKind as VK,
    build_msckf_vo_spec,
)
from rednose_tpu.models.msckf_eskf import MSCKFEskf
from rednose_tpu.ops import lane_bank

B = 12


def _bank(spec, x0, seed=0, scale=0.05):
  rng = np.random.RandomState(seed)
  d = spec.dim_err
  xs = np.tile(np.asarray(x0, np.float64), (B, 1))
  xs += scale * rng.randn(*xs.shape)
  for idx in spec.quaternion_idxs:
    q = xs[:, idx:idx + 4]
    xs[:, idx:idx + 4] = q / np.linalg.norm(q, axis=1, keepdims=True)
  Ps = []
  for _ in range(B):
    A = rng.randn(d, d) * 0.05
    Ps.append(A @ A.T + 0.1 * np.eye(d))
  return jnp.asarray(xs), jnp.asarray(np.stack(Ps, axis=-1))


def test_lane_predict_msckf_block_form():
  """Clone states are static: lane predict must reproduce the oracle's
  block propagation exactly (one-sided F on the coupling blocks)."""
  spec = build_msckf_vo_spec()
  x, P = _bank(spec, np.zeros(spec.dim_x))
  Q = jnp.asarray(np.diag(0.01 + 0.001 * np.arange(spec.dim_err)))
  dt = 0.05
  xl, Pl = lane_bank.lane_predict(spec, {}, x, P, Q, dt)
  for i in range(B):
    xo, Po = step_ops.predict(spec, {}, x[i], P[:, :, i], Q, dt)
    np.testing.assert_allclose(np.asarray(xl[i]), np.asarray(xo),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(Pl[:, :, i]), np.asarray(Po),
                               rtol=1e-10, atol=1e-12)


@pytest.mark.slow
def test_lane_feature_update_matches_oracle():
  """Householder-projected feature update == QR-complete oracle update in
  x and P (the nullspace basis differs by a rotation, so innovations are
  only compared through their norm)."""
  spec = build_msckf_vo_spec()
  kind = int(VK.MSCKF_TEST)
  om = spec.obs[kind]
  rng = np.random.RandomState(1)
  # clone window spread out so He has full column rank
  x0 = np.concatenate([0.1 * rng.randn(spec.dim_main),
                       (0.3 * rng.randn(spec.n_augment,
                                        spec.dim_augment)).ravel()])
  x, P = _bank(spec, x0, seed=2)
  ea = jnp.asarray(np.array([2.0, 1.5, 8.0]) + 0.2 * rng.randn(B, 3))
  zs = []
  for i in range(B):
    h = om.h({}, x[i], ea[i])
    zs.append(np.asarray(h) + 0.01 * rng.randn(om.dz))
  z = jnp.asarray(np.stack(zs))
  R = jnp.asarray(np.eye(om.dz) * 0.02**2)

  xl, Pl, yl = lane_bank.lane_update(spec, kind, {}, x, P, z, R, ea=ea)

  for i in range(B):
    xo, Po, yo = step_ops.update(spec, kind, {}, x[i], P[:, :, i], z[i], R,
                                 ea[i])
    np.testing.assert_allclose(np.asarray(xl[i]), np.asarray(xo),
                               rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(np.asarray(Pl[:, :, i]), np.asarray(Po),
                               rtol=1e-7, atol=1e-9)
    # innovation is basis-dependent; its norm is not
    np.testing.assert_allclose(np.linalg.norm(np.asarray(yl[i])),
                               np.linalg.norm(np.asarray(yo)), rtol=1e-8)


def test_lane_feature_update_gate_rejects():
  """A wildly wrong feature measurement must be soft-rejected (zero gain)
  lane-wise while sane lanes still update."""
  spec = build_msckf_vo_spec()
  kind = int(VK.MSCKF_TEST)
  om = spec.obs[kind]
  rng = np.random.RandomState(3)
  x0 = np.concatenate([0.1 * rng.randn(spec.dim_main),
                       (0.3 * rng.randn(spec.n_augment,
                                        spec.dim_augment)).ravel()])
  x, P = _bank(spec, x0, seed=4)
  ea = jnp.asarray(np.array([2.0, 1.5, 8.0]) + 0.2 * rng.randn(B, 3))
  zs = []
  for i in range(B):
    h = np.asarray(om.h({}, x[i], ea[i]))
    zs.append(h + (100.0 if i == 0 else 0.01) * rng.randn(om.dz))
  z = jnp.asarray(np.stack(zs))
  R = jnp.asarray(np.eye(om.dz) * 0.02**2)
  xl, Pl, _ = lane_bank.lane_update(spec, kind, {}, x, P, z, R, ea=ea)
  # outlier lane: state unchanged (zero gain)
  np.testing.assert_allclose(np.asarray(xl[0]), np.asarray(x[0]),
                             atol=1e-12)
  # healthy lane: state moved
  assert np.abs(np.asarray(xl[1]) - np.asarray(x[1])).max() > 1e-6


@pytest.mark.slow
def test_lane_feature_update_eskf_composition():
  """Feature update on the MSCKF x ESKF composition model (quaternion
  error state + He nullspace + H_mod chain in one update)."""
  spec = MSCKFEskf.build_spec()
  kind = next(k for k, om in spec.obs.items() if om.is_feature)
  om = spec.obs[kind]
  rng = np.random.RandomState(5)
  x, P = _bank(spec, MSCKFEskf.initial_x, seed=6, scale=0.02)
  ea = jnp.asarray(np.array([1.0, 0.5, 6.0]) + 0.1 * rng.randn(B, 3))
  zs = []
  for i in range(B):
    h = np.asarray(om.h({}, x[i], ea[i]))
    zs.append(h + 0.005 * rng.randn(om.dz))
  z = jnp.asarray(np.stack(zs))
  R = jnp.asarray(np.eye(om.dz) * 0.02**2)
  xl, Pl, _ = lane_bank.lane_update(spec, kind, {}, x, P, z, R, ea=ea)
  for i in range(B):
    xo, Po, _ = step_ops.update(spec, kind, {}, x[i], P[:, :, i], z[i], R,
                                ea[i])
    np.testing.assert_allclose(np.asarray(xl[i]), np.asarray(xo),
                               rtol=1e-7, atol=1e-8)
    np.testing.assert_allclose(np.asarray(Pl[:, :, i]), np.asarray(Po),
                               rtol=1e-6, atol=1e-8)


def test_lane_augment_matches_oracle():
  spec = build_msckf_vo_spec()
  x, P = _bank(spec, 0.5 + np.arange(spec.dim_x) * 0.1)
  xl, Pl = lane_bank.lane_augment(spec, x, P)
  for i in range(B):
    xo, Po = step_ops.augment(spec, x[i], P[:, :, i])
    np.testing.assert_allclose(np.asarray(xl[i]), np.asarray(xo),
                               atol=1e-14)
    np.testing.assert_allclose(np.asarray(Pl[:, :, i]), np.asarray(Po),
                               atol=1e-12)
