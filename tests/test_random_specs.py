"""Property-based parity: random filter specs through every generic path.

The shipped-model tests pin the framework to the reference's two filters;
these tests sweep randomly generated specs (random dims, random sparse
nonlinear dynamics, random observation maps) through the production paths
and compare against a 20-line textbook numpy EKF whose Jacobians come from
the same spec (so the check isolates the *algebra* of core/step.py /
ops/lane_bank.py, over arbitrary dims rather than the two shipped shapes).
Mirrors the reference's dual-engine strategy (examples/test_compare.py) at
property-test breadth.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from rednose_tpu.core.spec import FilterSpec, ObservationModel
from rednose_tpu.ops import lane_bank, sparsity
from rednose_tpu.runtime.driver import FilterEngine


def _random_spec(seed: int, dim: int, dz: int):
  """Random stable nonlinear spec: f = x + dt*(A tanh(x) + b), h = C x with
  one nonlinear tap; A gets a random sparsity mask (exercises structure
  detection on shapes no shipped model has)."""
  rng = np.random.RandomState(seed)
  mask = rng.rand(dim, dim) < 0.4
  np.fill_diagonal(mask, rng.rand(dim) < 0.5)
  A = jnp.asarray(np.where(mask, 0.3 * rng.randn(dim, dim), 0.0))
  b = jnp.asarray(0.1 * rng.randn(dim))
  C = jnp.asarray(rng.randn(dz, dim))

  def f(params, x, dt):
    del params
    return x + dt * (A @ jnp.tanh(x) + b)

  def h(params, x, ea):
    del params, ea
    return C @ x + jnp.sin(x[0])

  obs = {1: ObservationModel(kind=1, h=h, dz=dz, maha_test=bool(seed % 2))}
  return FilterSpec(name=f'rand{seed}', dim_x=dim, dim_err=dim, f=f,
                    obs=obs), rng


def _numpy_ekf(spec, x0, P0, Q, stream):
  """Textbook EKF in numpy (predict: F P F^T + dt Q; update: Joseph form),
  Jacobians evaluated through the spec's jacfwd surface."""
  x = np.asarray(x0, np.float64).copy()
  P = np.asarray(P0, np.float64).copy()
  Q = np.asarray(Q, np.float64)
  for dt, z, R in stream:
    F = np.asarray(spec.F({}, jnp.asarray(x), dt), np.float64)
    x = np.asarray(spec.f({}, jnp.asarray(x), dt), np.float64)
    P = F @ P @ F.T + dt * Q
    P = 0.5 * (P + P.T)
    om = spec.obs[1]
    hx = np.asarray(om.h({}, jnp.asarray(x), None), np.float64)
    H = np.asarray(spec.H(1, {}, jnp.asarray(x), jnp.zeros(1)), np.float64)
    y = z - hx
    S = H @ P @ H.T + R
    if om.maha_test and float(y @ np.linalg.solve(S, y)) > om.maha_thresh:
      K = np.zeros((x.shape[0], z.shape[0]))  # zero-gain soft reject
    else:
      K = np.linalg.solve(S, H @ P).T
    x = x + K @ y
    IKH = np.eye(x.shape[0]) - K @ H
    P = IKH @ P @ IKH.T + K @ R @ K.T
    P = 0.5 * (P + P.T)
  return x, P


@pytest.mark.parametrize("seed,dim,dz", [(0, 3, 1), (1, 5, 2), (2, 7, 3),
                                         (3, 11, 2)])
def test_engine_matches_numpy_ekf(seed, dim, dz):
  spec, rng = _random_spec(seed, dim, dz)
  x0 = rng.randn(dim)
  P0 = np.eye(dim)
  Q = np.diag(0.01 + 0.1 * rng.rand(dim))
  eng = FilterEngine(spec, Q, x0, P0)

  stream = []
  t = 0.0
  for i in range(40):
    t += 0.05
    z = rng.randn(dz) * (10.0 if i % 9 == 5 else 1.0)  # occasional outlier
    R = np.diag(0.5 + rng.rand(dz))
    # first observation initializes filter_time (dt=0), like the reference
    stream.append((0.05 if i else 0.0, z, R))
    eng.predict_and_update_batch(t, 1, [z], R[None])

  x_ref, P_ref = _numpy_ekf(spec, x0, P0, Q, stream)
  np.testing.assert_allclose(eng.state(), x_ref, rtol=1e-8, atol=1e-10)
  np.testing.assert_allclose(eng.covs(), P_ref, rtol=1e-7, atol=1e-10)


@pytest.mark.parametrize("seed,dim,dz", [(4, 4, 2), (5, 6, 3)])
def test_lane_bank_matches_numpy_ekf_per_lane(seed, dim, dz):
  """Random specs through the lane-major bank: every lane is an independent
  textbook EKF."""
  spec, rng = _random_spec(seed, dim, dz)
  B, T = 5, 12
  x0 = rng.randn(B, dim)
  P0 = np.tile(np.eye(dim), (B, 1, 1))
  Q = np.diag(0.01 + 0.1 * rng.rand(dim))
  dts = np.full((T,), 0.05)
  zs = rng.randn(T, B, dz)
  R = np.diag(0.5 + rng.rand(dz))

  xb, Pb = lane_bank.lane_bank_scan(
      spec, 1, {}, jnp.asarray(x0), jnp.asarray(P0.transpose(1, 2, 0)),
      jnp.asarray(Q), jnp.asarray(dts), jnp.asarray(zs), jnp.asarray(R))
  Pb = np.asarray(Pb).transpose(2, 0, 1)
  for lane in range(B):
    stream = [(0.05, zs[t, lane], R) for t in range(T)]
    x_ref, P_ref = _numpy_ekf(spec, x0[lane], P0[lane], Q, stream)
    np.testing.assert_allclose(np.asarray(xb)[lane], x_ref,
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(Pb[lane], P_ref, rtol=1e-7, atol=1e-10)


@pytest.mark.parametrize("seed,dim", [(6, 5), (7, 9)])
def test_structure_detection_on_random_sparsity(seed, dim):
  """detect_structure recovers the random mask of A (F = I + dt*A*diag(
  tanh'(x)) shares A's pattern plus the diagonal) and the masked lane path
  reproduces the dense one exactly."""
  spec, rng = _random_spec(seed, dim, 2)
  x0 = rng.randn(dim)
  st = sparsity.detect_structure(spec, x0)
  F = np.asarray(spec.F({}, jnp.asarray(rng.randn(dim)), 0.07))
  detected = np.zeros((dim, dim), bool)
  for i, cols in enumerate(st.f_rows):
    detected[i, list(cols)] = True
  assert ((F != 0) <= detected).all()  # no nonzero outside the pattern

  B, T = 4, 6
  xb0 = rng.randn(B, dim)
  P0 = np.tile(np.eye(dim), (B, 1, 1)).transpose(1, 2, 0)
  Q = np.diag(0.01 + 0.1 * rng.rand(dim))
  dts = np.full((T,), 0.05)
  zs = rng.randn(T, B, 2)
  R = np.diag(0.5 + rng.rand(2))
  args = ({}, jnp.asarray(xb0), jnp.asarray(P0), jnp.asarray(Q),
          jnp.asarray(dts), jnp.asarray(zs), jnp.asarray(R))
  xd, Pd = lane_bank.lane_bank_scan(spec, 1, *args)
  xs_, Ps_ = lane_bank.lane_bank_scan(spec, 1, *args, structure=st)
  np.testing.assert_allclose(np.asarray(xs_), np.asarray(xd),
                             rtol=1e-9, atol=1e-11)
  np.testing.assert_allclose(np.asarray(Ps_), np.asarray(Pd),
                             rtol=1e-8, atol=1e-11)


@pytest.mark.parametrize("seed,dim,dz", [(6, 3, 1), (7, 5, 2), (8, 9, 3),
                                         (9, 14, 2)])
def test_entry_slab_matches_numpy_ekf(seed, dim, dz):
  """Random specs through the entry-level slab body (ops/entry_slab.py) —
  the 'automatic minimal kernel for ANY model' path — vs the textbook
  numpy EKF, at dims no shipped model has."""
  from rednose_tpu.ops import entry_slab

  spec, rng = _random_spec(seed, dim, dz)
  st = sparsity.detect_structure(spec, rng.randn(dim))
  B, T = 4, 10
  x0 = rng.randn(B, dim)
  P0 = np.tile(np.eye(dim), (B, 1, 1))
  q = 0.01 + 0.1 * rng.rand(dim)
  R = np.diag(0.5 + rng.rand(dz))
  zs = rng.randn(T, B, dz)
  gate = spec.obs[1].maha_test

  x = jnp.asarray(x0.T)                      # (dim, B)
  P = jnp.asarray(P0.transpose(1, 2, 0))     # (dim, dim, B)
  q_diag = tuple(float(v) for v in q)
  r_mat = tuple(tuple(float(v) for v in row) for row in R)
  for t in range(T):
    x, P, _ = entry_slab.entry_step_slab(
        spec, 1, {}, x, P, jnp.asarray(zs[t].T), q_diag, r_mat,
        jnp.asarray(0.05), st, gate=gate)

  for lane in range(B):
    stream = [(0.05, zs[t, lane], R) for t in range(T)]
    x_ref, P_ref = _numpy_ekf(spec, x0[lane], P0[lane], np.diag(q), stream)
    np.testing.assert_allclose(np.asarray(x)[:, lane], x_ref,
                               rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(P)[:, :, lane], P_ref,
                               rtol=1e-6, atol=1e-9)


def test_lane_bank_pseudorange_extra_args():
  """Non-feature kind with real per-lane extra args through the lane bank
  (loc_kf pseudorange family): parity vs core/step.update with the same
  ea threaded."""
  from rednose_tpu.core import step as step_ops

  def h_pr(params, x, ea):
    del params
    d = x[:3] - ea
    return jnp.linalg.norm(d)[None]

  spec = FilterSpec(
      name='pr_lane', dim_x=3, dim_err=3,
      f=lambda p, x, dt: x,
      obs={5: ObservationModel(kind=5, h=h_pr, dz=1, ea_dim=0, ea_len=3)})
  rng = np.random.RandomState(0)
  B = 6
  x0 = jnp.asarray(rng.randn(B, 3))
  P0 = jnp.asarray(np.tile(np.eye(3) * 4.0, (B, 1, 1)).transpose(1, 2, 0))
  sats = jnp.asarray(100.0 * rng.randn(B, 3))
  z = jnp.asarray(rng.rand(B, 1) * 100.0)
  R = jnp.asarray([[1e-2]])

  xl, Pl, yl = lane_bank.lane_update(spec, 5, {}, x0, P0, z, R, ea=sats)
  for i in range(B):
    xo, Po, yo = step_ops.update(spec, 5, {}, x0[i], P0[:, :, i], z[i], R,
                                 sats[i])
    np.testing.assert_allclose(np.asarray(xl[i]), np.asarray(xo),
                               rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(np.asarray(Pl[:, :, i]), np.asarray(Po),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(yl[i]), np.asarray(yo),
                               rtol=1e-9, atol=1e-10)
