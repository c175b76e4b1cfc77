"""Filter-bank and Pallas-kernel parity tests.

SURVEY.md §4's prescribed dual-implementation pattern applied to the TPU hot
path: (a) the vmapped/scanned bank must reproduce the sequential driver
exactly, and (b) the fused Pallas kernel (interpret mode on CPU here,
compiled on TPU in bench.py) must reproduce the generic vmapped step,
with and without Mahalanobis gating.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from rednose_tpu.core.spec import FilterSpec, ObservationModel
from rednose_tpu.models.kinematic import KinematicKalman, ObservationKind, build_kinematic_spec
from rednose_tpu.ops import pallas_step
from rednose_tpu.runtime import bank as bank_ops


def _sim(T, B, seed=0):
  rng = np.random.default_rng(seed)
  dts = np.full((T,), 0.01)
  zs = rng.normal(0.0, 0.5, size=(T, B))
  rs = np.full((T,), 0.1**2)
  return dts, zs, rs


def test_run_bank_matches_sequential_driver():
  """A B-wide bank fed per-filter measurement streams must match B separate
  sequential drivers (here: check filter 0 against the driver)."""
  T, B = 50, 4
  dts, zs, rs = _sim(T, B)
  spec = KinematicKalman.build_spec()

  state = bank_ops.init_bank(
      spec, KinematicKalman.initial_x, np.diag(KinematicKalman.initial_P_diag),
      batch=B, dtype=jnp.float64)
  Q = jnp.asarray(KinematicKalman.Q)
  Rs = jnp.broadcast_to(jnp.asarray(rs)[:, None, None, None], (T, B, 1, 1))
  final, ys = bank_ops.run_bank(
      spec, ObservationKind.POSITION, {}, state, Q,
      jnp.asarray(dts), jnp.asarray(zs)[..., None], Rs)
  assert ys.shape == (T, B, 1)

  kf = KinematicKalman()
  kf.filter.set_filter_time(0.0)  # align with the bank's t0 = 0 (else dt=0 first step)
  t = 0.0
  for k in range(T):
    t += dts[k]
    kf.predict_and_observe(t, ObservationKind.POSITION, [[zs[k, 0]]],
                           R=np.array([[[rs[k]]]]))
  np.testing.assert_allclose(np.asarray(final.x[0]), kf.x, rtol=1e-10)
  np.testing.assert_allclose(np.asarray(final.P[0]), kf.P, rtol=1e-10)


def _generic_bank_final(maha, T, B, dts, zs, rs):
  spec = build_kinematic_spec()
  if maha:
    om = spec.obs[ObservationKind.POSITION]
    spec = dataclasses.replace(
        spec, obs={ObservationKind.POSITION: dataclasses.replace(
            om, maha_test=True,
            maha_thresh=pallas_step.MAHA_THRESH_1D)})
  state = bank_ops.init_bank(
      spec, KinematicKalman.initial_x, np.diag(KinematicKalman.initial_P_diag),
      batch=B, dtype=jnp.float64)
  Rs = jnp.broadcast_to(jnp.asarray(rs)[:, None, None, None], (T, B, 1, 1))
  final, _ = bank_ops.run_bank(
      spec, ObservationKind.POSITION, {}, state, jnp.asarray(KinematicKalman.Q),
      jnp.asarray(dts), jnp.asarray(zs)[..., None], Rs)
  return np.asarray(final.x), np.asarray(final.P)


def _pallas_bank_final(maha, T, B, dts, zs, rs):
  x0 = jnp.broadcast_to(jnp.asarray(KinematicKalman.initial_x), (B, 2))
  P0 = jnp.broadcast_to(jnp.asarray(np.diag(KinematicKalman.initial_P_diag)),
                        (B, 2, 2))
  packed = pallas_step.pack_state(x0, P0)
  Q = KinematicKalman.Q
  out = pallas_step.kinematic_bank_scan(
      packed, jnp.asarray(zs), jnp.asarray(dts), jnp.asarray(rs),
      q00=float(Q[0, 0]), q11=float(Q[1, 1]), maha=maha,
      t_chunk=8, tile_b=128, interpret=True)
  x, P = pallas_step.unpack_state(out)
  return np.asarray(x), np.asarray(P)


def test_pallas_kernel_matches_generic_step():
  T, B = 64, 256
  dts, zs, rs = _sim(T, B, seed=3)
  xg, Pg = _generic_bank_final(False, T, B, dts, zs, rs)
  xp, Pp = _pallas_bank_final(False, T, B, dts, zs, rs)
  np.testing.assert_allclose(xp, xg, rtol=1e-10, atol=1e-12)
  np.testing.assert_allclose(Pp, Pg, rtol=1e-10, atol=1e-12)


def test_pallas_kernel_matches_generic_step_with_maha_gate():
  T, B = 64, 256
  # Wide measurement spread so a good fraction of updates trip the gate.
  rng = np.random.default_rng(9)
  dts = np.full((T,), 0.01)
  zs = rng.normal(0.0, 3.0, size=(T, B))
  rs = np.full((T,), 0.05**2)
  xg, Pg = _generic_bank_final(True, T, B, dts, zs, rs)
  xp, Pp = _pallas_bank_final(True, T, B, dts, zs, rs)
  np.testing.assert_allclose(xp, xg, rtol=1e-8, atol=1e-10)
  np.testing.assert_allclose(Pp, Pg, rtol=1e-8, atol=1e-10)


def test_pack_unpack_roundtrip():
  rng = np.random.default_rng(0)
  x = jnp.asarray(rng.normal(size=(16, 2)))
  Poff = rng.normal(size=(16,))
  P = jnp.asarray(np.stack([np.array([[2.0, o], [o, 3.0]]) for o in Poff]))
  x2, P2 = pallas_step.unpack_state(pallas_step.pack_state(x, P))
  np.testing.assert_allclose(np.asarray(x2), np.asarray(x))
  np.testing.assert_allclose(np.asarray(P2), np.asarray(P))
