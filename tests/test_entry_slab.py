"""Entry-level slab step (ops/entry_slab.py) parity vs the core/step.py
oracle — the automatic minimal-kernel path for arbitrary specs (reference
codegen promise: rednose/helpers/ekf_sym.py:76-89)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rednose_tpu.core import step as step_ops
from rednose_tpu.models.kinematic import KinematicKalman
from rednose_tpu.models.kinematic import ObservationKind as KK
from rednose_tpu.models.live import LiveKalman, ObservationKind as LK
from rednose_tpu.ops import entry_slab, pallas_bank, sparsity


def _rand_bank(spec, x0, B, seed=0):
  rng = np.random.RandomState(seed)
  xs = sparsity.sample_states(spec, x0, B, seed=seed + 1)
  d = spec.dim_err
  Ps = []
  for _ in range(B):
    A = rng.randn(d, d) * 0.1
    Ps.append(A @ A.T + np.eye(d))
  return xs, np.stack(Ps)


def _oracle_step(spec, kind, x, P, Q, R, z, dt, gate):
  om = spec.obs[kind]
  if gate and not om.maha_test:
    om = dataclasses.replace(om, maha_test=True)
    spec = dataclasses.replace(spec, obs={**dict(spec.obs), kind: om})
  xp, Pp = step_ops.predict(spec, {}, x, P, Q, dt)
  ea = jnp.zeros((max(om.ea_len, 1),), x.dtype)
  return step_ops.update(spec, kind, {}, xp, Pp, z, R, ea)


def _check_parity(spec, kind, x0, q_diag_np, R_np, B=16, gate=True,
                  tol=5e-6):
  st = sparsity.detect_structure(spec, x0)
  dtype = jnp.float32
  xs, Ps = _rand_bank(spec, x0, B)
  x_slab = jnp.asarray(xs.T, dtype)
  P_slab = jnp.asarray(Ps.transpose(1, 2, 0), dtype)
  rng = np.random.RandomState(7)
  dz = spec.obs[kind].dz
  z = jnp.asarray(np.asarray(x0)[:dz][:, None] + rng.randn(dz, B), dtype)
  q_diag = tuple(float(v) for v in q_diag_np)
  r_mat = tuple(tuple(float(v) for v in row) for row in R_np)
  dt = jnp.asarray(0.01, dtype)

  xn, Pn, y = jax.jit(lambda x, P, z, dt: entry_slab.entry_step_slab(
      spec, kind, {}, x, P, z, q_diag, r_mat, dt, st, gate=gate))(
      x_slab, P_slab, z, dt)

  Q = jnp.asarray(np.diag(q_diag_np), dtype)
  R = jnp.asarray(R_np, dtype)
  for i in range(B):
    xo, Po, yo = _oracle_step(spec, kind, x_slab[:, i], P_slab[:, :, i], Q,
                              R, z[:, i], dt, gate)
    scale = float(jnp.abs(xo).max())
    assert float(jnp.abs(xo - xn[:, i]).max()) < tol * max(scale, 1.0)
    assert float(jnp.abs(Po - Pn[:, :, i]).max()) < tol * 100
    assert float(jnp.abs(yo - y[:, i]).max()) < tol * 100


@pytest.mark.slow
def test_entry_step_matches_oracle_live():
  """The unmodified live 23/22 ESKF spec through the entry-level body."""
  _check_parity(LiveKalman.build_spec(), LK.ECEF_POS, LiveKalman.initial_x,
                np.diag(LiveKalman.Q), np.diag([25.0] * 3))


@pytest.mark.slow
def test_entry_step_matches_oracle_live_gyro():
  """A second kind (rotation-chain H with bias/offset coupling)."""
  _check_parity(LiveKalman.build_spec(), LK.PHONE_GYRO,
                LiveKalman.initial_x, np.diag(LiveKalman.Q),
                np.diag([0.025**2] * 3), gate=False)


def test_entry_step_matches_oracle_kinematic():
  """Additive branch (no f_err): d f / d x taps."""
  _check_parity(KinematicKalman.build_spec(), KK.POSITION,
                KinematicKalman.initial_x, np.diag(KinematicKalman.Q),
                np.atleast_2d(0.1**2))


def test_entry_step_matches_oracle_sympy_frontend():
  """A MIGRATED (sympy-lambdified) spec reaches the entry-level fast path:
  the structural interpreter absorbs lambdify's (n, 1) matrix reshapes at
  the object level, so frontend-built specs are no longer locked out of
  the kernel body (round-2 verdict item 5)."""
  import sympy as sp

  from rednose_tpu.frontend.sympy_spec import spec_from_sympy

  x_sym = sp.MatrixSymbol('x', 2, 1)
  xm = sp.Matrix(x_sym)
  dt = sp.Symbol('dt')
  f_sym = sp.Matrix([xm[0, 0] + dt * xm[1, 0], xm[1, 0]])
  obs_eqs = [[sp.Matrix([xm[0, 0]]), int(KK.POSITION), None]]
  spec = spec_from_sympy('sympy_entry', f_sym, dt, x_sym, obs_eqs, 2, 2)
  _check_parity(spec, int(KK.POSITION), KinematicKalman.initial_x,
                np.diag(KinematicKalman.Q), np.atleast_2d(0.1**2))


@pytest.mark.slow
def test_entry_kernel_interpret_matches_oracle_live():
  """The entry-level body inside the actual Pallas kernel (interpret mode;
  the real-TPU compile is exercised by BENCH_MODEL=generic)."""
  spec = LiveKalman.build_spec()
  st = sparsity.detect_structure(spec, LiveKalman.initial_x)
  dtype = jnp.float32
  B, T = 16, 4
  xs, Ps = _rand_bank(spec, LiveKalman.initial_x, B)
  x = jnp.asarray(xs, dtype)
  P_lane = jnp.asarray(Ps.transpose(1, 2, 0), dtype)
  rng = np.random.RandomState(3)
  zs = jnp.asarray(LiveKalman.initial_x[:3] + rng.randn(T, B, 3), dtype)
  dts = jnp.full((T,), 0.01, dtype)
  q_diag = tuple(float(v) for v in np.diag(LiveKalman.Q))
  r_mat = tuple(tuple(float(v) for v in row) for row in np.diag([25.0] * 3))

  xp, Pp = pallas_bank.pack_bank(x, P_lane)
  zsp = pallas_bank.pack_bank_measurements(zs)
  xo_p, Po_p = pallas_bank.generic_bank_scan(
      xp, Pp, zsp, dts, spec=spec, kind=LK.ECEF_POS, q_diag=q_diag,
      r_mat=r_mat, gate=True, t_chunk=2, tile_b=8, interpret=True,
      structure=st, entry=True)
  x_out, P_out = pallas_bank.unpack_bank(xo_p, Po_p)

  Q = jnp.asarray(LiveKalman.Q, dtype)
  R = jnp.asarray(np.diag([25.0] * 3), dtype)
  for i in range(B):
    xi, Pi = x[i], P_lane[:, :, i]
    for t in range(T):
      xi, Pi, _ = _oracle_step(spec, LK.ECEF_POS, xi, Pi, Q, R, zs[t, i],
                               dts[t], True)
    assert float(jnp.abs(xi - x_out[i]).max()) < 1e-4 * max(
        float(jnp.abs(xi).max()), 1.0)
    assert float(jnp.abs(Pi - P_out[:, :, i]).max()) < 1e-3


def test_entry_kernel_interpret_sympy_frontend():
  """A migrated sympy spec through the ACTUAL generic Pallas kernel
  (interpret mode): the reference bar is that every gen_code filter IS a
  fast filter (site_scons rednose_filter.py:40-48)."""
  import sympy as sp

  from rednose_tpu.frontend.sympy_spec import spec_from_sympy

  x_sym = sp.MatrixSymbol('x', 2, 1)
  xm = sp.Matrix(x_sym)
  dt = sp.Symbol('dt')
  f_sym = sp.Matrix([xm[0, 0] + dt * xm[1, 0], xm[1, 0]])
  obs_eqs = [[sp.Matrix([xm[0, 0]]), int(KK.POSITION), None]]
  spec = spec_from_sympy('sympy_kernel', f_sym, dt, x_sym, obs_eqs, 2, 2)
  st = sparsity.detect_structure(spec, KinematicKalman.initial_x)

  dtype = jnp.float32
  B, T = 16, 4
  rng = np.random.RandomState(0)
  x = jnp.asarray(np.tile(KinematicKalman.initial_x, (B, 1))
                  + 0.1 * rng.randn(B, 2), dtype)
  P_lane = jnp.asarray(
      np.stack([np.diag(KinematicKalman.initial_P_diag)] * B, -1), dtype)
  zs = jnp.asarray(rng.randn(T, B, 1) * 0.3, dtype)
  dts = jnp.full((T,), 0.01, dtype)
  q_diag = tuple(float(v) for v in np.diag(KinematicKalman.Q))
  r_mat = ((0.1**2,),)

  xp, Pp = pallas_bank.pack_bank(x, P_lane)
  zsp = pallas_bank.pack_bank_measurements(zs)
  xo_p, Po_p = pallas_bank.generic_bank_scan(
      xp, Pp, zsp, dts, spec=spec, kind=int(KK.POSITION), q_diag=q_diag,
      r_mat=r_mat, gate=False, t_chunk=2, tile_b=8, interpret=True,
      structure=st, entry=True)
  x_out, P_out = pallas_bank.unpack_bank(xo_p, Po_p)

  Q = jnp.asarray(KinematicKalman.Q, dtype)
  R = jnp.asarray([[0.1**2]], dtype)
  ea = jnp.zeros((1,), dtype)
  for i in range(B):
    xi, Pi = x[i], P_lane[:, :, i]
    for t in range(T):
      xi, Pi = step_ops.predict(spec, {}, xi, Pi, Q, dts[t])
      xi, Pi, _ = step_ops.update(spec, int(KK.POSITION), {}, xi, Pi,
                                  zs[t, i], R, ea)
    np.testing.assert_allclose(np.asarray(x_out[i]), np.asarray(xi),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(P_out[:, :, i]), np.asarray(Pi),
                               rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_entry_step_matches_oracle_live_accel():
  """PHONE_ACCEL: gravity model with a pow primitive — exercises the
  interpreter's pow rule and the slab-safe fallback (pre-fix: shape
  corruption crash in slab mode)."""
  _check_parity(LiveKalman.build_spec(), LK.PHONE_ACCEL,
                LiveKalman.initial_x, np.diag(LiveKalman.Q),
                np.diag([0.5**2] * 3), gate=False, tol=2e-5)


def test_entry_step_matches_oracle_live_odo():
  """ODOMETRIC_SPEED (dz=1): speed norm with sqrt/clamping —
  max/select_n interpreter rules."""
  _check_parity(LiveKalman.build_spec(), LK.ODOMETRIC_SPEED,
                LiveKalman.initial_x, np.diag(LiveKalman.Q),
                np.atleast_2d(0.05**2), gate=False, tol=2e-5)


def _vo_setup(B=16, T=4, seed=0):
  from rednose_tpu.models.msckf_vo import (
      ObservationKind as VK,
      build_msckf_vo_spec,
  )

  spec = build_msckf_vo_spec()
  kind = int(VK.MSCKF_TEST)
  om = spec.obs[kind]
  st = sparsity.detect_structure(spec, np.zeros(spec.dim_x))
  rng = np.random.RandomState(seed)
  x0 = np.concatenate([0.1 * rng.randn(spec.dim_main),
                       0.3 * rng.randn(spec.n_augment * spec.dim_augment)])
  xs = np.tile(x0, (B, 1)) + 0.02 * rng.randn(B, spec.dim_x)
  Ps = np.stack([np.eye(spec.dim_err) * 0.1] * B, -1)
  eas = np.array([2.0, 1.5, 8.0])[None, None] + 0.1 * rng.randn(T, B, 3)
  zs = np.stack([np.stack([
      np.asarray(om.h({}, jnp.asarray(xs[i]), jnp.asarray(eas[t, i])))
      + 0.005 * rng.randn(om.dz) for i in range(B)]) for t in range(T)])
  return spec, kind, om, st, xs, Ps, eas, zs


@pytest.mark.slow
def test_entry_vo_kernel_interpret_matches_oracle():
  """The banked-VO Pallas kernel (vo_bank_scan: MSCKF block predict +
  Householder-projected feature update + window augment IN-KERNEL) vs the
  sequential core/step oracle — the reference's feature kinds in the same
  hot kernel as everything else (templates/ekf_c.c:66-77). Also exercises
  the structural interpreter's static-scatter rule: msckf_vo's dynamics
  use .at[0:3].add, which Mosaic cannot lower but the interpreter absorbs.
  """
  spec, kind, om, st, xs, Ps, eas, zs = _vo_setup()
  dtype = jnp.float32
  B, T = xs.shape[0], zs.shape[0]
  dts = np.full((T,), 0.05)
  q_diag = tuple(0.01 for _ in range(spec.dim_err))
  r_mat = tuple(tuple(0.02**2 if i == j else 0.0 for j in range(om.dz))
                for i in range(om.dz))

  xp, Pp = pallas_bank.pack_bank(jnp.asarray(xs, dtype),
                                 jnp.asarray(Ps, dtype))
  zsp = pallas_bank.pack_bank_measurements(jnp.asarray(zs, dtype))
  easp = pallas_bank.pack_bank_measurements(jnp.asarray(eas, dtype))
  xo_p, Po_p = pallas_bank.vo_bank_scan(
      xp, Pp, zsp, easp, jnp.asarray(dts, dtype), spec=spec, kind=kind,
      q_diag=q_diag, r_mat=r_mat, gate=True, t_chunk=2, tile_b=8,
      interpret=True, structure=st)
  x_out, P_out = pallas_bank.unpack_bank(xo_p, Po_p)

  Q = jnp.asarray(np.diag(q_diag), dtype)
  R = jnp.asarray(np.asarray(r_mat), dtype)
  for i in range(B):
    x, P = jnp.asarray(xs[i], dtype), jnp.asarray(Ps[:, :, i], dtype)
    for t in range(T):
      x, P = step_ops.predict(spec, {}, x, P, Q, dts[t])
      x, P, _ = step_ops.update(spec, kind, {}, x, P,
                                jnp.asarray(zs[t, i], dtype), R,
                                jnp.asarray(eas[t, i], dtype))
      x, P = step_ops.augment(spec, x, P)
    # 5e-5: f32 kernel vs f64 oracle; the tree-summed accumulations
    # reassociate adds, shifting f32 rounding by ~1e-5 vs the old fold
    assert float(jnp.abs(x - x_out[i]).max()) < 5e-5
    assert float(jnp.abs(P - P_out[:, :, i]).max()) < 5e-4

  # the 2-phase dispatch (predict folded into the innovation region —
  # the fallback when a flat body is past the compile budget) must
  # agree with the flat/3-phase forms on the same inputs
  xo2_p, Po2_p = pallas_bank.vo_bank_scan(
      xp, Pp, zsp, easp, jnp.asarray(dts, dtype), spec=spec, kind=kind,
      q_diag=q_diag, r_mat=r_mat, gate=True, t_chunk=2, tile_b=8,
      interpret=True, structure=st, phase_mode='switch2')
  x2, P2 = pallas_bank.unpack_bank(xo2_p, Po2_p)
  np.testing.assert_allclose(np.asarray(x2), np.asarray(x_out),
                             rtol=1e-6, atol=1e-6)
  np.testing.assert_allclose(np.asarray(P2), np.asarray(P_out),
                             rtol=1e-5, atol=1e-6)


def test_entry_feature_update_anisotropic_R():
  """The non-isotropic-R branch (full Q^T R Q projection) vs oracle."""
  spec, kind, om, st, xs, Ps, eas, zs = _vo_setup(B=6, T=1, seed=3)
  dtype = jnp.float64
  Rnp = np.diag(0.01 + 0.005 * np.arange(om.dz))
  r_mat = tuple(tuple(float(v) for v in row) for row in Rnp)
  xn, Pn, _ = entry_slab.entry_feature_update_slab(
      spec, kind, {}, jnp.asarray(xs.T, dtype), jnp.asarray(Ps, dtype),
      jnp.asarray(zs[0].T, dtype), r_mat, False, jnp.asarray(eas[0].T,
                                                             dtype),
      structure=st)
  for i in range(xs.shape[0]):
    xo, Po, _ = step_ops.update(
        spec, kind, {}, jnp.asarray(xs[i], dtype),
        jnp.asarray(Ps[:, :, i], dtype), jnp.asarray(zs[0, i], dtype),
        jnp.asarray(Rnp, dtype), jnp.asarray(eas[0, i], dtype))
    np.testing.assert_allclose(np.asarray(xn[:, i]), np.asarray(xo),
                               rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(np.asarray(Pn[:, :, i]), np.asarray(Po),
                               rtol=1e-7, atol=1e-9)


def test_entry_absorbs_static_scatter():
  """User model code written with .at[slice].add/.set reaches the entry
  path: the structural interpreter resolves static-slice scatters at the
  object level (Mosaic itself cannot lower scatter)."""
  from rednose_tpu.core.spec import FilterSpec, ObservationModel

  def f(params, x, dt):
    x = x.at[0:2].add(dt * x[2:4])
    return x.at[3:4].set(x[3:4] * 0.99)

  spec = FilterSpec(
      name="scatterful", dim_x=4, dim_err=4, f=f,
      obs={1: ObservationModel(kind=1, h=lambda p, x, ea: x[:2], dz=2)})
  st = sparsity.detect_structure(spec, np.array([1.0, 2.0, 0.5, -0.3]))
  _check_parity(spec, 1, np.array([1.0, 2.0, 0.5, -0.3]),
                np.full(4, 0.01), np.diag([0.1, 0.2]), gate=False)


@pytest.mark.slow
def test_entry_vo_kernel_eskf_composition_switch_mode():
  """The ESKFxMSCKF composition (models/msckf_eskf: quaternion error state
  + full-pose clone window — the reference's joint msckf_params +
  eskf_params path, ekf_sym.py:57-66) through vo_bank_scan. The flat
  frame body is ~4.4k jaxpr ops — past the Mosaic compile budget — so
  auto mode must pick the 3-phase lax.switch dispatch
  (entry_slab.entry_vo_frame_branches); parity vs the sequential
  core/step oracle stays exact."""
  from rednose_tpu.models.msckf_eskf import (
      MSCKFEskf,
      ObservationKind as EK,
  )

  spec = MSCKFEskf.build_spec()
  kind = int(EK.MSCKF_FEATURE)
  om = spec.obs[kind]
  st = sparsity.detect_structure(spec, MSCKFEskf.initial_x)
  q_diag = tuple(float(v) for v in np.diag(MSCKFEskf.Q))
  r_mat = tuple(tuple(0.01**2 if i == j else 0.0 for j in range(om.dz))
                for i in range(om.dz))
  assert pallas_bank.vo_flat_body_ops(
      spec, kind, q_diag, r_mat, True, st) > \
      pallas_bank.EPOCH_UNROLL_OP_BUDGET  # auto must route to 'switch'

  rng = np.random.RandomState(0)
  B, T = 16, 4
  x0 = np.asarray(MSCKFEskf.initial_x, np.float64)
  xs = np.tile(x0, (B, 1)) + 0.02 * rng.randn(B, spec.dim_x)
  for a in range(spec.n_augment):
    o = spec.dim_main + spec.dim_augment * a
    xs[:, o:o + 3] += 0.5 * rng.randn(3)[None]
  for idx in spec.quaternion_idxs:
    q = xs[:, idx:idx + 4]
    xs[:, idx:idx + 4] = q / np.linalg.norm(q, axis=1, keepdims=True)
  Ps = np.tile((0.1 * np.eye(spec.dim_err))[..., None], (1, 1, B))
  eas = np.array([1.0, 0.5, 6.0])[None, None] + 0.1 * rng.randn(T, B, 3)
  zs = np.stack([np.stack([
      np.asarray(om.h({}, jnp.asarray(xs[i]), jnp.asarray(eas[t, i])))
      + 0.005 * rng.randn(om.dz) for i in range(B)]) for t in range(T)])
  dts = np.full((T,), 0.05)
  dtype = jnp.float32

  xp, Pp = pallas_bank.pack_bank(jnp.asarray(xs, dtype),
                                 jnp.asarray(Ps, dtype))
  zsp = pallas_bank.pack_bank_measurements(jnp.asarray(zs, dtype))
  easp = pallas_bank.pack_bank_measurements(jnp.asarray(eas, dtype))
  xo_p, Po_p = pallas_bank.vo_bank_scan(
      xp, Pp, zsp, easp, jnp.asarray(dts, dtype), spec=spec, kind=kind,
      q_diag=q_diag, r_mat=r_mat, gate=True, t_chunk=2, tile_b=8,
      interpret=True, structure=st)
  x_out, P_out = pallas_bank.unpack_bank(xo_p, Po_p)

  Q = jnp.asarray(np.diag(q_diag), dtype)
  R = jnp.asarray(np.asarray(r_mat), dtype)
  for i in range(B):
    x, P = jnp.asarray(xs[i], dtype), jnp.asarray(Ps[:, :, i], dtype)
    for t in range(T):
      x, P = step_ops.predict(spec, {}, x, P, Q, dts[t])
      x, P, _ = step_ops.update(spec, kind, {}, x, P,
                                jnp.asarray(zs[t, i], dtype), R,
                                jnp.asarray(eas[t, i], dtype))
      x, P = step_ops.augment(spec, x, P)
    # 5e-5: f32 kernel vs f64 oracle; the tree-summed accumulations
    # reassociate adds, shifting f32 rounding by ~1e-5 vs the old fold
    assert float(jnp.abs(x - x_out[i]).max()) < 5e-5
    assert float(jnp.abs(P - P_out[:, :, i]).max()) < 5e-4

  # the 2-phase dispatch (predict folded into the innovation region —
  # the fallback when a flat body is past the compile budget) must
  # agree with the flat/3-phase forms on the same inputs
  xo2_p, Po2_p = pallas_bank.vo_bank_scan(
      xp, Pp, zsp, easp, jnp.asarray(dts, dtype), spec=spec, kind=kind,
      q_diag=q_diag, r_mat=r_mat, gate=True, t_chunk=2, tile_b=8,
      interpret=True, structure=st, phase_mode='switch2')
  x2, P2 = pallas_bank.unpack_bank(xo2_p, Po2_p)
  np.testing.assert_allclose(np.asarray(x2), np.asarray(x_out),
                             rtol=1e-6, atol=1e-6)
  np.testing.assert_allclose(np.asarray(P2), np.asarray(P_out),
                             rtol=1e-5, atol=1e-6)
