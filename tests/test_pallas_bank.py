"""Generic VMEM-resident Pallas bank (ops/pallas_bank.py) vs the core/step
oracle, for scatter-free specs: the shipped kinematic model and a custom
4-state constant-turn spec with a 2-dim gated observation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rednose_tpu.core import step as step_ops
from rednose_tpu.core.spec import FilterSpec, ObservationModel
from rednose_tpu.models.kinematic import KinematicKalman
from rednose_tpu.models.kinematic import ObservationKind as KK
from rednose_tpu.ops import pallas_bank


def _ct_f(params, x, dt):
  """Constant-turn 2-D model [px, py, v, heading] — deliberately nonlinear
  and scatter-free (built with jnp.stack)."""
  del params
  return jnp.stack([
      x[0] + dt * x[2] * jnp.cos(x[3]),
      x[1] + dt * x[2] * jnp.sin(x[3]),
      x[2],
      x[3] + dt * 0.1,
  ])


def _ct_h(params, x, ea):
  del params, ea
  return jnp.stack([x[0], x[1]])


def _ct_speed_h(params, x, ea):
  del params, ea
  return x[2:3]


def _ct_spec():
  return FilterSpec(
      name='const_turn', dim_x=4, dim_err=4, f=_ct_f,
      obs={1: ObservationModel(kind=1, h=_ct_h, dz=2, maha_test=True),
           2: ObservationModel(kind=2, h=_ct_speed_h, dz=1)})


def _run_oracle(spec, kind, x0, P0, Q, dts, zs, R, B, T):
  outs_x, outs_P = [], []
  ea = jnp.zeros((1,))
  for i in range(B):
    x, P = jnp.asarray(x0[i]), jnp.asarray(P0[i])
    for k in range(T):
      x, P = step_ops.predict(spec, {}, x, P, jnp.asarray(Q),
                              jnp.asarray(dts[k]))
      x, P, _ = step_ops.update(spec, kind, {}, x, P,
                                jnp.asarray(zs[k, i]), jnp.asarray(R), ea)
    outs_x.append(np.asarray(x))
    outs_P.append(np.asarray(P))
  return np.stack(outs_x), np.stack(outs_P)


@pytest.mark.parametrize("case", ["kinematic", "const_turn"])
def test_generic_kernel_matches_oracle(case):
  rng = np.random.RandomState(0)
  B, T = 16, 6
  if case == "kinematic":
    spec, kind = KinematicKalman.build_spec(), KK.POSITION
    x0 = np.tile(KinematicKalman.initial_x, (B, 1)) + 0.1 * rng.randn(B, 2)
    P0 = np.tile(np.diag(KinematicKalman.initial_P_diag), (B, 1, 1))
    Q = np.asarray(KinematicKalman.Q)
    zs = 0.5 * rng.randn(T, B, 1)
    R = np.atleast_2d(0.01)
  else:
    spec, kind = _ct_spec(), 1
    x0 = np.column_stack([rng.randn(B), rng.randn(B),
                          1.0 + 0.1 * rng.rand(B), 0.1 * rng.randn(B)])
    P0 = np.tile(np.diag([1.0, 1.0, 0.5, 0.2]), (B, 1, 1))
    Q = np.diag([0.01, 0.01, 0.1, 0.05])
    zs = x0[None, :, 0:2] + 0.3 * rng.randn(T, B, 2)
    zs[:, ::4, :] += 1e3  # gross outliers: exercise the gate
    R = np.diag([0.09, 0.09])

  dts = np.full((T,), 0.05)
  dtype = np.float32
  xp, Pp = pack = pallas_bank.pack_bank(
      jnp.asarray(x0, dtype), jnp.asarray(P0.transpose(1, 2, 0), dtype))
  zsp = pallas_bank.pack_bank_measurements(jnp.asarray(zs, dtype))
  q_diag = tuple(float(v) for v in np.diag(Q))
  r_mat = tuple(tuple(float(v) for v in row) for row in R)
  gate = spec.obs[kind].maha_test

  xo, Po = pallas_bank.generic_bank_scan(
      xp, Pp, zsp, jnp.asarray(dts, dtype), spec=spec, kind=kind,
      q_diag=q_diag, r_mat=r_mat, gate=gate, t_chunk=3, tile_b=8,
      interpret=True)
  xu, Pu = pallas_bank.unpack_bank(xo, Po)

  x_ref, P_ref = _run_oracle(spec, kind, x0, P0, Q, dts, zs, R, B, T)
  np.testing.assert_allclose(np.asarray(xu), x_ref, rtol=2e-4, atol=2e-4)
  np.testing.assert_allclose(np.asarray(Pu).transpose(2, 0, 1), P_ref,
                             rtol=2e-3, atol=2e-4)


@pytest.mark.parametrize("use_structure", [False, True])
@pytest.mark.parametrize("kind_name", ["PSEUDORANGE_GPS",
                                       "PSEUDORANGE_RATE_GPS"])
def test_generic_kernel_pseudorange_ea(kind_name, use_structure):
  """Non-feature extra-args kinds (the loc_kf pseudorange family) through
  the generic kernel's ea stream — per-step per-lane satellite states —
  vs the core/step oracle, on both the dense and the entry/structure
  bodies."""
  from rednose_tpu.models.live import ObservationKind as OK
  from rednose_tpu.models.loc import LocKalman
  from rednose_tpu.ops import sparsity

  spec = LocKalman.build_spec()
  kind = int(getattr(OK, kind_name))
  om = spec.obs[kind]
  B, T = 16, 6
  rng = np.random.RandomState(7)

  x0 = np.tile(LocKalman.initial_x, (B, 1)) + rng.randn(B, 11)
  x0[:, 3:6] += 5.0 * rng.randn(B, 3)
  P0 = np.tile(np.eye(11) * 10.0, (B, 1, 1))
  Q = np.asarray(LocKalman.Q)
  dts = np.full((T,), 0.1)

  sat_pos = LocKalman.initial_x[:3][None, None] \
      + 2.0e7 * rng.randn(T, B, 3)
  if om.ea_len == 3:
    eas = sat_pos
    rho = np.linalg.norm(x0[None, :, :3] - sat_pos, axis=-1)
    zs = (rho + x0[None, :, 6] + 2.0 * rng.randn(T, B))[..., None]
    R = np.atleast_2d(4.0)
  else:
    sat_vel = 3e3 * rng.randn(T, B, 3)
    eas = np.concatenate([sat_pos, sat_vel], axis=-1)
    d = x0[None, :, :3] - sat_pos
    u = d / np.linalg.norm(d, axis=-1, keepdims=True)
    zs = (np.sum(u * (x0[None, :, 3:6] - sat_vel), axis=-1)
          + x0[None, :, 7] + 0.05 * rng.randn(T, B))[..., None]
    R = np.atleast_2d(0.05**2)

  structure = (sparsity.structure_for(spec, jnp.asarray(LocKalman.initial_x))
               if use_structure else None)

  xp, Pp = pallas_bank.pack_bank(
      jnp.asarray(x0), jnp.asarray(P0.transpose(1, 2, 0)))
  zsp = pallas_bank.pack_bank_measurements(jnp.asarray(zs))
  easp = pallas_bank.pack_bank_measurements(jnp.asarray(eas))
  q_diag = tuple(float(v) for v in np.diag(Q))
  r_mat = tuple(tuple(float(v) for v in row) for row in R)

  xo, Po = pallas_bank.generic_bank_scan(
      xp, Pp, zsp, jnp.asarray(dts), easp, spec=spec, kind=kind,
      q_diag=q_diag, r_mat=r_mat, gate=om.maha_test, t_chunk=3, tile_b=8,
      interpret=True, structure=structure)
  xu, Pu = pallas_bank.unpack_bank(xo, Po)

  # sequential core/step oracle, per lane, real ea threaded
  for i in range(B):
    x, P = jnp.asarray(x0[i]), jnp.asarray(P0[i])
    for k in range(T):
      x, P = step_ops.predict(spec, {}, x, P, jnp.asarray(Q),
                              jnp.asarray(dts[k]))
      x, P, _ = step_ops.update(spec, kind, {}, x, P,
                                jnp.asarray(zs[k, i]), jnp.asarray(R),
                                jnp.asarray(eas[k, i]))
    np.testing.assert_allclose(np.asarray(xu[i]), np.asarray(x),
                               rtol=1e-7, atol=1e-8)
    np.testing.assert_allclose(np.asarray(Pu[:, :, i]), np.asarray(P),
                               rtol=1e-6, atol=1e-8)


def _run_mixed_oracle(spec, kinds, kind_idx, x0, P0, Q, dts, zs, R_list,
                      eas=None):
  """Sequential core/step oracle for a heterogeneous kind schedule; zs and
  eas rows are padded — slice each step's kind's own widths."""
  B, T = x0.shape[0], len(kind_idx)
  outs_x, outs_P = [], []
  for i in range(B):
    x, P = jnp.asarray(x0[i]), jnp.asarray(P0[i])
    for t in range(T):
      k = kinds[kind_idx[t]]
      om = spec.obs[k]
      x, P = step_ops.predict(spec, {}, x, P, jnp.asarray(Q),
                              jnp.asarray(dts[t]))
      ea = (jnp.asarray(eas[t, i, :om.ea_len]) if om.ea_len
            else jnp.zeros((1,)))
      x, P, _ = step_ops.update(spec, k, {}, x, P,
                                jnp.asarray(zs[t, i, :om.dz]),
                                jnp.asarray(R_list[kind_idx[t]]), ea)
    outs_x.append(np.asarray(x))
    outs_P.append(np.asarray(P))
  return np.stack(outs_x), np.stack(outs_P)


@pytest.mark.parametrize("use_structure", [False, True])
def test_generic_mixed_kernel_matches_oracle(use_structure):
  """Heterogeneous kind schedule (dz 2 + dz 1, gated + ungated) through
  generic_bank_scan_mixed vs the core/step oracle."""
  from rednose_tpu.ops import sparsity

  spec = _ct_spec()
  kinds = (1, 2)
  B, T = 16, 6
  rng = np.random.RandomState(3)
  x0 = np.column_stack([rng.randn(B), rng.randn(B),
                        1.0 + 0.1 * rng.rand(B), 0.1 * rng.randn(B)])
  P0 = np.tile(np.diag([1.0, 1.0, 0.5, 0.2]), (B, 1, 1))
  Q = np.diag([0.01, 0.01, 0.1, 0.05])
  dts = np.full((T,), 0.05)
  kind_idx = np.array([0, 1, 0, 0, 1, 0], dtype=np.int32)

  zs = np.zeros((T, B, 2))
  for t in range(T):
    if kind_idx[t] == 0:
      zs[t] = x0[:, 0:2] + 0.3 * rng.randn(B, 2)
      zs[t, ::5] += 1e3                      # outliers: exercise the gate
    else:
      zs[t, :, 0] = x0[:, 2] + 0.1 * rng.randn(B)
  R_list = [np.diag([0.09, 0.09]), np.atleast_2d(0.01)]
  r_mats = tuple(tuple(tuple(float(v) for v in row) for row in R)
                 for R in R_list)

  structure = (sparsity.structure_for(spec, jnp.asarray(x0[0]))
               if use_structure else None)

  xp, Pp = pallas_bank.pack_bank(
      jnp.asarray(x0), jnp.asarray(P0.transpose(1, 2, 0)))
  zsp = pallas_bank.pack_bank_measurements(jnp.asarray(zs))
  q_diag = tuple(float(v) for v in np.diag(Q))

  xo, Po = pallas_bank.generic_bank_scan_mixed(
      xp, Pp, zsp, jnp.asarray(dts), jnp.asarray(kind_idx), spec=spec,
      kinds=kinds, q_diag=q_diag, r_mats=r_mats, gate=True, t_chunk=3,
      tile_b=8, interpret=True, structure=structure)
  xu, Pu = pallas_bank.unpack_bank(xo, Po)

  x_ref, P_ref = _run_mixed_oracle(spec, kinds, kind_idx, x0, P0, Q, dts,
                                   zs, R_list)
  np.testing.assert_allclose(np.asarray(xu), x_ref, rtol=1e-7, atol=1e-8)
  np.testing.assert_allclose(np.asarray(Pu).transpose(2, 0, 1), P_ref,
                             rtol=1e-6, atol=1e-8)


@pytest.mark.parametrize(
    "use_structure",
    [False, pytest.param(True, marks=pytest.mark.slow)])
def test_generic_epoch_kernel_gnss_matches_oracle(use_structure):
  """Epoch-batched kernel (one predict + K unrolled updates per step — the
  reference's predict_and_update_batch shape, ekf_sym.py:484-531): a GNSS
  epoch of 3 pseudoranges + 2 rates per step vs the core/step oracle."""
  from rednose_tpu.models.live import ObservationKind as OK
  from rednose_tpu.models.loc import LocKalman
  from rednose_tpu.ops import sparsity

  spec = LocKalman.build_spec()
  slot_kinds = (int(OK.PSEUDORANGE_GPS),) * 3 \
      + (int(OK.PSEUDORANGE_RATE_GPS),) * 2
  K, B, T = len(slot_kinds), 16, 6
  rng = np.random.RandomState(13)

  x0 = np.tile(LocKalman.initial_x, (B, 1)) + rng.randn(B, 11)
  P0 = np.tile(np.eye(11) * 10.0, (B, 1, 1))
  Q = np.asarray(LocKalman.Q)
  dts = np.full((T,), 1.0)

  sat_pos = LocKalman.initial_x[:3][None, None, None] \
      + 2.0e7 * rng.randn(T, K, B, 3)
  sat_vel = 3e3 * rng.randn(T, K, B, 3)
  eas = np.concatenate([sat_pos, sat_vel], axis=-1)
  d = x0[None, None, :, :3] - sat_pos
  u = d / np.linalg.norm(d, axis=-1, keepdims=True)
  rho = np.linalg.norm(d, axis=-1) + x0[None, None, :, 6] \
      + 2.0 * rng.randn(T, K, B)
  rate = np.sum(u * (x0[None, None, :, 3:6] - sat_vel), axis=-1) \
      + x0[None, None, :, 7] + 0.05 * rng.randn(T, K, B)
  is_rho = (np.arange(K) < 3)[None, :, None]
  zs = np.where(is_rho, rho, rate)[..., None]
  zs[:, 1, ::4, 0] += 1e5                # one bad satellite: per-slot gate
  R_list = [np.atleast_2d(4.0)] * 3 + [np.atleast_2d(0.05**2)] * 2
  r_mats = tuple(tuple(tuple(float(v) for v in row) for row in R)
                 for R in R_list)

  structure = (sparsity.structure_for(spec, jnp.asarray(LocKalman.initial_x))
               if use_structure else None)

  xp, Pp = pallas_bank.pack_bank(
      jnp.asarray(x0), jnp.asarray(P0.transpose(1, 2, 0)))
  zsp = pallas_bank.pack_bank_epochs(jnp.asarray(zs))
  easp = pallas_bank.pack_bank_epochs(jnp.asarray(eas))
  q_diag = tuple(float(v) for v in np.diag(Q))

  xo, Po = pallas_bank.generic_bank_scan_epoch(
      xp, Pp, zsp, jnp.asarray(dts), easp, spec=spec,
      slot_kinds=slot_kinds, q_diag=q_diag, r_mats=r_mats, t_chunk=3,
      tile_b=8, interpret=True, structure=structure)
  xu, Pu = pallas_bank.unpack_bank(xo, Po)

  # oracle: predict once per epoch, then the K updates in slot order
  for i in range(B):
    x, P = jnp.asarray(x0[i]), jnp.asarray(P0[i])
    for t in range(T):
      x, P = step_ops.predict(spec, {}, x, P, jnp.asarray(Q),
                              jnp.asarray(dts[t]))
      for k, kind in enumerate(slot_kinds):
        om = spec.obs[kind]
        x, P, _ = step_ops.update(spec, kind, {}, x, P,
                                  jnp.asarray(zs[t, k, i, :om.dz]),
                                  jnp.asarray(R_list[k]),
                                  jnp.asarray(eas[t, k, i, :om.ea_len]))
    np.testing.assert_allclose(np.asarray(xu[i]), np.asarray(x),
                               rtol=1e-7, atol=1e-8)
    np.testing.assert_allclose(np.asarray(Pu[:, :, i]), np.asarray(P),
                               rtol=1e-6, atol=1e-8)


@pytest.mark.parametrize("use_structure", [False, True])
def test_generic_mixed_kernel_pseudorange_schedule(use_structure):
  """A real GNSS epoch schedule — interleaved pseudorange (ea 3) and
  pseudorange-rate (ea 6) kinds — through generic_bank_scan_mixed's padded
  ea stream, vs the core/step oracle."""
  from rednose_tpu.models.live import ObservationKind as OK
  from rednose_tpu.models.loc import LocKalman
  from rednose_tpu.ops import sparsity

  spec = LocKalman.build_spec()
  kinds = (int(OK.PSEUDORANGE_GPS), int(OK.PSEUDORANGE_RATE_GPS))
  B, T = 16, 6
  rng = np.random.RandomState(11)

  x0 = np.tile(LocKalman.initial_x, (B, 1)) + rng.randn(B, 11)
  P0 = np.tile(np.eye(11) * 10.0, (B, 1, 1))
  Q = np.asarray(LocKalman.Q)
  dts = np.full((T,), 0.1)
  kind_idx = np.array([0, 1, 0, 1, 0, 1], dtype=np.int32)

  sat_pos = LocKalman.initial_x[:3][None, None] + 2.0e7 * rng.randn(T, B, 3)
  sat_vel = 3e3 * rng.randn(T, B, 3)
  eas = np.concatenate([sat_pos, sat_vel], axis=-1)  # padded to max ea 6
  d = x0[None, :, :3] - sat_pos
  u = d / np.linalg.norm(d, axis=-1, keepdims=True)
  zs = np.zeros((T, B, 1))
  for t in range(T):
    if kind_idx[t] == 0:
      zs[t, :, 0] = (np.linalg.norm(d[t], axis=-1) + x0[:, 6]
                     + 2.0 * rng.randn(B))
    else:
      zs[t, :, 0] = (np.sum(u[t] * (x0[:, 3:6] - sat_vel[t]), axis=-1)
                     + x0[:, 7] + 0.05 * rng.randn(B))
  R_list = [np.atleast_2d(4.0), np.atleast_2d(0.05**2)]
  r_mats = tuple(tuple(tuple(float(v) for v in row) for row in R)
                 for R in R_list)

  structure = (sparsity.structure_for(spec, jnp.asarray(LocKalman.initial_x))
               if use_structure else None)

  xp, Pp = pallas_bank.pack_bank(
      jnp.asarray(x0), jnp.asarray(P0.transpose(1, 2, 0)))
  zsp = pallas_bank.pack_bank_measurements(jnp.asarray(zs))
  easp = pallas_bank.pack_bank_measurements(jnp.asarray(eas))
  q_diag = tuple(float(v) for v in np.diag(Q))

  xo, Po = pallas_bank.generic_bank_scan_mixed(
      xp, Pp, zsp, jnp.asarray(dts), jnp.asarray(kind_idx), easp, spec=spec,
      kinds=kinds, q_diag=q_diag, r_mats=r_mats, gate=True, t_chunk=3,
      tile_b=8, interpret=True, structure=structure)
  xu, Pu = pallas_bank.unpack_bank(xo, Po)

  x_ref, P_ref = _run_mixed_oracle(spec, kinds, kind_idx, x0, P0, Q, dts,
                                   zs, R_list, eas=eas)
  np.testing.assert_allclose(np.asarray(xu), x_ref, rtol=1e-7, atol=1e-8)
  np.testing.assert_allclose(np.asarray(Pu).transpose(2, 0, 1), P_ref,
                             rtol=1e-6, atol=1e-8)


def test_generic_epoch_kernel_switch_mode_matches_unroll():
  """slot_mode='switch' (fori_loop + per-distinct-(kind, R) lax.switch
  branches — the dispatch that keeps per-region op count at one-update
  size so live-complexity epochs can compile) computes EXACTLY what the
  flat unroll computes, on the GNSS epoch schedule."""
  from rednose_tpu.models.live import ObservationKind as OK
  from rednose_tpu.models.loc import LocKalman
  from rednose_tpu.ops import sparsity

  spec = LocKalman.build_spec()
  slot_kinds = (int(OK.PSEUDORANGE_GPS),) * 3 \
      + (int(OK.PSEUDORANGE_RATE_GPS),) * 2
  K, B, T = len(slot_kinds), 16, 6
  rng = np.random.RandomState(13)

  x0 = np.tile(LocKalman.initial_x, (B, 1)) + rng.randn(B, 11)
  P0 = np.tile(np.eye(11) * 10.0, (B, 1, 1))
  Q = np.asarray(LocKalman.Q)
  dts = np.full((T,), 1.0)

  sat_pos = LocKalman.initial_x[:3][None, None, None] \
      + 2.0e7 * rng.randn(T, K, B, 3)
  sat_vel = 3e3 * rng.randn(T, K, B, 3)
  eas = np.concatenate([sat_pos, sat_vel], axis=-1)
  d = x0[None, None, :, :3] - sat_pos
  u = d / np.linalg.norm(d, axis=-1, keepdims=True)
  rho = np.linalg.norm(d, axis=-1) + x0[None, None, :, 6] \
      + 2.0 * rng.randn(T, K, B)
  rate = np.sum(u * (x0[None, None, :, 3:6] - sat_vel), axis=-1) \
      + x0[None, None, :, 7] + 0.05 * rng.randn(T, K, B)
  is_rho = (np.arange(K) < 3)[None, :, None]
  zs = np.where(is_rho, rho, rate)[..., None]
  R_list = [np.atleast_2d(4.0)] * 3 + [np.atleast_2d(0.05**2)] * 2
  r_mats = tuple(tuple(tuple(float(v) for v in row) for row in R)
                 for R in R_list)

  structure = sparsity.structure_for(spec,
                                     jnp.asarray(LocKalman.initial_x))
  xp, Pp = pallas_bank.pack_bank(
      jnp.asarray(x0), jnp.asarray(P0.transpose(1, 2, 0)))
  zsp = pallas_bank.pack_bank_epochs(jnp.asarray(zs))
  easp = pallas_bank.pack_bank_epochs(jnp.asarray(eas))
  q_diag = tuple(float(v) for v in np.diag(Q))

  outs = {}
  for mode in ('unroll', 'switch'):
    xo, Po = pallas_bank.generic_bank_scan_epoch(
        xp, Pp, zsp, jnp.asarray(dts), easp, spec=spec,
        slot_kinds=slot_kinds, q_diag=q_diag, r_mats=r_mats, t_chunk=3,
        tile_b=8, interpret=True, structure=structure, slot_mode=mode)
    outs[mode] = pallas_bank.unpack_bank(xo, Po)

  # identical math, different op grouping (per-branch regions): the only
  # deviation allowed is f64 roundoff
  np.testing.assert_allclose(np.asarray(outs['switch'][0]),
                             np.asarray(outs['unroll'][0]),
                             rtol=1e-9, atol=1e-9)
  np.testing.assert_allclose(np.asarray(outs['switch'][1]),
                             np.asarray(outs['unroll'][1]),
                             rtol=1e-9, atol=1e-9)

  # auto keeps the faster flat form for GNSS-class epochs
  flat = pallas_bank.epoch_flat_body_ops(
      spec, slot_kinds, q_diag, r_mats, True, structure, True, True)
  assert flat <= pallas_bank.EPOCH_UNROLL_OP_BUDGET, flat


@pytest.mark.slow
def test_generic_epoch_kernel_live_complexity_routes_to_split():
  """A live-complexity epoch (4 DISTINCT 22-dim kinds per step — the
  all-sensors tick): since the round-5 scalar-entry update rewrite cut
  its flat body under the Mosaic budget, auto mode keeps the
  zero-dispatch FLAT unroll (306M upd/s measured, +39% over the split);
  a DOUBLED 8-slot schedule still exceeds the budget and must route to
  the contiguous SPLIT dispatch. Both dispatch forms and the per-slot
  switch must agree to ULP-level reassociation and match the core/step
  oracle. This was the round-3 documented limitation ('use run_mixed
  there'); round 4 made it compile via the per-slot switch, round 5
  made it fast (split), then flat."""
  from rednose_tpu.models.live import LiveKalman, ObservationKind as LK
  from rednose_tpu.ops import sparsity

  spec = LiveKalman.build_spec()
  slot_kinds = (int(LK.PHONE_GYRO), int(LK.PHONE_ACCEL),
                int(LK.ECEF_POS), int(LK.NO_ROT))
  K, B, T = len(slot_kinds), 8, 2
  rng = np.random.RandomState(5)

  x0 = sparsity.sample_states(spec, LiveKalman.initial_x, B, seed=6)
  d = spec.dim_err
  P0 = np.stack([(lambda A: A @ A.T + np.eye(d))(rng.randn(d, d) * 0.05)
                 for _ in range(B)])
  Q = np.asarray(LiveKalman.Q)
  dts = np.full((T,), 0.01)

  zs = np.zeros((T, K, B, 3))
  zs[:, 0] = 0.05 * rng.randn(T, B, 3)                    # gyro
  zs[:, 1] = np.array([0., 0., 9.81]) + 0.1 * rng.randn(T, B, 3)
  zs[:, 2] = x0[None, :, :3] + 1.0 * rng.randn(T, B, 3)   # ecef pos
  zs[:, 3] = 0.01 * rng.randn(T, B, 3)                    # no_rot
  R_list = [np.diag([0.025**2] * 3), np.diag([0.5**2] * 3),
            np.diag([25.0] * 3), np.diag([0.005**2] * 3)]
  r_mats = tuple(tuple(tuple(float(v) for v in row) for row in R)
                 for R in R_list)

  structure = sparsity.structure_for(spec,
                                     jnp.asarray(LiveKalman.initial_x))
  q_diag = tuple(float(v) for v in np.diag(Q))

  flat = pallas_bank.epoch_flat_body_ops(
      spec, slot_kinds, q_diag, r_mats, True, structure, True, False)
  assert flat <= pallas_bank.EPOCH_UNROLL_OP_BUDGET, (
      f"live epoch flat body grew to {flat} ops — auto no longer unrolls "
      f"the all-sensors tick (budget {pallas_bank.EPOCH_UNROLL_OP_BUDGET})")
  # ... while a doubled 8-slot schedule is over budget and must still
  # find a contiguous split partition (no per-slot dispatch)
  cuts = pallas_bank._partition_epoch_slots(
      spec, slot_kinds * 2, q_diag, r_mats * 2, True, structure, True,
      False, (), (), pallas_bank.EPOCH_UNROLL_OP_BUDGET)
  assert pallas_bank.epoch_flat_body_ops(
      spec, slot_kinds * 2, q_diag, r_mats * 2, True, structure, True,
      False) > pallas_bank.EPOCH_UNROLL_OP_BUDGET
  assert cuts, cuts

  xp, Pp = pallas_bank.pack_bank(
      jnp.asarray(x0), jnp.asarray(P0.transpose(1, 2, 0)))
  zsp = pallas_bank.pack_bank_epochs(jnp.asarray(zs))

  xo, Po = pallas_bank.generic_bank_scan_epoch(
      xp, Pp, zsp, jnp.asarray(dts), spec=spec, slot_kinds=slot_kinds,
      q_diag=q_diag, r_mats=r_mats, t_chunk=2, tile_b=8, interpret=True,
      structure=structure, slot_mode='auto')
  xu, Pu = pallas_bank.unpack_bank(xo, Po)

  # the per-slot switch and the explicit 2-region split must both agree
  # with the auto (flat) form (same math, different region grouping ->
  # ULP-level reassociation only)
  for mode in ('switch', 'split:2'):
    xs_, Ps_ = pallas_bank.generic_bank_scan_epoch(
        xp, Pp, zsp, jnp.asarray(dts), spec=spec, slot_kinds=slot_kinds,
        q_diag=q_diag, r_mats=r_mats, t_chunk=2, tile_b=8, interpret=True,
        structure=structure, slot_mode=mode)
    np.testing.assert_allclose(np.asarray(xs_), np.asarray(xo),
                               rtol=1e-12, atol=1e-12, err_msg=mode)
    np.testing.assert_allclose(np.asarray(Ps_), np.asarray(Po),
                               rtol=1e-12, atol=1e-12, err_msg=mode)

  for i in range(B):
    x, P = jnp.asarray(x0[i]), jnp.asarray(P0[i])
    for t in range(T):
      x, P = step_ops.predict(spec, {}, x, P, jnp.asarray(Q),
                              jnp.asarray(dts[t]))
      for k, kind in enumerate(slot_kinds):
        x, P, _ = step_ops.update(spec, kind, {}, x, P,
                                  jnp.asarray(zs[t, k, i]),
                                  jnp.asarray(R_list[k]),
                                  jnp.zeros((1,)))
    np.testing.assert_allclose(np.asarray(xu[i]), np.asarray(x),
                               rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(Pu[:, :, i]), np.asarray(P),
                               rtol=1e-6, atol=1e-9)
