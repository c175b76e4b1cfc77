"""Sharded-bank tests on the virtual 8-device CPU mesh (conftest sets
xla_force_host_platform_device_count=8), per SURVEY.md §4 pattern (d):
CPU-runnable so CI needs no TPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rednose_tpu.models.kinematic import KinematicKalman, ObservationKind
from rednose_tpu.parallel import sharding as shard_ops
from rednose_tpu.runtime import bank as bank_ops


@pytest.fixture(scope='module')
def mesh():
  assert len(jax.devices()) == 8, jax.devices()
  return shard_ops.make_bank_mesh()


def _workload(T=32, B=64, seed=0):
  rng = np.random.default_rng(seed)
  spec = KinematicKalman.build_spec()
  state = bank_ops.init_bank(
      spec, KinematicKalman.initial_x, np.diag(KinematicKalman.initial_P_diag),
      batch=B, dtype=jnp.float64)
  Q = jnp.asarray(KinematicKalman.Q)
  dts = jnp.full((T,), 0.01)
  zs = jnp.asarray(rng.normal(0, 0.5, size=(T, B, 1)))
  Rs = jnp.broadcast_to(jnp.asarray(0.1**2).reshape(1, 1, 1, 1), (T, B, 1, 1))
  return spec, state, Q, dts, zs, Rs


def test_sharded_matches_unsharded(mesh):
  spec, state, Q, dts, zs, Rs = _workload()
  ref_final, ref_ys = bank_ops.run_bank(
      spec, ObservationKind.POSITION, {}, state, Q, dts, zs, Rs)
  sh_final, sh_ys = shard_ops.sharded_run_bank(
      spec, ObservationKind.POSITION, mesh, {}, state, Q, dts, zs, Rs)
  np.testing.assert_allclose(np.asarray(sh_final.x), np.asarray(ref_final.x),
                             rtol=1e-12)
  np.testing.assert_allclose(np.asarray(sh_final.P), np.asarray(ref_final.P),
                             rtol=1e-12)
  np.testing.assert_allclose(np.asarray(sh_ys), np.asarray(ref_ys), rtol=1e-12)
  # the output really is sharded over the mesh
  assert len(sh_final.x.sharding.device_set) == 8


def test_sharded_rmse_psum(mesh):
  spec, state, Q, dts, zs, Rs = _workload()
  final, _ = shard_ops.sharded_run_bank(
      spec, ObservationKind.POSITION, mesh, {}, state, Q, dts, zs, Rs)
  truth = jnp.zeros((2,), dtype=jnp.float64)
  rmse_sharded = shard_ops.sharded_bank_rmse(mesh, final, truth)
  rmse_local = bank_ops.bank_rmse(final, truth)
  np.testing.assert_allclose(float(rmse_sharded), float(rmse_local), rtol=1e-12)


def test_jit_sharded_step(mesh):
  spec, state, Q, _, zs, Rs = _workload()
  state = shard_ops.shard_bank(state, mesh)
  fn = shard_ops.jit_sharded_step(spec, ObservationKind.POSITION, mesh)
  ea = jnp.zeros((state.batch, 1), dtype=jnp.float64)
  new_state, y = fn({}, state, Q, jnp.asarray(0.01), zs[0], Rs[0], ea)
  assert new_state.x.shape == state.x.shape
  assert len(new_state.x.sharding.device_set) == 8
  assert y.shape == (state.batch, 1)


def test_lane_bank_sharded(mesh):
  """The lane-major generic bank (B on the LAST axis) shards over the mesh
  with zero collectives and matches the unsharded run."""
  from jax.sharding import NamedSharding, PartitionSpec as P

  from rednose_tpu.ops import lane_bank

  spec, state, Q, dts, zs, Rs = _workload(T=16, B=64)
  R = jnp.asarray(np.atleast_2d(0.1**2))
  P0 = lane_bank.to_lane(state.P)

  ref_x, ref_P = lane_bank.lane_bank_scan(
      spec, ObservationKind.POSITION, {}, state.x, P0, Q, dts, zs, R)

  sh_last = NamedSharding(mesh, P(None, None, shard_ops.BANK_AXIS))
  x_sh = jax.device_put(state.x, NamedSharding(mesh, P(shard_ops.BANK_AXIS)))
  P_sh = jax.device_put(P0, sh_last)
  zs_sh = jax.device_put(zs, NamedSharding(mesh, P(None, shard_ops.BANK_AXIS)))
  fn = lane_bank.jit_lane_bank_scan(spec, ObservationKind.POSITION)
  sh_x, sh_P = fn({}, x_sh, P_sh, Q, dts, zs_sh, R)
  np.testing.assert_allclose(np.asarray(sh_x), np.asarray(ref_x), rtol=1e-12)
  np.testing.assert_allclose(np.asarray(sh_P), np.asarray(ref_P), rtol=1e-12)
  assert len(sh_x.sharding.device_set) == 8


def test_sharded_fused_live_kernel_matches_unsharded():
  """The fused live Pallas kernel under shard_map (bank axis split over the
  8-device mesh, interpret mode on CPU) must equal the unsharded jnp scan
  bitwise — zero collectives, embarrassingly parallel."""
  import jax
  import jax.numpy as jnp
  import numpy as np

  from rednose_tpu.models.live import LiveKalman
  from rednose_tpu.ops import live_lane, pallas_live
  from rednose_tpu.parallel import sharding as shard_ops

  mesh = shard_ops.make_bank_mesh()
  B, T = 64, 8
  dtype = jnp.float32
  x = jnp.tile(jnp.asarray(LiveKalman.initial_x, dtype), (B, 1))
  P = jnp.tile(jnp.asarray(np.diag(LiveKalman.initial_P_diag),
                           dtype)[:, :, None], (1, 1, B))
  dts = jnp.full((T,), 0.01, dtype)
  zs = jnp.asarray(LiveKalman.initial_x[0:3], dtype) + \
      jax.random.normal(jax.random.key(0), (T, B, 3), dtype)
  q_diag = tuple(float(v) for v in np.diag(LiveKalman.Q))
  R = np.diag([25.0] * 3)
  r_mat = tuple(tuple(float(v) for v in row) for row in R)

  xp, Pp = pallas_live.pack_live_state(x, P)
  zsp = pallas_live.pack_measurements(zs)
  xo, Po = shard_ops.sharded_live_bank_scan(
      mesh, xp, Pp, zsp, dts, q_diag=q_diag, r_mat=r_mat,
      t_chunk=4, tile_b=8, interpret=True)
  assert len(xo.sharding.device_set) == mesh.devices.size

  x_ref, P_ref = live_lane.live_lane_scan(
      x, P, jnp.asarray(LiveKalman.Q, dtype), dts, zs,
      jnp.asarray(R, dtype))
  xu, Pu = pallas_live.unpack_live_state(xo, Po)
  np.testing.assert_array_equal(np.asarray(xu), np.asarray(x_ref))
  np.testing.assert_array_equal(np.asarray(Pu), np.asarray(P_ref))


@pytest.mark.slow
def test_sharded_mixed_generic_kernel_matches_unsharded():
  """The heterogeneous-kind generic kernel under shard_map (replicated
  SMEM kind stream, sharded bank, interpret mode) must equal the unsharded
  generic mixed kernel bitwise."""
  import jax.numpy as jnp
  import numpy as np

  from rednose_tpu.models.live import LiveKalman, ObservationKind as K
  from rednose_tpu.ops import pallas_bank, sparsity
  from rednose_tpu.parallel import sharding as shard_ops

  mesh = shard_ops.make_bank_mesh()
  spec = LiveKalman.build_spec()
  structure = sparsity.structure_for(spec, LiveKalman.initial_x)
  B, T = 64, 4
  dtype = jnp.float32
  x = jnp.tile(jnp.asarray(LiveKalman.initial_x, dtype), (B, 1))
  P = jnp.tile(jnp.asarray(np.diag(LiveKalman.initial_P_diag),
                           dtype)[:, :, None], (1, 1, B))
  dts = jnp.full((T,), 0.01, dtype)
  kinds = (int(K.PHONE_GYRO), int(K.ECEF_POS))
  kind_idx = jnp.asarray([0, 1, 0, 1], jnp.int32)
  rng = np.random.RandomState(0)
  zs = jnp.where(
      (kind_idx == 1)[:, None, None],
      jnp.asarray(LiveKalman.initial_x[0:3], dtype)
      + jnp.asarray(rng.randn(T, B, 3), dtype),
      jnp.asarray(0.01 * rng.randn(T, B, 3), dtype))
  q_diag = tuple(float(v) for v in np.diag(LiveKalman.Q))
  r_mats = tuple(tuple(tuple(float(v) for v in row)
                       for row in LiveKalman.obs_noise[k]) for k in kinds)

  xp, Pp = pallas_bank.pack_bank(x, P)
  zsp = pallas_bank.pack_bank_measurements(zs)
  xo, Po = shard_ops.sharded_generic_bank_scan_mixed(
      mesh, xp, Pp, zsp, dts, kind_idx, spec=spec, kinds=kinds,
      q_diag=q_diag, r_mats=r_mats, structure=structure, t_chunk=4,
      tile_b=8, interpret=True)
  assert len(xo.sharding.device_set) == mesh.devices.size

  x_ref, P_ref = pallas_bank.generic_bank_scan_mixed(
      xp, Pp, zsp, dts, kind_idx, spec=spec, kinds=kinds, q_diag=q_diag,
      r_mats=r_mats, structure=structure, t_chunk=4, tile_b=8,
      interpret=True)
  np.testing.assert_array_equal(np.asarray(xo), np.asarray(x_ref))
  np.testing.assert_array_equal(np.asarray(Po), np.asarray(P_ref))


@pytest.mark.slow
def test_sharded_epoch_generic_kernel_matches_unsharded():
  """The epoch-batched generic kernel under shard_map (replicated epoch
  layout, sharded bank + ea stream, interpret mode) must equal the
  unsharded epoch kernel bitwise — on the switch dispatch (the
  live-complexity mode), so the sharded path covers both slot modes."""
  import jax.numpy as jnp
  import numpy as np

  from rednose_tpu.models.live import ObservationKind as K
  from rednose_tpu.models.loc import LocKalman
  from rednose_tpu.ops import pallas_bank, sparsity
  from rednose_tpu.parallel import sharding as shard_ops

  mesh = shard_ops.make_bank_mesh()
  spec = LocKalman.build_spec()
  structure = sparsity.structure_for(spec, LocKalman.initial_x)
  slot_kinds = (int(K.PSEUDORANGE_GPS), int(K.PSEUDORANGE_GPS),
                int(K.PSEUDORANGE_RATE_GPS))
  Ksl, B, T = len(slot_kinds), 64, 4
  dtype = jnp.float32
  rng = np.random.RandomState(3)
  x = jnp.tile(jnp.asarray(LocKalman.initial_x, dtype), (B, 1))
  P = jnp.tile(jnp.asarray(np.diag(LocKalman.initial_P_diag),
                           dtype)[:, :, None], (1, 1, B))
  dts = jnp.full((T,), 1.0, dtype)
  sat_pos = LocKalman.initial_x[:3] + 2.0e7 * rng.randn(T, Ksl, B, 3)
  sat_vel = 3e3 * rng.randn(T, Ksl, B, 3)
  eas = jnp.asarray(np.concatenate([sat_pos, sat_vel], -1), dtype)
  rho = np.linalg.norm(sat_pos - LocKalman.initial_x[:3], axis=-1)
  zs = jnp.asarray(
      np.where((np.arange(Ksl) < 2)[None, :, None], rho, 0.0)[..., None],
      dtype)
  q_diag = tuple(float(v) for v in np.diag(LocKalman.Q))
  r_mats = tuple(
      tuple(tuple(float(v) for v in row)
            for row in np.atleast_2d(LocKalman.obs_noise[k]))
      for k in slot_kinds)

  xp, Pp = pallas_bank.pack_bank(x, P)
  zsp = pallas_bank.pack_bank_epochs(zs)
  easp = pallas_bank.pack_bank_epochs(eas)
  xo, Po = shard_ops.sharded_generic_bank_scan_epoch(
      mesh, xp, Pp, zsp, dts, easp, spec=spec, slot_kinds=slot_kinds,
      q_diag=q_diag, r_mats=r_mats, structure=structure, t_chunk=4,
      tile_b=8, interpret=True, slot_mode='switch')
  assert len(xo.sharding.device_set) == mesh.devices.size

  x_ref, P_ref = pallas_bank.generic_bank_scan_epoch(
      xp, Pp, zsp, dts, easp, spec=spec, slot_kinds=slot_kinds,
      q_diag=q_diag, r_mats=r_mats, structure=structure, t_chunk=4,
      tile_b=8, interpret=True, slot_mode='switch')
  # switch branches are compiled per shard width, so XLA may regroup f32
  # ops differently sharded vs not: roundoff-level agreement (the unroll
  # mode is bitwise; asserted in test_sharded_mixed/generic above). On
  # ECEF-scale data the regrouping noise reaches ~1e-4 relative on a few
  # covariance entries (the documented f32 entry-body tolerance), so the
  # bound is 2e-4 — NOT an approximation tolerance, just f32 reassociation.
  np.testing.assert_allclose(np.asarray(xo), np.asarray(x_ref),
                             rtol=1e-6, atol=1e-6)
  np.testing.assert_allclose(np.asarray(Po), np.asarray(P_ref),
                             rtol=2e-4, atol=1e-4)


def test_multislice_hierarchical_rmse():
  """2-D (slice, bank) mesh: sharded run + hierarchically-staged psum
  (ICI within the slice, one scalar over DCN) matches the flat-mesh and
  unsharded results exactly."""
  spec, state, Q, dts, zs, Rs = _workload()
  mesh2 = shard_ops.make_multislice_mesh(n_slices=2)
  assert mesh2.shape == {'slice': 2, 'bank': 4}

  sh = shard_ops.multislice_sharding(mesh2)
  state2 = jax.tree.map(lambda a: jax.device_put(a, sh), state)
  final2, _ = bank_ops.jit_run_bank(spec, ObservationKind.POSITION)(
      {}, state2, Q, dts,
      jax.device_put(zs, jax.NamedSharding(
          mesh2, jax.sharding.PartitionSpec(
              None, (shard_ops.SLICE_AXIS, shard_ops.BANK_AXIS)))),
      Rs, None)

  final_ref, _ = bank_ops.jit_run_bank(spec, ObservationKind.POSITION)(
      {}, state, Q, dts, zs, Rs, None)
  np.testing.assert_allclose(np.asarray(final2.x), np.asarray(final_ref.x),
                             rtol=0, atol=1e-12)

  truth = np.zeros(spec.dim_x)
  r2 = shard_ops.multislice_bank_rmse(mesh2, final2, truth)
  r_flat = shard_ops.sharded_bank_rmse(
      shard_ops.make_bank_mesh(),
      jax.tree.map(lambda a: np.asarray(a), final_ref), truth)
  r_host = np.sqrt(np.mean(np.asarray(final_ref.x) ** 2))
  np.testing.assert_allclose(float(r2), r_host, rtol=1e-12)
  np.testing.assert_allclose(float(r_flat), r_host, rtol=1e-12)
