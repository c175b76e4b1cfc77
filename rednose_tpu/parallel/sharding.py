"""Multi-chip scale-out: sharded filter banks over a device mesh.

The "distributed backend" analog for this domain (SURVEY.md §2.5): the
reference is strictly single-process, so the scale-out dimension the rebuild
adds is the bank axis sharded across chips with `jax.sharding` — the step
itself is embarrassingly parallel (zero collectives on the hot path; XLA
inserts nothing), and bank-wide aggregate metrics are the only communication,
expressed as `psum` inside `shard_map` so they ride ICI.

Mesh layout: a 1-D 'bank' axis over all devices. A bank of B filters shards
to B/n_devices per chip; each chip runs the identical fused scan kernel on
its shard. Multi-slice (DCN) meshes work identically — the bank axis simply
spans slices, and since the step has no collectives there is no DCN traffic.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rednose_tpu.core.spec import FilterSpec
from rednose_tpu.runtime import bank as bank_ops

Array = Any

BANK_AXIS = 'bank'


def make_bank_mesh(devices=None) -> Mesh:
  """1-D mesh over all (or the given) devices with a single 'bank' axis."""
  import numpy as np

  if devices is None:
    devices = jax.devices()
  return Mesh(np.array(devices), (BANK_AXIS,))


def bank_sharding(mesh: Mesh) -> NamedSharding:
  """Leading-axis sharding for bank pytrees (x, P, t all shard on axis 0)."""
  return NamedSharding(mesh, P(BANK_AXIS))


def shard_bank(state: bank_ops.BankState, mesh: Mesh) -> bank_ops.BankState:
  """Place a BankState with the bank axis sharded over the mesh."""
  sh = bank_sharding(mesh)
  return jax.tree.map(lambda a: jax.device_put(a, sh), state)


def sharded_run_bank(spec: FilterSpec, kind: int, mesh: Mesh, params,
                     state: bank_ops.BankState, Q, dts, zs, Rs,
                     eas=None):
  """Run the (T, B) bank workload with B sharded over the mesh.

  The scan body is per-filter independent, so jit + sharded inputs partitions
  it with zero communication; dts/Q/params stay replicated.
  """
  sh = bank_sharding(mesh)
  repl = NamedSharding(mesh, P())
  state = jax.tree.map(lambda a: jax.device_put(a, sh), state)
  zs = jax.device_put(zs, NamedSharding(mesh, P(None, BANK_AXIS)))
  if Rs.ndim == 4:
    Rs = jax.device_put(Rs, NamedSharding(mesh, P(None, BANK_AXIS)))
  else:
    Rs = jax.device_put(Rs, repl)
  dts = jax.device_put(dts, repl)
  fn = bank_ops.jit_run_bank(spec, kind)
  return fn(params, state, Q, dts, zs, Rs, eas)


def _staged_bank_rmse(mesh: Mesh, state: bank_ops.BankState, truth: Array,
                      axes, in_spec, out_spec) -> Array:
  """Shared RMSE body: per-shard squared-error partials reduced with psum
  over `axes` in order (so callers stage cheap-link reductions first). One
  definition of "bank RMSE" for every mesh topology."""
  truth = jnp.asarray(truth, dtype=state.x.dtype)

  def local(x_shard):
    sq = jnp.sum((x_shard - truth) ** 2)
    n = jnp.asarray(x_shard.size, dtype=x_shard.dtype)
    for ax in axes:
      sq = jax.lax.psum(sq, ax)
      n = jax.lax.psum(n, ax)
    return jnp.reshape(sq / n, (1,) * len(out_spec))

  out = jax.shard_map(
      local, mesh=mesh, in_specs=in_spec, out_specs=out_spec)(state.x)
  # the mean is replicated across shards (psum'd over every mesh axis):
  # any element is the answer
  return jnp.sqrt(out.reshape(-1)[0])


def sharded_bank_rmse(mesh: Mesh, state: bank_ops.BankState,
                      truth: Array) -> Array:
  """Bank-wide RMSE as an explicit ICI collective: per-shard partial sums
  combined with psum inside shard_map (SURVEY.md §2.5 item 2)."""
  return _staged_bank_rmse(mesh, state, truth, (BANK_AXIS,),
                           P(BANK_AXIS), P(BANK_AXIS))


@functools.lru_cache(maxsize=None)
def jit_sharded_step(spec: FilterSpec, kind: int, mesh: Mesh,
                     sharding: NamedSharding | None = None):
  """One fused bank predict+update step, jitted with bank-axis shardings —
  the 'training step' equivalent used by the multichip dry run. Pass
  `sharding` to override the bank placement (e.g. multislice_sharding for
  a 2-D (slice, bank) mesh: the step then executes across BOTH the ICI
  and DCN axes with zero collectives)."""
  sh = sharding if sharding is not None else bank_sharding(mesh)
  repl = NamedSharding(mesh, P())

  def step(params, state, Q, dt, z, R, ea):
    return bank_ops.bank_predict_and_update(
        spec, kind, params, state, Q, dt, z, R, ea)

  return jax.jit(
      step,
      in_shardings=(repl,  # params
                    sh,    # BankState: every leaf sharded on the bank axis
                    repl, repl, sh, sh, sh),
      out_shardings=(sh, sh))


def sharded_live_bank_scan(mesh: Mesh, x_packed, P_packed, zs_packed, dts,
                           *, q_diag, r_mat, gate: bool = False,
                           t_chunk: int = 128, tile_b: int = 1024,
                           interpret: bool = False, axis=BANK_AXIS):
  """Fused live Pallas kernel (ops/pallas_live.py) sharded over the mesh:
  shard_map splits the packed bank on its folded sub-bank axis, every chip
  runs the identical VMEM-resident kernel on its shard, zero collectives —
  the scale-out story for the flagship fused path.

  Shapes are the packed layout (pallas_live.pack_live_state /
  pack_measurements); the sub-bank dim (last axis, B/8) must divide by the
  mesh size, and the PER-SHARD bank must still satisfy the kernel's tile_b
  divisibility (pass tile_b <= B/n_devices).

  `axis` is the mesh axis (or tuple of axes) the sub-bank dim folds over:
  BANK_AXIS on the 1-D mesh, (SLICE_AXIS, BANK_AXIS) on a multislice mesh —
  the kernel is identical either way, and no collective ever touches DCN.
  """
  from rednose_tpu.ops import pallas_live

  n = mesh.devices.size
  bsub = x_packed.shape[-1]
  assert bsub % n == 0, (bsub, n)

  def local(xp, Pp, zsp, dts_):
    return pallas_live.live_bank_scan(
        xp, Pp, zsp, dts_, q_diag=q_diag, r_mat=r_mat, gate=gate,
        t_chunk=t_chunk, tile_b=tile_b, interpret=interpret)

  # check_vma=False: pallas_call out_shapes carry no varying-mesh-axes
  # annotation, which jax's vma checker would otherwise require
  return jax.shard_map(
      local, mesh=mesh,
      in_specs=(P(None, None, axis), P(None, None, None, axis),
                P(None, None, None, axis), P()),
      out_specs=(P(None, None, axis), P(None, None, None, axis)),
      check_vma=False,
  )(x_packed, P_packed, zs_packed, dts)


def sharded_generic_bank_scan(mesh: Mesh, x_packed, P_packed, zs_packed,
                              dts, eas_packed=None, pss=None, *, spec,
                              kind, q_diag, r_mat, structure=None,
                              gate: bool = False, t_chunk: int = 128,
                              tile_b: int = 1024, interpret: bool = False,
                              entry: bool = True, ps_keys=(),
                              base_params=()):
  """Entry-level generic kernel (ops/pallas_bank.py + ops/entry_slab.py)
  sharded over the mesh — the scale-out story for the automatic path:
  ANY spec, no hand derivation, one VMEM-resident kernel per chip shard,
  zero collectives. Same packed layout and divisibility rules as
  sharded_live_bank_scan; extra-args kinds shard their eas_packed stream
  on the same sub-bank axis; a per-step runtime-params stream
  (ps_keys/pss, the reference's sensor-rate global_vars) is replicated —
  every chip reads the same control inputs."""
  from rednose_tpu.ops import pallas_bank

  n = mesh.devices.size
  assert x_packed.shape[-1] % n == 0, (x_packed.shape, n)

  def local(xp, Pp, zsp, dts_, *rest):
    rest = list(rest)
    easp = rest.pop(0) if eas_packed is not None else None
    pss_ = rest.pop(0) if pss is not None else None
    return pallas_bank.generic_bank_scan(
        xp, Pp, zsp, dts_, easp, pss_, spec=spec, kind=kind,
        q_diag=q_diag, r_mat=r_mat, gate=gate, t_chunk=t_chunk,
        tile_b=tile_b, interpret=interpret, structure=structure,
        entry=entry, ps_keys=ps_keys, base_params=base_params)

  in_specs = [P(None, None, BANK_AXIS), P(None, None, None, BANK_AXIS),
              P(None, None, None, BANK_AXIS), P()]
  operands = [x_packed, P_packed, zs_packed, dts]
  if eas_packed is not None:
    in_specs.append(P(None, None, None, BANK_AXIS))
    operands.append(eas_packed)
  if pss is not None:
    in_specs.append(P())
    operands.append(pss)
  return jax.shard_map(
      local, mesh=mesh,
      in_specs=tuple(in_specs),
      out_specs=(P(None, None, BANK_AXIS), P(None, None, None, BANK_AXIS)),
      check_vma=False,
  )(*operands)


def sharded_vo_bank_scan(mesh: Mesh, x_packed, P_packed, zs_packed,
                         eas_packed, dts, *, spec, kind, q_diag, r_mat,
                         structure=None, gate: bool = False,
                         t_chunk: int = 128, tile_b: int = 1024,
                         interpret: bool = False,
                         phase_mode: str = 'auto'):
  """Banked-VO kernel (ops/pallas_bank.vo_bank_scan: MSCKF block predict +
  projected feature update + window augment per frame — incl. the
  ESKFxMSCKF composition via the 3-phase switch dispatch) sharded over
  the mesh: the bank and its per-frame landmark stream shard, frames
  replicate. Zero collectives."""
  from rednose_tpu.ops import pallas_bank

  n = mesh.devices.size
  assert x_packed.shape[-1] % n == 0, (x_packed.shape, n)

  def local(xp, Pp, zsp, easp, dts_):
    return pallas_bank.vo_bank_scan(
        xp, Pp, zsp, easp, dts_, spec=spec, kind=kind, q_diag=q_diag,
        r_mat=r_mat, gate=gate, t_chunk=t_chunk, tile_b=tile_b,
        interpret=interpret, structure=structure, phase_mode=phase_mode)

  return jax.shard_map(
      local, mesh=mesh,
      in_specs=(P(None, None, BANK_AXIS), P(None, None, None, BANK_AXIS),
                P(None, None, None, BANK_AXIS),
                P(None, None, None, BANK_AXIS), P()),
      out_specs=(P(None, None, BANK_AXIS), P(None, None, None, BANK_AXIS)),
      check_vma=False,
  )(x_packed, P_packed, zs_packed, eas_packed, dts)


def sharded_generic_bank_scan_mixed(mesh: Mesh, x_packed, P_packed,
                                    zs_packed, dts, kind_idx,
                                    eas_packed=None, *, spec, kinds,
                                    q_diag, r_mats, structure=None,
                                    gate: bool = True, t_chunk: int = 128,
                                    tile_b: int = 1024,
                                    interpret: bool = False,
                                    entry: bool = True):
  """Heterogeneous-kind generic kernel (generic_bank_scan_mixed) sharded
  over the mesh: the kind schedule (SMEM stream) is replicated, the bank
  shards — every chip dispatches the same per-step lax.switch on its own
  sub-bank. Zero collectives."""
  from rednose_tpu.ops import pallas_bank

  n = mesh.devices.size
  assert x_packed.shape[-1] % n == 0, (x_packed.shape, n)

  def local(xp, Pp, zsp, dts_, ki, *easp):
    return pallas_bank.generic_bank_scan_mixed(
        xp, Pp, zsp, dts_, ki, easp[0] if easp else None, spec=spec,
        kinds=kinds, q_diag=q_diag, r_mats=r_mats, gate=gate,
        t_chunk=t_chunk, tile_b=tile_b, interpret=interpret,
        structure=structure, entry=entry)

  in_specs = [P(None, None, BANK_AXIS), P(None, None, None, BANK_AXIS),
              P(None, None, None, BANK_AXIS), P(), P()]
  operands = [x_packed, P_packed, zs_packed, dts, kind_idx]
  if eas_packed is not None:
    in_specs.append(P(None, None, None, BANK_AXIS))
    operands.append(eas_packed)
  return jax.shard_map(
      local, mesh=mesh,
      in_specs=tuple(in_specs),
      out_specs=(P(None, None, BANK_AXIS), P(None, None, None, BANK_AXIS)),
      check_vma=False,
  )(*operands)


def sharded_generic_bank_scan_epoch(mesh: Mesh, x_packed, P_packed,
                                    zs_packed, dts, eas_packed=None, *,
                                    spec, slot_kinds, q_diag, r_mats,
                                    structure=None, gate: bool = True,
                                    t_chunk: int = 32, tile_b: int = 1024,
                                    interpret: bool = False,
                                    entry: bool = True,
                                    slot_mode: str = 'auto'):
  """Epoch-batched generic kernel (generic_bank_scan_epoch: one predict +
  K slot updates per step, the reference's predict_and_update_batch shape)
  sharded over the mesh: the static epoch layout is replicated, the bank
  (and the per-lane ea stream — satellites per receiver) shards — every
  chip runs full epochs on its own sub-bank. Zero collectives."""
  from rednose_tpu.ops import pallas_bank

  n = mesh.devices.size
  assert x_packed.shape[-1] % n == 0, (x_packed.shape, n)

  def local(xp, Pp, zsp, dts_, *easp):
    return pallas_bank.generic_bank_scan_epoch(
        xp, Pp, zsp, dts_, easp[0] if easp else None, spec=spec,
        slot_kinds=slot_kinds, q_diag=q_diag, r_mats=r_mats, gate=gate,
        t_chunk=t_chunk, tile_b=tile_b, interpret=interpret,
        structure=structure, entry=entry, slot_mode=slot_mode)

  in_specs = [P(None, None, BANK_AXIS), P(None, None, None, BANK_AXIS),
              P(None, None, None, None, BANK_AXIS), P()]
  operands = [x_packed, P_packed, zs_packed, dts]
  if eas_packed is not None:
    in_specs.append(P(None, None, None, None, BANK_AXIS))
    operands.append(eas_packed)
  return jax.shard_map(
      local, mesh=mesh,
      in_specs=tuple(in_specs),
      out_specs=(P(None, None, BANK_AXIS), P(None, None, None, BANK_AXIS)),
      check_vma=False,
  )(*operands)


# ------------------------------------------------------- multi-slice (DCN)

SLICE_AXIS = 'slice'


def make_multislice_mesh(n_slices: int, devices=None) -> Mesh:
  """2-D ('slice', 'bank') mesh for multi-slice deployments: the 'bank'
  axis spans the chips *within* a slice (ICI), the 'slice' axis spans
  slices (DCN). The filter bank shards over BOTH axes (it is
  embarrassingly parallel, so placement is free); the axis split exists so
  collectives can be staged hierarchically — reduce within the slice over
  ICI first, then move one scalar per slice over DCN
  (multislice_bank_rmse).

  Devices are grouped by their real `slice_index` when the backend reports
  one (jax.devices() ordering is NOT guaranteed slice-contiguous; a naive
  reshape could put both slices in one mesh row and silently push the
  "ICI" psum onto DCN); virtual/CPU devices fall back to a plain reshape.
  """
  import numpy as np

  if devices is None:
    devices = jax.devices()
  devices = list(devices)
  assert len(devices) % n_slices == 0, (len(devices), n_slices)
  slice_ids = [getattr(d, "slice_index", None) for d in devices]
  if all(s is not None for s in slice_ids) and len(set(slice_ids)) == n_slices:
    devices = sorted(devices, key=lambda d: (d.slice_index, d.id))
  arr = np.asarray(devices).reshape(n_slices, -1)
  for row in arr:  # every mesh row must stay within one slice
    ids = {getattr(d, "slice_index", None) for d in row}
    assert len(ids) == 1, f"mesh row spans slices {ids}"
  return Mesh(arr, (SLICE_AXIS, BANK_AXIS))


def multislice_sharding(mesh: Mesh) -> NamedSharding:
  """Bank leading axis folded over (slice, bank): B/(n_slices*n_ici) rows
  per chip."""
  return NamedSharding(mesh, P((SLICE_AXIS, BANK_AXIS)))


def multislice_bank_rmse(mesh: Mesh, state: bank_ops.BankState,
                         truth: Array) -> Array:
  """Bank-wide RMSE on a multi-slice mesh with hierarchical collectives:
  psum over the intra-slice 'bank' axis first (partial sums ride ICI),
  then psum of ONE scalar per slice over the 'slice' axis — the only DCN
  traffic in the whole workload. Same result as sharded_bank_rmse; the
  staging is the point (DCN bandwidth is ~10x below ICI, so cross-slice
  bytes are minimized by construction)."""
  return _staged_bank_rmse(mesh, state, truth, (BANK_AXIS, SLICE_AXIS),
                           P((SLICE_AXIS, BANK_AXIS)),
                           P(SLICE_AXIS, BANK_AXIS))
