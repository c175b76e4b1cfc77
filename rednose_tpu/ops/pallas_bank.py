"""Generic VMEM-resident Pallas bank: ANY (scatter-free) FilterSpec.

The ladder's automatic rung 3 (README): where ops/pallas_live.py exploits
hand-derived model structure for the flagship, this kernel runs an
arbitrary FilterSpec's bank with the state resident in VMEM across the
whole (T x B) scan — the spec's own f / h / err functions (and their
jax.jacfwd Jacobians, including the ESKF H_mod chain) are traced INSIDE
the kernel, vmapped over the trailing bank dims, so covariance math stays
lane-major while the model code is exactly what the user wrote. No
hand-derivation required; the win over the pure-jnp lane bank is the
eliminated per-step HBM round-trip of the (d, d, B) covariance.

Lowering constraints on the spec functions (Mosaic TPU, see CLAUDE.md):
  * runtime `params` must be {} / static scalars (array params would need
    to be threaded as kernel inputs);
  * the DENSE (entry=False) body cannot lower scatter (`.at[...].add`);
    the default entry-level body (ops/entry_slab.py) absorbs static-slice
    scatters at the interpreter level, so idiomatic `.at[i:j].set/.add`
    model code reaches the kernel;
  * non-feature kinds with real extra args (the pseudorange family)
    stream per-step per-lane satellite states via
    generic_bank_scan(eas_packed=...), same layout as the VO kernel's
    landmark stream.
MSCKF specs: vo_bank_scan runs block predict + feature update + window
augmentation in-kernel. Parity with the core/step.py oracle:
tests/test_pallas_bank.py, tests/test_entry_slab.py.
"""

from __future__ import annotations

import functools
import logging

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rednose_tpu.core.spec import FilterSpec
from rednose_tpu.ops.lane_bank import _inv_small
from rednose_tpu.ops.live_lane import _mm_l, _mm_rt, _sym, joseph_sym
from rednose_tpu.ops.sparsity import composed_h_jvp, f_columns, fpf_masked
from rednose_tpu.ops.unroll import unroll_dots

SUBLANES = 8


def _vt(fn, n: int = 2):
  """vmap fn over the n trailing (bank) dims."""
  for _ in range(n):
    fn = jax.vmap(fn, in_axes=-1, out_axes=-1)
  return fn


def _vt2(fn, n: int = 2):
  for _ in range(n):
    fn = jax.vmap(fn, in_axes=(-1, -1), out_axes=-1)
  return fn


def _add_diag(P, scale, diag):
  """P + scale*diag on the diagonal, concatenate-built (no scatter)."""
  d = P.shape[0]
  return jnp.stack([
      jnp.concatenate(
          ([P[i, :i]] if i else [])
          + [(P[i, i] + scale * diag[i])[None]]
          + ([P[i, i + 1:]] if i + 1 < d else []))
      for i in range(d)])


def _normalize_slices_slab(x, idxs):
  for idx in idxs:
    q = x[idx:idx + 4]
    inv = jax.lax.rsqrt(q[0] * q[0] + q[1] * q[1] + q[2] * q[2]
                        + q[3] * q[3])
    x = jnp.concatenate(([x[:idx]] if idx else []) + [q * inv]
                        + ([x[idx + 4:]] if idx + 4 < x.shape[0] else []))
  return x


def generic_predict_slab(spec: FilterSpec, params, x, P, q_diag, dt,
                         structure=None):
  """Dense generic predict on slab state: x (dim_x, *b), P (de, de, *b);
  q_diag is a static tuple of diagonal process-noise scalars. With a
  detected `structure` (ops/sparsity.SpecStructure) the F P F^T products
  unroll only F's structurally nonzero entries."""
  assert spec.dim_main_err == spec.dim_err, "MSCKF blocks: use runtime/bank"
  de = spec.dim_err
  # unroll_dots: small matmuls in user model code (and inside jacfwd)
  # become elementwise multiply+sum, which survives the double bank-vmap
  # inside Mosaic (batched tpu.matmul supports at most 1 batch dim)
  x_new = _vt(unroll_dots(lambda xx: spec.f(params, xx, dt)))(x)
  if structure is None:
    F = _vt(unroll_dots(lambda xx: spec.F(params, xx, dt)))(x)
    P_new = _sym(_mm_rt(_mm_l(F, P, de), F, de))
  else:
    # only the structurally-nonzero F columns, via one linearize — the
    # dense jacfwd's basis-batched intermediates OOM the Mosaic compiler
    Fc = _vt(unroll_dots(
        lambda xx: f_columns(spec, params, xx, dt, structure.g_cols)))(x)
    P_new = _sym(fpf_masked(Fc, P, structure.g_cols))
  P_new = _add_diag(P_new, dt, q_diag)
  return _normalize_slices_slab(x_new, spec.quaternion_idxs), P_new


def generic_update_slab(spec: FilterSpec, kind: int, params, x, P, z, R,
                        gate: bool = False, structure=None, ea=None):
  """Dense generic update on slab state: z (dz, *b); R is a (dz, dz) nested
  static tuple (kernel) or array (jnp use). ESKF H_mod chain included.
  Non-feature extra-args kinds (the pseudorange family) pass per-lane
  satellite states as ea (ea_len, *b).

  With a detected `structure` (ops/sparsity.SpecStructure) the composed
  H_err = H @ H_mod is instead computed column-by-column via jax.jvp
  through the error injection — only the structurally nonzero columns —
  and H P / S accumulate over just those columns (detect_structure has
  verified the composed-H identity against the spec's H_mod)."""
  om = spec.obs[kind]
  assert not om.is_feature, "MSCKF feature kinds: use vo_bank_scan"
  if om.ea_len:
    assert ea is not None and ea.shape[0] == om.ea_len, (
        f"kind {kind} takes {om.ea_len} extra args; got "
        f"{None if ea is None else ea.shape}")
  else:
    assert ea is None, f"kind {kind} takes no extra args"
  dz, de = om.dz, spec.dim_err

  if structure is None:
    if om.ea_len:
      h = _vt2(unroll_dots(lambda xx, ee: om.h(params, xx, ee)))(x, ea)
      H = _vt2(unroll_dots(
          lambda xx, ee: spec.H(kind, params, xx, ee)))(x, ea)
    else:
      # ea placeholder built from x (a jnp.zeros constant would be rejected
      # as a captured constant inside Pallas kernels)
      h = _vt(unroll_dots(lambda xx: om.h(params, xx, xx[:1] * 0.0)))(x)
      H = _vt(unroll_dots(
          lambda xx: spec.H(kind, params, xx, xx[:1] * 0.0)))(x)
    if spec.is_eskf:
      Hm = _vt(unroll_dots(lambda xx: spec.H_mod_at(params, xx)))(x)
      H = _mm_l(H, Hm, spec.dim_x)        # (dz, de, *b)
    HP = _mm_l(H, P, de)                  # (dz, de, *b)
    S = _mm_rt(HP, H, de)                 # (dz, dz, *b)
  else:
    cols = structure.cols_for(kind)
    assert cols, f"kind {kind}: observation has all-zero H"
    if om.ea_len:
      h, h_cols = _vt2(unroll_dots(
          lambda xx, ee: composed_h_jvp(spec, kind, params, xx, cols,
                                        ea=ee)))(x, ea)
    else:
      h, h_cols = _vt(unroll_dots(
          lambda xx: composed_h_jvp(spec, kind, params, xx, cols)))(x)
    HP = sum(hc[:, None] * P[c][None] for c, hc in zip(cols, h_cols))
    S = sum(HP[:, c][:, None] * hc[None] for c, hc in zip(cols, h_cols))
  y = z - h
  if isinstance(R, tuple):
    S = jnp.stack([jnp.stack([S[i, j] + R[i][j] for j in range(dz)])
                   for i in range(dz)])
  else:
    if R.ndim == 2:
      R = R.reshape(R.shape + (1,) * (x.ndim - 1))
    S = S + R
  Sinv = _inv_small(S)
  K = _mm_l(jnp.swapaxes(HP, 0, 1), Sinv, dz)  # P H^T S^-1 (P symmetric)
  if gate:
    dist = sum(y[i] * Sinv[i, j] * y[j]
               for i in range(dz) for j in range(dz))
    K = jnp.where(dist[None, None] > om.maha_thresh, 0.0, K)
  dx = sum(K[:, i] * y[i][None] for i in range(dz))

  P_new = joseph_sym(P, K, HP, S, dz)
  x_new = _vt2(unroll_dots(lambda xx, dd: spec.err(params, xx, dd)))(x, dx)
  return _normalize_slices_slab(x_new, spec.quaternion_idxs), P_new, y


def pack_bank(x, P):
  """x (B, dim_x) + lane-major P (de, de, B) -> slab layout
  ((dim_x, 8, B/8), (de, de, 8, B/8))."""
  B, dx = x.shape
  de = P.shape[0]
  bsub = B // SUBLANES
  return x.T.reshape(dx, SUBLANES, bsub), P.reshape(de, de, SUBLANES, bsub)


def unpack_bank(xp, Pp):
  dx, _, bsub = xp.shape
  de = Pp.shape[0]
  B = SUBLANES * bsub
  return xp.reshape(dx, B).T, Pp.reshape(de, de, B)


def pack_bank_measurements(zs):
  T, B, dz = zs.shape
  return jnp.swapaxes(zs, 1, 2).reshape(T, dz, SUBLANES, B // SUBLANES)


def _kernel(dts_ref, *refs, spec, kind, t_chunk: int, q_diag, r_mat,
            gate: bool, structure, entry: bool, has_ea: bool,
            ps_keys=(), base_params=()):
  """Single-kind step kernel; with has_ea, a per-step per-lane extra-args
  stream (the pseudorange family's satellite states) rides along,
  mirroring _vo_kernel's layout. With ps_keys, a per-step runtime-params
  stream (the reference's global_vars at sensor rate, ekf_sym.py:129-132)
  rides SMEM next to dts: each step's params dict is the static
  base_params overlaid with that step's scalar row."""
  refs = list(refs)
  pss_ref = refs.pop(0) if ps_keys else None
  x_in_ref, p_in_ref, zs_ref = refs[:3]
  rest = refs[3:]
  eas_ref = rest.pop(0) if has_ea else None
  x_out_ref, p_out_ref = rest

  j = pl.program_id(1)

  @pl.when(j == 0)
  def _():
    x_out_ref[:] = x_in_ref[:]
    p_out_ref[:] = p_in_ref[:]

  def body(k, carry):
    x, P = carry
    dt = dts_ref[k, 0]
    z = zs_ref[pl.ds(k, 1)].reshape(zs_ref.shape[1:])
    ea = (eas_ref[pl.ds(k, 1)].reshape(eas_ref.shape[1:])
          if has_ea else None)
    params = dict(base_params)
    if ps_keys:
      params.update({key: pss_ref[k, i] for i, key in enumerate(ps_keys)})
    if entry:
      # entry-level body (ops/entry_slab.py): the structural interpreter
      # emits the whole step on slab values — the minimal-op path that
      # lets live-complexity specs fit the Mosaic compile budget
      from rednose_tpu.ops.entry_slab import entry_step_slab
      x, P, _ = entry_step_slab(spec, kind, params, x, P, z, q_diag,
                                r_mat, dt, structure, gate=gate, ea=ea)
    else:
      x, P = generic_predict_slab(spec, params, x, P, q_diag, dt,
                                  structure=structure)
      x, P, _ = generic_update_slab(spec, kind, params, x, P, z, r_mat,
                                    gate=gate, structure=structure, ea=ea)
    return (x, P)

  x, P = jax.lax.fori_loop(0, t_chunk, body, (x_out_ref[:], p_out_ref[:]))
  x_out_ref[:] = x
  p_out_ref[:] = P


def _mixed_kernel(dts_ref, kinds_ref, *refs, spec, kinds, t_chunk: int,
                  q_diag, r_mats, gate: bool, structure, entry: bool,
                  has_ea: bool, ps_keys=(), base_params=()):
  """generic _kernel for a heterogeneous kind schedule: one shared predict
  per step, then a lax.switch over per-kind updates (the same dispatch the
  hand live kernel uses, pallas_live._mixed_kernel). z rows are padded to
  the largest dz; ea rows (if any kind takes extra args) to the largest
  ea_len — each branch slices its own leading rows. With ps_keys, a
  per-step runtime-params stream rides SMEM (see _kernel)."""
  refs = list(refs)
  pss_ref = refs.pop(0) if ps_keys else None
  x_in_ref, p_in_ref, zs_ref = refs[:3]
  rest = refs[3:]
  eas_ref = rest.pop(0) if has_ea else None
  x_out_ref, p_out_ref = rest

  j = pl.program_id(1)

  @pl.when(j == 0)
  def _():
    x_out_ref[:] = x_in_ref[:]
    p_out_ref[:] = p_in_ref[:]

  branches = tuple(_update_branch(spec, k, r_mats[i], gate, structure,
                                  entry, ps_keys=ps_keys,
                                  base_params=base_params)
                   for i, k in enumerate(kinds))

  def body(t, carry):
    x, P = carry
    dt = dts_ref[t, 0]
    ki = kinds_ref[t, 0]
    z = zs_ref[pl.ds(t, 1)].reshape(zs_ref.shape[1:])
    params = dict(base_params)
    if ps_keys:
      # a TUPLE of SMEM scalar reads, not a stacked rank-1 array: the
      # tuple rides through lax.switch as a pytree of scalars, so no
      # rank-1 value has to cross a Mosaic region boundary
      ps_row = tuple(pss_ref[t, i] for i in range(len(ps_keys)))
      params.update({key: ps_row[i] for i, key in enumerate(ps_keys)})
    else:
      ps_row = dt * 0.0  # unused placeholder for the branches
    if entry:
      from rednose_tpu.ops.entry_slab import entry_predict_slab
      x, P = entry_predict_slab(spec, params, x, P, q_diag, dt, structure)
    else:
      x, P = generic_predict_slab(spec, params, x, P, q_diag, dt,
                                  structure=structure)
    ea = (eas_ref[pl.ds(t, 1)].reshape(eas_ref.shape[1:])
          if has_ea else x[:1] * 0.0)
    x, P = jax.lax.switch(ki, branches, x, P, z, ea, ps_row)
    return (x, P)

  x, P = jax.lax.fori_loop(0, t_chunk, body, (x_out_ref[:], p_out_ref[:]))
  x_out_ref[:] = x
  p_out_ref[:] = P


def _epoch_step_flat(spec, slot_kinds, q_diag, r_mats, gate, structure,
                     entry, x, P, z_t, ea_t, dt, base_params=(),
                     ps_keys=(), ps_row=None):
  """One fully-unrolled epoch step (one predict + K inline slot updates)
  on slab values — shared by _epoch_kernel's 'unroll' mode and the
  auto-mode op counter (epoch_flat_body_ops), so the count is exact."""
  from rednose_tpu.ops.entry_slab import entry_predict_slab, \
      entry_update_slab
  params = dict(base_params)
  if ps_keys:
    params.update({key: ps_row[i] for i, key in enumerate(ps_keys)})
  if entry:
    x, P = entry_predict_slab(spec, params, x, P, q_diag, dt, structure)
  else:
    x, P = generic_predict_slab(spec, params, x, P, q_diag, dt,
                                structure=structure)
  for k, kind in enumerate(slot_kinds):
    om = spec.obs[kind]
    z = z_t[k, :om.dz]
    ea = ea_t[k, :om.ea_len] if om.ea_len else None
    g = gate and om.maha_test
    if entry:
      x, P, _ = entry_update_slab(spec, kind, params, x, P, z, r_mats[k],
                                  g, structure, ea=ea)
    else:
      x, P, _ = generic_update_slab(spec, kind, params, x, P, z,
                                    r_mats[k], gate=g, structure=structure,
                                    ea=ea)
  return x, P


def _update_branch(spec, kind, r_mat, gate, structure, entry, ps_keys=(),
                   base_params=()):
  """One per-kind update branch (x, P, z_row, ea_row, ps_row) -> (x, P),
  shared by the mixed kernel's lax.switch dispatch and the epoch kernel's
  switch slot mode — one builder so the two kernels' per-kind semantics
  cannot drift. z_row/ea_row arrive padded to the schedule's max
  dz/ea_len; the branch slices its own leading rows. ps_row is the step's
  runtime-params stream row ((len(ps_keys),) scalars; an ignored
  placeholder when ps_keys is empty). gate=True means the KIND's own
  maha_test flag decides (reference semantics: gating is a spec property,
  templates/ekf_c.c:88-94) — unlike the hand live kernel's gate flag,
  which force-gates its position update.

  MSCKF FEATURE kinds get a camera-frame branch: nullspace-projected
  feature update + window AUGMENT (the reference's
  predict_and_update_batch(augment=True) flow, ekf_sym.py:525-526) — so
  ONE mixed kernel interleaves camera frames with other sensors. An
  over-budget feature body (the ESKFxMSCKF composition, ~3.6k ops) runs
  as a 2-phase inner lax.switch (innovation / apply+augment) nested
  inside the outer kind switch — each phase its own Mosaic region."""
  from rednose_tpu.ops.entry_slab import entry_update_slab

  om = spec.obs[kind]
  dz, mea = om.dz, om.ea_len

  if om.is_feature:
    return _feature_frame_branch(spec, kind, r_mat, gate, structure,
                                 ps_keys, base_params)

  def apply(x, P, z_row, ea_row, ps_row):
    z = z_row[:dz]
    ea = ea_row[:mea] if mea else None
    g = gate and om.maha_test
    params = dict(base_params)
    if ps_keys:
      params.update({key: ps_row[i] for i, key in enumerate(ps_keys)})
    if entry:
      x, P, _ = entry_update_slab(spec, kind, params, x, P, z, r_mat, g,
                                  structure, ea=ea)
    else:
      x, P, _ = generic_update_slab(spec, kind, params, x, P, z, r_mat,
                                    gate=g, structure=structure, ea=ea)
    return x, P

  return apply


@functools.lru_cache(maxsize=None)
def _feature_branch_ops(spec, kind, r_mat, gate, structure) -> int:
  """Exact jaxpr op count of the flat feature-update+augment branch body
  at tiny slab shapes (the per-region quantity the Mosaic budget sees)."""
  from rednose_tpu.ops.entry_slab import entry_feature_update_slab
  from rednose_tpu.ops.lane_bank import augment_slab

  om = spec.obs[kind]
  dx, de = spec.dim_x, spec.dim_err
  b = (8, 8)
  f32 = jnp.float32
  sds = jax.ShapeDtypeStruct

  def body(x, P, z, ea):
    x, P, _ = entry_feature_update_slab(spec, kind, {}, x, P, z, r_mat,
                                        gate, ea, structure=structure)
    return augment_slab(spec, x, P)

  closed = jax.make_jaxpr(body)(
      sds((dx,) + b, f32), sds((de, de) + b, f32), sds((om.dz,) + b, f32),
      sds((om.ea_len,) + b, f32))
  return _num_eqns(closed.jaxpr)


def _feature_frame_branch(spec, kind, r_mat, gate, structure, ps_keys,
                          base_params):
  """Camera-frame branch for the mixed kernel's kind switch: feature
  update + augment, phase-split when the flat body is over budget."""
  from rednose_tpu.ops.entry_slab import (
      entry_feature_apply_slab,
      entry_feature_innovation_slab,
      entry_feature_update_slab,
  )
  from rednose_tpu.ops.lane_bank import augment_slab

  om = spec.obs[kind]
  dz, mea = om.dz, om.ea_len
  g = gate and om.maha_test
  split = _feature_branch_ops(spec, kind, r_mat, g,
                              structure) > EPOCH_UNROLL_OP_BUDGET
  dzp = dz - om.ea_dim

  def apply(x, P, z_row, ea_row, ps_row):
    z = z_row[:dz]
    ea = ea_row[:mea]
    params = dict(base_params)
    if ps_keys:
      params.update({key: ps_row[i] for i, key in enumerate(ps_keys)})
    if not split:
      x, P, _ = entry_feature_update_slab(spec, kind, params, x, P, z,
                                          r_mat, g, ea,
                                          structure=structure)
      return augment_slab(spec, x, P)

    def innov_phase(x, P, yp, HP, S):
      yp, HP, S = entry_feature_innovation_slab(
          spec, kind, params, x, P, z, r_mat, ea, structure=structure)
      return x, P, yp, HP, S

    def apply_phase(x, P, yp, HP, S):
      x, P, _ = entry_feature_apply_slab(spec, kind, params, x, P, yp,
                                         HP, S, g)
      x, P = augment_slab(spec, x, P)
      return x, P, yp, HP, S

    yp0 = x[:dzp] * 0.0
    HP0 = P[:dzp] * 0.0
    S0 = P[:dzp, :dzp] * 0.0
    x, P, _, _, _ = jax.lax.fori_loop(
        0, 2,
        lambda pi, c: jax.lax.switch(pi, (innov_phase, apply_phase), *c),
        (x, P, yp0, HP0, S0))
    return x, P

  return apply


def _num_eqns(jaxpr) -> int:
  n = len(jaxpr.eqns)
  for eq in jaxpr.eqns:
    for key in ('jaxpr', 'call_jaxpr', 'cond_jaxpr', 'body_jaxpr'):
      sub = eq.params.get(key)
      if sub is not None:
        n += _num_eqns(getattr(sub, 'jaxpr', sub))
    for sub in (eq.params.get('branches') or ()):
      n += _num_eqns(sub.jaxpr)
  return n


# Mosaic compile cost scales superlinearly with the per-region op count.
# Measured anchors for FLAT epoch bodies (epoch_flat_body_ops counts, at
# the emission that was current when measured): the GNSS 8-slot epoch
# (LocKalman, 2477 ops) compiles and runs at 1.448B updates/s; the live
# 4-distinct-kind epoch at the pre-round-5 emission (3879 ops) OOMs the
# remote compile helper. The round-5 scalar-entry update rewrite
# (entry_slab._inv_entries et al.) cut the same bodies to 2243 / 3235
# ops, and the 3235-op flat live epoch now COMPILES (315 s first
# compile on the v5e relay) and runs at 306M updates/s — +39% over the
# 2-region split dispatch (220.8M, same session) — so the budget sits
# just above it. Flat bodies above budget route to the contiguous split
# (if a partition exists) or the per-slot lax.switch dispatch, whose
# regions stay at one-update size.
EPOCH_UNROLL_OP_BUDGET = 3300


@functools.lru_cache(maxsize=None)
def epoch_flat_body_ops(spec, slot_kinds, q_diag, r_mats, gate, structure,
                        entry, has_ea, base_params=(), ps_keys=()) -> int:
  """Exact jaxpr op count of one flat epoch step at tiny slab shapes —
  the quantity the Mosaic compile budget actually sees."""
  dx, de = spec.dim_x, spec.dim_err
  K = len(slot_kinds)
  max_dz = max(spec.obs[k].dz for k in slot_kinds)
  max_ea = max(spec.obs[k].ea_len for k in slot_kinds)
  b = (8, 8)
  f32 = jnp.float32
  x_s = jax.ShapeDtypeStruct((dx,) + b, f32)
  P_s = jax.ShapeDtypeStruct((de, de) + b, f32)
  z_s = jax.ShapeDtypeStruct((K, max_dz) + b, f32)
  dt_s = jax.ShapeDtypeStruct((), f32)

  def step(x, P, z_t, ea_t, dt, ps_row):
    return _epoch_step_flat(spec, slot_kinds, q_diag, r_mats, gate,
                            structure, entry, x, P, z_t, ea_t, dt,
                            base_params=base_params, ps_keys=ps_keys,
                            ps_row=ps_row)

  ps_s = jax.ShapeDtypeStruct((len(ps_keys),), f32) if ps_keys else None
  if has_ea:
    ea_s = jax.ShapeDtypeStruct((K, max_ea) + b, f32)
    if ps_keys:
      closed = jax.make_jaxpr(step)(x_s, P_s, z_s, ea_s, dt_s, ps_s)
    else:
      closed = jax.make_jaxpr(
          lambda x, P, z_t, ea_t, dt: step(x, P, z_t, ea_t, dt, None))(
              x_s, P_s, z_s, ea_s, dt_s)
  else:
    if ps_keys:
      closed = jax.make_jaxpr(
          lambda x, P, z_t, dt, ps: step(x, P, z_t, None, dt, ps))(
              x_s, P_s, z_s, dt_s, ps_s)
    else:
      closed = jax.make_jaxpr(
          lambda x, P, z_t, dt: step(x, P, z_t, None, dt, None))(
              x_s, P_s, z_s, dt_s)
  return _num_eqns(closed.jaxpr)


def _epoch_group_step(spec, slot_kinds, lo, hi, with_predict, q_diag,
                      r_mats, gate, structure, entry, base_params, ps_keys):
  """Contiguous slice of one epoch step: (optionally) the predict plus the
  inline updates for slots[lo:hi]. Shared by the 'split' slot mode's
  region branches and the partitioner's op counter, so the per-region
  Mosaic budget is measured on the exact code that compiles."""
  from rednose_tpu.ops.entry_slab import entry_predict_slab, \
      entry_update_slab

  def run(x, P, z_t, ea_t, dt, ps_row):
    params = dict(base_params)
    if ps_keys:
      params.update({key: ps_row[i] for i, key in enumerate(ps_keys)})
    if with_predict:
      if entry:
        x, P = entry_predict_slab(spec, params, x, P, q_diag, dt, structure)
      else:
        x, P = generic_predict_slab(spec, params, x, P, q_diag, dt,
                                    structure=structure)
    for k in range(lo, hi):
      kind = slot_kinds[k]
      om = spec.obs[kind]
      z = z_t[k, :om.dz]
      ea = ea_t[k, :om.ea_len] if om.ea_len else None
      g = gate and om.maha_test
      if entry:
        x, P, _ = entry_update_slab(spec, kind, params, x, P, z, r_mats[k],
                                    g, structure, ea=ea)
      else:
        x, P, _ = generic_update_slab(spec, kind, params, x, P, z,
                                      r_mats[k], gate=g,
                                      structure=structure, ea=ea)
    return x, P

  return run


@functools.lru_cache(maxsize=None)
def _epoch_group_ops(spec, slot_kinds, lo, hi, with_predict, q_diag, r_mats,
                     gate, structure, entry, has_ea, base_params,
                     ps_keys) -> int:
  """Exact jaxpr op count of one split-mode group region at tiny shapes."""
  dx, de = spec.dim_x, spec.dim_err
  K = len(slot_kinds)
  max_dz = max(spec.obs[k].dz for k in slot_kinds)
  max_ea = max(spec.obs[k].ea_len for k in slot_kinds)
  b = (8, 8)
  f32 = jnp.float32
  sds = jax.ShapeDtypeStruct
  run = _epoch_group_step(spec, slot_kinds, lo, hi, with_predict, q_diag,
                          r_mats, gate, structure, entry, base_params,
                          ps_keys)
  ps_s = (sds((len(ps_keys),), f32),) if ps_keys else ()
  ea_s = (sds((K, max(max_ea, 1)) + b, f32),) if has_ea else ()

  def fn(x, P, z_t, dt, *rest):
    rest = list(rest)
    ea_t = rest.pop(0) if has_ea else None
    ps_row = rest.pop(0) if ps_keys else None
    return run(x, P, z_t, ea_t, dt, ps_row)

  closed = jax.make_jaxpr(fn)(
      sds((dx,) + b, f32), sds((de, de) + b, f32),
      sds((K, max_dz) + b, f32), sds((), f32), *ea_s, *ps_s)
  return _num_eqns(closed.jaxpr)


@functools.lru_cache(maxsize=None)
def _partition_epoch_slots(spec, slot_kinds, q_diag, r_mats, gate,
                           structure, entry, has_ea, base_params, ps_keys,
                           budget: int):
  """Greedy contiguous partition of [predict] + slot updates into the
  fewest groups whose EXACT region op count fits the Mosaic budget.
  Returns the interior cut points (tuple of slot indices; group 0 carries
  the predict), or None if some single region can't fit (fall back to the
  per-slot switch dispatch)."""
  K = len(slot_kinds)

  def ops(lo, hi, with_predict):
    return _epoch_group_ops(spec, slot_kinds, lo, hi, with_predict, q_diag,
                            r_mats, gate, structure, entry, has_ea,
                            base_params, ps_keys)

  bounds = []
  lo, with_predict = 0, True
  while True:
    hi = lo
    # grow the group while the exact region count stays under budget
    while hi < K and ops(lo, hi + 1, with_predict) <= budget:
      hi += 1
    if hi == lo:
      # nothing fit: OK only for a bare-predict group 0 under budget
      if not (with_predict and ops(lo, lo, True) <= budget):
        return None  # a single region can't fit the budget
    if hi >= K:
      break
    bounds.append(hi)
    lo, with_predict = hi, False
  return tuple(bounds)


def _epoch_kernel(dts_ref, *refs, spec, slot_kinds, t_chunk: int, q_diag,
                  r_mats, gate: bool, structure, entry: bool, has_ea: bool,
                  slot_mode: str, base_params=(), ps_keys=()):
  """Epoch-batched step: ONE predict then K slot updates per time step —
  the reference's predict_and_update_batch shape (ekf_sym.py:484-531:
  predict once at t, then every measurement of the epoch) as a kernel
  body. slot_kinds is static. Two dispatch modes:

    'unroll': all K updates inline in one region — zero dispatch, the
      fastest form while the flat body fits the Mosaic op budget (the
      canonical GNSS epoch: 7 pseudoranges + 7 rates).
    'switch': fori_loop over slots with a lax.switch over one branch per
      DISTINCT (kind, R) — Mosaic compiles each branch as its own region,
      so per-region op count stays at one-update size no matter how many
      distinct kinds the epoch mixes (the structure _mixed_kernel already
      proves compilable; this is what lets live-complexity epochs — 4+
      distinct 22-dim kinds — reach the kernel at all)."""
  refs = list(refs)
  pss_ref = refs.pop(0) if ps_keys else None
  x_in_ref, p_in_ref, zs_ref = refs[:3]
  rest = refs[3:]
  eas_ref = rest.pop(0) if has_ea else None
  x_out_ref, p_out_ref = rest

  j = pl.program_id(1)

  @pl.when(j == 0)
  def _():
    x_out_ref[:] = x_in_ref[:]
    p_out_ref[:] = p_in_ref[:]

  from rednose_tpu.ops.entry_slab import entry_predict_slab

  K = len(slot_kinds)
  if slot_mode == 'switch':
    # one branch per distinct (kind, R); slots map onto branches
    keys, branch_of_slot = [], []
    for k, kind in enumerate(slot_kinds):
      key = (kind, r_mats[k])
      if key not in keys:
        keys.append(key)
      branch_of_slot.append(keys.index(key))

    branches = tuple(_update_branch(spec, kind, r_mat, gate, structure,
                                    entry, ps_keys=ps_keys,
                                    base_params=base_params)
                     for kind, r_mat in keys)
  elif slot_mode.startswith('split:'):
    # contiguous slot groups, each a flat region under the Mosaic budget;
    # group 0 carries the predict (the VO kernel's phase-dispatch pattern,
    # _vo_kernel 'switch2' — each lax.switch branch compiles as its own
    # Mosaic region, so per-region op count stays bounded while dispatch
    # cost is one switch per GROUP instead of one per slot)
    cuts = tuple(int(c) for c in slot_mode[6:].split(',')) if \
        slot_mode != 'split:' else ()
    edges = (0,) + cuts + (K,)
    groups = tuple(
        _epoch_group_step(spec, slot_kinds, edges[i], edges[i + 1], i == 0,
                          q_diag, r_mats, gate, structure, entry,
                          base_params, ps_keys)
        for i in range(len(edges) - 1))

  def body(t, carry):
    x, P = carry
    dt = dts_ref[t, 0]
    if ps_keys:
      ps_row = tuple(pss_ref[t, i] for i in range(len(ps_keys)))  # scalars
    else:
      ps_row = dt * 0.0  # unused placeholder
    if slot_mode.startswith('split:'):
      z_t = zs_ref[pl.ds(t, 1)].reshape(zs_ref.shape[1:])  # (K, max_dz, *b)
      ea_t = (eas_ref[pl.ds(t, 1)].reshape(eas_ref.shape[1:])
              if has_ea else None)
      phase_branches = tuple(
          (lambda g: lambda xx, PP: g(xx, PP, z_t, ea_t, dt, ps_row))(g)
          for g in groups)
      if len(phase_branches) == 1:
        return phase_branches[0](x, P)
      return jax.lax.fori_loop(
          0, len(phase_branches),
          lambda pi, c: jax.lax.switch(pi, phase_branches, *c), (x, P))
    if slot_mode == 'switch':
      params = dict(base_params)
      if ps_keys:
        params.update({key: ps_row[i] for i, key in enumerate(ps_keys)})
      if entry:
        x, P = entry_predict_slab(spec, params, x, P, q_diag, dt,
                                  structure)
      else:
        x, P = generic_predict_slab(spec, params, x, P, q_diag, dt,
                                    structure=structure)

      def slot_body(k, carry_k):
        xk, Pk = carry_k
        z_row = zs_ref[pl.ds(t, 1), pl.ds(k, 1)].reshape(zs_ref.shape[2:])
        ea_row = (eas_ref[pl.ds(t, 1),
                          pl.ds(k, 1)].reshape(eas_ref.shape[2:])
                  if has_ea else xk[:1] * 0.0)
        if len(branches) == 1:
          return branches[0](xk, Pk, z_row, ea_row, ps_row)
        bi = jnp.int32(branch_of_slot[0])
        for i in range(1, K):
          bi = jnp.where(k == i, jnp.int32(branch_of_slot[i]), bi)
        return jax.lax.switch(bi, branches, xk, Pk, z_row, ea_row, ps_row)

      return jax.lax.fori_loop(0, K, slot_body, (x, P))

    z_t = zs_ref[pl.ds(t, 1)].reshape(zs_ref.shape[1:])    # (K, max_dz, *b)
    ea_t = (eas_ref[pl.ds(t, 1)].reshape(eas_ref.shape[1:])
            if has_ea else None)
    return _epoch_step_flat(spec, slot_kinds, q_diag, r_mats, gate,
                            structure, entry, x, P, z_t, ea_t, dt,
                            base_params=base_params, ps_keys=ps_keys,
                            ps_row=ps_row if ps_keys else None)

  x, P = jax.lax.fori_loop(0, t_chunk, body, (x_out_ref[:], p_out_ref[:]))
  x_out_ref[:] = x
  p_out_ref[:] = P


def _vo_kernel(dts_ref, x_in_ref, p_in_ref, zs_ref, eas_ref, x_out_ref,
               p_out_ref, *, spec, kind, t_chunk: int, q_diag, r_mat,
               gate: bool, structure, phase_mode: str):
  """Banked-VO frame kernel. phase_mode:

    'flat': the whole frame (block predict + projected feature update +
      augment) inline in one region — fastest while the body fits the
      Mosaic op budget (the additive msckf_vo spec, ~1.9k ops).
    'switch': fori_loop(0, 3) over a lax.switch of the frame's three
      phases (predict / innovation / apply+augment,
      entry_slab.entry_vo_frame_branches) — Mosaic compiles each phase as
      its own region, which is what lets the 36-dim ESKFxMSCKF
      composition (flat body 4.4k ops) reach the kernel at all."""
  from rednose_tpu.ops.entry_slab import (
      entry_vo_frame_branches,
      entry_vo_frame_slab,
  )

  j = pl.program_id(1)

  @pl.when(j == 0)
  def _():
    x_out_ref[:] = x_in_ref[:]
    p_out_ref[:] = p_in_ref[:]

  if phase_mode in ('switch', 'switch2'):
    branches = entry_vo_frame_branches(
        spec, kind, {}, q_diag, r_mat, structure, gate,
        n_phases=2 if phase_mode == 'switch2' else 3)
    dzp = spec.obs[kind].dz - spec.obs[kind].ea_dim

    def body(k, carry):
      x, P = carry
      dt = dts_ref[k, 0]
      z = zs_ref[pl.ds(k, 1)].reshape(zs_ref.shape[1:])
      ea = eas_ref[pl.ds(k, 1)].reshape(eas_ref.shape[1:])
      # phase scratch zeros derived from inputs (Mosaic constant rule)
      yp0 = x[:dzp] * 0.0
      HP0 = P[:dzp] * 0.0
      S0 = P[:dzp, :dzp] * 0.0

      def phase(pi, c):
        return jax.lax.switch(pi, branches, *c, z, ea, dt)

      x, P, _, _, _ = jax.lax.fori_loop(0, len(branches), phase,
                                        (x, P, yp0, HP0, S0))
      return (x, P)
  else:
    def body(k, carry):
      x, P = carry
      dt = dts_ref[k, 0]
      z = zs_ref[pl.ds(k, 1)].reshape(zs_ref.shape[1:])
      ea = eas_ref[pl.ds(k, 1)].reshape(eas_ref.shape[1:])
      return entry_vo_frame_slab(spec, kind, {}, x, P, z, ea, q_diag,
                                 r_mat, dt, structure, gate=gate)

  x, P = jax.lax.fori_loop(0, t_chunk, body, (x_out_ref[:], p_out_ref[:]))
  x_out_ref[:] = x
  p_out_ref[:] = P


@functools.lru_cache(maxsize=None)
def vo_flat_body_ops(spec, kind, q_diag, r_mat, gate, structure) -> int:
  """Exact jaxpr op count of one flat VO frame at tiny slab shapes — the
  quantity the Mosaic compile budget sees (see epoch_flat_body_ops)."""
  from rednose_tpu.ops.entry_slab import entry_vo_frame_slab

  dx, de = spec.dim_x, spec.dim_err
  om = spec.obs[kind]
  b = (8, 8)
  f32 = jnp.float32
  sds = jax.ShapeDtypeStruct

  def frame(x, P, z, ea, dt):
    return entry_vo_frame_slab(spec, kind, {}, x, P, z, ea, q_diag, r_mat,
                               dt, structure, gate=gate)

  closed = jax.make_jaxpr(frame)(
      sds((dx,) + b, f32), sds((de, de) + b, f32), sds((om.dz,) + b, f32),
      sds((om.ea_len,) + b, f32), sds((), f32))
  return _num_eqns(closed.jaxpr)


# VO-path compile budgets, measured on the v5e relay with the
# ESKFxMSCKF composition (models/msckf_eskf, 41/36, flat frame body
# 4443 ops): the FLAT body compiles and is the fastest form measured —
# 22.2M frames/s vs 17.8M for the 2-phase switch and 16.8M for the
# 3-phase (each Mosaic region boundary costs throughput). The epoch
# kernel's 2600-op budget is NOT the VO ceiling: the 3933-op OOM was a
# 4-distinct-kind 22-dim epoch body; the single-kind VO body at 4.4k
# compiles fine. Budgets sit just above the measured-good points.
VO_FLAT_OP_BUDGET = 4500
# Largest-Mosaic-region budget for the VO 2-phase dispatch fallback: the
# composition's predict+innovation region (~3.2k ops) compiles in 45 s.
VO_SWITCH2_REGION_BUDGET = 3500


@functools.lru_cache(maxsize=None)
def vo_phase2_region_ops(spec, kind, q_diag, r_mat, gate,
                         structure) -> int:
  """Exact jaxpr op count of the 2-phase dispatch's LARGEST region
  (predict + feature innovation) at tiny slab shapes."""
  from rednose_tpu.ops.entry_slab import (
      entry_feature_innovation_slab,
      entry_predict_slab,
  )

  dx, de = spec.dim_x, spec.dim_err
  om = spec.obs[kind]
  b = (8, 8)
  f32 = jnp.float32
  sds = jax.ShapeDtypeStruct

  def region(x, P, z, ea, dt):
    x, P = entry_predict_slab(spec, {}, x, P, q_diag, dt, structure)
    yp, HP, S = entry_feature_innovation_slab(spec, kind, {}, x, P, z,
                                              r_mat, ea,
                                              structure=structure)
    return x, P, yp, HP, S

  closed = jax.make_jaxpr(region)(
      sds((dx,) + b, f32), sds((de, de) + b, f32), sds((om.dz,) + b, f32),
      sds((om.ea_len,) + b, f32), sds((), f32))
  return _num_eqns(closed.jaxpr)


@functools.partial(
    jax.jit,
    static_argnames=('spec', 'kind', 'q_diag', 'r_mat', 'gate', 't_chunk',
                     'tile_b', 'interpret', 'structure', 'phase_mode'))
def vo_bank_scan(x_packed, P_packed, zs_packed, eas_packed, dts, *, spec,
                 kind, q_diag, r_mat, gate: bool = False,
                 t_chunk: int = 128, tile_b: int = 1024,
                 interpret: bool = False, structure=None,
                 phase_mode: str = 'auto'):
  """T banked-VO frames, VMEM-resident: each frame is an MSCKF block
  predict + nullspace-projected feature update + window augmentation
  (ops/entry_slab.entry_vo_frame_slab) — the reference's feature kinds in
  the same hot compiled kernel as everything else (templates/ekf_c.c:66-77
  at kernel speed, with per-frame landmark positions streamed from HBM).
  Runs the ESKFxMSCKF composition (models/msckf_eskf — quaternion error
  state + full-pose clone window, the reference's joint
  msckf_params+eskf_params path, ekf_sym.py:57-66) as well as additive
  MSCKF specs: phase_mode='auto' counts the flat frame body's ops exactly
  (vo_flat_body_ops) and keeps the zero-dispatch flat form while it fits
  the measured Mosaic budget (the composition's 4.4k-op flat body
  compiles and runs fastest); bigger bodies fall back to a 2-phase then
  3-phase lax.switch (predict / innovation / apply+augment), one Mosaic
  region per phase.

  Layouts mirror generic_bank_scan, plus eas_packed (T, ea_len, 8, B/8)
  per-frame per-lane feature positions."""
  T = zs_packed.shape[0]
  dx, de = spec.dim_x, spec.dim_err
  dz, mea = spec.obs[kind].dz, spec.obs[kind].ea_len
  bsub = x_packed.shape[-1]
  B = SUBLANES * bsub
  tile = tile_b // SUBLANES
  assert x_packed.shape == (dx, SUBLANES, bsub), x_packed.shape
  assert P_packed.shape == (de, de, SUBLANES, bsub), P_packed.shape
  assert zs_packed.shape == (T, dz, SUBLANES, bsub), zs_packed.shape
  assert eas_packed.shape == (T, mea, SUBLANES, bsub), eas_packed.shape
  assert T % t_chunk == 0 and B % tile_b == 0, (T, t_chunk, B, tile_b)
  n_b, n_t = B // tile_b, T // t_chunk

  assert phase_mode in ('auto', 'flat', 'switch', 'switch2'), phase_mode
  if phase_mode == 'auto':
    # fewer Mosaic region boundaries measured strictly faster (the
    # composition on v5e: flat 22.2M frames/s > switch2 17.8M > switch
    # 16.8M) — pick the fewest-region form whose largest region fits
    # the measured compile budget
    flat_ops = vo_flat_body_ops(spec, kind, q_diag, r_mat, gate, structure)
    if flat_ops <= VO_FLAT_OP_BUDGET:
      phase_mode = 'flat'
    elif vo_phase2_region_ops(spec, kind, q_diag, r_mat, gate,
                              structure) <= VO_SWITCH2_REGION_BUDGET:
      phase_mode = 'switch2'
    else:
      phase_mode = 'switch'
    logging.getLogger(__name__).info(
        "vo_bank_scan auto: flat frame body %d ops (budget %d) -> "
        "phase_mode=%r", flat_ops, VO_FLAT_OP_BUDGET, phase_mode)
  kernel = functools.partial(_vo_kernel, spec=spec, kind=kind,
                             t_chunk=t_chunk, q_diag=q_diag, r_mat=r_mat,
                             gate=gate, structure=structure,
                             phase_mode=phase_mode)

  return pl.pallas_call(
      kernel,
      grid=(n_b, n_t),
      in_specs=[
          pl.BlockSpec((t_chunk, 1), lambda i, j: (j, 0),
                       memory_space=pltpu.SMEM),
          pl.BlockSpec((dx, SUBLANES, tile), lambda i, j: (0, 0, i),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((de, de, SUBLANES, tile), lambda i, j: (0, 0, 0, i),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((t_chunk, dz, SUBLANES, tile),
                       lambda i, j: (j, 0, 0, i), memory_space=pltpu.VMEM),
          pl.BlockSpec((t_chunk, mea, SUBLANES, tile),
                       lambda i, j: (j, 0, 0, i), memory_space=pltpu.VMEM),
      ],
      out_specs=(
          pl.BlockSpec((dx, SUBLANES, tile), lambda i, j: (0, 0, i),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((de, de, SUBLANES, tile), lambda i, j: (0, 0, 0, i),
                       memory_space=pltpu.VMEM),
      ),
      out_shape=(
          jax.ShapeDtypeStruct((dx, SUBLANES, bsub), x_packed.dtype),
          jax.ShapeDtypeStruct((de, de, SUBLANES, bsub), P_packed.dtype),
      ),
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=100 * 1024 * 1024),
      interpret=interpret,
  )(dts.reshape(T, 1), x_packed, P_packed, zs_packed, eas_packed)


@functools.partial(
    jax.jit,
    static_argnames=('spec', 'slot_kinds', 'q_diag', 'r_mats', 'gate',
                     't_chunk', 'tile_b', 'interpret', 'structure', 'entry',
                     'slot_mode', 'base_params', 'ps_keys'))
def generic_bank_scan_epoch(x_packed, P_packed, zs_packed, dts,
                            eas_packed=None, pss=None, *, spec, slot_kinds,
                            q_diag, r_mats, gate: bool = True,
                            t_chunk: int = 32, tile_b: int = 1024,
                            interpret: bool = False, structure=None,
                            entry: bool = True, slot_mode: str = 'auto',
                            base_params=(), ps_keys=()):
  """T EPOCHS, each one predict + K statically-unrolled updates — the
  reference's predict_and_update_batch semantics (predict once at t, then
  every measurement of the epoch, ekf_sym.py:484-531) at kernel speed.
  The canonical GNSS shape: slot_kinds = 4x(PSEUDORANGE,) + 4x(RATE,) runs
  a full receiver epoch per step with zero dispatch overhead (flat unroll,
  2477 ops — under budget) and one F P F^T instead of eight; fatter
  schedules still amortize the predict but dispatch per-slot (see
  slot_mode below).

  Args vs generic_bank_scan:
    slot_kinds: static tuple of K observation-kind ids (the epoch layout;
      repeat a kind for several same-kind measurements).
    zs_packed: (T, K, max_dz, 8, B/8) — pack with pack_bank_epochs.
    eas_packed: (T, K, max_ea_len, 8, B/8) (required iff some slot kind
      takes extra args).
    r_mats: per-slot static noise, tuple of (dz, dz) nested tuples.
    slot_mode: 'unroll' (all K updates inline — zero dispatch), 'switch'
      (fori_loop + per-distinct-(kind, R) lax.switch branches — per-region
      op count stays at one-update size), or 'auto' (default): count the
      flat body's ops exactly (epoch_flat_body_ops) and unroll only while
      it fits EPOCH_UNROLL_OP_BUDGET. This is what lets live-complexity
      epochs (4+ distinct 22-dim kinds) compile at all while the benched
      4+4 GNSS epoch (2477 ops) keeps the faster flat form. K-fat
      schedules can exceed the budget too (the 7+7 GNSS epoch above is
      4252 ops and auto-routes to switch — logged at INFO); pass
      slot_mode='unroll' explicitly to force the flat form if your
      compile budget allows it.
  gate=True (default) applies each kind's own maha_test flag per slot —
  one bad satellite is rejected without touching the rest of the epoch."""
  T = zs_packed.shape[0]
  dx, de = spec.dim_x, spec.dim_err
  slot_kinds = tuple(int(k) for k in slot_kinds)
  assert not any(spec.obs[k].is_feature for k in slot_kinds), (
      "MSCKF feature kinds are camera FRAMES (update + window augment), "
      "not epoch slots: use vo_bank_scan / generic_bank_scan_mixed")
  K = len(slot_kinds)
  max_dz = max(spec.obs[k].dz for k in slot_kinds)
  max_ea = max(spec.obs[k].ea_len for k in slot_kinds)
  bsub = x_packed.shape[-1]
  B = SUBLANES * bsub
  tile = tile_b // SUBLANES
  assert x_packed.shape == (dx, SUBLANES, bsub), x_packed.shape
  assert P_packed.shape == (de, de, SUBLANES, bsub), P_packed.shape
  assert zs_packed.shape == (T, K, max_dz, SUBLANES, bsub), zs_packed.shape
  assert T % t_chunk == 0 and B % tile_b == 0, (T, t_chunk, B, tile_b)
  assert len(q_diag) == de and len(r_mats) == K
  assert (eas_packed is None) == (max_ea == 0), (
      f"slot_kinds {slot_kinds} max ea_len={max_ea}: pass eas_packed iff "
      "some kind takes extra args")
  if eas_packed is not None:
    assert eas_packed.shape == (T, K, max_ea, SUBLANES, bsub), \
        eas_packed.shape
  assert (pss is None) == (len(ps_keys) == 0), (
      "pass pss (T, len(ps_keys)) iff ps_keys is non-empty")
  if pss is not None:
    assert pss.shape == (T, len(ps_keys)), (pss.shape, ps_keys)
  n_b, n_t = B // tile_b, T // t_chunk

  entry = entry and structure is not None
  assert slot_mode in ('auto', 'unroll', 'switch') or \
      slot_mode.startswith('split:'), slot_mode
  if slot_mode == 'auto':
    flat_ops = epoch_flat_body_ops(spec, slot_kinds, q_diag, r_mats, gate,
                                   structure, entry,
                                   eas_packed is not None, base_params,
                                   ps_keys)
    if flat_ops <= EPOCH_UNROLL_OP_BUDGET:
      slot_mode = 'unroll'
    else:
      # over-budget flat body: prefer the fewest-region contiguous split
      # (one lax.switch per GROUP) over the per-slot switch dispatch —
      # measured 16x faster on the live 4-distinct-kind all-sensors tick
      cuts = _partition_epoch_slots(spec, slot_kinds, q_diag, r_mats, gate,
                                    structure, entry,
                                    eas_packed is not None, base_params,
                                    ps_keys, EPOCH_UNROLL_OP_BUDGET)
      slot_mode = ('split:' + ','.join(str(c) for c in cuts)
                   if cuts else 'switch')
    logging.getLogger(__name__).info(
        "generic_bank_scan_epoch auto: flat body %d ops (budget %d) -> "
        "slot_mode=%r for %d slots / %d distinct kinds", flat_ops,
        EPOCH_UNROLL_OP_BUDGET, slot_mode, len(slot_kinds),
        len(set(slot_kinds)))
  kernel = functools.partial(
      _epoch_kernel, spec=spec, slot_kinds=slot_kinds, t_chunk=t_chunk,
      q_diag=q_diag, r_mats=r_mats, gate=gate, structure=structure,
      entry=entry, has_ea=eas_packed is not None, slot_mode=slot_mode,
      base_params=base_params, ps_keys=ps_keys)

  in_specs = [
      pl.BlockSpec((t_chunk, 1), lambda i, j: (j, 0),
                   memory_space=pltpu.SMEM),
  ]
  operands = [dts.reshape(T, 1)]
  if pss is not None:
    n_ps = len(ps_keys)
    in_specs.append(
        pl.BlockSpec((t_chunk, n_ps), lambda i, j: (j, 0),
                     memory_space=pltpu.SMEM))
    operands.append(pss)
  in_specs += [
      pl.BlockSpec((dx, SUBLANES, tile), lambda i, j: (0, 0, i),
                   memory_space=pltpu.VMEM),
      pl.BlockSpec((de, de, SUBLANES, tile), lambda i, j: (0, 0, 0, i),
                   memory_space=pltpu.VMEM),
      pl.BlockSpec((t_chunk, K, max_dz, SUBLANES, tile),
                   lambda i, j: (j, 0, 0, 0, i), memory_space=pltpu.VMEM),
  ]
  operands += [x_packed, P_packed, zs_packed]
  if eas_packed is not None:
    in_specs.append(
        pl.BlockSpec((t_chunk, K, max_ea, SUBLANES, tile),
                     lambda i, j: (j, 0, 0, 0, i),
                     memory_space=pltpu.VMEM))
    operands.append(eas_packed)

  return pl.pallas_call(
      kernel,
      grid=(n_b, n_t),
      in_specs=in_specs,
      out_specs=(
          pl.BlockSpec((dx, SUBLANES, tile), lambda i, j: (0, 0, i),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((de, de, SUBLANES, tile), lambda i, j: (0, 0, 0, i),
                       memory_space=pltpu.VMEM),
      ),
      out_shape=(
          jax.ShapeDtypeStruct((dx, SUBLANES, bsub), x_packed.dtype),
          jax.ShapeDtypeStruct((de, de, SUBLANES, bsub), P_packed.dtype),
      ),
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=100 * 1024 * 1024),
      interpret=interpret,
  )(*operands)


def pack_bank_epochs(zs):
  """(T, K, B, d) epoch measurements -> (T, K, d, 8, B/8) slab layout."""
  T, K, B, d = zs.shape
  return jnp.swapaxes(zs, 2, 3).reshape(T, K, d, SUBLANES, B // SUBLANES)


@functools.partial(
    jax.jit,
    static_argnames=('spec', 'kinds', 'q_diag', 'r_mats', 'gate', 't_chunk',
                     'tile_b', 'interpret', 'structure', 'entry', 'ps_keys',
                     'base_params'))
def generic_bank_scan_mixed(x_packed, P_packed, zs_packed, dts, kind_idx,
                            eas_packed=None, pss=None, *, spec, kinds,
                            q_diag, r_mats, gate: bool = True,
                            t_chunk: int = 128, tile_b: int = 1024,
                            interpret: bool = False, structure=None,
                            entry: bool = True, ps_keys=(),
                            base_params=()):
  """Heterogeneous-kind fused bank for ANY scatter-free spec: each step is
  one shared predict plus a lax.switch-dispatched update of
  kinds[kind_idx[t]], all VMEM-resident — the generic analog of the
  hand-derived pallas_live.live_bank_scan_mixed, and the kernel-speed form
  of ops/lane_bank.lane_mixed_bank_scan. The reference's real workload
  shape (several observation kinds at sensor rate, ekf_sym.cc:158-184) for
  an arbitrary user spec in ONE kernel.

  Args vs generic_bank_scan:
    kind_idx: (T,) int32 indices into `kinds` (streamed via SMEM).
    kinds: static tuple of observation-kind ids of the schedule.
    r_mats: static per-kind noise, tuple (aligned with kinds) of (dz, dz)
      nested scalar tuples.
    zs_packed rows are padded to max(dz); eas_packed rows (required iff
    any kind takes extra args; other steps' rows are ignored) to
    max(ea_len).
  gate=True (default) applies each kind's own maha_test flag — reference
  semantics, gating is a spec property (ekf_c.c:88-94); kinds without the
  flag are never gated, so this is a no-op for specs like live that set
  no maha kinds. The hand live kernel's gate flag force-gates instead —
  different contract.

  Per-step runtime params: ps_keys static tuple of names, pss
  (T, len(ps_keys)) SMEM-streamed values, base_params static (name,
  float) pairs for the rest — see generic_bank_scan."""
  T = zs_packed.shape[0]
  dx, de = spec.dim_x, spec.dim_err
  kinds = tuple(int(k) for k in kinds)
  max_dz = max(spec.obs[k].dz for k in kinds)
  max_ea = max(spec.obs[k].ea_len for k in kinds)
  bsub = x_packed.shape[-1]
  B = SUBLANES * bsub
  tile = tile_b // SUBLANES
  assert x_packed.shape == (dx, SUBLANES, bsub), x_packed.shape
  assert P_packed.shape == (de, de, SUBLANES, bsub), P_packed.shape
  assert zs_packed.shape == (T, max_dz, SUBLANES, bsub), zs_packed.shape
  assert kind_idx.shape == (T,), kind_idx.shape
  assert T % t_chunk == 0 and B % tile_b == 0, (T, t_chunk, B, tile_b)
  assert len(q_diag) == de and len(r_mats) == len(kinds)
  assert (eas_packed is None) == (max_ea == 0), (
      f"kinds {kinds} max ea_len={max_ea}: pass eas_packed iff some kind "
      "takes extra args")
  if eas_packed is not None:
    assert eas_packed.shape == (T, max_ea, SUBLANES, bsub), eas_packed.shape
  assert (pss is None) == (len(ps_keys) == 0), (
      "pass pss (T, len(ps_keys)) iff ps_keys is non-empty")
  if pss is not None:
    assert pss.shape == (T, len(ps_keys)), (pss.shape, ps_keys)
  if any(spec.obs[k].is_feature for k in kinds):
    # camera-frame branches need the entry predict (MSCKF block form) and
    # the structural taps for the composed feature H
    assert structure is not None and entry, (
        "a mixed schedule with MSCKF feature kinds needs a detected "
        "structure (ops/sparsity.detect_structure) and entry=True")
  n_b, n_t = B // tile_b, T // t_chunk

  kernel = functools.partial(
      _mixed_kernel, spec=spec, kinds=kinds, t_chunk=t_chunk, q_diag=q_diag,
      r_mats=r_mats, gate=gate, structure=structure,
      entry=entry and structure is not None,
      has_ea=eas_packed is not None, ps_keys=ps_keys,
      base_params=base_params)

  in_specs = [
      pl.BlockSpec((t_chunk, 1), lambda i, j: (j, 0),
                   memory_space=pltpu.SMEM),
      pl.BlockSpec((t_chunk, 1), lambda i, j: (j, 0),
                   memory_space=pltpu.SMEM),
  ]
  operands = [dts.reshape(T, 1), kind_idx.reshape(T, 1).astype(jnp.int32)]
  if pss is not None:
    n_ps = len(ps_keys)
    in_specs.append(
        pl.BlockSpec((t_chunk, n_ps), lambda i, j: (j, 0),
                     memory_space=pltpu.SMEM))
    operands.append(pss)
  in_specs += [
      pl.BlockSpec((dx, SUBLANES, tile), lambda i, j: (0, 0, i),
                   memory_space=pltpu.VMEM),
      pl.BlockSpec((de, de, SUBLANES, tile), lambda i, j: (0, 0, 0, i),
                   memory_space=pltpu.VMEM),
      pl.BlockSpec((t_chunk, max_dz, SUBLANES, tile),
                   lambda i, j: (j, 0, 0, i), memory_space=pltpu.VMEM),
  ]
  operands += [x_packed, P_packed, zs_packed]
  if eas_packed is not None:
    in_specs.append(
        pl.BlockSpec((t_chunk, max_ea, SUBLANES, tile),
                     lambda i, j: (j, 0, 0, i), memory_space=pltpu.VMEM))
    operands.append(eas_packed)

  return pl.pallas_call(
      kernel,
      grid=(n_b, n_t),
      in_specs=in_specs,
      out_specs=(
          pl.BlockSpec((dx, SUBLANES, tile), lambda i, j: (0, 0, i),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((de, de, SUBLANES, tile), lambda i, j: (0, 0, 0, i),
                       memory_space=pltpu.VMEM),
      ),
      out_shape=(
          jax.ShapeDtypeStruct((dx, SUBLANES, bsub), x_packed.dtype),
          jax.ShapeDtypeStruct((de, de, SUBLANES, bsub), P_packed.dtype),
      ),
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=100 * 1024 * 1024),
      interpret=interpret,
  )(*operands)


@functools.partial(
    jax.jit,
    static_argnames=('spec', 'kind', 'q_diag', 'r_mat', 'gate', 't_chunk',
                     'tile_b', 'interpret', 'structure', 'entry', 'ps_keys',
                     'base_params'))
def generic_bank_scan(x_packed, P_packed, zs_packed, dts, eas_packed=None,
                      pss=None, *, spec, kind, q_diag, r_mat,
                      gate: bool = False, t_chunk: int = 128,
                      tile_b: int = 1024, interpret: bool = False,
                      structure=None, entry: bool = True, ps_keys=(),
                      base_params=()):
  """T fused predict+update steps of ANY scatter-free spec, VMEM-resident.

  Args mirror pallas_live.live_bank_scan with generic dims: x_packed
  (dim_x, 8, B/8), P_packed (de, de, 8, B/8), zs_packed (T, dz, 8, B/8),
  q_diag static tuple of de diagonal process-noise scalars, r_mat static
  (dz, dz) nested tuple. Non-feature extra-args kinds (the loc_kf
  pseudorange family) stream their per-step per-lane satellite states as
  eas_packed (T, ea_len, 8, B/8) — pack with pack_bank_measurements.
  Pass `structure` (ops/sparsity.detect_structure)
  to unroll only the structurally nonzero Jacobian entries — the automated
  equivalent of the hand-derived flagship kernel's sparsity
  (ops/live_lane.py). With a structure, `entry=True` (default) emits the
  whole step body through the structural interpreter on slab values
  (ops/entry_slab.py) — the minimal-op form that brings live-complexity
  specs under the Mosaic compile budget; entry=False keeps the older
  masked-products body.

  PER-STEP RUNTIME PARAMS (the reference's global_vars updated at sensor
  rate, ekf_sym.py:129-132 — e.g. CarKalman's forward speed + commanded
  steering angle): ps_keys is a static tuple of param names, pss
  (T, len(ps_keys)) their per-step values, streamed through SMEM next to
  dts; base_params a static tuple of (name, float) pairs for the params
  that DON'T vary per step (spec.default_params minus the streamed keys).
  Each step's params dict = dict(base_params) overlaid with its pss row.
  """
  T = zs_packed.shape[0]
  dx, de, dz = spec.dim_x, spec.dim_err, spec.obs[kind].dz
  mea = spec.obs[kind].ea_len
  bsub = x_packed.shape[-1]
  B = SUBLANES * bsub
  tile = tile_b // SUBLANES
  assert x_packed.shape == (dx, SUBLANES, bsub), x_packed.shape
  assert P_packed.shape == (de, de, SUBLANES, bsub), P_packed.shape
  assert zs_packed.shape == (T, dz, SUBLANES, bsub), zs_packed.shape
  assert T % t_chunk == 0 and B % tile_b == 0, (T, t_chunk, B, tile_b)
  assert len(q_diag) == de and len(r_mat) == dz, (len(q_diag), len(r_mat))
  assert (eas_packed is None) == (mea == 0), (
      f"kind {kind} ea_len={mea}: pass eas_packed iff the kind takes "
      "extra args")
  if eas_packed is not None:
    assert eas_packed.shape == (T, mea, SUBLANES, bsub), eas_packed.shape
  assert (pss is None) == (len(ps_keys) == 0), (
      "pass pss (T, len(ps_keys)) iff ps_keys is non-empty")
  if pss is not None:
    assert pss.shape == (T, len(ps_keys)), (pss.shape, ps_keys)
  n_b, n_t = B // tile_b, T // t_chunk

  kernel = functools.partial(_kernel, spec=spec, kind=kind, t_chunk=t_chunk,
                             q_diag=q_diag, r_mat=r_mat, gate=gate,
                             structure=structure,
                             entry=entry and structure is not None,
                             has_ea=eas_packed is not None,
                             ps_keys=ps_keys, base_params=base_params)

  in_specs = [
      pl.BlockSpec((t_chunk, 1), lambda i, j: (j, 0),
                   memory_space=pltpu.SMEM),
  ]
  operands = [dts.reshape(T, 1)]
  if pss is not None:
    n_ps = len(ps_keys)
    in_specs.append(
        pl.BlockSpec((t_chunk, n_ps), lambda i, j: (j, 0),
                     memory_space=pltpu.SMEM))
    operands.append(pss)
  in_specs += [
      pl.BlockSpec((dx, SUBLANES, tile), lambda i, j: (0, 0, i),
                   memory_space=pltpu.VMEM),
      pl.BlockSpec((de, de, SUBLANES, tile), lambda i, j: (0, 0, 0, i),
                   memory_space=pltpu.VMEM),
      pl.BlockSpec((t_chunk, dz, SUBLANES, tile),
                   lambda i, j: (j, 0, 0, i), memory_space=pltpu.VMEM),
  ]
  operands += [x_packed, P_packed, zs_packed]
  if eas_packed is not None:
    in_specs.append(
        pl.BlockSpec((t_chunk, mea, SUBLANES, tile),
                     lambda i, j: (j, 0, 0, i), memory_space=pltpu.VMEM))
    operands.append(eas_packed)

  return pl.pallas_call(
      kernel,
      grid=(n_b, n_t),
      in_specs=in_specs,
      out_specs=(
          pl.BlockSpec((dx, SUBLANES, tile), lambda i, j: (0, 0, i),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((de, de, SUBLANES, tile), lambda i, j: (0, 0, 0, i),
                       memory_space=pltpu.VMEM),
      ),
      out_shape=(
          jax.ShapeDtypeStruct((dx, SUBLANES, bsub), x_packed.dtype),
          jax.ShapeDtypeStruct((de, de, SUBLANES, bsub), P_packed.dtype),
      ),
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=100 * 1024 * 1024),
      interpret=interpret,
  )(*operands)
