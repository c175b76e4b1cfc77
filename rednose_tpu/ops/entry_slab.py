"""Entry-level slab step: the ENTIRE predict/update body of an arbitrary
FilterSpec emitted by the structural interpreter directly on slab state.

This is the missing piece of the reference's codegen promise (rednose/
helpers/ekf_sym.py:76-89: every model — live_kf included — gets a minimal,
structurally-simplified compiled kernel with no hand work). The previous
generic path (ops/pallas_bank generic_*_slab + ops/sparsity masked
products) traced the user's model under vmap + unroll_dots and stacked
each Jacobian column, which left a ~2.2k-op kernel body for live_kf —
past the Mosaic compile helper's ~2k-op ceiling (PARITY.md). This module
cuts that by:

  * running the structural interpreter (ops/structural.py) ON SLAB VALUES:
    jaxprs are traced at per-filter logical shapes, payloads carry the
    bank dims, so there is no vmap and no unroll_dots pass;
  * sharing ONE memoized interpreter between the nominal-state propagation
    and the Jacobian taps — rotation-matrix entries etc. emit once (the
    reference's sympy CSE, sympy_helpers.py:122-162);
  * consuming Jacobian taps as RAW scalar entries (None / const / traced)
    and accumulating G·P / M·G^T / H·P row-by-row from only the
    structurally nonzero entries — no stacked columns, no broadcasts,
    ±1 constants folded into sign flips;
  * adding dt·diag(Q) through a broadcasted-iota diagonal mask instead of
    22 per-row concatenates.

Measured body op count for the unmodified live 23/22 ESKF spec
(predict + ECEF_POS update): 2215 ops (old sparse path) -> ~1.2k, below
the hand-derived kernel's 1.4k (ops/live_lane.py). Parity vs the
core/step.py oracle: tests/test_entry_slab.py.

Everything here is Mosaic-lowerable by construction: elementwise slab ops,
leading-dim slices/stacks, >=2D iota, no scatter, no captured array
constants (zeros derive from inputs).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from rednose_tpu.core.spec import FilterSpec
from rednose_tpu.ops import structural
from rednose_tpu.ops.lane_bank import _inv_small
from rednose_tpu.ops.live_lane import _mm_l, _mm_rt, _sym

Array = Any


def _sds(shape, dtype):
  return jax.ShapeDtypeStruct(shape, dtype)


def _ent_mul(e, row):
  """entry * (row slab), folding structural/const entries: None -> None,
  +-1 -> sign flip, const -> const mul; traced () or (*b) entries
  broadcast against the (n, *b) row."""
  if e is None:
    return None
  if isinstance(e, (int, float)):
    if e == 1.0:
      return row
    if e == -1.0:
      return -row
    return e * row
  return e * row


def _acc(acc, term):
  if term is None:
    return acc
  return term if acc is None else acc + term


def _stack_rows(rows, zero_row):
  return jnp.stack([r if r is not None else zero_row for r in rows])


def _add_diag_iota(P, scale, diag):
  """P + scale*diag on the diagonal via a broadcasted-iota mask — O(nnz)
  ops instead of d per-row concatenates, no scatter, no array constants."""
  d = P.shape[0]
  bdims = P.ndim - 2
  shape = (d, d) + (1,) * bdims
  i4 = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
  j4 = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
  qrow = None
  for k, q in enumerate(diag):
    if q == 0.0:
      continue
    term = q * (i4 == k).astype(P.dtype)
    qrow = term if qrow is None else qrow + term
  if qrow is None:
    return P
  D = jnp.where(i4 == j4, qrow, jnp.zeros((), P.dtype))
  return P + scale * D


def entry_predict_slab(spec: FilterSpec, params, x, P, q_diag, dt,
                      structure):
  """Predict on slab state — x (dim_x, *b), P (de, de, *b), dt traced
  scalar, q_diag static tuple — with x_new and the F-taps emitted through
  one shared structural interpreter and F P F^T accumulated entry-by-entry
  over structure.g_cols (F = I + G decomposition, see ops/sparsity
  fpf_masked for the algebra)."""
  assert spec.dim_main_err == spec.dim_err, "MSCKF blocks: use runtime/bank"
  de, dx_dim = spec.dim_err, spec.dim_x
  dtype = x.dtype
  zero = x[0] * 0.0  # (*b) slab zero, derived from an input (Mosaic rule)
  interp = structural._Interp(zero)

  lx = _sds((dx_dim,), dtype)
  ldt = _sds((), dtype)

  # nominal state x_new = f(x, dt), zero-folded + memo-shared with the taps
  x_obj = structural.run_primal(
      lambda xx, dtt: spec.f(params, xx, dtt), (lx, ldt), (x, dt), interp)
  x_new = interp.materialize(x_obj[0])

  # F columns at dx = 0 (ESKF: d f_err / d dx; additive: d f / d x)
  if spec.f_err is not None:
    fn_e = lambda xx, dtt, vv: spec.f_err(params, xx, vv, dtt)  # noqa: E731
  else:
    assert de == dx_dim, "additive spec with dim_err != dim_x"
    fn_e = lambda xx, dtt, vv: spec.f(params, xx + vv, dtt)  # noqa: E731
  _, taps = structural.run_entry_taps(fn_e, (lx, ldt), (x, dt), de, dtype,
                                      structure.g_cols, interp)

  # G = F - I entries per column
  G = {}
  for k in structure.g_cols:
    col = list(taps[k])
    e = col[k]
    if e is None:
      col[k] = -1.0
    elif isinstance(e, (int, float)):
      col[k] = e - 1.0 if e != 1.0 else None
    else:
      col[k] = e - 1.0
    G[k] = col

  zero_row = P[0] * 0.0  # (de, *b)
  # hoist row slices out of the accumulation loops: a slice re-evaluated
  # inside the double loop emits a fresh slice+squeeze op pair per use
  # (measured ~1k ops of pure slicing before hoisting)
  P_rows = {k: P[k] for k in structure.g_cols}
  # M = G P, accumulated row-by-row over only the nonzero entries
  m_rows = []
  for i in range(de):
    acc = None
    for k in structure.g_cols:
      acc = _acc(acc, _ent_mul(G[k][i], P_rows[k]))
    m_rows.append(acc)
  M = _stack_rows(m_rows, zero_row)  # (de, de, *b)

  # N = M G^T: column j is sum_k M[:, k] * G[j, k]
  M_cols = {k: M[:, k] for k in structure.g_cols}
  n_cols = []
  for j in range(de):
    acc = None
    for k in structure.g_cols:
      acc = _acc(acc, _ent_mul(G[k][j], M_cols[k]))
    n_cols.append(acc)
  N = jnp.stack([c if c is not None else zero_row for c in n_cols], axis=1)

  P_new = _sym(P + M + jnp.swapaxes(M, 0, 1) + N)
  P_new = _add_diag_iota(P_new, dt, q_diag)
  return _normalize_slices_slab(x_new, spec.quaternion_idxs), P_new


def _normalize_slices_slab(x, idxs):
  for idx in idxs:
    q = x[idx:idx + 4]
    inv = jax.lax.rsqrt(q[0] * q[0] + q[1] * q[1] + q[2] * q[2]
                        + q[3] * q[3])
    x = jnp.concatenate(([x[:idx]] if idx else []) + [q * inv]
                        + ([x[idx + 4:]] if idx + 4 < x.shape[0] else []))
  return x


def entry_update_slab(spec: FilterSpec, kind: int, params, x, P, z, R,
                     gate: bool, structure):
  """Measurement update on slab state with the composed H = H·H_mod taps
  (jvp through the error injection, verified by detect_structure) consumed
  entry-by-entry. z (dz, *b); R a (dz, dz) nested static tuple or array.
  Returns (x_new, P_new, y)."""
  om = spec.obs[kind]
  assert not om.is_feature, "MSCKF feature kinds: use runtime/bank"
  dz, de = om.dz, spec.dim_err
  dtype = x.dtype
  zero = x[0] * 0.0
  interp = structural._Interp(zero)

  lx = _sds((spec.dim_x,), dtype)
  m = max(om.ea_len, 1)

  def fn_h(xx, vv):
    return om.h(params, spec.err(params, xx, vv), xx[:m] * 0.0)

  cols = structure.cols_for(kind)
  h_obj, taps = structural.run_entry_taps(fn_h, (lx,), (x,), de, dtype,
                                          cols, interp)
  h = interp.materialize(h_obj)
  y = z - h

  zero_row = P[0] * 0.0  # (de, *b)
  # HP = H_err P: row r accumulates over the nonzero (r, c) entries
  # (row slices hoisted — see entry_predict_slab)
  P_rows = {c: P[c] for c in cols}
  hp_rows = []
  for r in range(dz):
    acc = None
    for c in cols:
      acc = _acc(acc, _ent_mul(taps[c][r], P_rows[c]))
    hp_rows.append(acc)
  HP = _stack_rows(hp_rows, zero_row)  # (dz, de, *b)

  # S = HP H^T: S[r, s] = sum_c HP[r, c] * H[s, c]
  HP_ent = {(r, c): HP[r, c] for r in range(dz) for c in cols}
  s_rows = []
  for r in range(dz):
    row = []
    for s in range(dz):
      acc = None
      for c in cols:
        acc = _acc(acc, _ent_mul(taps[c][s], HP_ent[r, c]))
      row.append(acc if acc is not None else zero * 0.0)
    s_rows.append(row)

  if isinstance(R, tuple):
    S = jnp.stack([jnp.stack([s_rows[i][j] + R[i][j] for j in range(dz)])
                   for i in range(dz)])
  else:
    if R.ndim == 2:
      R = R.reshape(R.shape + (1,) * (x.ndim - 1))
    S = jnp.stack([jnp.stack(row) for row in s_rows]) + R

  Sinv = _inv_small(S)
  K = _mm_l(jnp.swapaxes(HP, 0, 1), Sinv, dz)  # P H^T S^-1 (P symmetric)
  if gate:
    dist = sum(y[i] * Sinv[i, j] * y[j]
               for i in range(dz) for j in range(dz))
    K = jnp.where(dist[None, None] > om.maha_thresh, 0.0, K)
  dx = sum(K[:, i] * y[i][None] for i in range(dz))

  KHP = _mm_l(K, HP, dz)
  KSK = _mm_rt(_mm_l(K, S, dz), K, dz)
  P_new = _sym(P - KHP - jnp.swapaxes(KHP, 0, 1) + KSK)

  # error injection through the interpreter (dx is a plain traced slab —
  # nothing folds, but the emission is scalarized and memo-shared with h)
  ldx = _sds((de,), dtype)
  x_obj = structural.run_primal(
      lambda xx, dd: spec.err(params, xx, dd), (lx, ldx), (x, dx), interp)
  x_new = interp.materialize(x_obj[0])
  return _normalize_slices_slab(x_new, spec.quaternion_idxs), P_new, y


def entry_step_slab(spec: FilterSpec, kind: int, params, x, P, z, q_diag,
                   r_mat, dt, structure, gate: bool = False):
  """One fused predict + update (the kernel-body hot path)."""
  x, P = entry_predict_slab(spec, params, x, P, q_diag, dt, structure)
  return entry_update_slab(spec, kind, params, x, P, z, r_mat, gate,
                           structure)
