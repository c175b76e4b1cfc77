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

Measured for the unmodified live 23/22 ESKF spec (predict + ECEF_POS
update): body 2215 ops (old sparse path) -> ~1.25k, below the hand-derived
kernel's 1.38k (ops/live_lane.py) — and 8.8k FLOP/lane-step vs 15.0k
before the compact-row predict assembly (V + V^T, below) and the factored
Joseph downdate (live_lane.joseph_sym). Parity vs the core/step.py
oracle: tests/test_entry_slab.py.

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
from rednose_tpu.ops.live_lane import _mm_l, _sym

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


def _tree_sum(terms):
  """Balanced pairwise sum of a list of slabs (None entries dropped).

  Cuts an n-deep left-fold add chain to ceil(log2 n) at identical FLOP
  count. MEASURED PERF-NEUTRAL on both entry kernels (vo_eskf 13.2M
  either way, generic live 155.7M either way, v5e A/B): Mosaic already
  overlaps the dependent adds, so these bodies are not
  accumulation-latency-bound. Kept because depth reduction is free and
  principled — do NOT expect it to move a bench (the probe fallacy cuts
  both ways, CLAUDE.md). Returns None when every term is None."""
  terms = [t for t in terms if t is not None]
  if not terms:
    return None
  while len(terms) > 1:
    nxt = [terms[i] + terms[i + 1] for i in range(0, len(terms) - 1, 2)]
    if len(terms) % 2:
      nxt.append(terms[-1])
    terms = nxt
  return terms[0]


def _add_diag_iota(P, scale, diag):
  """P + scale*diag on the diagonal via a broadcasted-iota mask — no
  scatter, no array constants (Mosaic rules). CONTIGUOUS RUNS of equal
  diag values emit ONE range mask each instead of one eq-mask per entry:
  process-noise diagonals are block-structured (e.g. msckf_eskf: 5 runs
  over 36 entries), so this cuts the in-kernel assembly from ~3*d slab
  ops to ~3*runs (~7% of the whole composition frame's FLOPs)."""
  d = P.shape[0]
  bdims = P.ndim - 2
  shape = (d, d) + (1,) * bdims
  i4 = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
  j4 = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
  runs = []  # (lo, hi, value) maximal runs of equal nonzero values
  for k, q in enumerate(diag):
    if runs and runs[-1][1] == k and runs[-1][2] == q:
      runs[-1][1] = k + 1
    else:
      runs.append([k, k + 1, q])
  runs = [r for r in runs if r[2] != 0.0]
  if not runs:
    return P
  qrow = None
  for lo, hi, q in runs:
    if lo == 0 and hi == d:
      mask = jnp.ones((), P.dtype)  # uniform diagonal: no mask needed
      term = q * jnp.broadcast_to(mask, shape)
    else:
      m = (i4 >= lo) if hi == d else (
          (i4 < hi) if lo == 0 else (i4 >= lo) & (i4 < hi))
      term = q * m.astype(P.dtype)
    qrow = term if qrow is None else qrow + term
  D = jnp.where(i4 == j4, qrow, jnp.zeros((), P.dtype))
  return P + scale * D


def entry_predict_slab(spec: FilterSpec, params, x, P, q_diag, dt,
                      structure):
  """Predict on slab state — x (dim_x, *b), P (de, de, *b), dt traced
  scalar, q_diag static tuple — with x_new and the F-taps emitted through
  one shared structural interpreter and F P F^T accumulated entry-by-entry
  over structure.g_cols (F = I + G decomposition, see ops/sparsity
  fpf_masked for the algebra). MSCKF specs (dim_main_err < dim_err) get
  the ekf_c.c:17-29 block form: full propagation on the main block,
  one-sided G on the coupling block, clone block untouched."""
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

  m_dim = spec.dim_main_err
  assert all(k < m_dim for k in structure.g_cols), (
      "MSCKF structure must confine G to the main block", structure.g_cols)

  # hoist row slices out of the accumulation loops: a slice re-evaluated
  # inside the double loop emits a fresh slice+squeeze op pair per use
  # (measured ~1k ops of pure slicing before hoisting)
  P_rows = {k: P[k] for k in structure.g_cols}
  # M = G P, accumulated row-by-row over only the nonzero entries; G lives
  # in the main block, so rows beyond it are zero (tree-summed: the
  # accumulation depth, not the FLOPs, bounds latency-limited bodies)
  m_rows = []
  for i in range(m_dim):
    m_rows.append(_tree_sum(
        [_ent_mul(G[k][i], P_rows[k]) for k in structure.g_cols]))
  # P' = P + M + M^T + N with N = M G^T = G P G^T. M is nonzero only on
  # the rows where G has entries (nz), and N only on (nz x nz), so work
  # on the COMPACT (r, ...) forms (the hand kernel's trick,
  # ops/live_lane.py M0..M2/N0..N2, done here structurally) and assemble
  # through V = M + 0.5 N, P' = P + (V + V^T): equals the old
  # _sym(P + M + M^T + N) exactly (P, N symmetric), so the symmetrization
  # invariant costs nothing extra. For live this cuts predict from ~5.6k
  # to ~3.1k FLOP/lane-step. The MSCKF block form (ekf_c.c:17-29) needs
  # no separate branch: rows outside the main block have no M row, so
  # V + V^T reproduces the one-sided coupling update and leaves the
  # clone block untouched automatically.
  nz = [i for i in range(m_dim) if m_rows[i] is not None]
  if not nz:
    P_new = P
  else:
    M_nz = jnp.stack([m_rows[i] for i in nz])      # (r, de, *b)
    M_cols = {k: M_nz[:, k] for k in structure.g_cols}
    n_cols = []
    for j in nz:  # N columns are nonzero only for j in nz
      acc = _tree_sum([_ent_mul(G[k][j], M_cols[k])
                       for k in structure.g_cols])
      n_cols.append(acc if acc is not None else M_nz[:, 0] * 0.0)
    N_half = 0.5 * jnp.stack(n_cols, axis=1)       # (r, r, *b)
    # V = M + 0.5 N (N spliced into M's nz columns); P' = P + (V + V^T).
    # V + V^T is bitwise symmetric whatever V holds (float add commutes),
    # and adding it to the bitwise-symmetric P preserves exact symmetry —
    # no 0.5 P pass, no sym pass. Contiguous runs of nz give the column
    # splice points.
    runs = []
    for i in nz:
      if runs and runs[-1][1] == i:
        runs[-1][1] = i + 1
      else:
        runs.append([i, i + 1])
    zero_vrow = P[0] * 0.0  # (de, *b), derived from an input (Mosaic rule)
    rows, p = [], 0
    for i in range(de):
      if i >= m_dim or m_rows[i] is None:
        rows.append(zero_vrow)
        continue
      base = m_rows[i]
      nrow = N_half[p]
      p += 1
      segs, prev, q0 = [], 0, 0
      for s, e in runs:
        if s > prev:
          segs.append(base[prev:s])
        segs.append(base[s:e] + nrow[q0:q0 + (e - s)])
        q0 += e - s
        prev = e
      if prev < de:
        segs.append(base[prev:])
      rows.append(jnp.concatenate(segs) if len(segs) > 1 else segs[0])
    V = jnp.stack(rows)
    P_new = P + (V + jnp.swapaxes(V, 0, 1))
  P_new = _add_diag_iota(P_new, dt, q_diag)
  return _normalize_slices_slab(x_new, spec.quaternion_idxs), P_new


def _inv_entries(s, d):
  """Closed-form adjugate inverse on a nested list of scalar (*b) entries —
  lane_bank._inv_small bitwise, without ever stacking S into a (d, d, *b)
  slab that the consumers (gain, gate, Joseph) would immediately re-slice
  entry-by-entry (in a Mosaic kernel each of those slices is a real VREG
  copy). The adjugate of a bitwise-symmetric S is bitwise symmetric."""
  if d == 1:
    return [[1.0 / s[0][0]]]
  if d == 2:
    det = s[0][0] * s[1][1] - s[0][1] * s[1][0]
    return [[s[1][1] / det, (-s[0][1]) / det],
            [(-s[1][0]) / det, s[0][0] / det]]
  if d == 3:
    c = [[s[1][1] * s[2][2] - s[1][2] * s[2][1],
          s[0][2] * s[2][1] - s[0][1] * s[2][2],
          s[0][1] * s[1][2] - s[0][2] * s[1][1]],
         [s[1][2] * s[2][0] - s[1][0] * s[2][2],
          s[0][0] * s[2][2] - s[0][2] * s[2][0],
          s[0][2] * s[1][0] - s[0][0] * s[1][2]],
         [s[1][0] * s[2][1] - s[1][1] * s[2][0],
          s[0][1] * s[2][0] - s[0][0] * s[2][1],
          s[0][0] * s[1][1] - s[0][1] * s[1][0]]]
    det = s[0][0] * c[0][0] + s[0][1] * c[1][0] + s[0][2] * c[2][0]
    return [[c[i][j] / det for j in range(3)] for i in range(3)]
  raise NotImplementedError(f"closed-form inverse only for d<=3, got {d}")


def _normalize_slices_slab(x, idxs):
  for idx in idxs:
    q = x[idx:idx + 4]
    inv = jax.lax.rsqrt(q[0] * q[0] + q[1] * q[1] + q[2] * q[2]
                        + q[3] * q[3])
    x = jnp.concatenate(([x[:idx]] if idx else []) + [q * inv]
                        + ([x[idx + 4:]] if idx + 4 < x.shape[0] else []))
  return x


def entry_update_slab(spec: FilterSpec, kind: int, params, x, P, z, R,
                     gate: bool, structure, ea=None):
  """Measurement update on slab state with the composed H = H·H_mod taps
  (jvp through the error injection, verified by detect_structure) consumed
  entry-by-entry. z (dz, *b); R a (dz, dz) nested static tuple or array.
  Non-feature kinds with real extra args (the pseudorange family) pass
  their per-lane satellite states as ea (ea_len, *b) — the observation h
  consumes them exactly as on the driver/lane paths. Returns
  (x_new, P_new, y)."""
  om = spec.obs[kind]
  assert not om.is_feature, "feature kinds: entry_feature_update_slab"
  dz, de = om.dz, spec.dim_err
  dtype = x.dtype
  zero = x[0] * 0.0
  interp = structural._Interp(zero)

  lx = _sds((spec.dim_x,), dtype)
  cols = structure.cols_for(kind)

  if om.ea_len:
    assert ea is not None and ea.shape[0] == om.ea_len, (
        f"kind {kind} takes {om.ea_len} extra args; got "
        f"{None if ea is None else ea.shape}")
    lea = _sds((om.ea_len,), dtype)

    def fn_h(xx, ee, vv):
      return om.h(params, spec.err(params, xx, vv), ee)

    h_obj, taps = structural.run_entry_taps(fn_h, (lx, lea), (x, ea), de,
                                            dtype, cols, interp)
  else:
    assert ea is None, f"kind {kind} takes no extra args"

    def fn_h(xx, vv):
      return om.h(params, spec.err(params, xx, vv), xx[:1] * 0.0)

    h_obj, taps = structural.run_entry_taps(fn_h, (lx,), (x,), de, dtype,
                                            cols, interp)
  h = interp.materialize(h_obj)
  y = z - h
  y_ent = [y[i] for i in range(dz)]

  zero_row = P[0] * 0.0  # (de, *b)
  # HP = H_err P: row r accumulates over the nonzero (r, c) entries
  # (row slices hoisted — see entry_predict_slab; tree-summed for depth).
  # Everything downstream (S, S^-1, the gain, the Joseph downdate) is
  # consumed at SCALAR-ENTRY granularity: the old spelling stacked HP / S
  # / K into small slabs and immediately re-sliced them entry-by-entry
  # (~90-150 pure slice/squeeze ops per update — measured 489 -> ~350
  # ops for the 3-col camera-rotation update), which in a Mosaic kernel
  # are real VREG copies, not free metadata. The algebra below is the
  # same-term-order reassociation of _inv_small + _mm_l + joseph_sym on
  # entries; the only value change vs the slab spelling is that S's
  # mirror entries are now SHARED (bitwise-symmetric S) instead of two
  # independent f32 summations — within each path's own roundoff.
  P_rows = {c: P[c] for c in cols}
  hp_rows = [
      _tree_sum([_ent_mul(taps[c][r], P_rows[c]) for c in cols])
      for r in range(dz)]
  hp_ent = {(r, c): (hp_rows[r][c] if hp_rows[r] is not None else None)
            for r in range(dz) for c in cols}

  # S = HP H^T + R: S[r, s] = sum_c HP[r, c] * H[s, c], kept as entries.
  # S is exactly symmetric in exact arithmetic; computing only the upper
  # triangle and SHARING the entry across (r, s)/(s, r) saves
  # dz(dz-1)/2 * nc multiply-adds AND makes S (hence its adjugate
  # inverse) bitwise symmetric — the two-triangle spelling computed each
  # mirror pair as a different f32 summation.
  s_ent = [[None] * dz for _ in range(dz)]
  r_tuple = isinstance(R, tuple)
  if r_tuple:
    assert all(R[i][j] == R[j][i] for i in range(dz) for j in range(dz)), \
        "measurement noise R must be symmetric"
  elif R.ndim == 2:
    R = R.reshape(R.shape + (1,) * (x.ndim - 1))
  for r in range(dz):
    for s in range(r, dz):
      acc = _tree_sum([_ent_mul(taps[c][s], hp_ent[r, c]) for c in cols])
      acc = acc if acc is not None else zero * 0.0
      if r_tuple:
        if R[r][s] != 0.0:
          acc = acc + R[r][s]
      else:
        acc = acc + R[r, s]
      s_ent[r][s] = acc
      s_ent[s][r] = acc

  siv = _inv_entries(s_ent, dz)
  # K^T = S^-1 H P (S, S^-1 symmetric): row i = sum_j siv[i][j] * HP[j]
  kt_rows = [sum(siv[i][j] * hp_rows[j] for j in range(dz)
                 if hp_rows[j] is not None) for i in range(dz)]
  if gate:
    dist = sum(y_ent[i] * siv[i][j] * y_ent[j]
               for i in range(dz) for j in range(dz))
    rej = dist[None] > om.maha_thresh
    kt_rows = [jnp.where(rej, 0.0, kt) for kt in kt_rows]
  dx = sum(kt_rows[i] * y_ent[i][None] for i in range(dz))

  # factored Joseph downdate on entries (live_lane.joseph_sym):
  # W = K (0.5 S K^T - HP); P' = P + (W + W^T) is exactly symmetric
  t_rows = [0.5 * sum(s_ent[i][j] * kt_rows[j] for j in range(dz))
            - (hp_rows[i] if hp_rows[i] is not None else zero_row)
            for i in range(dz)]
  W = sum(kt_rows[i][:, None] * t_rows[i][None] for i in range(dz))
  P_new = P + (W + jnp.swapaxes(W, 0, 1))

  # error injection through the interpreter (dx is a plain traced slab —
  # nothing folds, but the emission is scalarized and memo-shared with h)
  ldx = _sds((de,), dtype)
  x_obj = structural.run_primal(
      lambda xx, dd: spec.err(params, xx, dd), (lx, ldx), (x, dx), interp)
  x_new = interp.materialize(x_obj[0])
  return _normalize_slices_slab(x_new, spec.quaternion_idxs), P_new, y


def entry_feature_innovation_slab(spec: FilterSpec, kind: int, params, x,
                                  P, z, r_mat, ea, structure=None):
  """First half of the MSCKF feature update: entry taps for the composed H
  (w.r.t. the error state) and He (w.r.t. the feature position), the
  unrolled Householder projection onto null(He^T), and the projected
  innovation quantities. Returns (yp (dz', *b), HP (dz', de, *b),
  S (dz', dz', *b)) — everything entry_feature_apply_slab needs to finish
  the update. Split out so the VO kernel can put each half in its own
  Mosaic region (lax.switch phase dispatch, ops/pallas_bank._vo_kernel):
  the flat 36-dim composition body is ~4.4k jaxpr ops, past the compile
  budget, while each half stays under it."""
  from rednose_tpu.ops.lane_bank import _apply_qt, _householder_qt

  om = spec.obs[kind]
  assert om.is_feature
  dz, me, de = om.dz, om.ea_dim, spec.dim_err
  dtype = x.dtype
  zero = x[0] * 0.0
  interp = structural._Interp(zero)

  lx = _sds((spec.dim_x,), dtype)
  lea = _sds((om.ea_len,), dtype)

  # composed H_err = d h(err(x, v), ea) / d v at v = 0, restricted to the
  # detected nonzero column support when a structure is available (the
  # feature h touches only the clone window, not the whole error state)
  cols = tuple(range(de))
  if structure is not None:
    try:
      cols = structure.cols_for(kind)
    except KeyError:
      pass
  nc = len(cols)

  def fn_h(xx, ee, vv):
    return om.h(params, spec.err(params, xx, vv), ee)

  h_obj, taps = structural.run_entry_taps(fn_h, (lx, lea), (x, ea), de,
                                          dtype, cols, interp)
  h = interp.materialize(h_obj)
  Hobj = np.empty((dz, nc), dtype=object)
  for j, c in enumerate(cols):
    for r in range(dz):
      Hobj[r, j] = taps[c][r]
  H = interp.materialize(Hobj)  # (dz, nc, *b)

  # He = d h / d ea, ea_dim columns
  def fn_e(xx, ee, ww):
    return om.h(params, xx, ee + ww)

  _, etaps = structural.run_entry_taps(fn_e, (lx, lea), (x, ea),
                                       om.ea_len, dtype, tuple(range(me)),
                                       interp)
  Heobj = np.empty((dz, me), dtype=object)
  for c in range(me):
    for r in range(dz):
      Heobj[r, c] = etaps[c][r]
  He = interp.materialize(Heobj)  # (dz, me, *b)

  y = z - h
  refl = _householder_qt(He)
  yp = _apply_qt(refl, y[:, None])[me:, 0]          # (dz', *b)
  Hp = _apply_qt(refl, H)[me:]                       # (dz', nc, *b)

  dzp = dz - me
  # HP = H_err P over the nonzero columns only (slices hoisted;
  # tree-summed — the 24-term left fold was the composition's critical
  # path, see _tree_sum)
  P_rows = {c: P[c] for c in cols}
  Hp_cols = [Hp[:, j] for j in range(nc)]            # each (dz', *b)
  HP = _tree_sum([Hp_cols[j][:, None] * P_rows[cols[j]][None]
                  for j in range(nc)])               # (dz', de, *b)
  HP_cols = {c: HP[:, c] for c in cols}
  S_hp = _tree_sum([HP_cols[cols[j]][:, None] * Hp_cols[j][None]
                    for j in range(nc)])             # (dz', dz', *b)

  # projected noise Q^T R Q: for the (usual) isotropic R = s^2 I it is
  # EXACTLY s^2 I — skip two Householder applications on (dz, dz) slabs
  diag0 = r_mat[0][0]
  isotropic = all(
      r_mat[i][j] == (diag0 if i == j else 0.0)
      for i in range(dz) for j in range(dz))
  if isotropic:
    S = _add_diag_iota(S_hp, 1.0, (diag0,) * dzp)
  else:
    Robj = np.empty((dz, dz), dtype=object)
    for i in range(dz):
      for j in range(dz):
        Robj[i, j] = r_mat[i][j] if r_mat[i][j] != 0.0 else None
    Rb = interp.materialize(Robj)                    # (dz, dz, *b)
    T1 = _apply_qt(refl, Rb)
    Rp = _apply_qt(refl, jnp.swapaxes(T1, 0, 1))[me:, me:]
    S = S_hp + _sym(Rp)
  return yp, HP, S


def _mm_outer(Kt, T, k):
  """(k, m, *b)^T @ (k, n, *b) -> (m, n, *b) as a k-term outer-product
  accumulation — _mm_l(K, T, k) without ever materializing the (m, k, *b)
  transpose of Kt (leading-dim transposes are physical VMEM copies in
  Mosaic kernels)."""
  return sum(Kt[i][:, None] * T[i][None] for i in range(k))


def _symW(W):
  """W + W^T — bitwise symmetric for ANY W (float add commutes)."""
  return W + jnp.swapaxes(W, 0, 1)


def joseph_sym_augment(spec: FilterSpec, P, Kt, HP, S, k):
  """Factored Joseph downdate (live_lane.joseph_sym) with the MSCKF window
  augmentation folded into the output assembly: emits
  augment_slab(joseph_sym(P, K, HP, S, k)) BITWISE in one pass over P.

  The separate augment_slab materializes the updated P, re-slices it into
  Pr, concatenates the duplicated pose block, and runs a 3-op _sym pass —
  two extra full-covariance VMEM round trips per frame that are pure data
  movement (VERDICT r4: the window roll is the VO kernel's FLOP-invisible
  tax). Here the updated value B = P + (W + W^T) is only ever formed on
  the KEPT rows (the dropped oldest-clone block's arithmetic is skipped),
  the column permutation rides the same concatenate, and the duplicated
  newest-clone rows reuse the assembled top rows. _sym is dropped because
  it is the bitwise identity here: P is bitwise symmetric by the carry
  invariant, W + W^T is bitwise symmetric for ANY W (float add commutes),
  and block-assembling a bitwise-symmetric B preserves that — the old
  _sym computed 0.5*(x + x) == x exactly. Takes the gain TRANSPOSED
  (Kt = S^{-1} H P, exactly as the solve produces it): both products
  consume Kt rows directly, so no transpose is ever materialized."""
  d2, d4, de = spec.dim_main_err, spec.dim_augment_err, spec.dim_err
  T = 0.5 * _mm_l(S, Kt, k) - HP                      # (k, de, *b)
  W = _mm_outer(Kt, T, k)
  Wsym = W + jnp.swapaxes(W, 0, 1)
  # updated covariance on the kept rows only ([0:d2) main, [d2+d4:) clones)
  Bk = jnp.concatenate([P[:d2] + Wsym[:d2],
                        P[d2 + d4:] + Wsym[d2 + d4:]])     # (de-d4, de, *b)
  # drop the oldest clone's columns, append the duplicated pose columns
  top = jnp.concatenate([Bk[:, :d2], Bk[:, d2 + d4:], Bk[:, :d4]], axis=1)
  # the newest clone's rows duplicate the already-assembled pose rows
  return jnp.concatenate([top, top[:d4]])


def entry_feature_apply_slab(spec: FilterSpec, kind: int, params, x, P,
                             yp, HP, S, gate: bool, augment: bool = False):
  """Second half of the MSCKF feature update: lane Cholesky solve at the
  projected dimension, Mahalanobis zero-gain gate, factored Joseph
  downdate, and error injection. Consumes
  entry_feature_innovation_slab's (yp, HP, S); returns (x, P, yp).

  augment=True folds the MSCKF window augmentation into the covariance
  assembly (joseph_sym_augment) and the state roll into the injection
  output — bitwise augment_slab(entry_feature_apply_slab(...)) without
  the extra covariance passes.

  The gain solve stays the lane Cholesky: replacing it with a closed-form
  Schur-block inverse (3x3 adjugate + Schur complement + one Newton
  refinement) — the VERDICT-r4 ILP hypothesis, trading the serial
  substitution chains for instruction-level-parallel products — A/B'd
  EXACTLY even on TPU (33.01 vs 32.99 ms, B=4096, same chip session)
  while costing ~4x f32 solve accuracy un-refined and +155 Mosaic body
  ops refined: the kernel is not dependency-chain-bound at these shapes
  (PARITY.md round 5). The gain is consumed TRANSPOSED throughout
  (Kt = S^{-1} H P, exactly as the solve produces it): gate, dx, and
  both Joseph forms take Kt rows, so the (de, dz') transpose the old
  spelling materialized is gone."""
  from rednose_tpu.ops.lane_bank import cho_solve_lane, cholesky_lane

  om = spec.obs[kind]
  de = spec.dim_err
  dzp = om.dz - om.ea_dim
  dtype = x.dtype
  zero = x[0] * 0.0
  interp = structural._Interp(zero)
  lx = _sds((spec.dim_x,), dtype)

  L = cholesky_lane(S)
  Kt = cho_solve_lane(L, HP)                         # S^{-1} H P = K^T
  if gate:
    sy = cho_solve_lane(L, yp[:, None])
    dist = sum(yp[i] * sy[i, 0] for i in range(dzp))
    Kt = jnp.where(dist[None, None] > om.maha_thresh, 0.0, Kt)
  dx = sum(Kt[i] * yp[i][None] for i in range(dzp))

  if augment:
    P_new = joseph_sym_augment(spec, P, Kt, HP, S, dzp)
  else:
    P_new = P + _symW(_mm_outer(Kt, 0.5 * _mm_l(S, Kt, dzp) - HP, dzp))

  ldx = _sds((de,), dtype)
  x_obj = structural.run_primal(
      lambda xx, dd: spec.err(params, xx, dd), (lx, ldx), (x, dx), interp)
  x_new = interp.materialize(x_obj[0])
  x_new = _normalize_slices_slab(x_new, spec.quaternion_idxs)
  if augment:
    d1, d3 = spec.dim_main, spec.dim_augment
    x_new = jnp.concatenate([x_new[:d1], x_new[d1 + d3:], x_new[:d3]])
  return x_new, P_new, yp


def entry_feature_update_slab(spec: FilterSpec, kind: int, params, x, P,
                              z, r_mat, gate: bool, ea, structure=None):
  """MSCKF feature-track update on slab state, kernel-lowerable:
  innovation half (taps + Householder projection) then apply half
  (Cholesky solve + Joseph + error injection) — templates/ekf_c.c's
  feature path (66-77) inside the same hot kernel as everything else.

  x (dim_x, *b), P (de, de, *b), z (dz, *b), ea (ea_len, *b) per-lane
  feature positions, r_mat static nested tuple. Returns (x, P, y) with y
  the PROJECTED innovation (basis differs from core/step's QR-complete
  basis by a rotation; x/P parity is exact — see ops/lane_bank)."""
  yp, HP, S = entry_feature_innovation_slab(spec, kind, params, x, P, z,
                                            r_mat, ea, structure=structure)
  return entry_feature_apply_slab(spec, kind, params, x, P, yp, HP, S,
                                  gate)


def entry_step_slab(spec: FilterSpec, kind: int, params, x, P, z, q_diag,
                   r_mat, dt, structure, gate: bool = False, ea=None):
  """One fused predict + update (the kernel-body hot path)."""
  x, P = entry_predict_slab(spec, params, x, P, q_diag, dt, structure)
  return entry_update_slab(spec, kind, params, x, P, z, r_mat, gate,
                           structure, ea=ea)


def entry_vo_frame_slab(spec: FilterSpec, kind: int, params, x, P, z, ea,
                        q_diag, r_mat, dt, structure, gate: bool = False):
  """One banked-VO frame: MSCKF block predict + nullspace-projected
  feature update + window augmentation (folded into the covariance
  assembly, joseph_sym_augment), all kernel-lowerable."""
  x, P = entry_predict_slab(spec, params, x, P, q_diag, dt, structure)
  yp, HP, S = entry_feature_innovation_slab(spec, kind, params, x, P, z,
                                            r_mat, ea, structure=structure)
  x, P, _ = entry_feature_apply_slab(spec, kind, params, x, P, yp, HP, S,
                                     gate, augment=True)
  return x, P


def entry_vo_frame_branches(spec: FilterSpec, kind: int, params, q_diag,
                            r_mat, structure, gate: bool,
                            n_phases: int = 3):
  """The VO frame as lax.switch phase branches with one shared signature
  — (x, P, yp, HP, S, z, ea, dt) -> (x, P, yp, HP, S) — so the VO kernel
  can run one frame as fori_loop(0, n) over a phase switch and Mosaic
  compiles each phase as its own region. The flat composition body
  (models/msckf_eskf: 36-dim error state, 4.4k jaxpr ops) is past the
  Mosaic compile budget; with n_phases=3 (predict / innovation /
  apply+augment) the largest phase (~2.5k) matches the proven GNSS
  flat-epoch size. n_phases=2 folds predict into the innovation phase
  (~3.3k — above the soft budget but below the observed OOM point) to
  trade compile headroom for one fewer region boundary. Semantics are
  exactly entry_vo_frame_slab's (parity: tests/test_entry_slab.py)."""

  def predict_phase(x, P, yp, HP, S, z, ea, dt):
    x, P = entry_predict_slab(spec, params, x, P, q_diag, dt, structure)
    return x, P, yp, HP, S

  def innovation_phase(x, P, yp, HP, S, z, ea, dt):
    yp, HP, S = entry_feature_innovation_slab(spec, kind, params, x, P, z,
                                              r_mat, ea,
                                              structure=structure)
    return x, P, yp, HP, S

  def predict_innovation_phase(x, P, yp, HP, S, z, ea, dt):
    x, P = entry_predict_slab(spec, params, x, P, q_diag, dt, structure)
    yp, HP, S = entry_feature_innovation_slab(spec, kind, params, x, P, z,
                                              r_mat, ea,
                                              structure=structure)
    return x, P, yp, HP, S

  def apply_phase(x, P, yp, HP, S, z, ea, dt):
    x, P, _ = entry_feature_apply_slab(spec, kind, params, x, P, yp, HP,
                                       S, gate, augment=True)
    return x, P, yp, HP, S

  if n_phases == 2:
    return (predict_innovation_phase, apply_phase)
  return (predict_phase, innovation_phase, apply_phase)
