"""Lane-major generic filter banks: any spec, near-VPU-speed covariance math.

The straightforward bank (runtime/bank.py: vmap over a leading batch axis)
leaves XLA to execute batched 22x22 matmuls, which it does at <1% of peak —
tiny matrices can't tile the 128x128 MXU, and in-loop-produced operands get
poor layouts. This module restructures the SAME math the way the kinematic
Pallas kernel does, generalized to any FilterSpec:

  * covariance lives as (d, d, B) with the bank axis B on vector lanes,
  * every small-matrix product is unrolled into broadcast multiply-adds over
    (d, d, B) slabs — pure elementwise VPU work, no MXU, no layout traps
    (measured 1.36 TFLOP/s vs 0.43 for batched einsum on v5e),
  * innovation covariance S is inverted in closed form for dz <= 3 (every
    shipped kind; the reference hardcodes the same bound, ekf_sym.py:151).

Semantics are identical to core/step.py (same Joseph form, Mahalanobis gate,
ESKF H_mod chain) — parity is asserted in tests/test_lane_bank.py. MSCKF
feature kinds run at bank speed too: per-lane Householder nullspace
projection + blocked lane Cholesky (lane_update below; parity in
tests/test_lane_msckf.py).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from rednose_tpu.core.spec import FilterSpec
from rednose_tpu.ops.quaternion import normalize_slices
from rednose_tpu.ops.sparsity import composed_h_jvp, f_columns, fpf_masked

Array = Any


def _matmul_ll(A, B_):
  """(m, k, B) @ (k, n, B) -> (m, n, B), unrolled over k."""
  k = A.shape[1]
  return sum(A[:, i, None, :] * B_[None, i, :, :] for i in range(k))


def _matmul_lt(A, B_):
  """(m, k, B) @ (n, k, B)^T -> (m, n, B), unrolled over k."""
  k = A.shape[1]
  return sum(A[:, i, None, :] * B_[None, :, i, :] for i in range(k))


def _sym(P):
  return 0.5 * (P + jnp.swapaxes(P, 0, 1))


def _inv_small(S):
  """Closed-form inverse of (d, d, B) for d <= 3 (adjugate), elementwise on
  lanes — the TPU replacement for the reference's Eigen LU (ekf_c.c:101)."""
  d = S.shape[0]
  if d == 1:
    return 1.0 / S
  if d == 2:
    det = S[0, 0] * S[1, 1] - S[0, 1] * S[1, 0]
    row0 = jnp.stack([S[1, 1], -S[0, 1]])
    row1 = jnp.stack([-S[1, 0], S[0, 0]])
    return jnp.stack([row0, row1]) / det
  if d == 3:
    c = [[S[1, 1] * S[2, 2] - S[1, 2] * S[2, 1],
          S[0, 2] * S[2, 1] - S[0, 1] * S[2, 2],
          S[0, 1] * S[1, 2] - S[0, 2] * S[1, 1]],
         [S[1, 2] * S[2, 0] - S[1, 0] * S[2, 2],
          S[0, 0] * S[2, 2] - S[0, 2] * S[2, 0],
          S[0, 2] * S[1, 0] - S[0, 0] * S[1, 2]],
         [S[1, 0] * S[2, 1] - S[1, 1] * S[2, 0],
          S[0, 1] * S[2, 0] - S[0, 0] * S[2, 1],
          S[0, 0] * S[1, 1] - S[0, 1] * S[1, 0]]]
    det = S[0, 0] * c[0][0] + S[0, 1] * c[1][0] + S[0, 2] * c[2][0]
    return jnp.stack([jnp.stack(row) for row in c]) / det
  raise NotImplementedError(f"closed-form inverse only for d<=3, got {d}")


def cholesky_lane(A):
  """Column-slab Cholesky factorization of SPD (d, d, B) lane-major matrices.

  Batched LAPACK-style factorizations serialize on TPU's scalar unit; this
  unrolls over columns only — each step updates a whole (d-j, B) slab, so the
  traced graph stays O(d^2) ops while the arithmetic is d^3/3 broadcast
  multiply-adds on lanes. Returns the list-of-rows lower factor used by
  cho_solve_lane (A = L L^T)."""
  d = A.shape[0]
  cols = []  # cols[j]: (d - j, B) — column j from the diagonal down
  for j in range(d):
    s = A[j:, j]
    for k in range(j):
      s = s - cols[k][j - k:] * cols[k][j - k][None]
    diag = jnp.sqrt(s[0])
    # zero-size concat operands don't lower in Mosaic: last column is 1-high
    cols.append(jnp.concatenate([diag[None], s[1:] / diag[None]], axis=0)
                if j + 1 < d else diag[None])
  return cols


def cho_solve_lane(cols, B_):
  """Solve A X = B with A = L L^T from cholesky_lane; B_ is (d, m, B).
  Forward/back substitution vectorized over the m right-hand sides."""
  d = len(cols)
  # forward: L Y = B, Y[i] is (m, B)
  Y = [None] * d
  for i in range(d):
    s = B_[i]
    for k in range(i):
      s = s - cols[k][i - k][None] * Y[k]
    Y[i] = s / cols[i][0][None]
  # backward: L^T X = Y
  X = [None] * d
  for i in reversed(range(d)):
    s = Y[i]
    for k in range(i + 1, d):
      s = s - cols[i][k - i][None] * X[k]
    X[i] = s / cols[i][0][None]
  return jnp.stack(X)


def cholesky_lane_blocked(A, r: int = 8):
  """Blocked right-looking Cholesky of SPD (d, d, B) lane-major matrices.

  cholesky_lane's column-at-a-time unroll has a ~d^2/2-deep chain of
  dependent slab ops — serial-latency-bound on the VPU (CLAUDE.md). This
  blocks the factorization: per r-wide panel, an unrolled r x r diagonal
  factor + r-step panel substitution + ONE rank-r trailing update, cutting
  the critical path by ~r/2 while keeping every op a big lane slab.
  Returns the DENSE lower factor (d, d, B) consumed by
  cho_solve_lane_blocked."""
  d = A.shape[0]
  S = A  # trailing submatrix, shrinking by r each panel
  panels = []
  for b0 in range(0, d, r):
    rr = min(r, d - b0)
    Ablk = S[:rr, :rr]
    # unrolled small Cholesky of the diagonal block: Ld[j] = column j from
    # the diagonal down, (rr - j, B)
    Ld = []
    for j in range(rr):
      s = Ablk[j:, j]
      for k in range(j):
        s = s - Ld[k][j - k:] * Ld[k][j - k][None]
      diag = jnp.sqrt(s[0])
      Ld.append(jnp.concatenate([diag[None], s[1:] / diag[None]], axis=0)
                if j + 1 < rr else diag[None])
    # panel below the diagonal block: solve Lp Ld^T = P  (forward columns)
    Lp_cols = []
    if rr < S.shape[0]:
      Pn = S[rr:, :rr]  # (n, rr, B)
      for j in range(rr):
        s = Pn[:, j]
        for k in range(j):
          s = s - Lp_cols[k] * Ld[k][j - k][None]
        Lp_cols.append(s / Ld[j][0][None])
    # assemble this panel's dense (d - b0, rr, B) block column
    dcol = jnp.stack(
        [jnp.concatenate([jnp.zeros((j,) + Ld[j].shape[1:], A.dtype),
                          Ld[j]]) if j else Ld[0] for j in range(rr)],
        axis=1)
    if Lp_cols:
      Lp = jnp.stack(Lp_cols, axis=1)  # (n, rr, B)
      panel = jnp.concatenate([dcol, Lp], axis=0)
      # rank-r trailing update: ONE slab contraction
      S = S[rr:, rr:] - _matmul_lt(Lp, Lp)
    else:
      panel = dcol
    panels.append(panel)
  # pad each panel to full height and concatenate into the dense factor
  full = []
  for b0, panel in zip(range(0, d, r), panels):
    if b0:
      panel = jnp.concatenate(
          [jnp.zeros((b0,) + panel.shape[1:], A.dtype), panel])
    full.append(panel)
  return jnp.concatenate(full, axis=1)


def cho_solve_lane_blocked(L, B_, r: int = 8):
  """Solve A X = B with A = L L^T from cholesky_lane_blocked; B_ (d, m, B).
  Blocked forward/backward substitution: per panel, one slab contraction
  for the cross-panel correction + an unrolled r-step small substitution."""
  d = L.shape[0]
  # forward: L Y = B
  Y_blocks = []
  for b0 in range(0, d, r):
    rr = min(r, d - b0)
    s = B_[b0:b0 + rr]
    if Y_blocks:
      Yprev = jnp.concatenate(Y_blocks)  # (b0, m, B)
      s = s - _matmul_ll(L[b0:b0 + rr, :b0], Yprev)
    rows = []
    for i in range(rr):
      si = s[i]
      for k in range(i):
        si = si - L[b0 + i, b0 + k][None] * rows[k]
      rows.append(si / L[b0 + i, b0 + i][None])
    Y_blocks.append(jnp.stack(rows))
  Y = jnp.concatenate(Y_blocks)
  # backward: L^T X = Y
  X_blocks = []
  starts = list(range(0, d, r))
  for b0 in reversed(starts):
    rr = min(r, d - b0)
    s = Y[b0:b0 + rr]
    if X_blocks:
      Xnext = jnp.concatenate(X_blocks)  # rows b0+rr ... d
      # (L^T)[b0:b0+rr, b0+rr:] @ Xnext = L[b0+rr:, b0:b0+rr]^T @ Xnext
      s = s - _matmul_ll(jnp.swapaxes(L[b0 + rr:, b0:b0 + rr], 0, 1),
                         Xnext)
    rows = [None] * rr
    for i in reversed(range(rr)):
      si = s[i]
      for k in range(i + 1, rr):
        si = si - L[b0 + k, b0 + i][None] * rows[k]
      rows[i] = si / L[b0 + i, b0 + i][None]
    X_blocks = [jnp.stack(rows)] + X_blocks
  return jnp.concatenate(X_blocks)


def lane_predict(spec: FilterSpec, params, x, P, Q, dt, structure=None):
  """Bank predict: x (B, dim_x), P (dim_err, dim_err, B) lane-major.

  Implements ekf_c.c:8-33 semantics, INCLUDING the MSCKF block form: for
  specs with clone states (dim_main_err < dim_err) only the main block
  gets F P F^T, the coupling blocks get one-sided F products, and the
  clone block passes through (the clone states are static). With a
  detected `structure` (ops/sparsity.SpecStructure) the F P F^T products
  unroll only F's structurally nonzero entries — the automated analog of
  the hand-derived live fast path (ops/live_lane.py)."""
  with jax.default_matmul_precision('float32'):
    return _lane_predict(spec, params, x, P, Q, dt, structure)


def _lane_predict(spec, params, x, P, Q, dt, structure):
  # small `@`s in user model code (quat products, rotations) and inside
  # jacfwd otherwise run bf16 on TPU — covariance-corrupting (CLAUDE.md);
  # the Pallas kernels scalarize them via unroll_dots, so without this
  # guard the lane and kernel paths DIVERGE on TPU (seen at ~2e-2 on the
  # ESKFxMSCKF composition over 32 frames)
  x_new = jax.vmap(lambda xx: spec.f(params, xx, dt))(x)
  m = spec.dim_main_err
  if m < spec.dim_err:
    # MSCKF block propagation (ekf_c.c:17-29), lane-major
    if spec.F_lane is not None:
      Fm = spec.F_lane(params, x.T, dt)[:m, :m]
    else:
      Fm = jax.vmap(lambda xx: spec.F(params, xx, dt)[:m, :m],
                    out_axes=2)(x)
    TL = _matmul_lt(_matmul_ll(Fm, P[:m, :m]), Fm)
    TR = _matmul_ll(Fm, P[:m, m:])
    P_new = jnp.concatenate([
        jnp.concatenate([TL, TR], axis=1),
        jnp.concatenate([jnp.swapaxes(TR, 0, 1), P[m:, m:]], axis=1),
    ])
    P_new = _sym(P_new) + (dt * Q)[:, :, None]
    x_new = jax.vmap(
        lambda xx: normalize_slices(xx, spec.quaternion_idxs))(x_new)
    return x_new, P_new
  if structure is None:
    # per-step vmap(jacfwd) of rotation-chain dynamics is ~95% of this
    # predict's cost; use the spec's closed-form F when it ships one
    if spec.F_lane is not None:
      F = spec.F_lane(params, x.T, dt)                              # (d,d,B)
    else:
      F = jax.vmap(lambda xx: spec.F(params, xx, dt), out_axes=2)(x)
    P_new = _matmul_lt(_matmul_ll(F, P), F)
  else:
    Fc = jax.vmap(
        lambda xx: f_columns(spec, params, xx, dt, structure.g_cols),
        out_axes=1)(x)  # {col: (d, B)}
    P_new = fpf_masked(Fc, P, structure.g_cols)
  P_new = _sym(P_new) + (dt * Q)[:, :, None]
  x_new = jax.vmap(lambda xx: normalize_slices(xx, spec.quaternion_idxs))(x_new)
  return x_new, P_new


def _householder_qt(He):
  """Householder reflectors of the thin QR of He (dz, m, B) lane-major.

  Returns [(j, v, beta)] such that applying them in order left-multiplies
  by Q^T (see _apply_qt). m is small (3 for every shipped feature kind),
  so the factorization unrolls to a few dozen slab ops — the lane answer
  to the reference's per-measurement Eigen fullPivLu().kernel()
  (templates/ekf_c.c:66-70). A structurally rank-deficient He column gets
  beta = 0 (its reflector degenerates to the identity) instead of the
  reference's dynamic nullspace-failure branch (ekf_sym.py:588-591); the
  Mahalanobis gate is the backstop for the garbage measurement that
  implies."""
  dz, m = He.shape[0], He.shape[1]
  cols = [He[:, k] for k in range(m)]  # each (dz, B)
  refl = []
  for j in range(m):
    cj = cols[j]
    c = [cj[i] for i in range(j, dz)]  # hoisted elements (each (B,))
    sigma = sum(ci * ci for ci in c)
    norm = jnp.sqrt(sigma)
    sign = jnp.where(c[0] >= 0, 1.0, -1.0)
    alpha = -sign * norm
    v0 = c[0] - alpha
    v = jnp.concatenate([v0[None]] + [ci[None] for ci in c[1:]])
    ve = [v0] + c[1:]  # hoisted v elements: _apply_qt re-uses them
    vtv = sigma - c[0] * c[0] + v0 * v0
    beta = jnp.where(vtv > 0, 2.0 / jnp.where(vtv > 0, vtv, 1.0), 0.0)
    refl.append((j, v, beta, ve))
    for k in range(j + 1, m):
      ck = cols[k]
      w = sum(ve[i] * ck[j + i] for i in range(dz - j))  # (B,)
      tail = ck[j:] - (beta * w)[None] * v
      # zero-size concat operands don't lower in Mosaic: guard j == 0
      cols[k] = jnp.concatenate([ck[:j], tail]) if j else tail
  return refl


def _apply_qt(refl, M):
  """Left-multiply M (dz, n, B) by Q^T via the Householder reflectors
  (element slices hoisted in _householder_qt — a slice per use would emit
  ~100 extra Mosaic ops per application, see CLAUDE.md)."""
  for j, v, beta, ve in refl:
    sub = M[j:]  # (dz - j, n, B)
    w = sum(ve[i][None] * sub[i] for i in range(sub.shape[0]))  # (n, B)
    sub = sub - (beta[None] * w)[None] * v[:, None]
    M = jnp.concatenate([M[:j], sub]) if j else sub
  return M


def _solve_spd_lane(S, B_):
  """S^{-1} B for SPD lane-major S (d, d, B): closed-form adjugate for
  d <= 3, column-slab Cholesky otherwise (projected MSCKF feature updates
  have d = dz - ea_dim > 3)."""
  if S.shape[0] <= 3:
    return _matmul_ll(_inv_small(S), B_)
  return cho_solve_lane(cholesky_lane(S), B_)


def lane_update(spec: FilterSpec, kind: int, params, x, P, z, R,
                structure=None, ea=None):
  """Bank update: z (B, dz), R (dz, dz) shared or (dz, dz, B) lane-major.

  Same math as core/step.py update (innovation, ESKF H.H_mod, Mahalanobis
  zero-gain gate, closed-form S^-1, Joseph form), restructured lane-major.
  With a detected `structure`, the composed H_err columns come from
  jax.jvp through the error injection (only the structurally nonzero
  columns) and the Joseph form is expanded exactly to
  P - K(HP) - (HP)^T K^T + K S K^T, cutting the two dense de^3 products to
  de^2 dz (see ops/live_lane.py for the algebra).
  """
  with jax.default_matmul_precision('float32'):  # see _lane_predict note
    return _lane_update(spec, kind, params, x, P, z, R, structure, ea)


def _lane_update(spec, kind, params, x, P, z, R, structure, ea):
  om = spec.obs[kind]
  dz, de = om.dz, spec.dim_err
  ea0 = jnp.zeros((max(om.ea_len, 1),), dtype=x.dtype)

  if R.ndim == 2:
    R = R[:, :, None]

  assert ea is not None or om.ea_len == 0, (
      f"kind {kind} takes real extra args (ea_len={om.ea_len}); pass "
      "ea=(B, ea_len) — a zeros placeholder would silently evaluate h at "
      "the origin")
  if om.is_feature:
    # MSCKF feature-track update at bank speed: per-lane He, an unrolled
    # Householder projection onto null(He^T), then the ordinary slab
    # update at the projected dimension dz' = dz - ea_dim (the reference
    # handles feature kinds in the same hot kernel, ekf_c.c:66-77).
    assert ea is not None, "feature kinds need per-lane extra args (B, ea_len)"
    B = x.shape[0]
    h = jax.vmap(lambda xx, ee: om.h(params, xx, ee), out_axes=1)(x, ea)
    H_raw = jax.vmap(lambda xx, ee: spec.H(kind, params, xx, ee),
                     out_axes=2)(x, ea)          # (dz, dim_x, B)
    He = jax.vmap(lambda xx, ee: spec.He(kind, params, xx, ee),
                  out_axes=2)(x, ea)             # (dz, ea_dim, B)
    if spec.is_eskf:
      Hm = jax.vmap(lambda xx: spec.H_mod_at(params, xx), out_axes=2)(x)
      H = _matmul_ll(H_raw, Hm)                  # (dz, de, B)
    else:
      H = H_raw
    me = om.ea_dim
    refl = _householder_qt(He)
    # A = Q[:, me:] is an orthonormal left-nullspace basis of He; the
    # update is invariant to the basis choice (core/step.py uses a QR
    # complete basis — x/P parity holds, innovations differ by a rotation)
    y = _apply_qt(refl, (z.T - h)[:, None])[me:, 0]     # (dz', B)
    H = _apply_qt(refl, H)[me:]                          # (dz', de, B)
    Rb = jnp.broadcast_to(R, (dz, dz, B))
    T1 = _apply_qt(refl, Rb)                             # Q^T R
    Rp = _apply_qt(refl, jnp.swapaxes(T1, 0, 1))[me:, me:]  # Q^T R Q
    HP = _matmul_lt(H, P)                                # (dz', de, B)
    S = _matmul_lt(HP, H) + _sym(Rp)
    Kt = _solve_spd_lane(S, HP)                          # S^{-1} H P = K^T
    K = jnp.swapaxes(Kt, 0, 1)                           # (de, dz', B)
    dzp = dz - me
    if om.maha_test:
      sy = _solve_spd_lane(S, y[:, None])                # (dz', 1, B)
      dist = sum(y[i] * sy[i, 0] for i in range(dzp))
      K = jnp.where(dist[None, None, :] > om.maha_thresh, 0.0, K)
    dx = sum(K[:, i, :] * y[i][None, :] for i in range(dzp))
    # factored P + (W + W^T) assembly of the symmetrized Joseph downdate,
    # W = K (0.5 S K^T - HP) — exact algebra, exactly symmetric (float add
    # commutes), one (de, de) product instead of two (live_lane.joseph_sym)
    T_ = 0.5 * _matmul_ll(S, jnp.swapaxes(K, 0, 1)) - HP
    W = _matmul_ll(K, T_)
    P_new = P + (W + jnp.swapaxes(W, 0, 1))
    x_new = jax.vmap(lambda xx, d: spec.err(params, xx, d))(x, dx.T)
    x_new = jax.vmap(
        lambda xx: normalize_slices(xx, spec.quaternion_idxs))(x_new)
    return x_new, P_new, y.T

  if structure is None:
    # H (and the ESKF H.H_mod chain) lane-major: composing them per-filter
    # inside the vmap would emit batched small matmuls (the slow pattern
    # this module exists to avoid). Non-feature extra-args kinds (the
    # loc_kf pseudorange family, ekf_sym.py:84-89) thread per-lane ea.
    if ea is not None:
      h = jax.vmap(lambda xx, ee: om.h(params, xx, ee), out_axes=1)(x, ea)
      H_raw = jax.vmap(lambda xx, ee: spec.H(kind, params, xx, ee),
                       out_axes=2)(x, ea)  # (dz, dim_x, B)
    else:
      h = jax.vmap(lambda xx: om.h(params, xx, ea0), out_axes=1)(x)
      H_raw = jax.vmap(lambda xx: spec.H(kind, params, xx, ea0),
                       out_axes=2)(x)  # (dz, dim_x, B)
    if spec.is_eskf:
      Hm = jax.vmap(lambda xx: spec.H_mod_at(params, xx),
                    out_axes=2)(x)  # (dim_x, de, B)
      H = _matmul_ll(H_raw, Hm)  # (dz, de, B)
    else:
      H = H_raw
    HP = jnp.swapaxes(_matmul_lt(P, H), 0, 1)  # (dz, de, B)
  else:
    cols = structure.cols_for(kind)
    if ea is not None:
      h, h_cols = jax.vmap(
          lambda xx, ee: composed_h_jvp(spec, kind, params, xx, cols,
                                        ea=ee),
          out_axes=1)(x, ea)  # h (dz, B), cols each (dz, B)
    else:
      h, h_cols = jax.vmap(
          lambda xx: composed_h_jvp(spec, kind, params, xx, cols),
          out_axes=1)(x)  # h (dz, B), cols each (dz, B)
    HP = sum(hc[:, None] * P[c][None] for c, hc in zip(cols, h_cols))
    S_hp = sum(HP[:, c][:, None] * hc[None] for c, hc in zip(cols, h_cols))
  y = z.T - h

  PHt = jnp.swapaxes(HP, 0, 1)  # (de, dz, B); P is symmetric
  if structure is None:
    S_hp = _matmul_ll(H, PHt)  # H P H^T
  S = S_hp + R
  Sinv = _inv_small(S)
  K = _matmul_ll(PHt, Sinv)  # (de, dz, B)

  if om.maha_test:
    # zero-gain rejection: the exact R->inf limit of the reference's 1e16
    # R inflation, overflow-safe in float32 (see core/step.py)
    dist = sum(y[i] * Sinv[i, j] * y[j] for i in range(dz) for j in range(dz))
    K = jnp.where(dist[None, None, :] > om.maha_thresh, 0.0, K)
  dx = sum(K[:, i, :] * y[i][None, :] for i in range(dz))  # (de, B)

  if structure is None:
    I_KH = jnp.eye(de, dtype=P.dtype)[:, :, None] - _matmul_ll(K, H)
    P_new = _matmul_lt(_matmul_ll(I_KH, P), I_KH) + \
        _matmul_lt(_matmul_ll(K, R), K)
    P_new = _sym(P_new)
  else:
    # factored P + (W + W^T) Joseph downdate (live_lane.joseph_sym)
    T_ = 0.5 * _matmul_ll(S, jnp.swapaxes(K, 0, 1)) - HP
    W = _matmul_ll(K, T_)
    P_new = P + (W + jnp.swapaxes(W, 0, 1))

  x_new = jax.vmap(lambda xx, d: spec.err(params, xx, d))(x, dx.T)
  x_new = jax.vmap(lambda xx: normalize_slices(xx, spec.quaternion_idxs))(x_new)
  return x_new, P_new, y.T


def augment_slab(spec: FilterSpec, x, P):
  """MSCKF augmentation on slab state: x (dim_x, *b), P (de, de, *b) —
  clone the current pose into the newest window slot (core/step.augment
  semantics, reference ekf_sym.py:365-391). Built from contiguous slices
  and concatenates only (the `keep` index set is two contiguous ranges),
  so it lowers inside Pallas kernels as pure data movement."""
  assert spec.is_msckf
  d1, d2 = spec.dim_main, spec.dim_main_err
  d3, d4 = spec.dim_augment, spec.dim_augment_err
  x_new = jnp.concatenate([x[:d1], x[d1 + d3:], x[:d3]])
  # drop the oldest augment block's rows/cols (both contiguous ranges)
  Pr = jnp.concatenate([
      jnp.concatenate([P[:d2, :d2], P[:d2, d2 + d4:]], axis=1),
      jnp.concatenate([P[d2 + d4:, :d2], P[d2 + d4:, d2 + d4:]], axis=1),
  ])
  # to_mult projection = duplicate the first d4 rows/cols into the last slot
  P_new = jnp.concatenate([
      jnp.concatenate([Pr, Pr[:, :d4]], axis=1),
      jnp.concatenate([Pr[:d4], Pr[:d4, :d4]], axis=1),
  ])
  return x_new, _sym(P_new)


def lane_augment(spec: FilterSpec, x, P):
  """Banked MSCKF augmentation: x (B, dim_x) batch-major, P (de, de, B)
  lane-major (the lane-bank convention); see augment_slab."""
  x_new, P_new = augment_slab(spec, x.T, P)
  return x_new.T, P_new


def lane_bank_scan(spec: FilterSpec, kind: int, params, x, P, Q, dts, zs,
                   R, structure=None, eas=None, ps_keys=(), pss=None):
  """Scan T fused predict+update steps over the lane-major bank.

  Args: x (B, dim_x), P (dim_err, dim_err, B), dts (T,), zs (T, B, dz),
  R (dz, dz) shared across bank and time (per-step R variation belongs to the
  generic path). Non-feature extra-args kinds (the pseudorange family)
  stream per-step per-lane satellite states as eas (T, B, ea_len). Pass
  `structure` (ops/sparsity.detect_structure) to skip structurally-zero
  Jacobian arithmetic.

  Per-STEP runtime params (the reference's global_vars updated at sensor
  rate, ekf_sym.py:129-132 — e.g. CarKalman's forward speed + commanded
  steering angle): ps_keys is a static tuple of param names, pss (T,
  len(ps_keys)) their per-step values; each step's params dict is the
  base `params` overlaid with that step's row. Returns (x, P) finals.
  """
  assert (eas is None) == (spec.obs[kind].ea_len == 0), (
      f"kind {kind} ea_len={spec.obs[kind].ea_len}: pass eas iff the kind "
      "takes extra args")
  assert (pss is None) == (len(ps_keys) == 0), (
      "pass pss (T, len(ps_keys)) iff ps_keys is non-empty")
  if pss is not None:
    assert pss.shape == (dts.shape[0], len(ps_keys)), (pss.shape, ps_keys)
  Rl = jnp.asarray(R, dtype=x.dtype)

  seq = {'dt': dts, 'z': zs}
  if eas is not None:
    seq['ea'] = eas
  if pss is not None:
    seq['ps'] = pss

  def body(carry, inp):
    x, P = carry
    ps_row = inp.get('ps')
    p_t = params if ps_row is None else {
        **params, **{k: ps_row[i] for i, k in enumerate(ps_keys)}}
    x, P = lane_predict(spec, p_t, x, P, Q, inp['dt'],
                        structure=structure)
    x, P, _ = lane_update(spec, kind, p_t, x, P, inp['z'], Rl,
                          structure=structure, ea=inp.get('ea'))
    return (x, P), None

  (x, P), _ = jax.lax.scan(body, (x, P), seq)
  return x, P


@functools.lru_cache(maxsize=None)
def jit_lane_bank_scan(spec: FilterSpec, kind: int, structure=None,
                       ps_keys=()):
  return jax.jit(functools.partial(lane_bank_scan, spec, kind,
                                   structure=structure, ps_keys=ps_keys))


def lane_mixed_bank_scan(spec: FilterSpec, kinds: tuple, params, x, P, Q,
                         dts, kind_idx, zs, R_list, structure=None,
                         eas=None, ps_keys=(), pss=None):
  """Heterogeneous sensor schedule over a lane-major bank for ANY spec:
  one fused predict + `lax.switch`-dispatched update per step — the
  generic analog of ops/live_lane.live_mixed_scan (which is live-only) and
  the banked analog of runtime/scan.build_scan_stream (which is
  single-filter). The reference's real workload shape (several observation
  kinds at sensor rate, ekf_sym.cc:158-184) at bank scale for any model.

  MSCKF FEATURE kinds get a camera-frame branch — projected feature
  update + window AUGMENT (predict_and_update_batch(augment=True)
  semantics, ekf_sym.py:525-526) — matching the kernel twin
  (pallas_bank._update_branch), so a VIO schedule interleaving camera
  frames with other sensors runs as one scan on either path.

  Args: kinds static tuple; kind_idx (T,) int32 indices into it; zs
  (T, B, max_dz) rows padded to the largest dz; R_list per-kind (dz, dz)
  noises aligned with `kinds` (traced — per-call values don't recompile);
  eas (T, B, max_ea_len) rows padded to the largest ea_len (required iff
  some kind takes extra args; other steps' rows are ignored). Per-step
  runtime params stream via ps_keys (static names) + pss
  (T, len(ps_keys)), as in lane_bank_scan.
  Returns final (x (B, dim_x), P (de, de, B)).
  """
  kinds = tuple(int(k) for k in kinds)
  max_dz = max(spec.obs[k].dz for k in kinds)
  max_ea = max(spec.obs[k].ea_len for k in kinds)
  assert zs.shape[-1] == max_dz, (zs.shape, max_dz)
  assert (eas is None) == (max_ea == 0), (
      f"kinds {kinds} max ea_len={max_ea}: pass eas iff some kind takes "
      "extra args")
  if eas is not None:
    assert eas.shape[-1] == max_ea, (eas.shape, max_ea)
  assert (pss is None) == (len(ps_keys) == 0), (
      "pass pss (T, len(ps_keys)) iff ps_keys is non-empty")

  def _branch(i, k):
    om = spec.obs[k]
    dz, mea = om.dz, om.ea_len

    def apply(xc, Pc, z, Rl, ea, ps_row):
      p_t = params if not ps_keys else {
          **params, **{key: ps_row[n] for n, key in enumerate(ps_keys)}}
      xn, Pn, _ = lane_update(spec, k, p_t, xc, Pc, z[:, :dz], Rl[i],
                              structure=structure,
                              ea=ea[:, :mea] if mea else None)
      if om.is_feature:  # camera frame: clone the pose into the window
        xn, Pn = lane_augment(spec, xn, Pn)
      return xn, Pn

    return apply

  branches = tuple(_branch(i, k) for i, k in enumerate(kinds))

  seq = {'dt': dts, 'ki': kind_idx, 'z': zs}
  if eas is not None:
    seq['ea'] = eas
  if pss is not None:
    seq['ps'] = pss

  def body(carry, inp):
    xc, Pc = carry
    dt = inp['dt']
    # (B, 1) placeholder: every branch's kind has ea_len 0 and ignores it
    ea = inp.get('ea', xc[:, :1] * 0.0)
    ps_row = inp.get('ps', dt * 0.0)
    p_t = params if not ps_keys else {
        **params, **{key: ps_row[n] for n, key in enumerate(ps_keys)}}
    xc, Pc = lane_predict(spec, p_t, xc, Pc, Q, dt, structure=structure)
    xc, Pc = jax.lax.switch(inp['ki'], branches, xc, Pc, inp['z'], R_list,
                            ea, ps_row)
    return (xc, Pc), None

  (x, P), _ = jax.lax.scan(body, (x, P), seq)
  return x, P


def lane_epoch_bank_scan(spec: FilterSpec, slot_kinds: tuple, params, x, P,
                         Q, dts, zs, R_list, structure=None, eas=None,
                         ps_keys=(), pss=None):
  """T EPOCHS over a lane-major bank: one predict then K statically-
  unrolled updates per step — the reference's predict_and_update_batch
  shape (predict once at t, then every measurement of the epoch,
  ekf_sym.py:484-531) as a bank scan; the jnp twin of
  ops/pallas_bank.generic_bank_scan_epoch.

  Args: slot_kinds static tuple of K kind ids (repeat a kind for several
  same-kind measurements); zs (T, K, B, max_dz) rows padded to the largest
  dz; R_list per-slot (dz, dz) noises; eas (T, K, B, max_ea_len) iff some
  slot kind takes extra args. Returns final (x (B, dim_x), P (de, de, B)).
  """
  slot_kinds = tuple(int(k) for k in slot_kinds)
  assert not any(spec.obs[k].is_feature for k in slot_kinds), (
      "MSCKF feature kinds are camera FRAMES (update + window augment), "
      "not epoch slots: use MSCKFBank.run_frames / run_mixed")
  max_dz = max(spec.obs[k].dz for k in slot_kinds)
  max_ea = max(spec.obs[k].ea_len for k in slot_kinds)
  assert zs.shape[1] == len(slot_kinds) and zs.shape[-1] == max_dz, zs.shape
  assert (eas is None) == (max_ea == 0)
  if eas is not None:
    assert eas.shape[:2] == zs.shape[:2] and eas.shape[-1] == max_ea, (
        f"eas {eas.shape}: want (T, K, B, {max_ea}) padded to the largest "
        f"slot ea_len, matching zs {zs.shape}")
  assert (pss is None) == (len(ps_keys) == 0)

  seq = {'dt': dts, 'z': zs}
  if eas is not None:
    seq['ea'] = eas
  if pss is not None:
    seq['ps'] = pss

  def body(carry, inp):
    xc, Pc = carry
    dt, z_t = inp['dt'], inp['z']
    ea_t = inp.get('ea', z_t[:, :, :1] * 0.0)
    ps_row = inp.get('ps')
    p_t = params if ps_row is None else {
        **params, **{k: ps_row[i] for i, k in enumerate(ps_keys)}}
    xc, Pc = lane_predict(spec, p_t, xc, Pc, Q, dt, structure=structure)
    for k, kind in enumerate(slot_kinds):
      om = spec.obs[kind]
      ea_k = ea_t[k][:, :om.ea_len] if om.ea_len else None
      xc, Pc, _ = lane_update(spec, kind, p_t, xc, Pc,
                              z_t[k][:, :om.dz], R_list[k],
                              structure=structure, ea=ea_k)
    return (xc, Pc), None

  (x, P), _ = jax.lax.scan(body, (x, P), seq)
  return x, P


@functools.lru_cache(maxsize=None)
def jit_lane_epoch_bank_scan(spec: FilterSpec, slot_kinds: tuple,
                             structure=None, ps_keys=()):
  def fn(params, x, P, Q, dts, zs, R_list, eas=None, pss=None):
    return lane_epoch_bank_scan(spec, slot_kinds, params, x, P, Q, dts,
                                zs, R_list, structure=structure, eas=eas,
                                ps_keys=ps_keys, pss=pss)
  return jax.jit(fn)


@functools.lru_cache(maxsize=None)
def jit_lane_mixed_bank_scan(spec: FilterSpec, kinds: tuple,
                             structure=None, ps_keys=()):
  def fn(params, x, P, Q, dts, kind_idx, zs, R_list, eas=None, pss=None):
    return lane_mixed_bank_scan(spec, kinds, params, x, P, Q, dts,
                                kind_idx, zs, R_list, structure=structure,
                                eas=eas, ps_keys=ps_keys, pss=pss)
  return jax.jit(fn)


def to_lane(P_batch):
  """(B, d, d) -> (d, d, B)."""
  return jnp.transpose(P_batch, (1, 2, 0))


def from_lane(P_lane):
  """(d, d, B) -> (B, d, d)."""
  return jnp.transpose(P_lane, (2, 0, 1))
