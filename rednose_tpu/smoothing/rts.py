"""Rauch-Tung-Striebel smoothing: sequential and parallel-in-time.

TPU-native rebuild of the reference smoother (rednose/helpers/ekf_sym.py:651-690),
which is a strictly sequential Python backward loop over the estimate list. Two
implementations are provided:

  * `rts_smooth` — a `lax.scan` backward pass that smooths only the main
    (non-augmented) state block, computes the smoothed delta through the
    spec's inv_err/err functions so it is ESKF-correct, and optionally
    renormalizes quaternions. O(T) sequential depth, but each step is one
    fused XLA program instead of T Python iterations with cffi calls.
    One DELIBERATE deviation from the reference: the backward pass is seeded
    from the last POSTERIOR (x_post[T-1], P_post[T-1]) — the textbook
    boundary condition — whereas ekf_sym.rts_smooth seeds from the last
    PREDICTED state (ekf_sym.py:661-663), which silently drops the final
    measurement. Smoothed outputs therefore differ from the reference near
    the trajectory tail (and are more accurate there); the live-oracle
    comparison in tests/test_live_kf.py covers this.

  * `rts_smooth_parallel` — parallel-in-time formulation via
    `jax.lax.associative_scan`. The smoothed correction obeys the affine
    backward recursion e_k = C_k·(u_{k+1} + e_{k+1}) (with u the filter-update
    increment and C the smoother gain), which is a first-order linear
    recurrence and therefore scannable in O(log T) depth. Exact for additive
    error states; for ESKF specs the recursion runs in the error tangent space
    (inv_err at the filtered trajectory), the standard linearization used by
    parallel-in-time smoothers. This is the "sequence parallel" analog named
    in SURVEY.md §2.5 — the time axis can additionally be sharded.

Both consume the stacked arrays of a forward pass; `smooth_estimates` adapts
the driver's list-of-Estimate format (ekf_sym.py:651 signature).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from rednose_tpu.core.spec import FilterSpec
from rednose_tpu.ops.quaternion import normalize_slices

Array = Any


def _smoother_gain(spec: FilterSpec, params, x_post, P_post, P_pred_next, dt):
  """C_k = P_{k|k} F_k^T P_{k+1|k}^{-1} on the main error block
  (reference: ekf_sym.py:673-677)."""
  d2 = spec.dim_main_err
  F = spec.F(params, x_post, dt)[:d2, :d2]
  Pk = P_post[:d2, :d2]
  Pk1 = P_pred_next[:d2, :d2]
  # solve(Pk1, F @ Pk.T).T == Pk F^T Pk1^{-1} for symmetric Pk1.
  return jnp.linalg.solve(Pk1, F @ Pk.T).T


def rts_smooth(spec: FilterSpec, params, x_pred, P_pred, x_post, P_post, t,
               norm_quats: bool = False, dts=None,
               reference_seed: bool = False):
  """Sequential (lax.scan) RTS backward pass.

  Args: stacked forward-pass results, time-major:
    x_pred (T, dim_x)  : x_{k|k-1}   P_pred (T, dim_err, dim_err) : P_{k|k-1}
    x_post (T, dim_x)  : x_{k|k}     P_post (T, dim_err, dim_err) : P_{k|k}
    t (T,) timestamps.
  Returns (x_smooth, P_smooth) with the same leading shape. Only the main
  state block is smoothed; MSCKF augment slots pass through unchanged
  (reference: ekf_sym.py:677-686 slices [:d1]/[:d2]).

  `reference_seed=True` reproduces the reference's boundary condition
  bit-for-bit: ekf_sym.rts_smooth seeds the backward pass from the last
  PREDICTED state (estimates[-1][0]/[2], ekf_sym.py:658-660), silently
  dropping the final measurement. Use it when diffing a migration against
  reference output; the default posterior seed is the textbook (more
  accurate) boundary condition.
  """
  with jax.default_matmul_precision('float32'):  # see core/step.py note
    return _rts_smooth_impl(spec, params, x_pred, P_pred, x_post, P_post, t,
                            norm_quats, dts, reference_seed)


def _rts_smooth_impl(spec, params, x_pred, P_pred, x_post, P_post, t,
                     norm_quats, dts=None, reference_seed=False):
  d1, d2 = spec.dim_main, spec.dim_main_err
  T = x_post.shape[0]
  if dts is None:
    # NOTE: only exact when t is float64 — absolute epoch timestamps
    # differenced in float32 quantize dt catastrophically. Callers with f32
    # state should pass host-computed float64 deltas via dts=.
    dts = t[1:] - t[:-1]

  def backward(carry, inp):
    x_next_s, P_next_s = carry
    x_k, P_k, x_pred_next, P_pred_next, dt = inp
    Ck = _smoother_gain(spec, params, x_k, P_k, P_pred_next, dt)
    dx = spec.inv_err(params, x_pred_next, x_next_s)
    dx = dx.at[:d2].set(Ck @ dx[:d2])
    x_s = spec.err(params, x_k, dx)
    x_s = x_k.at[:d1].set(x_s[:d1])
    if norm_quats:
      x_s = normalize_slices(x_s, spec.quaternion_idxs)
    P_s = P_k.at[:d2, :d2].add(
        Ck @ (P_next_s[:d2, :d2] - P_pred_next[:d2, :d2]) @ Ck.T)
    P_s = 0.5 * (P_s + P_s.T)  # f32 covariance conditioning (see core/step.py)
    return (x_s, P_s), (x_s, P_s)

  if reference_seed:
    # ekf_sym.py:658-660: seed from the last PREDICTED state. The returned
    # tail element is that predicted seed, exactly as the reference returns
    # estimates[-1][0]/[2] as its newest smoothed entry.
    init = (x_pred[T - 1], P_pred[T - 1])
    tail = (x_pred[T - 1:], P_pred[T - 1:])
  else:
    init = (x_post[T - 1], P_post[T - 1])
    tail = (x_post[T - 1:], P_post[T - 1:])
  # scan over k = T-2 .. 0: inputs are (filtered at k, predicted at k+1, dt_k)
  inputs = (x_post[:-1], P_post[:-1], x_pred[1:], P_pred[1:], dts)
  _, (xs, Ps) = jax.lax.scan(backward, init, inputs, reverse=True)
  x_smooth = jnp.concatenate([xs, tail[0]], axis=0)
  P_smooth = jnp.concatenate([Ps, tail[1]], axis=0)
  return x_smooth, P_smooth


def _affine_combine_lane(a, b):
  """Associative combine for the backward affine recurrence, lane-major.

  Elements are (A (d, d, K), b (d, K), V (d, d, K)) representing the
  affine map
    e_out = A·e_in + b          (mean correction)
    D_out = V + A·D_in·A^T      (covariance correction)

  With `associative_scan(..., reverse=True)`, the scan semantics are
  r[k] = x[n-1] ∘ ... ∘ x[k]: the first combine argument `a` is the
  composition of LATER-index elements, the second `b` the EARLIER element —
  and the backward recurrence applies the earlier element outermost
  (e_k = A_k·e_{k+1} + b_k), so `b` wraps `a`:
    e = A_b·(A_a·e + b_a) + b_b

  Lane-major layout (time on vector lanes, matrix dims unrolled) keeps the
  tiny d×d products on the VPU as broadcast multiply-adds — einsum-style
  (K, d, d) batched matmuls lower to MXU batch-matmuls that waste >95% of
  the systolic array at d=22 (measured ~14x slower end-to-end).
  """
  from rednose_tpu.ops.lane_bank import _matmul_ll, _matmul_lt

  A_a, b_a, V_a = a  # b carried as (d, 1, K): one shared scan axis
  A_b, b_b, V_b = b
  A = _matmul_ll(A_b, A_a)
  b_new = _matmul_ll(A_b, b_a) + b_b
  V = V_b + _matmul_lt(_matmul_ll(A_b, V_a), A_b)
  return A, b_new, V


def _suffix_scan_lane(A, b, V=None, n_lanes: int = 128):
  """Inclusive suffix combine of the affine elements (A (d,d,T), b (d,1,T),
  V (d,d,T)) along the time axis: out[k] = x[T-1] ∘ ... ∘ x[k].
  With V=None, combines only (A, b) — the refinement passes' cheap variant.

  jax.lax.associative_scan slices odd/even elements along the scanned axis
  at every level; with time on vector lanes those are strided lane gathers
  (a relayout per level — measured ~25 ms of a 33 ms smoother at T=8192).
  This chunked formulation keeps every hot slice on a LEADING axis instead:

    1. reshape time into (chunks C on lanes) x (position m within chunk),
       with m leading — lax.scan over m slices the major axis for free;
    2. one reverse lax.scan of M steps computes within-chunk suffixes for
       all C chunks at once (each step combines (d, d, C) slabs on the VPU);
    3. the C chunk totals get an exclusive suffix combine across lanes
       (tiny: C=128 elements) via associative_scan + a single lane shift;
    4. one broadcast combine folds each chunk's outer suffix into its
       within-chunk results.

  Work is the same O(T) as the Blelloch scan; the strided-lane relayouts
  are gone. Exact same combine semantics as _affine_combine_lane.
  """
  d = A.shape[0]
  T = A.shape[-1]
  C = n_lanes
  M = -(-T // C)
  pad = M * C - T

  eye = jnp.eye(d, dtype=A.dtype)
  idents = (eye, jnp.zeros((d, 1), dtype=A.dtype))
  elems = (A, b)
  combine = _affine_combine_ab
  if V is not None:
    idents = idents + (jnp.zeros((d, d), dtype=A.dtype),)
    elems = elems + (V,)
    combine = _affine_combine_lane
  n = len(elems)

  def _pad_id(x, ident):
    if not pad:
      return x
    tail = jnp.broadcast_to(ident[..., None], x.shape[:-1] + (pad,))
    return jnp.concatenate([x, tail], axis=-1)  # identity at later times

  padded = tuple(_pad_id(x, i) for x, i in zip(elems, idents))

  # t = c*M + m  ->  [m, :, :, c] layout (m leading for free scan slicing)
  def to_mc(x):
    r = x.reshape(x.shape[:-1] + (C, M))
    return jnp.moveaxis(r, -1, 0)

  elems_m = tuple(to_mc(x) for x in padded)

  def step(carry, elem):
    new = combine(carry, elem)
    return new, new

  ident = tuple(jnp.broadcast_to(i[..., None], i.shape + (C,))
                for i in idents)
  totals, S1 = jax.lax.scan(step, ident, elems_m, reverse=True)

  # exclusive suffix of the C chunk totals (later chunks = higher c)
  incl = jax.lax.associative_scan(combine, totals, reverse=True, axis=2)
  excl = tuple(
      jnp.concatenate([x[..., 1:], jnp.broadcast_to(i[..., None],
                                                    x.shape[:-1] + (1,))],
                      axis=-1)
      for x, i in zip(incl, idents))

  # outer chunk suffix wraps each within-chunk suffix
  out_m = jax.vmap(combine, in_axes=((None,) * n, (0,) * n))(excl, S1)

  def from_mc(x):
    r = jnp.moveaxis(x, 0, -1)                 # (..., C, M)
    return r.reshape(x.shape[1:-1] + (C * M,))[..., :T]

  return tuple(from_mc(x) for x in out_m)


def rts_smooth_parallel(spec: FilterSpec, params, x_pred, P_pred, x_post,
                        P_post, t, norm_quats: bool = False, dts=None,
                        refine: int | None = None):
  """Parallel-in-time RTS via associative scan (O(log T) depth).

  Derivation: let e_k = inv_err(x_{k|k}, x_{k|T}) be the smoothed correction
  in the error tangent space and u_{k+1} = inv_err(x_{k+1|k}, x_{k+1|k+1}) the
  filter-update increment. The RTS recursion x_{k|T} = err(x_{k|k},
  C_k·inv_err(x_{k+1|k}, x_{k+1|T})) linearizes to

      e_k = C_k·u_{k+1} + C_k·e_{k+1},       e_{T-1} = 0

  and the covariance recursion P_{k|T} = P_{k|k} + C_k (P_{k+1|T} −
  P_{k+1|k}) C_k^T is, in terms of D_k = P_{k|T} − P_{k|k},

      D_k = C_k·(P_{k+1|k+1} − P_{k+1|k})·C_k^T + C_k·D_{k+1}·C_k^T.

  Both are first-order affine recurrences, combined associatively. Exact for
  additive error states (matches `rts_smooth` to roundoff). For ESKF specs
  the mean recursion composes tangent-space corrections additively, which is
  first-order in the correction size: on a live_kf trajectory with large
  attitude corrections the one-shot result drifts from the sequential
  smoother (measured up to ~0.5 in quaternion components on a
  weakly-observable-attitude stream; tests/test_rts_live.py).

  `refine` fixes that with Newton passes: the exact recursion is
  e_k = C_k·v(e_{k+1}) with v(e) = inv_err(x_pred, inject(x_post, e)) (the
  spec's own err/inv_err — generic for any error state). Each pass
  linearizes v around the current iterate ê (J_v = ∂v/∂e by jacfwd) and
  re-solves the resulting affine recursion

      e_k = C_k·(v(ê_{k+1}) − J_v·ê_{k+1}) + (C_k·J_v)·e_{k+1}

  exactly with one more (A, b)-only associative scan. The fixed point IS
  the sequential recursion, and convergence is Newton-quadratic near it
  (measured on a cold-start weakly-observable live stream: one-shot dev
  4.3e-1 → 9.8e-2 after 3, 2.4e-4 after 6, f64 floor ~1e-8 after 8 passes;
  warm trajectories converge in 1-2). A plain Picard pass (A = C_k held
  fixed) DIVERGES on that stream — the (I−L)^{-1} amplification over a
  weakly-damped horizon beats the small per-step nonlinearity — hence the
  re-linearized A matrices. Each pass costs one jacfwd sweep + d^3 T
  products + a gain-free scan; the Cholesky gains pass is not repeated.

  Refinement REQUIRES float64: each pass recomputes the residual
  v = inv_err(x_pred, x̂) between nearly-equal states, a catastrophic
  cancellation at ECEF scale in float32 (6.4e6 m quantizes at ~0.5 m) that
  the scan then amplifies across the horizon (measured: refine=2 at f32
  turns a 0.3 deviation into 27). In float32 the SEQUENTIAL smoother is
  itself roundoff-limited on live logs (measured 0.26 relative deviation
  from the f64 oracle, tests/test_rts_live.py) — there is no accuracy for
  refinement to recover, and the one-shot parallel pass is already within
  that same f32 noise floor. Default: 2 for ESKF specs in float64, 0 for
  float32 and for additive specs (already exact: v ≡ u+e, so a pass
  reproduces the one-shot answer identically).
  """
  with jax.default_matmul_precision('float32'):  # see core/step.py note
    return _rts_smooth_parallel_impl(spec, params, x_pred, P_pred, x_post,
                                     P_post, t, norm_quats, dts, refine)


def _affine_combine_ab(a, b):
  """(A, b)-only variant of _affine_combine_lane for refinement passes
  (the covariance suffix products are exact on the first pass and are not
  re-run)."""
  from rednose_tpu.ops.lane_bank import _matmul_ll

  A_a, b_a = a
  A_b, b_b = b
  return _matmul_ll(A_b, A_a), _matmul_ll(A_b, b_a) + b_b


def _rts_smooth_parallel_impl(spec, params, x_pred, P_pred, x_post, P_post,
                              t, norm_quats, dts=None, refine=None):
  d1, d2 = spec.dim_main, spec.dim_main_err
  T = x_post.shape[0]
  if dts is None:
    dts = t[1:] - t[:-1]  # see note in _rts_smooth_impl re f32 timestamps

  # Smoother gains C_k = P_k F_k^T P_{k+1|k}^{-1} for ALL k at once,
  # lane-major (d2, d2, T) with an unrolled Cholesky solve: batched LAPACK
  # solves serialize on TPU's scalar unit (measured ~6x slower).
  from rednose_tpu.ops.lane_bank import (
      _matmul_ll, _matmul_lt, cho_solve_lane_blocked, cholesky_lane_blocked)

  if spec.F_lane is not None:  # closed-form F: skips the dominant jacfwd
    F = spec.F_lane(params, x_post[:-1].T, dts)[:d2, :d2]
  else:
    F = jax.vmap(lambda xk, dt: spec.F(params, xk, dt)[:d2, :d2],
                 out_axes=2)(x_post[:-1], dts)  # (d2, d2, T-1)
  Pk = jnp.transpose(P_post[:-1, :d2, :d2], (1, 2, 0))
  Pk1 = jnp.transpose(P_pred[1:, :d2, :d2], (1, 2, 0))
  # blocked factorization/substitution: the column-at-a-time unroll was
  # serial-latency-bound (~d^2/2 dependent slab ops on the critical path);
  # blocking cuts the depth ~r/2 with one rank-r slab contraction per panel
  L = cholesky_lane_blocked(Pk1)
  # solve Pk1 X = F Pk^T, then C = X^T; keep everything lane-major
  # (d2, d2, T-1) — see _affine_combine_lane on why
  X = cho_solve_lane_blocked(L, _matmul_lt(F, Pk))
  C_l = jnp.swapaxes(X, 0, 1)  # C_k = X_k^T, lane-major

  u_l = jax.vmap(lambda xp, xf: spec.inv_err(params, xp, xf),
                 out_axes=1)(x_pred[1:], x_post[1:])[:d2]  # (d2, T-1)
  b_l = _matmul_ll(C_l, u_l[:, None])  # (d2, 1, T-1)
  # P_{k+1|k+1} - P_{k+1|k}, lane-major
  dP_l = jnp.transpose(P_post[1:, :d2, :d2] - P_pred[1:, :d2, :d2],
                       (1, 2, 0))
  V_l = _matmul_lt(_matmul_ll(C_l, dP_l), C_l)

  # Backward suffix combine over elements k = 0..T-2 (time on lanes):
  # chunked two-level scan for long logs (see _suffix_scan_lane), plain
  # associative scan for short ones (chunking overhead not worth it).
  chunked = C_l.shape[-1] >= 512
  if chunked:
    A_acc, e_acc_l, D_acc_l = _suffix_scan_lane(C_l, b_l, V_l)
  else:
    A_acc, e_acc_l, D_acc_l = jax.lax.associative_scan(
        _affine_combine_lane, (C_l, b_l, V_l), reverse=True, axis=2)
  del A_acc  # only the accumulated affine offset is needed (e_{T-1} = 0)
  e_acc = e_acc_l[:, 0].T                     # (T-1, d2)
  D_acc = jnp.transpose(D_acc_l, (2, 0, 1))   # (T-1, d2, d2)

  # Inject corrections back into the nominal state.
  def inject(x_k, e_k):
    dx = jnp.zeros((spec.dim_err,), dtype=x_k.dtype).at[:d2].set(e_k)
    x_s = spec.err(params, x_k, dx)
    x_s = x_k.at[:d1].set(x_s[:d1])
    if norm_quats:
      x_s = normalize_slices(x_s, spec.quaternion_idxs)
    return x_s

  # Newton refinement passes (docstring): linearize the exact composition
  # v(e) = inv_err(x_pred, inject(x_post, e)) around the current iterate
  # and re-solve the affine recursion e_k = C_k(v(ê) − J_v ê) + C_k J_v e
  # exactly with a gain-free (A, b) suffix scan.
  f64 = x_post.dtype == jnp.float64
  n_refine = (2 if (spec.is_eskf and f64) else 0) if refine is None else refine
  for _ in range(n_refine if T > 2 else 0):
    # smoothed states at times 1..T-1 from the current corrections
    xs_mid = jax.vmap(inject)(x_post[1:-1], e_acc[1:])
    x_hat_next = jnp.concatenate([xs_mid, x_post[T - 1:]], axis=0)
    v_l = jax.vmap(lambda xp, xh: spec.inv_err(params, xp, xh),
                   out_axes=1)(x_pred[1:], x_hat_next)[:d2]  # (d2, T-1)
    # ê_{k+1}: current correction one step later (ê_{T-1} = 0)
    e_shift = jnp.concatenate(
        [e_acc[1:], jnp.zeros((1, d2), dtype=e_acc.dtype)], axis=0)
    Jv = jax.vmap(
        lambda xp, xpo, eh: jax.jacfwd(
            lambda e: spec.inv_err(params, xp, inject(xpo, e))[:d2])(eh),
        out_axes=2)(x_pred[1:], x_post[1:], e_shift)  # (d2, d2, T-1)
    A_ref = _matmul_ll(C_l, Jv)
    Jv_e = sum(Jv[:, j] * e_shift[:, j][None, :] for j in range(d2))
    b_ref = _matmul_ll(C_l, (v_l - Jv_e)[:, None])  # (d2, 1, T-1)
    if chunked:
      _, e_acc_l = _suffix_scan_lane(A_ref, b_ref)
    else:
      _, e_acc_l = jax.lax.associative_scan(
          _affine_combine_ab, (A_ref, b_ref), reverse=True, axis=2)
    e_acc = e_acc_l[:, 0].T

  xs = jax.vmap(inject)(x_post[:-1], e_acc)
  Ps = P_post[:-1].at[:, :d2, :d2].add(D_acc)
  Ps = 0.5 * (Ps + jnp.swapaxes(Ps, -1, -2))  # f32 conditioning
  x_smooth = jnp.concatenate([xs, x_post[T - 1:]], axis=0)
  P_smooth = jnp.concatenate([Ps, P_post[T - 1:]], axis=0)
  return x_smooth, P_smooth


@functools.lru_cache(maxsize=None)
def _jit_rts(spec: FilterSpec, norm_quats: bool, parallel: bool,
             refine: int | None = None, reference_seed: bool = False):
  if parallel:
    return jax.jit(functools.partial(rts_smooth_parallel, spec,
                                     norm_quats=norm_quats, refine=refine))
  return jax.jit(functools.partial(rts_smooth, spec, norm_quats=norm_quats,
                                   reference_seed=reference_seed))


def smooth_estimates(spec: FilterSpec, params, estimates,
                     norm_quats: bool = False, parallel: bool = False,
                     dtype=None, refine: int | None = None,
                     reference_seed: bool = False):
  """Driver-facing entry point consuming a list of 9-tuple Estimates
  (reference signature: ekf_sym.py:651 rts_smooth(estimates, norm_quats)).

  Returns a list of smoothed (x, P) pairs, newest last, matching the
  reference's return ordering (ekf_sym.py:657-690 builds backwards then the
  caller reverses; we return time-ascending which is what downstream uses).

  `reference_seed=True` (sequential path only) reproduces the reference's
  last-predicted-state boundary condition for migration diffs — see
  rts_smooth.
  """
  if len(estimates) <= 1:
    return [(np.asarray(e[1]).flatten(), np.asarray(e[3])) for e in estimates]
  x_pred = jnp.stack([jnp.asarray(e[0], dtype=dtype).reshape(-1)
                      for e in estimates])
  x_post = jnp.stack([jnp.asarray(e[1], dtype=dtype).reshape(-1)
                      for e in estimates])
  P_pred = jnp.stack([jnp.asarray(e[2], dtype=dtype) for e in estimates])
  P_post = jnp.stack([jnp.asarray(e[3], dtype=dtype) for e in estimates])
  t64 = np.asarray([float(e[4]) for e in estimates], dtype=np.float64)
  t = jnp.asarray(t64, dtype=dtype)
  # difference timestamps on the host in float64: epoch-scale t cast to f32
  # first would quantize dt (see runtime/scan.py pad_log)
  dts = jnp.asarray(t64[1:] - t64[:-1], dtype=dtype)
  fn = _jit_rts(spec, norm_quats, parallel, refine,
                reference_seed and not parallel)  # cached compiled program
  xs, Ps = fn(params, x_pred, P_pred, x_post, P_post, t, dts=dts)
  xs = np.asarray(xs)
  Ps = np.asarray(Ps)
  return [(xs[i], Ps[i]) for i in range(xs.shape[0])]


def rts_smooth_parallel_bank(spec: FilterSpec, params, x_pred, P_pred,
                             x_post, P_post, t, norm_quats: bool = False,
                             dts=None, refine: int | None = None):
  """Smooth a BANK of trajectories in one program: all arguments gain a
  leading bank axis B (x_* (B, T, dim_x), P_* (B, T, d, d), t (B, T)) and
  the O(log T) parallel-in-time pass vmaps over it — B x T smoothing as a
  single XLA computation, the offline analog of the filter banks."""
  fn = functools.partial(rts_smooth_parallel, spec, params,
                         norm_quats=norm_quats, refine=refine)
  if dts is None:
    return jax.vmap(lambda *a: fn(*a))(x_pred, P_pred, x_post, P_post, t)
  return jax.vmap(lambda *a: fn(*a[:-1], dts=a[-1]))(
      x_pred, P_pred, x_post, P_post, t, dts)
