"""Automatic structural-sparsity detection for generic filter banks.

The reference gets structural-zero elimination for free: sympy derives F
and H symbolically and the emitted C simply omits zero entries
(rednose/helpers/ekf_sym.py:76-89 + sympy codegen CSE). The README's
performance ladder recovered that win for the flagship by HAND
(ops/live_lane.py derives live_kf's five nonzero F blocks and per-kind
sparse H). This module automates it for ANY FilterSpec:

  1. Sample the spec's jacfwd Jacobians at a handful of randomly perturbed
     states on the host (structural zeros of an autodiff Jacobian are
     exactly 0.0 at every point — no tolerance games needed).
  2. Take the union nonzero pattern across samples, then VERIFY it on
     held-out samples (and verify the composed-H shortcut, below); any
     violation raises StructureError instead of silently mis-filtering.
  3. Hand the (static, hashable) pattern to masked slab products that
     unroll only the nonzero entries — inside the generic Pallas kernel
     (ops/pallas_bank.py) or any lane-major jnp path.

For the live 23/22 ESKF this turns the dense 2*22^3 ~ 21k-FLOP covariance
propagation into ~3k FLOP — the same reduction live_lane.py derives by
hand — with zero model-specific code.

The composed-H shortcut: the ESKF update needs H_err = H @ H_mod
(templates/ekf_c.c:83-85). In every standard error-state construction
H_mod == d err(x, dx)/d dx at dx=0, so H_err equals the Jacobian of
h(err(x, dx)) in dx — computable column-by-column with jax.jvp for ONLY
the detected nonzero columns. detect_structure() numerically verifies
this identity against the spec's own H_mod at every sample and refuses
(StructureError) if a nonstandard H_mod breaks it.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from rednose_tpu.core.spec import FilterSpec
from rednose_tpu.ops import structural

Cols = tuple  # tuple[int, ...]


class StructureError(ValueError):
  """Raised when a detected sparsity pattern fails held-out verification."""


@dataclasses.dataclass(frozen=True)
class SpecStructure:
  """Static (hashable — usable as a jit static arg) sparsity description.

  f_rows[i] is the tuple of column indices k with F[i, k] structurally
  nonzero; h_cols maps kind -> tuple of structurally nonzero columns of
  the composed H_err = H @ H_mod (dz, dim_err).
  """

  f_rows: tuple  # tuple[Cols, ...], length dim_err
  h_cols: tuple  # tuple[tuple[int, Cols], ...] sorted by kind
  # columns where G = F - I is structurally nonzero: the F P F^T
  # decomposition P + GP + (GP)^T + (GP)G^T touches only these columns
  g_cols: Cols = ()

  def cols_for(self, kind: int) -> Cols:
    for k, cols in self.h_cols:
      if k == kind:
        return cols
    raise KeyError(f"kind {kind} not in detected structure")

  @property
  def f_nnz(self) -> int:
    return sum(len(r) for r in self.f_rows)


# ---------------------------------------------------------------- detection

def sample_states(spec: FilterSpec, x0, n: int, seed: int = 0,
                  rel: float = 0.1, absolute: float = 0.1) -> np.ndarray:
  """n plausible states: x0 perturbed multiplicatively AND additively (so
  both huge entries like ECEF positions and zero entries like biases move),
  quaternions renormalized."""
  rng = np.random.RandomState(seed)
  x0 = np.asarray(x0, dtype=np.float64)
  xs = x0[None] * (1.0 + rel * rng.randn(n, x0.shape[0]))
  xs = xs + absolute * rng.randn(n, x0.shape[0])
  for idx in spec.quaternion_idxs:
    q = xs[:, idx:idx + 4]
    xs[:, idx:idx + 4] = q / np.linalg.norm(q, axis=1, keepdims=True)
  return xs


def perturb_params(params, rng, rel: float = 0.1, absolute: float = 0.5):
  """Randomly perturb every floating leaf of a params pytree.

  Structure detection must not sample Jacobians at a single fixed params: a
  params-dependent F/H entry that happens to be zero there (e.g. a sympy
  global still at its 0.0 default) would be masked out of the products, and
  a later set_global would silently corrupt the covariance. Perturbing the
  params per sample makes such entries structurally visible. Non-float
  leaves (ints, bools, treedefs) pass through untouched."""
  leaves, treedef = jax.tree_util.tree_flatten(params)
  out = []
  for leaf in leaves:
    arr = np.asarray(leaf)
    if np.issubdtype(arr.dtype, np.floating):
      p = (arr * (1.0 + rel * rng.randn(*arr.shape))
           + absolute * rng.randn(*arr.shape))
      out.append(float(p) if arr.ndim == 0 else p)
    else:
      out.append(leaf)
  return jax.tree_util.tree_unflatten(treedef, out)


def composed_h_jvp(spec: FilterSpec, kind: int, params, x, cols: Cols,
                   ea=None):
  """h(x) and the requested columns of d h(err(x, dx))/d dx at dx = 0,
  via ONE jax.linearize + structurally-evaluated per-column taps
  (ops/structural.linear_taps: one-hot zeros propagate symbolically, so
  each column emits only its nonzero scalar arithmetic — the sympy-
  codegen result, derived from the user's jnp model). Unbatched x; vmap
  for slabs. Everything is derived from x (captured-constant-free: safe
  inside Pallas kernels). Extra-args kinds (the pseudorange family) pass
  their real ea (ea_len,) — the zero placeholder is only correct for
  ea-free kinds.

  Returns (h (dz,), H_cols list of (dz,)).
  """
  om = spec.obs[kind]
  de = spec.dim_err
  if ea is None:
    assert om.ea_len == 0, (
        f"kind {kind} takes {om.ea_len} extra args; pass ea=")
    ea = x[:1] * 0.0
  dx0 = x[:de] * 0.0

  def fn(dd):
    return om.h(params, spec.err(params, x, dd), ea)

  return structural.jvp_taps(fn, de, x.dtype, cols, dx0[0])


def f_columns(spec: FilterSpec, params, x, dt, cols: Cols):
  """Selected columns of F = d f_err / d dx at dx=0 (additive specs:
  d f / d x) via one jax.linearize + structural taps — same rationale as
  composed_h_jvp.

  Returns {col: (dim_err,) column}.
  """
  de = spec.dim_err
  dx0 = x[:de] * 0.0
  if spec.f_err is not None:
    fn = lambda dd: spec.f_err(params, x, dd, dt)  # noqa: E731
  else:
    assert de == spec.dim_x, "additive spec with dim_err != dim_x"
    fn = lambda dd: spec.f(params, x + dd, dt)  # noqa: E731
  _, taps = structural.jvp_taps(fn, de, x.dtype, cols, dx0[0])
  return dict(zip(cols, taps))


def _dense_h_err(spec: FilterSpec, kind: int, params, x, ea=None):
  """Reference composed Jacobian H @ H_mod via the spec's own H_mod
  (exactly what core/step.update computes). Feature kinds pass a real
  (sampled) ea — zeros would put the landmark at the origin and mask
  columns."""
  om = spec.obs[kind]
  if ea is None:
    ea = jnp.zeros((max(om.ea_len, 1),), dtype=x.dtype)
  H = spec.H(kind, params, x, ea)
  if spec.is_eskf:
    H = H @ spec.H_mod_at(params, x)
  return H


def detect_structure(spec: FilterSpec, x0, kinds=None, params=None,
                     n_detect: int = 4, n_verify: int = 2, seed: int = 0,
                     dts=(0.013, 0.17), consistency_tol: float = 1e-5):
  """Detect + verify the structural sparsity of F and per-kind composed H.

  x0: a representative state (e.g. the model's initial_x) — samples are
  random perturbations of it. kinds defaults to every non-feature kind.
  Raises StructureError if a held-out sample contradicts the detected
  pattern, or if the spec's H_mod is inconsistent with d err/d dx (which
  would make the composed-H fast path wrong for this spec).

  Runs on host CPU in float64 (a handful of Jacobian evaluations at spec
  build time — the moral equivalent of the reference's codegen pass).
  """
  if params is None:
    params = spec.default_params
  if kinds is None:
    # only ea-free kinds take the composed-H jvp path (its placeholder ea
    # is zeros — a pseudorange kind sampled with the satellite at the
    # origin would mask real columns); ea_len > 0 kinds get a cols-only
    # detection with randomly sampled extra args below
    kinds = tuple(sorted(k for k, om in spec.obs.items()
                         if om.ea_len == 0))
  assert all(spec.obs[k].ea_len == 0 for k in kinds), (
      "explicit kinds= must be ea-free; ea_len>0 kinds are detected "
      "automatically with sampled extra args", kinds)
  de = spec.dim_err

  cpu = jax.local_devices(backend="cpu")[0]
  with jax.default_device(cpu):
    xs = sample_states(spec, x0, n_detect + n_verify, seed=seed)
    xs_det, xs_ver = xs[:n_detect], xs[n_detect:]
    # One independently perturbed params per sample: entries that are zero
    # ONLY at the caller's params (sympy globals default 0.0) must still be
    # detected as structurally nonzero — the resulting SpecStructure is
    # applied at whatever params the runtime passes later (set_global).
    prng = np.random.RandomState(seed + 0x5EED)
    ps_det = [perturb_params(params, prng) for _ in xs_det]
    ps_ver = [perturb_params(params, prng) for _ in xs_ver]

    def F_at(p, x, dt):
      return np.asarray(spec.F(p, jnp.asarray(x), dt))

    eye = np.eye(de)
    f_mask = np.zeros((de, de), dtype=bool)
    g_mask = np.zeros((de, de), dtype=bool)
    for p, x in zip(ps_det, xs_det):
      for dt in dts:
        F = F_at(p, x, float(dt))
        f_mask |= F != 0.0
        g_mask |= (F - eye) != 0.0
    for p, x in zip(ps_ver, xs_ver):
      for dt in dts:
        F = F_at(p, x, float(dt))
        bad = ((F != 0.0) & ~f_mask) | (((F - eye) != 0.0) & ~g_mask)
        if bad.any():
          ij = np.argwhere(bad)[:8].tolist()
          raise StructureError(
              f"F entries {ij} nonzero on held-out samples but zero on all "
              f"detection samples; pass more/better samples (x0, n_detect)")
    f_rows = tuple(tuple(int(k) for k in np.nonzero(f_mask[i])[0])
                   for i in range(de))
    g_cols = tuple(int(k) for k in np.nonzero(g_mask.any(axis=0))[0])

    h_cols = []
    for kind in kinds:
      mask = np.zeros((de,), dtype=bool)
      for p, x in zip(ps_det, xs_det):
        Hd = np.asarray(_dense_h_err(spec, kind, p, jnp.asarray(x)))
        mask |= (Hd != 0.0).any(axis=0)
      cols = tuple(int(c) for c in np.nonzero(mask)[0])
      for p, x in zip(ps_ver, xs_ver):
        xj = jnp.asarray(x)
        Hd = np.asarray(_dense_h_err(spec, kind, p, xj))
        bad = (Hd != 0.0).any(axis=0) & ~mask
        if bad.any():
          raise StructureError(
              f"kind {kind}: H_err columns {np.nonzero(bad)[0].tolist()} "
              f"nonzero on held-out samples but missed by detection")
        # composed-H shortcut consistency: jvp through err must reproduce
        # the spec's H @ H_mod on the detected columns
        _, hc = composed_h_jvp(spec, kind, p, xj, cols)
        for c, col in zip(cols, hc):
          ref = Hd[:, c]
          if not np.allclose(np.asarray(col), ref,
                             rtol=consistency_tol,
                             atol=consistency_tol * max(1.0,
                                                        np.abs(ref).max())):
            raise StructureError(
                f"kind {kind}: spec H_mod is inconsistent with "
                f"d err/d dx at column {c} — the composed-H fast path "
                f"would diverge from core/step semantics for this spec")
      h_cols.append((int(kind), cols))

    # extra-args kinds (MSCKF feature tracks AND the pseudorange family):
    # detect the composed-H column support with RANDOMLY sampled extra
    # args (landmark / satellite positions). No composed-H consistency
    # check here — the jvp identity is verified through the ea-free kinds
    # above, and the feature path's Householder projection is
    # basis-invariant regardless.
    frng = np.random.RandomState(seed + 0xFEA7)
    for kind, om in sorted(spec.obs.items()):
      if om.ea_len == 0:
        continue
      mask = np.zeros((de,), dtype=bool)
      for p, x in zip(ps_det, xs_det):
        ea = jnp.asarray(frng.randn(om.ea_len))
        Hd = np.asarray(_dense_h_err(spec, kind, p, jnp.asarray(x), ea))
        mask |= (Hd != 0.0).any(axis=0)
      cols = tuple(int(c) for c in np.nonzero(mask)[0])
      for p, x in zip(ps_ver, xs_ver):
        ea = jnp.asarray(frng.randn(om.ea_len))
        Hd = np.asarray(_dense_h_err(spec, kind, p, jnp.asarray(x), ea))
        bad = (Hd != 0.0).any(axis=0) & ~mask
        if bad.any():
          raise StructureError(
              f"extra-args kind {kind}: H_err columns "
              f"{np.nonzero(bad)[0].tolist()} nonzero on held-out samples "
              f"but missed by detection")
      h_cols.append((int(kind), cols))

  return SpecStructure(f_rows=f_rows, h_cols=tuple(h_cols), g_cols=g_cols)


_structure_cache: dict = {}


def structure_for(spec: FilterSpec, x0, kinds=None, **kw) -> SpecStructure:
  """Cached detect_structure: one detection pass per (spec, x0, kinds) —
  specs hash by identity (core/spec.py), mirroring the jit caches."""
  key = (spec, tuple(float(v) for v in np.asarray(x0).ravel()), kinds,
         tuple(sorted(kw.items())))
  if key not in _structure_cache:
    _structure_cache[key] = detect_structure(spec, x0, kinds=kinds, **kw)
  return _structure_cache[key]


# ------------------------------------------------------------- masked algebra
# Slab layout throughout: matrices (m, n, *b) with arbitrary trailing bank
# dims, entries on vector lanes (see ops/live_lane.py). Patterns are static
# Python tuples, so everything unrolls to exactly the nonzero arithmetic.

def mm_f_masked(F, P, rows):
  """Sparse-F (de, de, *b) @ dense (de, n, *b): out[i] = sum over the
  structurally nonzero F[i, k] of F[i, k] * P[k]."""
  z = P[0] * 0.0
  return jnp.stack([
      sum(F[i, k][None] * P[k] for k in rows[i]) if rows[i] else z
      for i in range(len(rows))])


def mm_rt_masked(G, F, rows):
  """Dense (m, de, *b) @ sparse-F^T: out[:, j] = sum over nonzero F[j, k]
  of G[:, k] * F[j, k]."""
  z = G[:, 0] * 0.0
  return jnp.stack([
      sum(G[:, k] * F[j, k][None] for k in rows[j]) if rows[j] else z
      for j in range(len(rows))], axis=1)


def fpf_masked(F, P, g_cols):
  """F P F^T on slabs via the F = I + G decomposition:

    F P F^T = P + M + M^T + M G^T,   M = G P  (P symmetric)

  with M and M G^T accumulated as outer products over ONLY the columns
  where G = F - I is structurally nonzero (detect_structure.g_cols). The
  result stays dense-shaped throughout — plain fused multiply-add chains
  with no row stacks, so it is fast under BOTH XLA (lane path) and Mosaic
  (Pallas kernel). For live_kf: 12 of 22 columns, ~2x fewer FLOPs than the
  dense product on the dominant term; the same algebra the hand-derived
  kernel uses (ops/live_lane.py M/N blocks), derived automatically.
  """
  if not g_cols:
    return P  # F == I structurally: pure random walk
  g = {}
  for k in g_cols:
    Fk = F[:, k] if hasattr(F, "ndim") else F[k]  # array or {col: column}
    g[k] = jnp.concatenate(
        ([Fk[:k]] if k else []) + [Fk[k:k + 1] - 1.0]
        + ([Fk[k + 1:]] if k + 1 < P.shape[0] else []))
  M = sum(g[k][:, None] * P[k][None] for k in g_cols)
  N = sum(M[:, k][:, None] * g[k][None] for k in g_cols)
  return P + M + jnp.swapaxes(M, 0, 1) + N
