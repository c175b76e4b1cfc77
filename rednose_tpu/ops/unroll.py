"""Unroll small matmuls so user model code lowers inside Pallas kernels.

Filter models are naturally written with tiny matrix products —
`quat_to_rot(q) @ accel`, `_omega_matrix(w) @ q` — which trace to
`dot_general`. Inside the generic VMEM-resident kernel
(ops/pallas_bank.py) every per-filter function is vmapped over two
trailing bank dims (and jacfwd adds a basis batch), so those dots become
batched `tpu.matmul`s with 2-3 batch dims, which Mosaic rejects
("Up to 1 batch dim supported"). For 3x3-scale operands a systolic-array
matmul is the wrong lowering anyway: the right code is unrolled
multiply-adds on the VPU, with the bank dims on vector lanes.

`unroll_dots(fn)` rewrites fn at the jaxpr level, replacing every
dot_general with an explicit broadcast-multiply + sum — which vmaps to
pure elementwise arithmetic. This keeps the promise that the kernel runs
the user's model code verbatim (no scatter-free hand rewrites of their
matrix products), the same way the reference's sympy codegen flattens all
matrix algebra to scalar C (rednose/helpers/sympy_helpers.py:122-162).

Only transposes/broadcasts/sums over LEADING dims are emitted, so the
rewrite composes with the slab layout's tiled trailing dims (CLAUDE.md:
reshapes that move the last two dims do not lower).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.extend.core import Literal


# Free dims larger than this stay vectorized instead of being scalarized:
# jacfwd carries its Jacobian basis (dim_err wide) as a free dim of the
# tangent operand, and scalarizing it multiplies the op count by dim_err
# (28k-op jaxprs that OOM the Mosaic compiler).
_SCALARIZE_MAX = 4


def _unrolled_dot(lhs, rhs, dimension_numbers):
  """dot_general as unrolled multiply-adds (no tpu.matmul).

  result[B..., L..., R...] = sum_C lhs[..L,C,B..] * rhs[..C,R,B..]

  Small free dims and contracting dims are iterated with Python loops
  (they are tiny in filter models); batch dims and LARGE free dims stay
  vectorized. Emitted ops: integer-indexed slices, elementwise mul/add,
  jnp.stack, leading-dims transposes. New dims are only ever inserted in
  LEADING positions — a trailing unit dim next to the tiled dims after the
  bank vmap is an "unsupported shape cast" in Mosaic (CLAUDE.md).
  """
  import itertools

  (lc, rc), (lb, rb) = dimension_numbers
  lc, rc, lb, rb = map(tuple, (lc, rc, lb, rb))
  l_free = [i for i in range(lhs.ndim) if i not in lc + lb]
  r_free = [i for i in range(rhs.ndim) if i not in rc + rb]
  big_l = tuple(d for d in l_free if lhs.shape[d] > _SCALARIZE_MAX)
  big_r = tuple(d for d in r_free if rhs.shape[d] > _SCALARIZE_MAX)
  if big_l and big_r:
    # cross-product of two large free dims would need a trailing
    # broadcast; scalarize the smaller side instead (rare in filter code)
    if max(lhs.shape[d] for d in big_l) >= max(rhs.shape[d] for d in big_r):
      big_r = ()
    else:
      big_l = ()
  small_l = [d for d in l_free if d not in big_l]
  small_r = [d for d in r_free if d not in big_r]
  big = big_l or big_r  # at most one side is vectorized

  cache = {}

  def at(arr, which, pos_vals, batch, bigdims):
    """Slice scalars out; remaining dims transposed to (big..., B...)."""
    key = (which, pos_vals)
    if key in cache:
      return cache[key]
    idx = [slice(None)] * arr.ndim
    for p, v in pos_vals:
      idx[p] = v
    out = arr[tuple(idx)]  # remaining dims ascending: mix of big + batch
    keep = sorted(bigdims + batch)
    want = list(bigdims) + list(batch)
    if keep != want:
      pos = {p: i for i, p in enumerate(keep)}
      out = jnp.transpose(out, tuple(pos[p] for p in want))
    cache[key] = out
    return out

  nbig = len(big)

  def term_at(f_idx, g_idx, c_idx):
    lv = at(lhs, 0, f_idx + tuple(zip(lc, c_idx)), lb, big_l)
    rv = at(rhs, 1, g_idx + tuple(zip(rc, c_idx)), rb, big_r)
    # align to (big..., B...): the side without big dims gets LEADING
    # broadcast dims (scalars broadcast implicitly)
    if big_l and rv.ndim:
      rv = rv[(None,) * len(big_l)]
    elif big_r and lv.ndim:
      lv = lv[(None,) * len(big_r)]
    return lv * rv

  def build(f_dims, f_idx):
    if f_dims:
      d, rest = f_dims[0], f_dims[1:]
      return jnp.stack([build(rest, f_idx + ((d, i),))
                        for i in range(lhs.shape[d])])
    return build_r(list(small_r), f_idx, ())

  def build_r(g_dims, f_idx, g_idx):
    if g_dims:
      d, rest = g_dims[0], g_dims[1:]
      return jnp.stack([build_r(rest, f_idx, g_idx + ((d, i),))
                        for i in range(rhs.shape[d])])
    acc = None
    for c_idx in itertools.product(*[range(lhs.shape[i]) for i in lc]):
      t = term_at(f_idx, g_idx, c_idx)
      acc = t if acc is None else acc + t
    assert acc is not None, "zero-size contraction dimension"
    return acc

  out = build(list(small_l), ())
  # current dims: (small_l asc, small_r asc, big asc?, B...) — big dims kept
  # in the order listed in big (ascending by construction)
  cur = (["sl%d" % d for d in small_l] + ["sr%d" % d for d in small_r]
         + (["bl%d" % d for d in big_l] if big_l else
            ["br%d" % d for d in big_r]) + ["b%d" % i for i in range(len(lb))])
  # dot_general output: (batch, lhs free asc, rhs free asc)
  want = (["b%d" % i for i in range(len(lb))]
          + ["sl%d" % d if d in small_l else "bl%d" % d for d in l_free]
          + ["sr%d" % d if d in small_r else "br%d" % d for d in r_free])
  if cur != want:
    pos = {n: i for i, n in enumerate(cur)}
    out = jnp.transpose(out, tuple(pos[n] for n in want))
  return out


# Primitives that are pure calls (inlining their jaxpr is semantics-
# preserving). Control-flow primitives (scan/while/cond) also carry jaxpr
# params but CANNOT be inlined — they pass through unchanged, so dots
# inside lax control flow are not unrolled (spec functions that need the
# kernel path should keep matrix products out of lax loops).
_CALL_PRIMS = frozenset({
    "pjit", "closed_call", "core_call", "custom_jvp_call",
    "custom_vjp_call", "custom_vjp_call_jaxpr", "remat", "checkpoint",
})


def _subjaxpr(eqn):
  """The inner jaxpr of a call-like primitive, if any."""
  if eqn.primitive.name not in _CALL_PRIMS:
    return None, None
  for key in ("jaxpr", "call_jaxpr"):
    if key in eqn.params:
      inner = eqn.params[key]
      if hasattr(inner, "jaxpr"):  # ClosedJaxpr
        return inner.jaxpr, inner.consts
      return inner, ()
  return None, None


def _interp(jaxpr, consts, *args):
  env = {}

  def read(v):
    return v.val if isinstance(v, Literal) else env[v]

  def write(v, val):
    env[v] = val

  for v, c in zip(jaxpr.constvars, consts):
    write(v, c)
  for v, a in zip(jaxpr.invars, args):
    write(v, a)

  for eqn in jaxpr.eqns:
    invals = [read(v) for v in eqn.invars]
    if eqn.primitive.name == "dot_general":
      outs = [_unrolled_dot(invals[0], invals[1],
                            eqn.params["dimension_numbers"])]
    else:
      inner, inner_consts = _subjaxpr(eqn)
      if inner is not None:
        outs = _interp(inner, inner_consts, *invals)
      else:
        outs = eqn.primitive.bind(*invals, **eqn.params)
        if not eqn.primitive.multiple_results:
          outs = [outs]
    for v, o in zip(eqn.outvars, outs):
      write(v, o)
  return [read(v) for v in jaxpr.outvars]


def unroll_dots(fn):
  """Return fn with every dot_general replaced by unrolled multiply+sum.

  Works on any pytree-in/pytree-out jax-traceable function; apply BEFORE
  vmapping over bank dims (the unrolled ops then vmap elementwise).
  """

  @functools.wraps(fn)
  def wrapped(*args):
    closed, out_shape = jax.make_jaxpr(fn, return_shape=True)(*args)
    flat_args = jax.tree_util.tree_leaves(args)
    out_flat = _interp(closed.jaxpr, closed.consts, *flat_args)
    out_tree = jax.tree_util.tree_structure(out_shape)
    return jax.tree_util.tree_unflatten(out_tree, out_flat)

  return wrapped
