"""Structural partial evaluation of Jacobian-column taps.

The reference's codegen gets sparse, simplified Jacobians for free: sympy
derives each F/H entry symbolically, evaluates at the zero error state,
and structural zeros/identities vanish from the emitted C
(rednose/helpers/ekf_sym.py:76-89). This module is the autodiff
equivalent: it interprets the jaxpr of `jvp(fn)` at scalar granularity
with the evaluation point v = 0 known STRUCTURALLY — sin(0) folds to a
literal 0, cos(0) to 1, multiply-by-zero vanishes, multiply-by-one passes
through — so each Jacobian column emits only its minimal nonzero scalar
arithmetic. For live_kf's error dynamics this reproduces what
ops/live_lane.py derives by hand (rotation-at-zero-error = identity,
derivative = skew), from the user's unmodified jnp model code.

Why it matters: tracing plain jacfwd/jvp taps inside a Pallas kernel
emits the full dead multiply-by-zero pipeline (thousands of ops), which
times out / OOMs the Mosaic compiler. Structural taps emit tens of ops
per column.

Mechanics: every interpreter value is a small numpy object-array whose
elements are None (structural zero), python numbers (folded constants),
lazy references into traced arrays (sliced out only when used), or traced
JAX scalars. Emission is memoized across taps, so shared primal
subexpressions trace once. Unrecognized primitives fall back to
materializing operands and binding the real primitive — correctness is
never lost, only sparsity. Shapes are per-filter logical shapes; bank
dims are added outside by vmap.
"""

from __future__ import annotations

import itertools

import numpy as np

import jax
import jax.numpy as jnp
from jax.extend.core import Literal


class _LazyArray:
  """Scalar elements of a traced array, sliced out (and cached) on use."""

  __slots__ = ("arr", "cache")

  def __init__(self, arr):
    self.arr = arr
    self.cache = {}

  def element(self, idx):
    if idx not in self.cache:
      self.cache[idx] = self.arr[idx]
    return self.cache[idx]


class _Elem:
  """Lazy reference to one element of a _LazyArray."""

  __slots__ = ("la", "idx")

  def __init__(self, la, idx):
    self.la = la
    self.idx = idx

  def resolve(self):
    return self.la.element(self.idx)

  def key(self):
    return (id(self.la), self.idx)


def _key(x):
  if x is None or isinstance(x, (int, float)):
    return x
  if isinstance(x, _Elem):
    return x.key()
  return id(x)


# f(0) = 0 elementwise primitives (safe to fold None -> None)
_ZERO_PRESERVING = frozenset({
    "sin", "tan", "tanh", "sinh", "asin", "atan", "asinh", "atanh",
    "expm1", "log1p", "abs", "sign", "neg", "sqrt", "cbrt", "erf",
    "real", "imag", "round", "floor", "ceil",
})
# f(0) = 1 elementwise primitives
_ONE_AT_ZERO = frozenset({"cos", "cosh", "exp"})

# elementwise binaries with no safe structural shortcut: fold const-const
# through the jnp fn (works on python floats), emit otherwise
_BINOP_FNS = {
    "max": jnp.maximum, "min": jnp.minimum, "atan2": jnp.arctan2,
    "rem": jnp.remainder,
    "eq": lambda a, b: a == b, "ne": lambda a, b: a != b,
    "lt": lambda a, b: a < b, "le": lambda a, b: a <= b,
    "gt": lambda a, b: a > b, "ge": lambda a, b: a >= b,
}


class _Interp:
  """Zero-propagating jaxpr interpreter with memoized scalar emission."""

  def __init__(self, zero):
    self.zero = zero   # traced scalar 0.0 used when materializing
    self.lazy = {}     # id(traced array) -> _LazyArray
    self.memo = {}     # (op, operand keys...) -> emitted scalar

  # ---------------------------------------------------------- scalar rules

  def _emit(self, opname, fn, *xs):
    key = (opname,) + tuple(_key(x) for x in xs)
    if key not in self.memo:
      self.memo[key] = fn(*[x.resolve() if isinstance(x, _Elem) else x
                            for x in xs])
    return self.memo[key]

  def s_mul(self, x, y):
    if x is None or y is None:
      return None
    if isinstance(x, (int, float)) and isinstance(y, (int, float)):
      return x * y
    for lit, other in ((x, y), (y, x)):
      if isinstance(lit, (int, float)):
        if lit == 1.0:
          return other
        if lit == -1.0:
          return self.s_neg(other)
    return self._emit("mul", lambda a, b: a * b, x, y)

  def s_add(self, x, y):
    if x is None:
      return y
    if y is None:
      return x
    if isinstance(x, (int, float)) and isinstance(y, (int, float)):
      return x + y
    return self._emit("add", lambda a, b: a + b, x, y)

  def s_sub(self, x, y):
    if y is None:
      return x
    if x is None:
      return self.s_neg(y)
    if isinstance(x, (int, float)) and isinstance(y, (int, float)):
      return x - y
    return self._emit("sub", lambda a, b: a - b, x, y)

  def s_neg(self, x):
    if x is None:
      return None
    if isinstance(x, (int, float)):
      return -x
    return self._emit("neg", lambda a: -a, x)

  def s_div(self, x, y):
    if y is None or (isinstance(y, (int, float)) and y == 0.0):
      # Structurally-zero denominator: emit the REAL division so NaN/inf
      # semantics match the jacfwd oracle (0/0 -> NaN — folding to 0 would
      # silently diverge for pathological specs), materializing None
      # operands instead of crashing _emit with them.
      xm = self.zero if x is None else (
          self.zero + x if isinstance(x, (int, float)) else x)
      ym = self.zero if y is None else self.zero + y
      return self._emit("div", lambda a, b: a / b, xm, ym)
    if x is None:
      return None
    if isinstance(x, (int, float)) and isinstance(y, (int, float)):
      return x / y
    return self._emit("div", lambda a, b: a / b, x, y)

  def s_unary(self, name, x, jfn):
    if x is None:
      if name in _ZERO_PRESERVING:
        return None
      if name in _ONE_AT_ZERO:
        return 1.0
      x = 0.0
    return self._emit(name, jfn, x)

  def s_pow(self, x, y):
    if isinstance(x, (int, float)) and isinstance(y, (int, float)):
      return x ** y
    if y is None or (isinstance(y, (int, float)) and y == 0.0):
      return 1.0  # x**0 == 1 in jax/numpy floating semantics (incl. 0**0)
    if x is None:
      if isinstance(y, (int, float)) and y > 0:
        return None  # 0**y == 0 for y > 0
      x = 0.0  # 0**negative / traced exponent: emit the real op
    return self._emit("pow", lambda a, b: a ** b, x, y)

  def s_binop(self, name, x, y, jfn):
    """Generic binary rule (max, min, comparisons, ...): no structural
    shortcut is safe, so emit the real (memoized) op with structural
    zeros materialized as 0.0; const-const emits a concrete scalar."""
    return self._emit(name, jfn, 0.0 if x is None else x,
                      0.0 if y is None else y)

  # ------------------------------------------------------------- conversion

  def lazy_obj(self, v, logical_shape):
    """Object array of lazy references into `v`, addressed by LOGICAL shape.

    Slab mode: `v` may carry arbitrary trailing bank dims beyond
    logical_shape — element (i, ...) is then the slab v[i, ...] of bank
    payload, and every emitted scalar op becomes a slab op. The jaxpr being
    interpreted is always traced at logical shapes; only the payloads are
    banked (see run_entry_taps)."""
    la = self.lazy.get(id(v))
    if la is None or la.arr is not v:
      la = _LazyArray(v)
      self.lazy[id(v)] = la
    out = np.empty(logical_shape, dtype=object)
    if not logical_shape:
      out[()] = _Elem(la, ())
    else:
      for idx in np.ndindex(logical_shape):
        out[idx] = _Elem(la, idx)
    return out

  def to_obj(self, v):
    if isinstance(v, np.ndarray) and v.dtype == object:
      return v
    if not isinstance(v, jax.core.Tracer):
      # concrete: python number, numpy array, committed jax array, or a
      # Literal's TypedNdArray wrapper — fold to structural constants
      arr = np.asarray(v)
      out = np.empty(arr.shape, dtype=object)
      for idx in np.ndindex(arr.shape):
        x = arr[idx].item()
        out[idx] = None if x == 0.0 else x
      return out
    la = self.lazy.get(id(v))
    if la is None or la.arr is not v:
      la = _LazyArray(v)
      self.lazy[id(v)] = la
    shape = np.shape(v)
    out = np.empty(shape, dtype=object)
    if not shape:
      out[()] = _Elem(la, ())
    else:
      for idx in np.ndindex(shape):
        out[idx] = _Elem(la, idx)
    return out

  def materialize(self, obj):
    pshape = jnp.shape(self.zero)  # bank payload shape ((), or (*b) in slab mode)

    def conc(e):
      if e is None:
        return self.zero
      if isinstance(e, (int, float)):
        return self.zero + e if e != 0.0 else self.zero
      if isinstance(e, _Elem):
        e = e.resolve()
      # slab mode: elements may mix () payloads (e.g. pure-dt entries) with
      # (*b) payloads; stack needs them uniform
      if jnp.shape(e) != pshape:
        e = jnp.broadcast_to(e, pshape)
      return e

    if obj.ndim == 0:
      return jnp.asarray(conc(obj[()]))
    out = jnp.stack([jnp.asarray(conc(e)) for e in obj.ravel()])
    # leading-dims reshape only: bank (tiled) dims stay put, Mosaic-safe
    return out.reshape(obj.shape + pshape) if obj.ndim > 1 else out

  # ------------------------------------------------------------ array rules

  def ew2(self, a, b, rule):
    shape = np.broadcast_shapes(a.shape, b.shape)
    a = np.broadcast_to(a, shape)
    b = np.broadcast_to(b, shape)
    out = np.empty(shape, dtype=object)
    for idx in np.ndindex(shape):
      out[idx] = rule(a[idx], b[idx])
    return out

  def ew1(self, obj, fn):
    out = np.empty(obj.shape, dtype=object)
    for idx in np.ndindex(obj.shape):
      out[idx] = fn(obj[idx])
    return out

  def dot(self, a, b, dimension_numbers):
    (lc, rc), (lb, rb) = dimension_numbers
    lc, rc, lb, rb = map(tuple, (lc, rc, lb, rb))
    l_free = [i for i in range(a.ndim) if i not in lc + lb]
    r_free = [i for i in range(b.ndim) if i not in rc + rb]
    out_shape = tuple([a.shape[d] for d in lb]
                      + [a.shape[d] for d in l_free]
                      + [b.shape[d] for d in r_free])
    out = np.empty(out_shape, dtype=object)
    for bidx in itertools.product(*[range(a.shape[d]) for d in lb]):
      for fidx in itertools.product(*[range(a.shape[d]) for d in l_free]):
        for gidx in itertools.product(*[range(b.shape[d]) for d in r_free]):
          acc = None
          for cidx in itertools.product(*[range(a.shape[d]) for d in lc]):
            ai = [0] * a.ndim
            bi = [0] * b.ndim
            for d, v in zip(lb, bidx):
              ai[d] = v
            for d, v in zip(l_free, fidx):
              ai[d] = v
            for d, v in zip(lc, cidx):
              ai[d] = v
            for d, v in zip(rb, bidx):
              bi[d] = v
            for d, v in zip(r_free, gidx):
              bi[d] = v
            for d, v in zip(rc, cidx):
              bi[d] = v
            acc = self.s_add(acc, self.s_mul(a[tuple(ai)], b[tuple(bi)]))
          out[bidx + fidx + gidx] = acc
    return out

  def reduce_sum(self, obj, axes):
    axes = tuple(axes)
    out_shape = tuple(s for i, s in enumerate(obj.shape) if i not in axes)
    out = np.empty(out_shape, dtype=object)
    for oidx in np.ndindex(out_shape):
      it = iter(oidx)
      base = [next(it) if i not in axes else 0 for i in range(obj.ndim)]
      acc = None
      for ridx in itertools.product(*[range(obj.shape[a]) for a in axes]):
        idx = list(base)
        for a, v in zip(axes, ridx):
          idx[a] = v
        acc = self.s_add(acc, obj[tuple(idx)])
      out[oidx] = acc
    return out

  # ------------------------------------------------------------ interpreter

  def run(self, jaxpr, consts, *args):
    env = {}

    def read(v):
      if isinstance(v, Literal):
        return self.to_obj(v.val)
      return env[v]

    for var, c in zip(jaxpr.constvars, consts):
      env[var] = c if (isinstance(c, np.ndarray) and c.dtype == object) \
          else self.to_obj(c)
    for var, a in zip(jaxpr.invars, args):
      env[var] = a if (isinstance(a, np.ndarray) and a.dtype == object) \
          else self.to_obj(a)

    for eqn in jaxpr.eqns:
      name = eqn.primitive.name
      invals = [read(v) for v in eqn.invars]
      p = eqn.params
      if name == "mul":
        outs = [self.ew2(invals[0], invals[1], self.s_mul)]
      elif name in ("add", "add_any"):
        outs = [self.ew2(invals[0], invals[1], self.s_add)]
      elif name == "sub":
        outs = [self.ew2(invals[0], invals[1], self.s_sub)]
      elif name == "div":
        outs = [self.ew2(invals[0], invals[1], self.s_div)]
      elif name == "neg":
        outs = [self.ew1(invals[0], self.s_neg)]
      elif name in _ZERO_PRESERVING or name in _ONE_AT_ZERO:
        prim = eqn.primitive
        outs = [self.ew1(
            invals[0],
            lambda x: self.s_unary(name, x,
                                   lambda a: prim.bind(a, **p)))]
      elif name == "pow":
        outs = [self.ew2(invals[0], invals[1], self.s_pow)]
      elif name in _BINOP_FNS:
        jfn = _BINOP_FNS[name]
        outs = [self.ew2(
            invals[0], invals[1],
            lambda a, b, jfn=jfn, name=name: self.s_binop(name, a, b, jfn))]
      elif name == "select_n":
        # elementwise n-way select; no structural shortcut (the predicate
        # decides at runtime) — materialize Nones per element, and in slab
        # mode broadcast every case to the common payload shape (lax.select
        # requires identical case shapes; a () const case against a (*b)
        # traced case would otherwise crash)
        def _sel(*elems):
          vals = [0.0 if e is None else
                  (e.resolve() if isinstance(e, _Elem) else e)
                  for e in elems]
          vals = [jnp.asarray(v) if isinstance(v, (int, float, bool))
                  else v for v in vals]
          pshape = np.broadcast_shapes(*[jnp.shape(v) for v in vals])
          if pshape:
            vals = [jnp.broadcast_to(v, pshape) for v in vals]
          return eqn.primitive.bind(*vals, **p)

        shape = np.broadcast_shapes(*[v.shape for v in invals])
        bc = [np.broadcast_to(v, shape) for v in invals]
        out = np.empty(shape, dtype=object)
        for idx in np.ndindex(shape):
          out[idx] = _sel(*[v[idx] for v in bc])
        outs = [out]
      elif name in ("scatter", "scatter-add"):
        # the `.at[static slices].set/add` family: constant start indices,
        # full-window updates — resolved at the OBJECT level, so user model
        # code written with scatter updates (which Mosaic cannot lower)
        # still reaches the kernels through this interpreter.
        operand, indices, updates = invals
        dn = p["dimension_numbers"]
        uw = tuple(dn.update_window_dims)
        # index 0 folds to structural None in to_obj — it is the const 0
        starts_flat = [0 if e is None else e for e in indices.ravel()]
        supported = (
            not dn.inserted_window_dims and not dn.operand_batching_dims
            and uw == tuple(range(updates.ndim))
            and indices.ndim <= 1
            and all(isinstance(e, (int, float)) for e in starts_flat))
        if not supported:
          raise NotImplementedError(
              f"structural interpreter: only static-slice scatters "
              f"(.at[i:j].set/.add with constant indices) are supported; "
              f"got {name} with {dn}, indices shape {indices.shape} "
              f"elements {[type(e).__name__ for e in starts_flat]}, "
              f"updates ndim {updates.ndim} — rewrite the model with "
              f"jnp.concatenate, or keep this spec off the kernel paths")
        start = [0] * operand.ndim
        for d, si in zip(tuple(dn.scatter_dims_to_operand_dims),
                         starts_flat):
          start[d] = int(si)
        region = tuple(slice(start[d], start[d] + updates.shape[d])
                       for d in range(operand.ndim))
        out = operand.copy()
        if name == "scatter":
          out[region] = updates
        else:
          out[region] = self.ew2(operand[region], updates, self.s_add)
        outs = [out]
      elif name == "integer_pow":
        y = p["y"]
        outs = [self.ew1(
            invals[0],
            lambda x: (None if (x is None and y > 0) else
                       x ** y if isinstance(x, (int, float)) else
                       self._emit(f"ipow{y}",
                                  lambda a: eqn.primitive.bind(a, **p),
                                  0.0 if x is None else x)))]
      elif name == "slice":
        sl = tuple(slice(b, e, s) for b, e, s in zip(
            p["start_indices"], p["limit_indices"],
            p["strides"] or (1,) * len(p["start_indices"])))
        outs = [invals[0][sl]]
      elif name == "squeeze":
        outs = [np.squeeze(invals[0], axis=tuple(p["dimensions"]))]
      elif name == "reshape":
        outs = [np.reshape(invals[0], tuple(p["new_sizes"]))]
      elif name == "transpose":
        outs = [np.transpose(invals[0], tuple(p["permutation"]))]
      elif name == "concatenate":
        outs = [np.concatenate(invals, axis=p["dimension"])]
      elif name == "broadcast_in_dim":
        obj = invals[0]
        shape = tuple(p["shape"])
        bdims = tuple(p["broadcast_dimensions"])
        out = np.empty(shape, dtype=object)
        for idx in np.ndindex(shape):
          src = tuple(idx[d] if obj.shape[i] != 1 else 0
                      for i, d in enumerate(bdims))
          out[idx] = obj[src]
        outs = [out]
      elif name == "dot_general":
        outs = [self.dot(invals[0], invals[1], p["dimension_numbers"])]
      elif name == "reduce_sum":
        outs = [self.reduce_sum(invals[0], p["axes"])]
      elif name == "convert_element_type":
        outs = [invals[0]]
      elif name == "expand_dims":
        outs = [np.expand_dims(invals[0], tuple(p["dimensions"]))]
      elif name in ("pjit", "jit", "closed_call", "core_call",
                    "custom_jvp_call", "custom_vjp_call", "remat",
                    "checkpoint"):
        inner = None
        for key in ("jaxpr", "call_jaxpr"):
          if key in p:
            inner = p[key]
            break
        if hasattr(inner, "jaxpr"):
          outs = self.run(inner.jaxpr, list(inner.consts), *invals)
        else:
          outs = self.run(inner, [], *invals)
      else:
        # correctness fallback: materialize operands, bind the real op
        mats = [self.materialize(v) for v in invals]
        res = eqn.primitive.bind(*mats, **p)
        if not eqn.primitive.multiple_results:
          res = [res]
        pshape = jnp.shape(self.zero)
        if pshape == ():
          outs = [self.to_obj(r) for r in res]
        else:
          # slab mode: materialized operands carried payload dims, so only
          # ELEMENTWISE primitives produce logical+payload results; anything
          # shape-parameterized would be silently wrong — refuse loudly.
          logical = np.broadcast_shapes(*[v.shape for v in invals]) \
              if invals else ()
          outs = []
          for r in res:
            if jnp.shape(r) != tuple(logical) + pshape:
              raise NotImplementedError(
                  f"structural interpreter: primitive {name!r} has no slab "
                  f"rule and is not elementwise (result {jnp.shape(r)} vs "
                  f"logical {logical} + payload {pshape}); add a rule")
            outs.append(self.lazy_obj(r, tuple(logical)))
      for var, o in zip(eqn.outvars, outs):
        env[var] = o
    return [read(v) for v in jaxpr.outvars]


def run_primal(fn, logical_args, slab_args, interp: _Interp):
  """Evaluate fn through the structural interpreter on SLAB inputs.

  fn is traced once at per-filter logical shapes (`logical_args`:
  ShapeDtypeStructs); the interpretation then runs with `slab_args` —
  traced arrays whose leading dims match the logical shapes and whose
  trailing dims are arbitrary bank dims — so every emitted scalar op is a
  slab op. Sharing one `interp` across calls CSEs common subexpressions
  (e.g. the rotation matrix entries between the nominal-state propagation
  and the Jacobian taps), exactly like the reference's sympy CSE pass
  (sympy_helpers.py:122-162). fn must NOT close over slab-valued arrays
  (they would be captured as consts at the wrong shape) — thread them as
  explicit args. Returns the OBJECT arrays of fn's outputs (materialize
  with interp.materialize)."""
  closed = jax.make_jaxpr(fn)(*logical_args)
  consts = []
  for c in closed.consts:
    if isinstance(c, jax.core.Tracer):  # genuinely traced closure value
      consts.append(interp.lazy_obj(c, tuple(np.shape(c))))
    else:  # concrete (numpy, python, committed jax array): fold to consts
      consts.append(interp.to_obj(np.asarray(c)))
  objs = []
  for a, ls in zip(slab_args, logical_args):
    if isinstance(a, np.ndarray) and a.dtype == object:
      objs.append(a)
    else:
      objs.append(interp.lazy_obj(a, tuple(ls.shape)))
  return interp.run(closed.jaxpr, consts, *objs)


def run_entry_taps(fn, logical_args, slab_args, n: int, dtype, cols,
                   interp: _Interp):
  """Jacobian-column taps of fn(*args, v) at v = 0, returned as RAW entry
  lists instead of stacked arrays.

  Returns (primal_obj, {col: [entries]}) where each entry is None
  (structural zero), a python number (folded constant), or a traced
  scalar/slab — so consumers can drive row-sparse slab algebra directly
  from the scalars, skipping the ~40-op-per-column stack/broadcast
  materialization AND preserving entry-level sparsity a stacked column
  hides. Slab semantics as in run_primal."""
  sds = jax.ShapeDtypeStruct((n,), dtype)

  def wrapper(*all_args):
    args, v, t = all_args[:-2], all_args[-2], all_args[-1]
    return jax.jvp(lambda vv: fn(*args, vv), (v,), (t,))

  closed = jax.make_jaxpr(wrapper)(*logical_args, sds, sds)
  consts = []
  for c in closed.consts:
    if isinstance(c, jax.core.Tracer):  # genuinely traced closure value
      consts.append(interp.lazy_obj(c, tuple(np.shape(c))))
    else:  # concrete (numpy, python, committed jax array): fold to consts
      consts.append(interp.to_obj(np.asarray(c)))
  objs = []
  for a, ls in zip(slab_args, logical_args):
    if isinstance(a, np.ndarray) and a.dtype == object:
      objs.append(a)
    else:
      objs.append(interp.lazy_obj(a, tuple(ls.shape)))
  zvec = np.empty((n,), dtype=object)
  zvec[:] = None

  primal_obj = None
  taps = {}
  for k in cols:
    onehot = np.empty((n,), dtype=object)
    onehot[:] = None
    onehot[k] = 1.0
    primal_obj, tangent = interp.run(closed.jaxpr, consts, *objs, zvec,
                                     onehot)
    taps[k] = [e.resolve() if isinstance(e, _Elem) else e for e in tangent]
  if primal_obj is None:  # no columns requested: still evaluate the primal
    primal_obj, _ = interp.run(closed.jaxpr, consts, *objs, zvec, zvec)
  return primal_obj, taps


def jvp_taps(fn, n: int, dtype, cols, zero):
  """Primal fn(0) and Jacobian columns [d fn/d v |_0 @ e_k for k in cols],
  partially evaluated with v = 0 known structurally.

  fn: vector (n,) -> vector; typically closes over traced state x.
  zero: a traced scalar 0.0 DERIVED FROM AN INPUT (jnp constants are
  rejected as captured constants inside Pallas kernels).
  Returns (primal (m,), [columns (m,)]).
  """
  sds = jax.ShapeDtypeStruct((n,), dtype)
  closed = jax.make_jaxpr(lambda v, t: jax.jvp(fn, (v,), (t,)))(sds, sds)
  interp = _Interp(zero)
  consts = [interp.to_obj(c) for c in closed.consts]
  zvec = np.empty((n,), dtype=object)
  zvec[:] = None

  primal_obj = None
  cols_out = []
  for k in cols:
    onehot = np.empty((n,), dtype=object)
    onehot[:] = None
    onehot[k] = 1.0
    primal_obj, tangent = interp.run(closed.jaxpr, consts, zvec, onehot)
    cols_out.append(interp.materialize(tangent))
  if primal_obj is None:  # no columns requested: still need the primal
    primal_obj, _ = interp.run(closed.jaxpr, consts, zvec, zvec)
  return interp.materialize(primal_obj), cols_out
