"""Tracing / profiling / numeric-debug hooks.

The reference's only tracing is a Cython profile directive
(ekf_sym_pyx.pyx:2, SURVEY.md §5); the TPU-native equivalents are
jax.profiler device traces (viewable in TensorBoard/Perfetto) plus
jax.named_scope annotations on the hot ops, and NaN detection over state
pytrees for divergence debugging.
"""

from __future__ import annotations

import contextlib
import math

import jax
import jax.numpy as jnp

named_scope = jax.named_scope


@contextlib.contextmanager
def trace(logdir: str):
  """Capture a device trace around a block: with trace('/tmp/tb'): run()."""
  jax.profiler.start_trace(logdir)
  try:
    yield
  finally:
    jax.profiler.stop_trace()


def annotate_step(fn, name: str):
  """Wrap a step function in a named scope so it is attributable in traces."""
  def wrapped(*args, **kwargs):
    with jax.named_scope(name):
      return fn(*args, **kwargs)
  return wrapped


def assert_finite(tree, name: str = "state"):
  """Host-side NaN/inf check over a pytree; raises on divergence. For traced
  contexts enable jax_debug_nans instead (SURVEY.md §5 race-detection
  equivalent)."""
  import numpy as np

  for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
    arr = np.asarray(leaf)
    if not np.all(np.isfinite(arr)):
      raise FloatingPointError(
          f"non-finite values in {name}{jax.tree_util.keystr(path)}")


def finite_or_nan_flag(tree):
  """Traced all-finite flag for use inside jit (bank health monitoring)."""
  leaves = jax.tree.leaves(tree)
  ok = jnp.array(True)
  for leaf in leaves:
    ok = jnp.logical_and(ok, jnp.all(jnp.isfinite(leaf)))
  return ok


# Elementwise primitives counted as 1 FLOP per output element. Transcendental
# ops cost more than one hardware op, but on the VPU they are within a small
# constant of 1 and the covariance math that dominates these kernels is all
# mul/add, so the flat rule keeps the count conservative and auditable.
_ELEMENTWISE_FLOP_PRIMS = frozenset({
    'add', 'sub', 'mul', 'div', 'rem', 'neg', 'max', 'min', 'pow',
    'integer_pow', 'exp', 'log', 'log1p', 'expm1', 'sqrt', 'rsqrt', 'cbrt',
    'sin', 'cos', 'tan', 'asin', 'acos', 'atan', 'atan2', 'sinh', 'cosh',
    'tanh', 'logistic', 'erf', 'erfc', 'abs', 'sign', 'floor', 'ceil',
    'round', 'nextafter', 'select_n', 'clamp', 'square',
})
# Comparisons: 1 op per output element (they feed gates/selects on the VPU).
_COMPARE_PRIMS = frozenset({'eq', 'ne', 'lt', 'le', 'gt', 'ge'})
_CALL_JAXPR_PARAMS = ('jaxpr', 'call_jaxpr', 'fun_jaxpr')


def _eqn_size(eqn):
  return sum(int(math.prod(v.aval.shape)) for v in eqn.outvars)


def _count_jaxpr_flops(jaxpr) -> int:
  total = 0
  for eqn in jaxpr.eqns:
    prim = eqn.primitive.name
    if prim == 'dot_general':
      dims = eqn.params['dimension_numbers']
      (lc, _), _ = dims
      lhs_shape = eqn.invars[0].aval.shape
      k = math.prod(lhs_shape[d] for d in lc) or 1
      out = math.prod(eqn.outvars[0].aval.shape)
      total += 2 * out * k
    elif prim == 'conv_general_dilated':
      # rhs spatial+input-channel window size, 2 FLOP per MAC
      rhs_shape = eqn.invars[1].aval.shape
      out = math.prod(eqn.outvars[0].aval.shape)
      dn = eqn.params['dimension_numbers']
      window = math.prod(rhs_shape[d] for d in
                         (dn.rhs_spec[1], *dn.rhs_spec[2:]))
      total += 2 * out * window
    elif prim == 'scan':
      total += int(eqn.params['length']) * _count_jaxpr_flops(
          eqn.params['jaxpr'].jaxpr)
    elif prim == 'while':
      # unknown trip count: count ONE body+cond evaluation (documented;
      # callers multiply by their own bound if they need a ceiling)
      total += _count_jaxpr_flops(eqn.params['body_jaxpr'].jaxpr)
      total += _count_jaxpr_flops(eqn.params['cond_jaxpr'].jaxpr)
    elif prim == 'cond':
      total += max((_count_jaxpr_flops(b.jaxpr)
                    for b in eqn.params['branches']), default=0)
    elif prim in ('custom_jvp_call', 'custom_vjp_call', 'remat', 'remat2',
                  'checkpoint', 'pjit', 'closed_call', 'core_call',
                  'xla_call', 'named_call', 'custom_vjp_call_jaxpr'):
      for key in _CALL_JAXPR_PARAMS:
        inner = eqn.params.get(key)
        if inner is not None:
          total += _count_jaxpr_flops(getattr(inner, 'jaxpr', inner))
          break
    elif prim in _ELEMENTWISE_FLOP_PRIMS or prim in _COMPARE_PRIMS:
      total += _eqn_size(eqn)
    # data movement (reshape/slice/concat/broadcast/transpose/convert) and
    # control primitives: 0 FLOP
  return total


def jaxpr_flops(fn, *args, **kwargs) -> int:
  """Count FLOPs of fn(*args) by walking its jaxpr: each arithmetic eqn
  contributes prod(output shape) (a (22,22,B) mul is 484*B FLOPs, not 1),
  dot_general contributes 2*out*K, scan multiplies by its trip count.
  This is the counting rule behind every FLOP/step figure in PARITY.md —
  rerun it on the same step function to audit those claims."""
  closed = jax.make_jaxpr(fn)(*args, **kwargs)
  return _count_jaxpr_flops(closed.jaxpr)


def cost_report(fn, *args, **kwargs):
  """Compile fn for the given args and return XLA's cost analysis
  ({'flops': ..., 'bytes accessed': ..., ...}) — per-kernel cost
  reporting for roofline checks (used to validate the FLOP counts quoted
  in PARITY.md). Returns {} if the backend exposes no analysis."""
  compiled = jax.jit(fn).lower(*args, **kwargs).compile()
  try:
    analysis = compiled.cost_analysis()
  except NotImplementedError:  # backend exposes no analysis
    return {}
  if analysis is None:
    return {}
  # jax returns either a dict or a single-element list of dicts by version
  if isinstance(analysis, (list, tuple)):
    analysis = analysis[0] if analysis else {}
  return dict(analysis)
