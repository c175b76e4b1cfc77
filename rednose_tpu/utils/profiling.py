"""Tracing / profiling / numeric-debug hooks.

The reference's only tracing is a Cython profile directive
(ekf_sym_pyx.pyx:2, SURVEY.md §5); the TPU-native equivalents are
jax.profiler device traces (viewable in TensorBoard/Perfetto) plus
jax.named_scope annotations on the hot ops, and NaN detection over state
pytrees for divergence debugging.
"""

from __future__ import annotations

import contextlib

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
