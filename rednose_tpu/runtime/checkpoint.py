"""Disk checkpoint / resume for filters and banks.

The reference has no disk checkpointing (SURVEY.md §5): openpilot warm-starts
by calling init_state with its own persisted state (ekf_sym.py:351-358). Here
the filter state is a pytree, so checkpointing is a plain .npz round trip —
save_filter/load_filter cover the single-stream engine (its (x, P, t) plus
runtime params), save_bank/load_bank cover vmapped BankStates of any width.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from rednose_tpu.runtime.bank import BankState


def save_filter(path, engine):
  """Persist a FilterEngine's resumable state (x, P, filter_time, params).

  For the common flat-mapping params case the keys are saved too, so
  load_filter can rebuild the dict without an externally-kept treedef."""
  leaves, treedef = jax.tree.flatten(engine.params)
  extra = {}
  if (isinstance(engine.params, dict)
      and all(isinstance(k, str) for k in engine.params)
      and jax.tree_util.all_leaves(list(engine.params.values()))):
    # genuinely flat: every value is a leaf (a length check alone would
    # false-positive on single-leaf containers like {'g': (arr,)} and
    # silently strip the wrapper on load)
    # jax flattens dicts in sorted-key order; record that same order
    extra["param_keys"] = np.asarray(sorted(engine.params), dtype=np.str_)
  np.savez(
      path,
      x=np.asarray(engine.x),
      P=np.asarray(engine.P),
      filter_time=np.asarray(
          np.nan if engine.filter_time is None else engine.filter_time),
      augment_times=np.asarray(engine.augment_times, dtype=np.float64),
      n_params=np.asarray(len(leaves)),
      **{f"param_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)},
      **extra,
  )
  return treedef  # caller keeps the treedef if params have structure


def load_filter(path, engine, treedef=None):
  """Restore a FilterEngine from save_filter output (rewind ring resets,
  matching init_state semantics, ekf_sym.py:351-358). Saved runtime params
  are restored via `treedef` (any pytree) or the self-describing saved keys
  (flat string-keyed dicts); raises rather than silently resuming with the
  engine's current params when neither is available."""
  with np.load(path) as data:
    t = float(data["filter_time"])
    engine.init_state(data["x"], data["P"], None if np.isnan(t) else t)
    if "augment_times" in data:  # MSCKF clone-window bookkeeping
      engine.augment_times = list(data["augment_times"])
    n = int(data["n_params"])
    if n:
      leaves = [jnp.asarray(data[f"param_{i}"]) for i in range(n)]
      if treedef is not None:
        engine.params = jax.tree.unflatten(treedef, leaves)
      elif "param_keys" in data:
        keys = [str(k) for k in data["param_keys"]]
        engine.params = dict(zip(keys, leaves))
      else:
        raise ValueError(
            f"checkpoint carries {n} param leaves of a non-mapping pytree; "
            "pass the treedef returned by save_filter to restore them")
  return engine


def save_bank(path, state: BankState):
  np.savez(path, x=np.asarray(state.x), P=np.asarray(state.P),
           t=np.asarray(state.t), epoch=np.asarray(state.epoch))


def load_bank(path, dtype=None) -> BankState:
  with np.load(path) as data:
    return BankState(
        x=jnp.asarray(data["x"], dtype=dtype),
        P=jnp.asarray(data["P"], dtype=dtype),
        t=jnp.asarray(data["t"], dtype=dtype),
        epoch=float(data["epoch"]) if "epoch" in data else 0.0,
    )
