"""Vmapped filter banks: thousands of independent EKFs per chip.

This is the parallelism dimension the reference never had (SURVEY.md §2.5):
N independent EKF_sym instances become one jax program — the per-filter step
from core/step.py vmapped over a leading bank axis, then lax.scan'd over time
so the whole (T steps x B filters) workload compiles to a single XLA
computation with no host round trips. This is the north-star benchmark
surface (BASELINE.json: 16k-wide kinematic bank, >=10M steps/sec/chip).

The bank state is a pytree, so sharding it over a device mesh
(parallel/sharding.py), checkpointing it (orbax/np.save), and differentiating
through it all come for free.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp

from rednose_tpu.core import step as step_ops
from rednose_tpu.core.spec import FilterSpec

Array = Any


@functools.partial(jax.tree_util.register_dataclass,
                   data_fields=('x', 'P', 't'), meta_fields=('epoch',))
@dataclasses.dataclass
class BankState:
  """State of B independent filters: x (B, dim_x), P (B, dim_err, dim_err),
  t (B,) seconds SINCE `epoch`.

  t is stored relative to the (static, host-side) epoch because epoch-scale
  absolute times in float32 have 256 s resolution — `t + dt` would be a
  no-op (see CLAUDE.md). Absolute time = epoch + t.
  """
  x: Array
  P: Array
  t: Array
  epoch: float = 0.0

  @property
  def batch(self) -> int:
    return self.x.shape[0]

  def absolute_t(self):
    import numpy as np
    return self.epoch + np.asarray(self.t, dtype=np.float64)


def init_bank(spec: FilterSpec, x0, P0, batch: int, t0=0.0,
              dtype=jnp.float32) -> BankState:
  """Broadcast one initial (x0, P0) to a B-wide bank; t0 becomes the epoch."""
  x0 = jnp.asarray(x0, dtype=dtype)
  P0 = jnp.asarray(P0, dtype=dtype)
  assert x0.shape == (spec.dim_x,)
  assert P0.shape == (spec.dim_err, spec.dim_err)
  return BankState(
      x=jnp.broadcast_to(x0, (batch, spec.dim_x)),
      P=jnp.broadcast_to(P0, (batch, spec.dim_err, spec.dim_err)),
      t=jnp.zeros((batch,), dtype=dtype),
      epoch=float(t0),
  )


def bank_predict_and_update(spec: FilterSpec, kind: int, params,
                            state: BankState, Q: Array, dt: Array,
                            z: Array, R: Array, ea: Array) -> tuple:
  """One fused predict+update across the whole bank.

  Args (leading axis B = bank width):
    dt (B,) or scalar; z (B, dz); R (B, dz, dz); ea (B, ea_dim).
  Returns (new_state, y (B, dz')).
  """
  dt = jnp.broadcast_to(jnp.asarray(dt, dtype=state.x.dtype), (state.batch,))

  def one(x, P, dt_i, z_i, R_i, ea_i):
    x_p, P_p = step_ops.predict(spec, params, x, P, Q, dt_i)
    x_u, P_u, y = step_ops.update(spec, kind, params, x_p, P_p, z_i, R_i, ea_i)
    return x_u, P_u, y

  x_new, P_new, y = jax.vmap(one)(state.x, state.P, dt, z, R, ea)
  return BankState(x=x_new, P=P_new, t=state.t + dt, epoch=state.epoch), y


def run_bank(spec: FilterSpec, kind: int, params, state: BankState, Q: Array,
             dts: Array, zs: Array, Rs: Array, eas: Array | None = None
             ) -> tuple:
  """Scan T time steps over a B-wide bank: the full (T, B) workload as one
  XLA program.

  Args: dts (T,), zs (T, B, dz), Rs (T, B, dz, dz) or (T, dz, dz) shared.
  Returns (final BankState, ys (T, B, dz')).
  """
  om = spec.obs[kind]
  T, B = zs.shape[0], state.batch
  if Rs.ndim == 3:
    Rs = jnp.broadcast_to(Rs[:, None], (T, B, om.dz, om.dz))
  if eas is None:
    eas = jnp.zeros((T, B, max(om.ea_len, 1)), dtype=state.x.dtype)

  def body(st, inp):
    dt, z, R, ea = inp
    st_new, y = bank_predict_and_update(spec, kind, params, st, Q, dt, z, R, ea)
    return st_new, y

  return jax.lax.scan(body, state, (dts, zs, Rs, eas))


@functools.lru_cache(maxsize=None)
def jit_run_bank(spec: FilterSpec, kind: int):
  return jax.jit(functools.partial(run_bank, spec, kind))


def bank_rmse(state: BankState, truth: Array) -> Array:
  """Bank-wide state RMSE vs a broadcast truth vector — the aggregate metric
  that becomes a psum under sharding (SURVEY.md §2.5 item 2)."""
  return jnp.sqrt(jnp.mean((state.x - truth) ** 2))
