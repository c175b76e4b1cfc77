"""Fused Pallas TPU kernel for the live ESKF bank.

The pure-jnp specialized scan (ops/live_lane.py) is HBM-bound: every
lax.scan step round-trips the (22, 22, B) covariance bank (16 MB at
B=8192) plus XLA-materialized intermediates through HBM. This kernel runs
the whole (T x B) workload in one pallas_call with the bank state RESIDENT
IN VMEM across all T steps — the same design as the kinematic kernel
(ops/pallas_step.py), at live scale: measurements stream from HBM one
t_chunk at a time through the Pallas pipeline while x and P never leave
the chip.

Layout: bank folded to (8, B/8) so every (i, j) covariance slab occupies
full (8, 128) f32 vector registers; filter b lives at slab position
(b // bsub, b % bsub). State x is (23, 8, bsub), covariance P is
(22, 22, 8, bsub).

The per-step math is literally ops/live_lane.live_step_slab — the slab
functions are shape-agnostic over trailing bank dims, so kernel and jnp
paths cannot diverge. Parity vs the core/step.py oracle is therefore
inherited from tests/test_live_lane.py, plus an interpret-mode equality
test of this kernel in tests/test_pallas_live.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rednose_tpu.ops.live_lane import live_step_slab

SUBLANES = 8
DIM_X, DIM_E = 23, 22


def pack_live_state(x, P):
  """x (B, 23) + lane-major P (22, 22, B) -> VMEM slab layout
  ((23, 8, B/8), (22, 22, 8, B/8))."""
  B = x.shape[0]
  assert B % SUBLANES == 0, B
  bsub = B // SUBLANES
  return (x.T.reshape(DIM_X, SUBLANES, bsub),
          P.reshape(DIM_E, DIM_E, SUBLANES, bsub))


def unpack_live_state(xp, Pp):
  """Inverse of pack_live_state -> (x (B, 23), P (22, 22, B))."""
  bsub = xp.shape[-1]
  B = SUBLANES * bsub
  return xp.reshape(DIM_X, B).T, Pp.reshape(DIM_E, DIM_E, B)


def pack_measurements(zs):
  """(T, B, 3) -> (T, 3, 8, B/8), matching pack_live_state's bank fold."""
  T, B, dz = zs.shape
  return jnp.swapaxes(zs, 1, 2).reshape(T, dz, SUBLANES, B // SUBLANES)


def _kernel(dts_ref, x_in_ref, p_in_ref, zs_ref, x_out_ref,
            p_out_ref, *, t_chunk: int, q_diag, r_mat, gate: bool):
  j = pl.program_id(1)

  @pl.when(j == 0)
  def _():
    x_out_ref[:] = x_in_ref[:]
    p_out_ref[:] = p_in_ref[:]

  def body(k, carry):
    x, P = carry
    dt = dts_ref[k, 0]
    z = zs_ref[pl.ds(k, 1)].reshape(zs_ref.shape[1:])
    # Q/R enter as static scalar tuples: 2D-array broadcasts would need an
    # unsupported tiled-dim relayout inside the kernel (see live_lane)
    x, P, _ = live_step_slab(x, P, q_diag, dt, z, r_mat, gate=gate)
    return (x, P)

  x, P = jax.lax.fori_loop(0, t_chunk, body, (x_out_ref[:], p_out_ref[:]))
  x_out_ref[:] = x
  p_out_ref[:] = P


@functools.partial(
    jax.jit,
    static_argnames=('q_diag', 'r_mat', 'gate', 't_chunk', 'tile_b',
                     'interpret'))
def live_bank_scan(x_packed, P_packed, zs_packed, dts, *, q_diag, r_mat,
                   gate: bool = False, t_chunk: int = 128,
                   tile_b: int = 1024, interpret: bool = False):
  """Run T fused predict + ECEF_POS-update steps over a B-wide live bank.

  Args:
    x_packed: (23, 8, B/8) from pack_live_state.
    P_packed: (22, 22, 8, B/8) from pack_live_state.
    q_diag: static tuple of 22 process-noise diagonal scalars (the live Q
      is diagonal, models/live.py).
    r_mat: static 3x3 measurement noise as a nested tuple of scalars.
    zs_packed: (T, 3, 8, B/8) position measurements from pack_measurements.
    dts: (T,) per-step time deltas (shared across the bank).
    tile_b: filters per grid tile (must divide B; multiple of 8). The
      (22, 22, 8, tile_b/8) covariance tile must fit VMEM twice (in + out):
      tile_b=1024 -> 2 MB per buffer.
  Returns the final (x_packed, P_packed).
  """
  T = zs_packed.shape[0]
  bsub = x_packed.shape[-1]
  B = SUBLANES * bsub
  tile = tile_b // SUBLANES
  assert x_packed.shape == (DIM_X, SUBLANES, bsub), x_packed.shape
  assert P_packed.shape == (DIM_E, DIM_E, SUBLANES, bsub), P_packed.shape
  assert zs_packed.shape == (T, 3, SUBLANES, bsub), zs_packed.shape
  assert T % t_chunk == 0, (T, t_chunk)
  assert B % tile_b == 0 and tile_b % SUBLANES == 0, (B, tile_b)
  n_b, n_t = B // tile_b, T // t_chunk

  assert len(q_diag) == DIM_E and len(r_mat) == 3, (len(q_diag), len(r_mat))
  kernel = functools.partial(_kernel, t_chunk=t_chunk, q_diag=q_diag,
                             r_mat=r_mat, gate=gate)

  return pl.pallas_call(
      kernel,
      grid=(n_b, n_t),
      in_specs=[
          pl.BlockSpec((t_chunk, 1), lambda i, j: (j, 0),
                       memory_space=pltpu.SMEM),
          pl.BlockSpec((DIM_X, SUBLANES, tile), lambda i, j: (0, 0, i),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((DIM_E, DIM_E, SUBLANES, tile),
                       lambda i, j: (0, 0, 0, i), memory_space=pltpu.VMEM),
          pl.BlockSpec((t_chunk, 3, SUBLANES, tile),
                       lambda i, j: (j, 0, 0, i), memory_space=pltpu.VMEM),
      ],
      out_specs=(
          pl.BlockSpec((DIM_X, SUBLANES, tile), lambda i, j: (0, 0, i),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((DIM_E, DIM_E, SUBLANES, tile),
                       lambda i, j: (0, 0, 0, i), memory_space=pltpu.VMEM),
      ),
      out_shape=(
          jax.ShapeDtypeStruct((DIM_X, SUBLANES, bsub), x_packed.dtype),
          jax.ShapeDtypeStruct((DIM_E, DIM_E, SUBLANES, bsub),
                               P_packed.dtype),
      ),
      # the resident P tile + kernel temporaries exceed the conservative
      # default 16MB scoped-vmem budget at tile_b=1024; the hardware has more
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=100 * 1024 * 1024),
      interpret=interpret,
  )(dts.reshape(T, 1), x_packed, P_packed, zs_packed)


def _mixed_kernel(dts_ref, kinds_ref, rs_ref, x_in_ref, p_in_ref, zs_ref,
                  x_out_ref, p_out_ref, *, t_chunk: int, q_diag, kinds,
                  r_mats, stream_kinds, gate: bool):
  from rednose_tpu.ops.live_lane import (
      live_predict_slab,
      make_update_branches,
  )

  j = pl.program_id(1)

  @pl.when(j == 0)
  def _():
    x_out_ref[:] = x_in_ref[:]
    p_out_ref[:] = p_in_ref[:]

  # the same branch builder the jnp mixed scan uses (streamed kinds read
  # their per-step diagonal noise from SMEM as traced scalars)
  branches = make_update_branches(kinds, dict(zip(kinds, r_mats)),
                                  stream_kinds, gate)

  def body(t, carry):
    x, P = carry
    dt = dts_ref[t, 0]
    ki = kinds_ref[t, 0]
    r_row = (rs_ref[t, 0], rs_ref[t, 1], rs_ref[t, 2])
    z = zs_ref[pl.ds(t, 1)].reshape(zs_ref.shape[1:])
    x, P = live_predict_slab(x, P, q_diag, dt)
    x, P = jax.lax.switch(ki, branches, x, P, z, r_row)
    return (x, P)

  x, P = jax.lax.fori_loop(0, t_chunk, body, (x_out_ref[:], p_out_ref[:]))
  x_out_ref[:] = x
  p_out_ref[:] = P


@functools.partial(
    jax.jit,
    static_argnames=('q_diag', 'kinds', 'r_mats', 'stream_kinds', 'gate',
                     't_chunk', 'tile_b', 'interpret'))
def live_bank_scan_mixed(x_packed, P_packed, zs_packed, dts, kind_idx,
                         r_stream=None, *, q_diag, kinds, r_mats,
                         stream_kinds: tuple = (), gate: bool = False,
                         t_chunk: int = 128, tile_b: int = 1024,
                         interpret: bool = False):
  """Heterogeneous-kind fused live bank: like live_bank_scan, but each step
  dispatches (lax.switch) to the closed-form update of kinds[kind_idx[t]] —
  the whole multi-sensor schedule runs in ONE kernel with VMEM-resident
  state.

  Extra args vs live_bank_scan:
    kind_idx: (T,) int32 indices into `kinds` (streamed via SMEM).
    kinds: static tuple of live ObservationKind ids (each in
      live_lane.LANE_KINDS).
    r_mats: static per-kind measurement noise, tuple (aligned with kinds)
      of (dz, dz) nested scalar tuples.
    r_stream: optional (T, 3) per-step DIAGONAL noise, used by kinds listed
      in `stream_kinds` instead of their static r_mat — the camera-odometry
      kinds' measurement-supplied variances (live_kf.py:325-337).
  zs_packed rows are padded to dz<=3; dz=1 kinds read row 0.
  """
  T = zs_packed.shape[0]
  bsub = x_packed.shape[-1]
  B = SUBLANES * bsub
  tile = tile_b // SUBLANES
  assert x_packed.shape == (DIM_X, SUBLANES, bsub), x_packed.shape
  assert P_packed.shape == (DIM_E, DIM_E, SUBLANES, bsub), P_packed.shape
  assert zs_packed.shape == (T, 3, SUBLANES, bsub), zs_packed.shape
  assert kind_idx.shape == (T,) and T % t_chunk == 0, (kind_idx.shape, T)
  assert B % tile_b == 0 and tile_b % SUBLANES == 0, (B, tile_b)
  n_b, n_t = B // tile_b, T // t_chunk

  if r_stream is None:
    assert not stream_kinds
    r_stream = jnp.zeros((T, 3), dtype=x_packed.dtype)
  assert r_stream.shape == (T, 3), r_stream.shape
  kernel = functools.partial(
      _mixed_kernel, t_chunk=t_chunk, q_diag=q_diag, kinds=kinds,
      r_mats=r_mats, stream_kinds=stream_kinds, gate=gate)

  return pl.pallas_call(
      kernel,
      grid=(n_b, n_t),
      in_specs=[
          pl.BlockSpec((t_chunk, 1), lambda i, j: (j, 0),
                       memory_space=pltpu.SMEM),
          pl.BlockSpec((t_chunk, 1), lambda i, j: (j, 0),
                       memory_space=pltpu.SMEM),
          pl.BlockSpec((t_chunk, 3), lambda i, j: (j, 0),
                       memory_space=pltpu.SMEM),
          pl.BlockSpec((DIM_X, SUBLANES, tile), lambda i, j: (0, 0, i),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((DIM_E, DIM_E, SUBLANES, tile),
                       lambda i, j: (0, 0, 0, i), memory_space=pltpu.VMEM),
          pl.BlockSpec((t_chunk, 3, SUBLANES, tile),
                       lambda i, j: (j, 0, 0, i), memory_space=pltpu.VMEM),
      ],
      out_specs=(
          pl.BlockSpec((DIM_X, SUBLANES, tile), lambda i, j: (0, 0, i),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((DIM_E, DIM_E, SUBLANES, tile),
                       lambda i, j: (0, 0, 0, i), memory_space=pltpu.VMEM),
      ),
      out_shape=(
          jax.ShapeDtypeStruct((DIM_X, SUBLANES, bsub), x_packed.dtype),
          jax.ShapeDtypeStruct((DIM_E, DIM_E, SUBLANES, bsub),
                               P_packed.dtype),
      ),
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=100 * 1024 * 1024),
      interpret=interpret,
  )(dts.reshape(T, 1), kind_idx.reshape(T, 1).astype(jnp.int32),
    jnp.asarray(r_stream, x_packed.dtype), x_packed, P_packed, zs_packed)
