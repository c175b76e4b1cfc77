"""Fused Pallas TPU kernel for the kinematic EKF bank.

The TPU-native replacement for the reference's hand-written Eigen hot loop
(rednose/templates/ekf_c.c:8-121), redesigned for the hardware instead of
translated: rather than one small-matrix predict/update per call, the kernel
runs the ENTIRE (T steps x B filters) workload in one pallas_call with the
filter state resident in VMEM across all T steps. Every step is closed-form
elementwise VPU math and measurements stream from HBM one block at a time
via the Pallas pipeline.

Layout: structure-of-arrays with the bank folded to (8, B/8) so every
variable occupies FULL (8, 128) f32 vector registers — a flat (1, B) row per
variable would waste 7/8 of each vreg and cost ~8x in issued VPU ops
(measured: 25B -> >100B steps/s from this fold alone). Filter b lives at
slab position (b // Bsub, b % Bsub), Bsub = B/8.

Packed state (5 slabs x 8 sublanes = 40 rows):
  rows  0- 7: x0 (position)   rows  8-15: x1 (velocity)
  rows 16-23: P00   rows 24-31: P01   rows 32-39: P11

Covariance math is the scalar closed form of the generic step for
  F = [[1, dt], [0, 1]],  H = [1, 0],  diagonal Q, scalar R
including the Mahalanobis gate — implemented as zero-gain rejection, the
exact R->inf limit of the reference's 1e16 R inflation (ekf_c.c:88-94),
overflow-safe in f32 — and the Joseph-form covariance update (ekf_c.c:115). Parity with core/step.py is
asserted in tests (interpret mode on CPU, compiled on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rednose_tpu.utils.chi2 import chi2_ppf

# chi2.ppf(0.95, 1): the baked threshold the reference codegen emits for
# 1-dim maha-gated kinds (ekf_sym.py:144-147); computed, not hardcoded, so
# it cannot drift from the shared chi2 implementation.
MAHA_THRESH_1D = chi2_ppf(0.95, 1)

SUBLANES = 8
STATE_SLABS = 5  # x0, x1, P00, P01, P11
STATE_ROWS = STATE_SLABS * SUBLANES


def pack_state(x, P):
  """(B, 2) state + (B, 2, 2) cov -> packed (40, B/8) SoA layout."""
  B = x.shape[0]
  assert B % SUBLANES == 0, B
  bsub = B // SUBLANES
  rows = [x[:, 0], x[:, 1], P[:, 0, 0], P[:, 0, 1], P[:, 1, 1]]
  return jnp.concatenate([r.reshape(SUBLANES, bsub) for r in rows], axis=0)


def unpack_state(s):
  """Packed (40, B/8) -> ((B, 2) state, (B, 2, 2) cov)."""
  g = [s[i * SUBLANES:(i + 1) * SUBLANES].reshape(-1) for i in range(STATE_SLABS)]
  x0, x1, p00, p01, p11 = g
  x = jnp.stack([x0, x1], axis=-1)
  P = jnp.stack([jnp.stack([p00, p01], axis=-1),
                 jnp.stack([p01, p11], axis=-1)], axis=-2)
  return x, P


def _kernel(dts_ref, rs_ref, s_in_ref, z_ref, s_out_ref, *, t_chunk: int,
            maha: bool, maha_thresh: float, q00: float, q01: float,
            q11: float):
  j = pl.program_id(1)

  @pl.when(j == 0)
  def _():
    s_out_ref[:] = s_in_ref[:]

  n = SUBLANES

  def body(k, carry):
    x0, x1, p00, p01, p11 = carry
    dt = dts_ref[k, 0]
    r = rs_ref[k, 0]
    z = z_ref[pl.ds(k, 1)].reshape(z_ref.shape[1], z_ref.shape[2])

    # predict: x <- F x, P <- F P F^T + dt*Q (ekf_c.c:8-33 closed form)
    x0 = x0 + dt * x1
    p00 = p00 + dt * (2.0 * p01 + dt * p11) + dt * q00
    p01 = p01 + dt * p11 + dt * q01
    p11 = p11 + dt * q11

    # update with H = [1, 0], scalar innovation
    y = z - x0
    s = p00 + r
    inv_s = 1.0 / s
    k0 = p00 * inv_s
    k1 = p01 * inv_s
    if maha:
      # zero-gain rejection: exact R->inf limit of the reference's 1e16 R
      # inflation (ekf_c.c:88-94), overflow-safe in f32 (see core/step.py)
      gated = y * y > maha_thresh * s
      k0 = jnp.where(gated, 0.0, k0)
      k1 = jnp.where(gated, 0.0, k1)
    x0 = x0 + k0 * y
    x1 = x1 + k1 * y
    # Joseph form (ekf_c.c:115), scalar expansion
    a = 1.0 - k0
    p00_n = a * a * p00 + k0 * k0 * r
    p01_n = a * (p01 - k1 * p00) + k0 * k1 * r
    p11_n = p11 - 2.0 * k1 * p01 + k1 * k1 * p00 + k1 * k1 * r
    return (x0, x1, p00_n, p01_n, p11_n)

  init = (s_out_ref[0:n], s_out_ref[n:2 * n], s_out_ref[2 * n:3 * n],
          s_out_ref[3 * n:4 * n], s_out_ref[4 * n:5 * n])
  x0, x1, p00, p01, p11 = jax.lax.fori_loop(0, t_chunk, body, init)
  s_out_ref[0:n] = x0
  s_out_ref[n:2 * n] = x1
  s_out_ref[2 * n:3 * n] = p00
  s_out_ref[3 * n:4 * n] = p01
  s_out_ref[4 * n:5 * n] = p11


@functools.partial(
    jax.jit,
    static_argnames=('maha', 'maha_thresh', 'q00', 'q01', 'q11', 't_chunk',
                     'tile_b', 'interpret'))
def kinematic_bank_scan(packed_state, zs, dts, rs, *, q00: float,
                        q11: float, q01: float = 0.0, maha: bool = False,
                        maha_thresh: float = MAHA_THRESH_1D,
                        t_chunk: int = 256, tile_b: int = 4096,
                        interpret: bool = False):
  """Run T fused predict+update steps over a B-wide kinematic bank.

  Args:
    packed_state: (40, B/8) from pack_state.
    zs: (T, B) position measurements.
    dts: (T,) per-step time deltas (shared across the bank).
    rs: (T,) per-step scalar measurement variance.
    tile_b: filters per grid tile (must divide B; multiple of 8).
  Returns the final packed (40, B/8) state.
  """
  T, B = zs.shape
  bsub = B // SUBLANES
  tile = tile_b // SUBLANES
  assert packed_state.shape == (STATE_ROWS, bsub), packed_state.shape
  assert T % t_chunk == 0, (T, t_chunk)
  assert B % tile_b == 0 and tile_b % SUBLANES == 0, (B, tile_b)
  n_b, n_t = B // tile_b, T // t_chunk

  kernel = functools.partial(
      _kernel, t_chunk=t_chunk, maha=maha, maha_thresh=maha_thresh,
      q00=q00, q01=q01, q11=q11)

  return pl.pallas_call(
      kernel,
      grid=(n_b, n_t),
      in_specs=[
          pl.BlockSpec((t_chunk, 1), lambda i, j: (j, 0),
                       memory_space=pltpu.SMEM),
          pl.BlockSpec((t_chunk, 1), lambda i, j: (j, 0),
                       memory_space=pltpu.SMEM),
          pl.BlockSpec((STATE_ROWS, tile), lambda i, j: (0, i),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((t_chunk, SUBLANES, tile), lambda i, j: (j, 0, i),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((STATE_ROWS, tile), lambda i, j: (0, i),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((STATE_ROWS, bsub), zs.dtype),
      interpret=interpret,
  )(dts.reshape(T, 1), rs.reshape(T, 1), packed_state,
    zs.reshape(T, SUBLANES, bsub))
