"""Structure-exploiting fused step for the live ESKF bank (the flagship).

The generic lane bank (ops/lane_bank.py) runs the live 23/22 filter with
dense covariance algebra: F P F^T and the Joseph update are ~150k FLOP per
step per filter, all of it VPU-elementwise — which caps the bank at ~13M
steps/s/chip. This module is the TPU answer to what the reference's sympy
codegen does on CPU (rednose/helpers/ekf_sym.py:76-89 derives F/H
symbolically and emits flattened C with all structural zeros removed): we
exploit the live model's closed-form sparsity by hand and cut the step to
~10k FLOP:

  * F = I + dt*A where A (the error-dynamics Jacobian at dx=0,
    examples/live_kf.py:177-184) has exactly five nonzero 3x3 blocks:
      A[pos, vel]        = I
      A[att, att]        = -skew(R(q) @ omega)
      A[att, omega]      =  R(q)
      A[vel, att]        = -skew(R(q) @ accel)
      A[vel, accel_err]  =  R(q)
    (the -skew closed form holds for ANY euler convention: at e=0 the
    derivative of euler_to_rot(e) @ v w.r.t. e is [e1xv e2xv e3xv] = -skew(v);
    verified exhaustively against jax.jacfwd in tests/test_live_lane.py).
    P' = (I+dtA) P (I+dtA)^T + dt*Q expands to P + M + M^T + M(dtA)^T + dt*Q
    with M = (dtA)P having only 9 nonzero rows.

  * The ECEF_POS update has H = H_raw @ H_mod = [I3 | 0] (position rows of
    H_mod are identity), so H P = P[:3], S = P[:3,:3] + R, K = P[:,:3] S^-1,
    and the Joseph form expands EXACTLY (any K, symmetric P) to
      P' = P - K(HP) - (HP)^T K^T + K S K^T
    which costs two 22x22x3 products instead of two 22x22x22.

All math is written over arrays with arbitrary trailing bank dims `*b`
(slab layout: state (23, *b), covariance (22, 22, *b)) so the identical
code path serves the pure-jnp lax.scan bank here and the VMEM-resident
Pallas kernel (ops/pallas_live.py). Parity with the core/step.py oracle is
asserted in tests/test_live_lane.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from rednose_tpu.models.live import DIM_STATE, DIM_STATE_ERR, _omega_matrix
from rednose_tpu.ops.quaternion import quat_to_rot, skew
from rednose_tpu.utils.chi2 import chi2_ppf

# baked chi2(0.95, 3) threshold for the optional position gate, same source
# as the reference codegen (ekf_sym.py:144-147)
MAHA_THRESH_3D = chi2_ppf(0.95, 3)


def _mv(M, v, n):
  """(n, n, *b) @ (n, *b) -> (n, *b), unrolled."""
  return jnp.stack([sum(M[i, k] * v[k] for k in range(n)) for i in range(n)])


def _mm_l(A, B, k):
  """(m, k, *b) @ (k, n, *b) -> (m, n, *b), unrolled over k."""
  return sum(A[:, i][:, None] * B[i][None] for i in range(k))


def _mm_rt(A, B, k):
  """(m, k, *b) @ (n, k, *b)^T -> (m, n, *b), unrolled over k."""
  return sum(A[:, i][:, None] * B[:, i][None] for i in range(k))


def _sym(P):
  return 0.5 * (P + jnp.swapaxes(P, 0, 1))


def _inv3(S):
  """Closed-form adjugate inverse of (3, 3, *b) (see lane_bank._inv_small)."""
  c = [[S[1, 1] * S[2, 2] - S[1, 2] * S[2, 1],
        S[0, 2] * S[2, 1] - S[0, 1] * S[2, 2],
        S[0, 1] * S[1, 2] - S[0, 2] * S[1, 1]],
       [S[1, 2] * S[2, 0] - S[1, 0] * S[2, 2],
        S[0, 0] * S[2, 2] - S[0, 2] * S[2, 0],
        S[0, 2] * S[1, 0] - S[0, 0] * S[1, 2]],
       [S[1, 0] * S[2, 1] - S[1, 1] * S[2, 0],
        S[0, 1] * S[2, 0] - S[0, 0] * S[2, 1],
        S[0, 0] * S[1, 1] - S[0, 1] * S[1, 0]]]
  det = S[0, 0] * c[0][0] + S[0, 1] * c[1][0] + S[0, 2] * c[2][0]
  return jnp.stack([jnp.stack(row) for row in c]) / det


def _normalize_quat(x):
  # concatenate-built (not .at[]): scatter ops do not lower in Pallas TPU
  # kernels, and these functions must run unchanged inside the kernel
  q = x[3:7]
  inv = jax.lax.rsqrt(q[0] * q[0] + q[1] * q[1] + q[2] * q[2] + q[3] * q[3])
  return jnp.concatenate([x[0:3], q * inv, x[7:]])


def live_predict_slab(x, P, Q, dt):
  """Fused live predict on slab state: x (23, *b), P (22, 22, *b), dt scalar.

  Q is either a (22, 22) shared array, or — for use inside Pallas TPU
  kernels, where reshaping the tiled dims of a small 2D array away is an
  unsupported relayout — a static tuple of 22 diagonal scalars.
  Implements core/step.predict semantics with the closed-form block-sparse
  F (module docstring)."""
  bdims = x.ndim - 1
  q, v = x[3:7], x[7:10]
  w, a = x[10:13], x[17:20]
  Rq = quat_to_rot(q)                    # (3, 3, *b)
  wd = _mv(Rq, w, 3)                     # R(q) @ omega
  ad = _mv(Rq, a, 3)                     # R(q) @ accel

  # nominal state: first-order integrator (live_kf.py:160-168) + quat renorm
  x_new = jnp.concatenate([
      x[0:3] + dt * v,
      q + dt * _mv(_omega_matrix(w), q, 4),
      v + dt * ad,
      x[10:],
  ])
  x_new = _normalize_quat(x_new)

  # M = (dt*A) @ P: rows 0:9 only
  Sw, Sa = skew(wd), skew(ad)            # (3, 3, *b)
  M0 = dt * P[6:9]                                             # pos <- vel
  M1 = dt * (_mm_l(Rq, P[9:12], 3) - _mm_l(Sw, P[3:6], 3))     # att rows
  M2 = dt * (_mm_l(Rq, P[16:19], 3) - _mm_l(Sa, P[3:6], 3))    # vel rows
  M = jnp.concatenate([M0, M1, M2])      # (9, 22, *b)

  # N = M @ (dt*A)^T: columns 0:9 only (rows already 0:9 via M)
  N0 = dt * M[:, 6:9]
  N1 = dt * (_mm_rt(M[:, 9:12], Rq, 3) - _mm_rt(M[:, 3:6], Sw, 3))
  N2 = dt * (_mm_rt(M[:, 16:19], Rq, 3) - _mm_rt(M[:, 3:6], Sa, 3))
  N = jnp.concatenate([N0, N1, N2], axis=1)  # (9, 9, *b)

  # block assembly (same add order as sequential .at[].add would use);
  # concatenate-built because scatter-add does not lower in Pallas TPU
  TL = P[0:9, 0:9] + M[:, 0:9] + jnp.swapaxes(M[:, 0:9], 0, 1) + N
  TR = P[0:9, 9:] + M[:, 9:]
  BL = P[9:, 0:9] + jnp.swapaxes(M[:, 9:], 0, 1)
  BR = P[9:, 9:]
  P_new = jnp.concatenate([
      jnp.concatenate([TL, TR], axis=1),
      jnp.concatenate([BL, BR], axis=1),
  ])
  P_new = _sym(P_new)
  if isinstance(Q, tuple):  # static diagonal scalars (Pallas kernel path)
    d = DIM_STATE_ERR
    P_new = jnp.stack([
        jnp.concatenate(
            ([P_new[i, :i]] if i else [])
            + [(P_new[i, i] + dt * Q[i])[None]]
            + ([P_new[i, i + 1:]] if i + 1 < d else []))
        for i in range(d)])
  else:
    P_new = P_new + (dt * Q).reshape(Q.shape + (1,) * bdims)
  return x_new, P_new


def live_update_pos_slab(x, P, z, R, gate: bool = False,
                         gate_thresh: float = MAHA_THRESH_3D):
  """Fused ECEF_POS update on slab state: z (3, *b), R (3, 3) shared,
  (3, 3, *b) per-filter, or a static 3x3 nested tuple of scalars (Pallas
  kernel path — see live_predict_slab). H = [I3 | 0] so HP = P[:3] (module
  docstring); zero-gain Mahalanobis rejection (the exact R->inf limit of
  ekf_c.c:88-94) when `gate`. Returns (x, P, y)."""
  bdims = x.ndim - 1
  y = z - x[0:3]
  HP = P[0:3]                            # (3, 22, *b)
  if isinstance(R, tuple):  # static scalars
    S = jnp.stack([
        jnp.stack([HP[i, j] + R[i][j] for j in range(3)]) for i in range(3)])
  else:
    if R.ndim == 2:
      R = R.reshape(R.shape + (1,) * bdims)
    S = HP[:, 0:3] + R                   # (3, 3, *b)
  Sinv = _inv3(S)
  K = _mm_l(P[:, 0:3], Sinv, 3)          # P H^T S^-1, (22, 3, *b)
  if gate:
    dist = sum(y[i] * Sinv[i, j] * y[j] for i in range(3) for j in range(3))
    K = jnp.where(dist[None, None] > gate_thresh, 0.0, K)
  dx = sum(K[:, i] * y[i][None] for i in range(3))  # (22, *b)

  # Joseph form, expanded (exact identity for symmetric P, any K)
  KHP = _mm_l(K, HP, 3)                  # (22, 22, *b)
  KS = _mm_l(K, S, 3)                    # (22, 3, *b)
  KSK = _mm_rt(KS, K, 3)                 # (22, 22, *b)
  P_new = _sym(P - KHP - jnp.swapaxes(KHP, 0, 1) + KSK)

  # ESKF error injection (live_kf.py:200-205): additive except the
  # quaternion, which composes with delta = [1, 0.5*dtheta] through the
  # right product matrix: q_new = quat_matrix_r(q) @ delta.
  q = x[3:7]
  d1, d2, d3 = 0.5 * dx[3], 0.5 * dx[4], 0.5 * dx[5]
  q_new = jnp.stack([
      q[0] - q[1] * d1 - q[2] * d2 - q[3] * d3,
      q[1] + q[0] * d1 + q[3] * d2 - q[2] * d3,
      q[2] - q[3] * d1 + q[0] * d2 + q[1] * d3,
      q[3] + q[2] * d1 - q[1] * d2 + q[0] * d3,
  ])
  x_new = jnp.concatenate([x[0:3] + dx[0:3], q_new, x[7:] + dx[6:]])
  x_new = _normalize_quat(x_new)
  return x_new, P_new, y


def live_step_slab(x, P, Q, dt, z, R, gate: bool = False):
  """One fused predict + ECEF_POS update (the bank hot path)."""
  x, P = live_predict_slab(x, P, Q, dt)
  x, P, y = live_update_pos_slab(x, P, z, R, gate=gate)
  return x, P, y


def live_lane_scan(x, P, Q, dts, zs, R, gate: bool = False):
  """Scan T fused steps over a lane-major live bank (pure jnp; the Pallas
  kernel in ops/pallas_live.py is the VMEM-resident version of this loop).

  Args: x (B, 23), P (22, 22, B) lane-major, Q (22, 22), dts (T,),
  zs (T, B, 3), R (3, 3) shared. Returns final (x (B, 23), P).
  """
  xl = x.T  # (23, B)

  def body(carry, inp):
    xc, Pc = carry
    dt, z = inp
    xc, Pc, _ = live_step_slab(xc, Pc, Q, dt, z.T, R, gate=gate)
    return (xc, Pc), None

  (xl, P), _ = jax.lax.scan(body, (xl, P), (dts, zs))
  return xl.T, P


@functools.lru_cache(maxsize=None)
def jit_live_lane_scan(gate: bool = False):
  return jax.jit(functools.partial(live_lane_scan, gate=gate))
