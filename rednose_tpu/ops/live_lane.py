"""Structure-exploiting fused step for the live ESKF bank (the flagship).

The generic lane bank (ops/lane_bank.py) runs the live 23/22 filter with
dense covariance algebra: F P F^T and the Joseph update are ~150k FLOP per
step per filter, all of it VPU-elementwise — which caps the bank at ~13M
steps/s/chip. This module is the TPU answer to what the reference's sympy
codegen does on CPU (rednose/helpers/ekf_sym.py:76-89 derives F/H
symbolically and emits flattened C with all structural zeros removed): we
exploit the live model's closed-form sparsity by hand and cut the step to
~8.4k FLOP (block-sparse F products, factored+symmetric-by-construction
covariance assemblies — joseph_sym below):

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
    which factors (joseph_sym) into ONE 22x22x3 product instead of two
    22x22x22.

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

from rednose_tpu.models.live import (
    DIM_STATE,
    DIM_STATE_ERR,
    EARTH_GM,
    ObservationKind as _K,
    _omega_matrix,
)
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


def joseph_sym(P, K, HP, S, k):
  """sym(P - K HP - (K HP)^T + K S K^T), assembled as P + (W + W^T) with
  W = K (0.5 S K^T - HP).

  Identical algebra to the _sym() spelling (P symmetric in, K S K^T
  symmetrized either way; factoring K out of -K HP + 0.5 K S K^T is a
  reassociation), and ONE unrolled (de, de) product instead of two plus a
  sym pass: the correction factor T = 0.5 S K^T - HP is only (k, de).
  Exactly symmetric by construction: W + W^T is bitwise symmetric (float
  add is commutative), and adding it to a bitwise-symmetric P preserves
  that. For the live ECEF update this cuts the covariance downdate from
  ~7.4k to ~3.6k FLOP/lane. T ~= -0.5 HP (S K^T = S S^-1 H P ~= H P), so
  no cancellation pathology; a gated K = 0 still yields P' = P exactly."""
  T = 0.5 * _mm_l(S, jnp.swapaxes(K, 0, 1), k) - HP   # (k, de, *b)
  W = _mm_l(K, T, k)
  return P + (W + jnp.swapaxes(W, 0, 1))


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

  # M = (dt*A) @ P: rows 0:9 only. dt is folded into the tiny (3, 3)
  # A-blocks once instead of scaling the (3, 22) row blocks (saves a full
  # row-block pass per product)
  Swd, Sad = dt * skew(wd), dt * skew(ad)    # dt * skew, (3, 3, *b)
  Rqd = dt * Rq
  M0 = dt * P[6:9]                                             # pos <- vel
  M1 = _mm_l(Rqd, P[9:12], 3) - _mm_l(Swd, P[3:6], 3)          # att rows
  M2 = _mm_l(Rqd, P[16:19], 3) - _mm_l(Sad, P[3:6], 3)         # vel rows
  M = jnp.concatenate([M0, M1, M2])      # (9, 22, *b)

  # 0.5 * N with N = M @ (dt*A)^T: columns 0:9 only (rows already 0:9);
  # the 0.5 rides on the small factors for the symmetrized assembly below
  N0 = (0.5 * dt) * M[:, 6:9]
  N1 = 0.5 * (_mm_rt(M[:, 9:12], Rqd, 3) - _mm_rt(M[:, 3:6], Swd, 3))
  N2 = 0.5 * (_mm_rt(M[:, 16:19], Rqd, 3) - _mm_rt(M[:, 3:6], Sad, 3))
  N_half = jnp.concatenate([N0, N1, N2], axis=1)  # (9, 9, *b)

  # P' = sym(P + M + M^T + N), assembled blockwise touching only the
  # nonzero blocks and EXACTLY symmetric without a sym pass: MM and NN
  # below are bitwise symmetric (float add commutes), sums of bitwise-
  # symmetric matrices stay bitwise symmetric, and BL is literally TR^T
  # (P itself is bitwise symmetric). Concatenate-built because scatter-add
  # does not lower in Pallas TPU.
  MM = M[:, 0:9] + jnp.swapaxes(M[:, 0:9], 0, 1)     # M + M^T, main block
  NN = N_half + jnp.swapaxes(N_half, 0, 1)           # sym(N)
  TL = (P[0:9, 0:9] + MM) + NN
  TR = P[0:9, 9:] + M[:, 9:]
  P_new = jnp.concatenate([
      jnp.concatenate([TL, TR], axis=1),
      jnp.concatenate([jnp.swapaxes(TR, 0, 1), P[9:, 9:]], axis=1),
  ])
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
  """Fused ECEF_POS update on slab state: the kind=ECEF_POS case of the
  generic sparse update below (H = [I3 | 0], so HP = P[:3]). Kept as a
  named entry point for the single-kind Pallas kernel."""
  return live_update_slab(_K.ECEF_POS, x, P, z, R, gate=gate,
                          gate_thresh=gate_thresh)


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


# ---------------------------------------------------------------------------
# Closed-form sparse H for EVERY live observation kind (the full sympy-
# codegen replacement): each kind's H = H_raw @ H_mod is a handful of 3x3
# (or 1x3) blocks on a small set of error-state columns. Derivations are
# verified exactly against jacfwd H @ H_mod in tests/test_live_lane.py.
#
# Key identities (R = Rz(y)Ry(p)Rx(r) extrinsic euler; q composes on the
# left, q_new = dq (x) q, so R(q_new) = R(dq) R(q)):
#   d(R(e)u)/de   = [ (R e_x) x u', (Rz e_y) x u', e_z x u' ],  u' = R(e)u
#   d(R(q)^T u)/d(dtheta) = R(q)^T skew(u)
# ---------------------------------------------------------------------------

# error-state column offsets (models/live.py States *_ERR slices)
_POS, _ATT, _VEL, _OMEGA = 0, 3, 6, 9
_BIAS, _SCALE, _ACC, _OFF = 12, 15, 16, 19


def _cross(a, b):
  """(3, *b) x (3, *b) elementwise cross product."""
  return jnp.stack([a[1] * b[2] - a[2] * b[1],
                    a[2] * b[0] - a[0] * b[2],
                    a[0] * b[1] - a[1] * b[0]])


def _euler_rot_slab(e):
  """euler_to_rot on slab euler angles (3, *b) -> (3, 3, *b). The jnp
  helper's trailing-dims @ does not fit lane-major layout."""
  cr, sr = jnp.cos(e[0]), jnp.sin(e[0])
  cp, sp_ = jnp.cos(e[1]), jnp.sin(e[1])
  cy, sy = jnp.cos(e[2]), jnp.sin(e[2])
  one, zero = jnp.ones_like(cr), jnp.zeros_like(cr)
  r_roll = jnp.stack([jnp.stack([one, zero, zero]),
                      jnp.stack([zero, cr, -sr]),
                      jnp.stack([zero, sr, cr])])
  r_pitch = jnp.stack([jnp.stack([cp, zero, sp_]),
                       jnp.stack([zero, one, zero]),
                       jnp.stack([-sp_, zero, cp])])
  r_yaw = jnp.stack([jnp.stack([cy, -sy, zero]),
                     jnp.stack([sy, cy, zero]),
                     jnp.stack([zero, zero, one])])
  return _mm_l(r_yaw, _mm_l(r_pitch, r_roll, 3), 3)


def _transpose33(M):
  return jnp.swapaxes(M, 0, 1)


def _d_euler_rot(e, Re, u_prime):
  """d(R(e)u)/de as (3, 3, *b) given R(e) and u' = R(e)u (see header)."""
  cy, sy = jnp.cos(e[2]), jnp.sin(e[2])
  zero = jnp.zeros_like(cy)
  one = jnp.ones_like(cy)
  col_r = _cross(Re[:, 0], u_prime)                       # (R e_x) x u'
  col_p = _cross(jnp.stack([-sy, cy, zero]), u_prime)     # (Rz e_y) x u'
  col_y = _cross(jnp.stack([zero, zero, one]), u_prime)   # e_z x u'
  return jnp.stack([col_r, col_p, col_y], axis=1)


# Each builder: x (23, *b) -> (h (dz, *b), blocks); blocks is a tuple of
# (col, width, Hb) with Hb (dz, width, *b) or None for an identity block.

def _hH_ecef_pos(x):
  return x[0:3], ((_POS, 3, None),)


def _hH_no_rot(x):
  return x[10:13], ((_OMEGA, 3, None),)


def _hH_imu_frame(x):
  return x[20:23], ((_OFF, 3, None),)


def _hH_odo_speed(x):
  v, s = x[7:10], x[16]
  speed = jnp.sqrt(v[0] * v[0] + v[1] * v[1] + v[2] * v[2])
  h = (speed * s)[None]
  # |v| -> 0 makes the velocity direction (and the jacfwd oracle) undefined
  # (0/0 -> NaN, which would permanently poison a whole bank); clamp the
  # denominator so a standstill update degrades to information-free on the
  # velocity rows instead. Deviation from the oracle only within |v| < 1e-6.
  Hv = (s / jnp.maximum(speed, 1e-6)) * v  # s * v^T / |v|
  return h, ((_VEL, 3, Hv[None]), (_SCALE, 1, speed[None, None]))


def _hH_cam_trans(x):
  q, v = x[3:7], x[7:10]
  RqT = _transpose33(quat_to_rot(q))
  h = _mv(RqT, v, 3)
  return h, ((_ATT, 3, _mm_l(RqT, skew(v), 3)), (_VEL, 3, RqT))


def _hH_gyro(x):
  w, b_, o = x[10:13], x[13:16], x[20:23]
  Re = _euler_rot_slab(o)
  up = _mv(Re, w + b_, 3)
  return up, ((_OMEGA, 3, Re), (_BIAS, 3, Re), (_OFF, 3, _d_euler_rot(o, Re, up)))


def _hH_accel(x):
  p, q, a, o = x[0:3], x[3:7], x[17:20], x[20:23]
  Rq = quat_to_rot(q)
  RqT = _transpose33(Rq)
  Re = _euler_rot_slab(o)
  r2 = p[0] * p[0] + p[1] * p[1] + p[2] * p[2]
  scale = EARTH_GM / (r2 * jnp.sqrt(r2))
  u = scale * p                                  # GM p / r^3
  g = _mv(RqT, u, 3)
  h = _mv(Re, g + a, 3)
  ReRqT = _mm_l(Re, RqT, 3)
  # d u / d p = scale * (I - 3 p p^T / r^2)
  php = jnp.stack([jnp.stack([p[i] * p[j] for j in range(3)])
                   for i in range(3)]) * (3.0 / r2)
  eye3 = jnp.stack([
      jnp.stack([jnp.ones_like(r2) if i == j else jnp.zeros_like(r2)
                 for j in range(3)]) for i in range(3)])
  Hp = scale * _mm_l(ReRqT, eye3 - php, 3)
  return h, ((_POS, 3, Hp),
             (_ATT, 3, _mm_l(ReRqT, skew(u), 3)),
             (_ACC, 3, Re),
             (_OFF, 3, _d_euler_rot(o, Re, h)))


# kind -> (dz, builder); NO_ROT and CAMERA_ODO_ROTATION share h = omega
LANE_KINDS = {
    _K.ECEF_POS: (3, _hH_ecef_pos),
    _K.NO_ROT: (3, _hH_no_rot),
    _K.CAMERA_ODO_ROTATION: (3, _hH_no_rot),
    _K.IMU_FRAME: (3, _hH_imu_frame),
    _K.ODOMETRIC_SPEED: (1, _hH_odo_speed),
    _K.CAMERA_ODO_TRANSLATION: (3, _hH_cam_trans),
    _K.PHONE_GYRO: (3, _hH_gyro),
    _K.PHONE_ACCEL: (3, _hH_accel),
}


def _inject(x, dx):
  """ESKF error injection + quat renorm (shared by all updates)."""
  q = x[3:7]
  d1, d2, d3 = 0.5 * dx[3], 0.5 * dx[4], 0.5 * dx[5]
  q_new = jnp.stack([
      q[0] - q[1] * d1 - q[2] * d2 - q[3] * d3,
      q[1] + q[0] * d1 + q[3] * d2 - q[2] * d3,
      q[2] - q[3] * d1 + q[0] * d2 + q[1] * d3,
      q[3] + q[2] * d1 - q[1] * d2 + q[0] * d3,
  ])
  return _normalize_quat(
      jnp.concatenate([x[0:3] + dx[0:3], q_new, x[7:] + dx[6:]]))


def live_update_slab(kind: int, x, P, z, R, gate: bool = False,
                     gate_thresh: float | None = None):
  """Fused update for ANY live observation kind on slab state, via the
  kind's closed-form sparse H blocks (header). z (dz, *b); R (dz, dz)
  array, (dz, dz, *b), or static nested scalar tuple (Pallas path).
  Returns (x, P, y)."""
  dz, builder = LANE_KINDS[kind]
  h, blocks = builder(x)
  y = z - h

  # HP = H @ P, accumulating per sparse block (identity block = row slice)
  HP = None
  for c, w, Hb in blocks:
    term = P[c:c + w] if Hb is None else _mm_l(Hb, P[c:c + w], w)
    HP = term if HP is None else HP + term  # (dz, 22, *b)
  # S = HP @ H^T + R
  S = None
  for c, w, Hb in blocks:
    term = HP[:, c:c + w] if Hb is None else _mm_rt(HP[:, c:c + w], Hb, w)
    S = term if S is None else S + term
  if isinstance(R, tuple):
    S = jnp.stack([jnp.stack([S[i, j] + R[i][j] for j in range(dz)])
                   for i in range(dz)])
  else:
    if R.ndim == 2:
      R = R.reshape(R.shape + (1,) * (x.ndim - 1))
    S = S + R

  if dz == 1:
    Sinv = 1.0 / S
  elif dz == 3:
    Sinv = _inv3(S)
  else:
    raise NotImplementedError(f"dz={dz}")
  K = _mm_l(jnp.swapaxes(HP, 0, 1), Sinv, dz)  # P H^T S^-1 (P symmetric)
  if gate:
    if gate_thresh is None:
      gate_thresh = chi2_ppf(0.95, dz)
    dist = sum(y[i] * Sinv[i, j] * y[j]
               for i in range(dz) for j in range(dz))
    K = jnp.where(dist[None, None] > gate_thresh, 0.0, K)
  dx = sum(K[:, i] * y[i][None] for i in range(dz))

  P_new = joseph_sym(P, K, HP, S, dz)
  return _inject(x, dx), P_new, y


def _stream_r_tuple(r_row, dz: int):
  """Per-step streamed DIAGONAL noise as a nested tuple of traced scalars.

  live_update_slab's tuple-R path does only scalar arithmetic with the
  entries, so traced scalars work exactly like static ones — and unlike a
  jnp.diag-built (dz, dz) array this never needs the tiled-dim relayout
  that Pallas cannot lower (see live_predict_slab)."""
  return tuple(tuple(r_row[i] if i == j else 0.0 for j in range(dz))
               for i in range(dz))


def make_update_branches(kinds: tuple, R_static_by_kind,
                         stream_kinds: tuple = (), gate: bool = False):
  """Per-kind update closures `(x, P, z3, r_row) -> (x, P)` for lax.switch
  — the ONE branch builder both the jnp mixed scan and the Pallas mixed
  kernel use, so the two paths cannot diverge. Kinds in `stream_kinds`
  build their diagonal R from r_row (per-step traced scalars); others use
  R_static_by_kind[kind] (array in jnp, nested static tuple in Pallas)."""
  def _branch(k):
    dz = LANE_KINDS[k][0]

    def apply(xc, Pc, z, r_row):
      R = (_stream_r_tuple(r_row, dz) if k in stream_kinds
           else R_static_by_kind[k])
      return live_update_slab(k, xc, Pc, z[:dz], R, gate=gate)[:2]

    return apply

  return tuple(_branch(k) for k in kinds)


def live_mixed_scan(x, P, Q, dts, kind_idx, zs, R_by_kind, kinds: tuple,
                    gate: bool = False, r_stream=None,
                    stream_kinds: tuple = ()):
  """Scan a HETEROGENEOUS sensor stream over the lane-major live bank: one
  fused predict+update per step with `lax.switch` over the closed-form
  per-kind updates — the reference's real workload (several observation
  kinds at sensor rate, ekf_sym.cc:158-184) at bank scale.

  Args: x (B, 23), P (22, 22, B), Q (22, 22), dts (T,), kind_idx (T,) int32
  indices into `kinds`, zs (T, B, 3) padded to dz<=3, R_by_kind mapping
  kind -> (dz, dz) shared noise. Kinds listed in `stream_kinds` instead take
  a per-step DIAGONAL noise from r_stream (T, 3) — the camera-odometry
  kinds' measurement-supplied variances (live_kf.py:325-337). Returns final
  (x (B, 23), P).
  """
  xl = x.T
  if r_stream is None:
    assert not stream_kinds
    r_stream = jnp.zeros((dts.shape[0], 3), dtype=x.dtype)

  branches = make_update_branches(kinds, R_by_kind, stream_kinds, gate)

  def body(carry, inp):
    xc, Pc = carry
    dt, ki, z, r_row = inp
    xc, Pc = live_predict_slab(xc, Pc, Q, dt)
    xc, Pc = jax.lax.switch(ki, branches, xc, Pc, z.T, r_row)
    return (xc, Pc), None

  (xl, P), _ = jax.lax.scan(body, (xl, P), (dts, kind_idx, zs, r_stream))
  return xl.T, P


@functools.lru_cache(maxsize=None)
def jit_live_mixed_scan(kinds: tuple, gate: bool = False,
                        stream_kinds: tuple = ()):
  def fn(x, P, Q, dts, kind_idx, zs, R_list, r_stream=None):
    return live_mixed_scan(x, P, Q, dts, kind_idx, zs,
                           dict(zip(kinds, R_list)), kinds, gate=gate,
                           r_stream=r_stream, stream_kinds=stream_kinds)
  return jax.jit(fn)
