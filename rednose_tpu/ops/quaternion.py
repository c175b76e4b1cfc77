"""Quaternion / rotation operations as pure jax-traceable functions.

These replace the reference's dual numeric/symbolic rotation helpers
(rednose/helpers/sympy_helpers.py:5-119): since JAX traces Python functions
into XLA and differentiates them with jacfwd, one jnp implementation serves
both the "numeric" and "symbolic" roles.

Quaternion convention: scalar-first [w, x, y, z], Hamilton product.
"""

from __future__ import annotations

import jax.numpy as jnp


def quat_to_rot(q):
  """Rotation matrix from a (4,) quaternion (body->reference frame).

  Matches the reference's quat_rotate(...).T convention
  (rednose/helpers/sympy_helpers.py:101-105): quat_rotate returns the
  transpose there, so `quat_to_rot(q) @ v_body` rotates a body-frame vector
  into the reference frame, identical to the reference's `quat_rot * acceleration`
  usage in live_kf (examples/live_kf.py:164).
  """
  q0, q1, q2, q3 = q[0], q[1], q[2], q[3]
  return jnp.stack([
      jnp.stack([q0 * q0 + q1 * q1 - q2 * q2 - q3 * q3,
                 2 * (q1 * q2 - q0 * q3),
                 2 * (q1 * q3 + q0 * q2)]),
      jnp.stack([2 * (q1 * q2 + q0 * q3),
                 q0 * q0 - q1 * q1 + q2 * q2 - q3 * q3,
                 2 * (q2 * q3 - q0 * q1)]),
      jnp.stack([2 * (q1 * q3 - q0 * q2),
                 2 * (q2 * q3 + q0 * q1),
                 q0 * q0 - q1 * q1 - q2 * q2 + q3 * q3]),
  ])


def euler_to_rot(euler):
  """Rotation matrix from (roll, pitch, yaw) euler angles, R = Rz(yaw) Ry(pitch) Rx(roll).

  Mirror of euler_rotate (rednose/helpers/sympy_helpers.py:87-98).
  """
  roll, pitch, yaw = euler[0], euler[1], euler[2]
  cr, sr = jnp.cos(roll), jnp.sin(roll)
  cp, sp_ = jnp.cos(pitch), jnp.sin(pitch)
  cy, sy = jnp.cos(yaw), jnp.sin(yaw)
  one = jnp.ones_like(roll)
  zero = jnp.zeros_like(roll)
  r_roll = jnp.stack([
      jnp.stack([one, zero, zero]),
      jnp.stack([zero, cr, -sr]),
      jnp.stack([zero, sr, cr]),
  ])
  r_pitch = jnp.stack([
      jnp.stack([cp, zero, sp_]),
      jnp.stack([zero, one, zero]),
      jnp.stack([-sp_, zero, cp]),
  ])
  r_yaw = jnp.stack([
      jnp.stack([cy, -sy, zero]),
      jnp.stack([sy, cy, zero]),
      jnp.stack([zero, zero, one]),
  ])
  return r_yaw @ r_pitch @ r_roll


def euler_to_quat(euler):
  """Scalar-first quaternion from (roll, pitch, yaw); w kept non-negative.

  Mirror of euler2quat (rednose/helpers/sympy_helpers.py:30-52).
  """
  gamma, theta, psi = euler[0] / 2.0, euler[1] / 2.0, euler[2] / 2.0
  cg, sg = jnp.cos(gamma), jnp.sin(gamma)
  ct, st = jnp.cos(theta), jnp.sin(theta)
  cp, sp_ = jnp.cos(psi), jnp.sin(psi)
  q = jnp.stack([
      cg * ct * cp + sg * st * sp_,
      sg * ct * cp - cg * st * sp_,
      cg * st * cp + sg * ct * sp_,
      cg * ct * sp_ - sg * st * cp,
  ])
  return jnp.where(q[0] < 0, -q, q)


def rot_to_euler(rot):
  """(roll, pitch, yaw) euler angles from a rotation matrix.

  Mirror of rot_to_euler (rednose/helpers/sympy_helpers.py:70-74).
  """
  gamma = jnp.arctan2(rot[2, 1], rot[2, 2])
  theta = jnp.arcsin(-rot[2, 0])
  psi = jnp.arctan2(rot[1, 0], rot[0, 0])
  return jnp.stack([gamma, theta, psi])


def quat_matrix_l(p):
  """Left quaternion product matrix: quat_matrix_l(p) @ q == p * q (Hamilton).

  Mirror of quat_matrix_l (rednose/helpers/sympy_helpers.py:108-112).
  """
  p0, p1, p2, p3 = p[0], p[1], p[2], p[3]
  return jnp.stack([
      jnp.stack([p0, -p1, -p2, -p3]),
      jnp.stack([p1, p0, -p3, p2]),
      jnp.stack([p2, p3, p0, -p1]),
      jnp.stack([p3, -p2, p1, p0]),
  ])


def quat_matrix_r(p):
  """Right quaternion product matrix: quat_matrix_r(p) @ q == q * p (Hamilton).

  Mirror of quat_matrix_r (rednose/helpers/sympy_helpers.py:115-119).
  """
  p0, p1, p2, p3 = p[0], p[1], p[2], p[3]
  return jnp.stack([
      jnp.stack([p0, -p1, -p2, -p3]),
      jnp.stack([p1, p0, p3, -p2]),
      jnp.stack([p2, -p3, p0, p1]),
      jnp.stack([p3, p2, -p1, p0]),
  ])


def quat_product(p, q):
  """Hamilton product p * q of two scalar-first quaternions."""
  return quat_matrix_l(p) @ q


def skew(v):
  """Skew-symmetric cross-product matrix (mirror of `cross`, sympy_helpers.py:62-67)."""
  zero = jnp.zeros_like(v[0])
  return jnp.stack([
      jnp.stack([zero, -v[2], v[1]]),
      jnp.stack([v[2], zero, -v[0]]),
      jnp.stack([-v[1], v[0], zero]),
  ])


def quat_normalize(q):
  return q / jnp.linalg.norm(q)


def normalize_slices(x, quaternion_idxs):
  """Renormalize each quaternion living at x[idx:idx+4] for idx in quaternion_idxs.

  Equivalent of EKF_sym.normalize_quaternions (rednose/helpers/ekf_sym.py:405-410).
  quaternion_idxs is static (Python ints), so this unrolls into fixed slices.
  """
  for idx in quaternion_idxs:
    q = x[idx:idx + 4]
    x = x.at[idx:idx + 4].set(q / jnp.linalg.norm(q))
  return x
