"""MSCKF feature triangulation: batched Gauss-Newton on inverse depth.

TPU-native rebuild of the reference template (rednose/templates/
compute_pos.c:10-52): the reference ships a C Gauss-Newton loop whose
residual/jacobian functions are sympy-generated downstream; here the residual
is a plain jnp function (standard MSCKF reprojection residual over a pose
window) and its Jacobian is jax.jacfwd, so the whole solver jits and vmaps
over thousands of feature tracks at once.

Parameterization (compute_pos.c:31-33,45-47): the feature is
(alpha, beta, rho) = (u/1, v/1, inverse depth) in the LAST camera frame of
the track; ECEF position is R(q_last) @ RC^T @ [alpha/rho, beta/rho, 1/rho]
+ p_last.

Solver semantics match gauss_newton (compute_pos.c:18-26): do-while with at
most 30 iterations, stop when the squared step norm <= 1e-4, full (undamped)
normal-equation steps.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from rednose_tpu.ops.quaternion import quat_to_rot

MAX_ITERS = 30
STEP_TOL_SQ = 1e-4


def feature_ecef(to_c, pose_last, param):
  """ECEF position of a feature from its last-frame inverse-depth param
  (compute_pos.c:36-51)."""
  p_last, q_last = pose_last[0:3], pose_last[3:7]
  q_last = q_last / jnp.linalg.norm(q_last)
  rel = jnp.stack([param[0] / param[2], param[1] / param[2], 1.0 / param[2]])
  return quat_to_rot(q_last) @ to_c.T @ rel + p_last


def reprojection_residual(to_c, poses, img_positions, param):
  """Stacked (2K,) residual: predicted minus observed normalized image
  coordinates over the K-frame pose window.

  poses: (K, 7) rows [ecef_pos(3), quat wxyz(4)]; img_positions: (K, 2).
  """
  p_ecef = feature_ecef(to_c, poses[-1], param)

  def per_frame(pose, uv):
    q = pose[3:7] / jnp.linalg.norm(pose[3:7])
    p_c = to_c @ quat_to_rot(q).T @ (p_ecef - pose[0:3])
    return jnp.stack([p_c[0] / p_c[2] - uv[0], p_c[1] / p_c[2] - uv[1]])

  return jax.vmap(per_frame)(poses, img_positions).reshape(-1)


def gauss_newton(res_fun, param0):
  """Undamped GN with the reference's stopping rule (compute_pos.c:18-26)."""
  jac_fun = jax.jacfwd(res_fun)

  def step(param):
    r = res_fun(param)
    J = jac_fun(param)
    # least-squares step via QR: same solution as the reference's
    # (J^T J)^{-1} J^T r normal equations (compute_pos.c:22) but without
    # squaring the condition number — matters for float32 on TPU.
    q, rr = jnp.linalg.qr(J)
    delta = jax.scipy.linalg.solve_triangular(rr, q.T @ r, lower=False)
    return param - delta, jnp.sum(delta * delta)

  def cond(carry):
    _, delta_sq, counter = carry
    return jnp.logical_or(
        jnp.logical_and(delta_sq > STEP_TOL_SQ, counter < MAX_ITERS),
        counter == 0)

  def body(carry):
    param, _, counter = carry
    param, delta_sq = step(param)
    return param, delta_sq, counter + 1

  param, delta_sq, _ = jax.lax.while_loop(
      cond, body, (param0, jnp.zeros((), dtype=param0.dtype), 0))
  return param, delta_sq


def compute_pos(to_c, poses, img_positions):
  """Triangulate one feature track; returns (ecef_pos (3,), converged bool).

  Mirrors compute_pos (compute_pos.c:30-52): init param from the last
  observation with inverse depth 0.1, GN refine, map to ECEF.
  """
  param0 = jnp.concatenate(
      [img_positions[-1], jnp.full((1,), 0.1, dtype=img_positions.dtype)])
  res_fun = functools.partial(reprojection_residual, to_c, poses,
                              img_positions)
  # full-f32 matmuls: TPU default matmul precision stalls GN convergence
  with jax.default_matmul_precision('float32'):
    param, delta_sq = gauss_newton(res_fun, param0)
    pos = feature_ecef(to_c, poses[-1], param)
  return pos, delta_sq <= STEP_TOL_SQ


@functools.partial(jax.jit, static_argnums=())
def compute_pos_batch(to_c, poses, img_positions):
  """vmap over N feature tracks: poses (N, K, 7), img_positions (N, K, 2).

  The reference triangulates one track per C call; on TPU the whole frame's
  tracks solve in one fused program.
  """
  return jax.vmap(lambda p, z: compute_pos(to_c, p, z))(poses, img_positions)
