"""MSCKF composed with a quaternion ESKF: the full reference machinery in
one filter.

The reference's msckf_params are designed to coexist with eskf_params
(ekf_sym.py:57-66 augments dims alongside the error-state machinery;
downstream openpilot loc_kf uses both together, with He = dh/dea derived for
a full-pose window, ekf_sym.py:86-87). models/msckf_vo.py exercises the
MSCKF window with an additive error state; THIS model exercises the
composition: a quaternion-attitude error state whose sliding window clones
full poses (position + attitude), so one update path runs
  augment  +  He nullspace projection  +  H . H_mod  +  error injection
simultaneously — exactly the reference's joint path (ekf_sym.py:365-391,
576-624). Validated against an independent sympy-Jacobian numpy oracle in
tests/test_msckf_eskf.py.

State layout (nominal 41 / error 36):
  main nominal (13): ecef_pos(3) quat(4) vel(3) angular_vel(3)
  main error  (12): pos_err(3) att_err(3) vel_err(3) omega_err(3)
  4 clones: nominal pose (pos(3) quat(4)) = 7 each; error (3+3) = 6 each
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from rednose_tpu.core.spec import FilterSpec, ObservationModel
from rednose_tpu.models.kalman_filter import KalmanFilter
from rednose_tpu.models.live import _omega_matrix
from rednose_tpu.msckf.triangulation import compute_pos_batch
from rednose_tpu.ops.quaternion import (
    euler_to_rot,
    quat_matrix_r,
    quat_to_rot,
)
from rednose_tpu.registry import register


class ObservationKind:
  POSITION = 12        # direct ECEF position fix
  MSCKF_FEATURE = 16   # nullspace-projected feature track (live_kf.py:34)

  names = {12: 'Position', 16: 'MSCKF feature track'}

  @classmethod
  def to_string(cls, kind):
    return cls.names[kind]


N_AUGMENT = 4
DIM_MAIN, DIM_MAIN_ERR = 13, 12
DIM_AUG, DIM_AUG_ERR = 7, 6
DIM_X = DIM_MAIN + DIM_AUG * N_AUGMENT        # 41
DIM_ERR = DIM_MAIN_ERR + DIM_AUG_ERR * N_AUGMENT  # 36


def _clone_nom(a):
  """Nominal slice of clone a: (pos, quat)."""
  o = DIM_MAIN + DIM_AUG * a
  return slice(o, o + 3), slice(o + 3, o + 7)


def _clone_err(a):
  """Error slice of clone a: (pos_err, att_err)."""
  o = DIM_MAIN_ERR + DIM_AUG_ERR * a
  return slice(o, o + 3), slice(o + 3, o + 6)


def _f(params, x, dt):
  """Main-state kinematics (pos<-vel, quat<-omega); clones static — the
  block structure templates/ekf_c.c:8-33 exploits."""
  del params
  q, v, w = x[3:7], x[7:10], x[10:13]
  x_dot = jnp.zeros_like(x)
  x_dot = x_dot.at[0:3].set(v)
  x_dot = x_dot.at[3:7].set(_omega_matrix(w) @ q)
  return x + dt * x_dot


def _f_err(params, x, dx, dt):
  """Error dynamics at the nominal trajectory (live-style attitude error);
  clone errors are static."""
  del params
  q, w = x[3:7], x[10:13]
  att_err, v_err, w_err = dx[3:6], dx[6:9], dx[9:12]
  dx_dot = jnp.zeros_like(dx)
  dx_dot = dx_dot.at[0:3].set(v_err)
  dx_dot = dx_dot.at[3:6].set(
      euler_to_rot(att_err) @ quat_to_rot(q) @ (w + w_err))
  return dx + dt * dx_dot


def _compose_quat(q, dtheta):
  """q_new = quat_matrix_r(q) @ [1, 0.5*dtheta] (live_kf.py:200-205)."""
  delta = jnp.concatenate([jnp.ones((1,), dtype=q.dtype), 0.5 * dtheta])
  return quat_matrix_r(q) @ delta


def _err(params, nom_x, dx):
  """Error injection: additive except every quaternion (main + each clone),
  which composes multiplicatively — the composition the reference's
  err_function applies across the augmented state."""
  del params
  out = nom_x.at[0:3].add(dx[0:3])
  out = out.at[3:7].set(_compose_quat(nom_x[3:7], dx[3:6]))
  out = out.at[7:13].add(dx[6:12])
  for a in range(N_AUGMENT):
    pn, qn = _clone_nom(a)
    pe, ae = _clone_err(a)
    out = out.at[pn].add(dx[pe])
    out = out.at[qn].set(_compose_quat(nom_x[qn], dx[ae]))
  return out


def _inv_err(params, nom_x, true_x):
  del params
  dx = jnp.zeros((DIM_ERR,), dtype=nom_x.dtype)
  dx = dx.at[0:3].set(true_x[0:3] - nom_x[0:3])
  dx = dx.at[3:6].set(2.0 * (quat_matrix_r(nom_x[3:7]).T @ true_x[3:7])[1:])
  dx = dx.at[6:12].set(true_x[7:13] - nom_x[7:13])
  for a in range(N_AUGMENT):
    pn, qn = _clone_nom(a)
    pe, ae = _clone_err(a)
    dx = dx.at[pe].set(true_x[pn] - nom_x[pn])
    dx = dx.at[ae].set(2.0 * (quat_matrix_r(nom_x[qn]).T @ true_x[qn])[1:])
  return dx


def _H_mod(params, x):
  """(41, 36) error->nominal modifier: identity blocks plus a 4x3
  0.5*quat_matrix_r(q)[:, 1:] block per quaternion (main + clones) — the
  composition's H_mod the reference derives symbolically."""
  del params
  H = jnp.zeros((DIM_X, DIM_ERR), dtype=x.dtype)
  H = H.at[0:3, 0:3].set(jnp.eye(3, dtype=x.dtype))
  H = H.at[3:7, 3:6].set(0.5 * quat_matrix_r(x[3:7])[:, 1:])
  H = H.at[7:13, 6:12].set(jnp.eye(6, dtype=x.dtype))
  for a in range(N_AUGMENT):
    pn, qn = _clone_nom(a)
    pe, ae = _clone_err(a)
    H = H.at[pn, pe].set(jnp.eye(3, dtype=x.dtype))
    H = H.at[qn, ae].set(0.5 * quat_matrix_r(x[qn])[:, 1:])
  return H


def _h_position(params, x, ea):
  del params, ea
  return x[0:3]


def _h_feature(params, x, ea):
  """Normalized image coordinates of landmark ea (3,) seen from every clone
  POSE (position + attitude): d_cam = R(q_a)^T (ea - p_a), h = d_xy / d_z.
  dz = 2*N_AUGMENT with ea_dim=3 nullspace-projected out at update time."""
  del params
  outs = []
  for a in range(N_AUGMENT):
    pn, qn = _clone_nom(a)
    d = quat_to_rot(x[qn]).T @ (ea - x[pn])
    outs.append(jnp.stack([d[0] / d[2], d[1] / d[2]]))
  return jnp.concatenate(outs)


def build_msckf_eskf_spec() -> FilterSpec:
  obs = {
      ObservationKind.POSITION: ObservationModel(
          kind=ObservationKind.POSITION, h=_h_position, dz=3),
      ObservationKind.MSCKF_FEATURE: ObservationModel(
          kind=ObservationKind.MSCKF_FEATURE, h=_h_feature,
          dz=2 * N_AUGMENT, ea_dim=3, maha_test=True),
  }
  return FilterSpec(
      name='msckf_eskf', dim_x=DIM_X, dim_err=DIM_ERR, f=_f, obs=obs,
      err=_err, inv_err=_inv_err, H_mod=_H_mod, f_err=_f_err,
      quaternion_idxs=tuple([3] + [DIM_MAIN + DIM_AUG * a + 3
                                   for a in range(N_AUGMENT)]),
      dim_main=DIM_MAIN, dim_main_err=DIM_MAIN_ERR,
      dim_augment=DIM_AUG, dim_augment_err=DIM_AUG_ERR,
      n_augment=N_AUGMENT,
      extra_routines={'compute_pos': compute_pos_batch})


def _initial_x():
  x = np.zeros(DIM_X)
  x[3] = 1.0  # main quat = identity
  for a in range(N_AUGMENT):
    x[DIM_MAIN + DIM_AUG * a + 3] = 1.0  # clone quats = identity
  return x


@register
class MSCKFEskf(KalmanFilter):
  """Facade for the MSCKF x ESKF visual-odometry localizer (the loc_kf-style
  composition the reference machinery exists for)."""

  name = 'msckf_eskf'

  initial_x = _initial_x()
  initial_P_diag = np.concatenate([
      np.full(3, 1.0**2), np.full(3, 0.1**2), np.full(3, 1.0**2),
      np.full(3, 0.05**2),
      np.tile(np.concatenate([np.full(3, 1.0**2), np.full(3, 0.1**2)]),
              N_AUGMENT)])
  Q = np.diag(np.concatenate([
      np.full(3, 0.05**2), np.full(3, 0.001**2), np.full(3, 0.5**2),
      np.full(3, 0.05**2),
      np.full(DIM_AUG_ERR * N_AUGMENT, 1e-12)]))  # clones are static
  obs_noise = {
      ObservationKind.POSITION: np.diag([1.0**2] * 3),
      ObservationKind.MSCKF_FEATURE: np.diag([0.01**2] * (2 * N_AUGMENT)),
  }

  _spec_cache = None

  @classmethod
  def build_spec(cls) -> FilterSpec:
    if cls._spec_cache is None:
      cls._spec_cache = build_msckf_eskf_spec()
    return cls._spec_cache

  def observe_camera_frame(self, t, tracks_img):
    """One camera frame: triangulate each complete track from the clone
    POSES (position + attitude) via the spec's compute_pos extra routine,
    apply the nullspace-projected feature update, then clone the current
    pose (augment=True) — the reference's joint flow (ekf_sym.py:525-526)."""
    tracks_img = np.asarray(tracks_img, dtype=np.float64)
    if tracks_img.ndim == 2:
      tracks_img = tracks_img[None]
    assert tracks_img.ndim == 3 and tracks_img.shape[1:] == (N_AUGMENT, 2), \
        tracks_img.shape
    n = tracks_img.shape[0]
    x = self.filter.state()
    poses = np.stack([np.concatenate([x[_clone_nom(a)[0]],
                                      x[_clone_nom(a)[1]]])
                      for a in range(N_AUGMENT)])
    if n:
      import jax.numpy as jnp

      triangulate = self.filter.get_extra_routine('compute_pos')
      poses_b = jnp.broadcast_to(jnp.asarray(poses), (n,) + poses.shape)
      pos, ok = triangulate(jnp.eye(3), poses_b, jnp.asarray(tracks_img))
      ok = np.asarray(ok)
      if ok.any():
        z = tracks_img[ok].reshape(int(ok.sum()), -1)
        R = self.get_R(ObservationKind.MSCKF_FEATURE, int(ok.sum()))
        return self.filter.predict_and_update_batch(
            t, ObservationKind.MSCKF_FEATURE, z, R,
            extra_args=np.asarray(pos)[ok], augment=True)
    # no usable tracks: still predict to t and clone the pose so the window
    # stays in sync with the camera cadence (see msckf_vo.py)
    return self.filter.predict_and_update_batch(
        t, ObservationKind.POSITION, np.zeros((0, 3)), np.zeros((0, 3, 3)),
        augment=True)
