"""GNSS localizer: the downstream loc_kf family, TPU-native.

The reference ships the pseudorange observation kinds in its enum
(examples/live_kf.py:24-41: PSEUDORANGE_GPS/GLONASS + rates) but the
filter that consumes them lives downstream in openpilot's loc_kf. This
model completes that story natively: an 11-state ECEF position / velocity
/ receiver-clock filter whose pseudorange and pseudorange-rate
observations take per-measurement satellite states through the NON-feature
extra-args path (ObservationModel.ea_len > 0, ea_dim == 0 — no nullspace
projection; reference plumbing: obs_eqs entries with extra args whose kind
is not in feature_track_kinds, ekf_sym.py:84-89).

State (additive error state):
    [0:3]  ECEF position (m)
    [3:6]  ECEF velocity (m/s)
    [6]    receiver clock bias (m)
    [7]    receiver clock drift (m/s)
    [8:11] accelerometer-frame acceleration (m/s^2), random walk

Observation models:
    PSEUDORANGE(_GPS):      rho = |pos - sat_pos| + bias          ea = sat_pos (3,)
    PSEUDORANGE_RATE(_GPS): rho_dot = u.(vel - sat_vel) + drift   ea = [sat_pos, sat_vel] (6,)
    ECEF_POS:               direct position fix

Runs on every framework path: FilterEngine (driver threads real extra
args), lane banks (lane_update ea=), the sympy compat surface, and the
smoothers. Tests: tests/test_loc.py (multi-satellite convergence to a
moving-receiver ground truth, rate observability of clock drift).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from rednose_tpu.core.spec import FilterSpec, ObservationModel
from rednose_tpu.models.kalman_filter import KalmanFilter
from rednose_tpu.models.live import ObservationKind
from rednose_tpu.registry import register

DIM = 11

_EARTH_R = 6.371e6


def _f(params, x, dt):
  del params
  pos, vel = x[0:3], x[3:6]
  bias, drift = x[6], x[7]
  acc = x[8:11]
  return jnp.concatenate([
      pos + dt * vel,
      vel + dt * acc,
      (bias + dt * drift)[None],
      drift[None],
      acc,
  ])


def _h_pseudorange(params, x, ea):
  del params
  d = x[0:3] - ea[0:3]
  # clamp like the odometric-speed h: a zero range makes the direction
  # (and the jacfwd oracle) undefined; degrade gracefully instead of NaN
  rho = jnp.sqrt(jnp.maximum(d[0] * d[0] + d[1] * d[1] + d[2] * d[2],
                             1e-6))
  return (rho + x[6])[None]


def _h_pseudorange_rate(params, x, ea):
  del params
  sat_pos, sat_vel = ea[0:3], ea[3:6]
  d = x[0:3] - sat_pos
  rho = jnp.sqrt(jnp.maximum(d[0] * d[0] + d[1] * d[1] + d[2] * d[2],
                             1e-6))
  u = d / rho
  return (u @ (x[3:6] - sat_vel) + x[7])[None]


def _h_ecef_pos(params, x, ea):
  del params, ea
  return x[0:3]


_spec_cache = {}


def build_loc_spec() -> FilterSpec:
  if "spec" not in _spec_cache:
    obs = {}
    for kind in (ObservationKind.PSEUDORANGE_GPS,
                 ObservationKind.PSEUDORANGE):
      obs[int(kind)] = ObservationModel(
          kind=int(kind), h=_h_pseudorange, dz=1, ea_dim=0, ea_len=3,
          maha_test=True)
    for kind in (ObservationKind.PSEUDORANGE_RATE_GPS,
                 ObservationKind.PSEUDORANGE_RATE):
      obs[int(kind)] = ObservationModel(
          kind=int(kind), h=_h_pseudorange_rate, dz=1, ea_dim=0, ea_len=6,
          maha_test=True)
    obs[int(ObservationKind.ECEF_POS)] = ObservationModel(
        kind=int(ObservationKind.ECEF_POS), h=_h_ecef_pos, dz=3)
    _spec_cache["spec"] = FilterSpec(
        name="loc", dim_x=DIM, dim_err=DIM, f=_f, obs=obs)
  return _spec_cache["spec"]


class LocKalman(KalmanFilter):
  """GNSS receiver filter facade (loc_kf-style)."""

  name = "loc"
  initial_x = np.concatenate([
      [_EARTH_R, 0.0, 0.0],     # somewhere on the sphere
      np.zeros(3),              # velocity
      [0.0, 0.0],               # clock bias / drift
      np.zeros(3),              # acceleration
  ])
  initial_P_diag = np.concatenate([
      1e8 * np.ones(3), 1e2 * np.ones(3), [1e6, 1e2], 1e1 * np.ones(3)])
  Q = np.diag(np.concatenate([
      0.03 * np.ones(3), 1e-4 * np.ones(3), [0.1, 0.01],
      0.005 * np.ones(3)]))
  obs_noise = {
      int(ObservationKind.PSEUDORANGE_GPS): np.atleast_2d(4.0),
      int(ObservationKind.PSEUDORANGE): np.atleast_2d(4.0),
      int(ObservationKind.PSEUDORANGE_RATE_GPS): np.atleast_2d(0.05**2),
      int(ObservationKind.PSEUDORANGE_RATE): np.atleast_2d(0.05**2),
      int(ObservationKind.ECEF_POS): np.diag([25.0] * 3),
  }

  @classmethod
  def build_spec(cls) -> FilterSpec:
    return build_loc_spec()


register(LocKalman)
