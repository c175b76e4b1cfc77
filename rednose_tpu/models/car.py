"""Vehicle-dynamics parameter estimation filter (the paramsd pattern).

The reference framework's second production use downstream of openpilot is
vehicle-model parameter identification: a filter whose state mixes slowly
drifting CALIBRATION parameters (steer ratio, tire-stiffness factor,
steering-angle offset) with fast DYNAMIC states (lateral velocity, yaw
rate), driven by the linear single-track ("bicycle") model. This module
ships that filter-family natively; it also demonstrates the framework's
runtime-parameter surface (`params` pytree + `FilterEngine.set_global`, the
TPU-native replacement for the reference's mutable C globals + set_<var>
setters, rednose/helpers/ekf_sym.py:129-132): forward speed and commanded
steering angle are *runtime params*, updated every tick with zero
recompilation — exactly how the reference feeds its IMU lever arm through
global_vars.

Bicycle-model dynamics (standard linear single-track equations; see e.g.
Rajamani, "Vehicle Dynamics and Control", ch. 2):

  tire angle     sa  = (steer_angle - angle_offset) / sR
  front/rear     cF  = sf * cF0,   cR = sf * cR0   (stiffness_factor sf)
  lateral vel    vy' = -(cF+cR)/(m u) vy + ((aR cR - aF cF)/(m u) - u) r
                       + cF/m sa
  yaw rate       r'  = (aR cR - aF cF)/(J u) vy
                       - (aF^2 cF + aR^2 cR)/(J u) r + aF cF/J sa

with the three calibration states following random walks (process noise
only). Yaw rate is observed from the gyro; lateral velocity gets the
standard small-slip pseudo-observation.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from rednose_tpu.core.spec import FilterSpec, ObservationModel
from rednose_tpu.models.kalman_filter import KalmanFilter
from rednose_tpu.registry import register


class ObservationKind:
  YAW_RATE = 1       # gyro yaw rate (rad/s)
  LATERAL_SLIP = 2   # small-slip pseudo-observation of lateral velocity

  names = {1: 'Yaw rate', 2: 'Lateral slip'}

  @classmethod
  def to_string(cls, kind):
    return cls.names[kind]


class States:
  STEER_RATIO = slice(0, 1)
  STIFFNESS = slice(1, 2)        # unitless factor on nominal stiffness
  ANGLE_OFFSET = slice(2, 3)     # degrees
  LATERAL_VELOCITY = slice(3, 4)  # m/s
  YAW_RATE = slice(4, 5)         # rad/s


DIM = 5

# nominal vehicle constants (generic mid-size sedan; tunable via params)
DEFAULT_PARAMS = {
    'mass': 1650.0,        # kg
    'rot_inertia': 2500.0,  # kg m^2
    'cF0': 1.2e5,          # N/rad nominal front cornering stiffness
    'cR0': 1.7e5,          # N/rad nominal rear
    'aF': 1.25,            # m, CG -> front axle
    'aR': 1.55,            # m, CG -> rear axle
    # runtime inputs, updated per tick via set_global (no recompile):
    'u': 20.0,             # forward speed (m/s)
    'steer_angle_deg': 0.0,  # commanded steering-wheel angle (degrees)
}


# Speed floor for the dynamics: the single-track equations divide by u and
# the one-step explicit-Euler discretization goes unstable once
# (cF+cR)/(m u) dt > 2 (~3.5 m/s at 20 Hz). Below this speed there is no
# lateral-dynamics information anyway (paramsd likewise gates on speed), so
# the model saturates u rather than NaN-poisoning the state at standstill.
MIN_SPEED = 5.0


def _f(params, x, dt):
  sR = x[0]
  sf = x[1]
  ao = x[2]
  vy = x[3]
  r = x[4]
  m, j = params['mass'], params['rot_inertia']
  cF, cR = sf * params['cF0'], sf * params['cR0']
  aF, aR = params['aF'], params['aR']
  u = jnp.maximum(params['u'], MIN_SPEED)
  sa = jnp.deg2rad(params['steer_angle_deg'] - ao) / sR

  vy_dot = (-(cF + cR) / (m * u) * vy
            + ((aR * cR - aF * cF) / (m * u) - u) * r + cF / m * sa)
  r_dot = ((aR * cR - aF * cF) / (j * u) * vy
           - (aF * aF * cF + aR * aR * cR) / (j * u) * r
           + aF * cF / j * sa)
  return jnp.concatenate([
      x[0:3],                      # calibration states: random walk
      (vy + dt * vy_dot)[None],
      (r + dt * r_dot)[None],
  ])


def _h_yaw_rate(params, x, ea):
  del params, ea
  return x[4:5]


def _h_lateral_slip(params, x, ea):
  del params, ea
  return x[3:4]


def build_car_spec() -> FilterSpec:
  obs = {
      ObservationKind.YAW_RATE: ObservationModel(
          ObservationKind.YAW_RATE, _h_yaw_rate, 1, maha_test=True),
      ObservationKind.LATERAL_SLIP: ObservationModel(
          ObservationKind.LATERAL_SLIP, _h_lateral_slip, 1),
  }
  return FilterSpec(
      name='car', dim_x=DIM, dim_err=DIM, f=_f, obs=obs,
      default_params=dict(DEFAULT_PARAMS))


@register
class CarKalman(KalmanFilter):
  """Vehicle-model parameter estimator (paramsd-style)."""

  name = 'car'

  initial_x = np.array([15.0, 1.0, 0.0, 0.0, 0.0])
  initial_P_diag = np.array([5.0**2, 0.25**2, 2.0**2, 1.0**2, 1.0**2])
  # calibration states drift slowly; dynamics absorb model error faster
  Q = np.diag([0.005**2, 0.002**2, 0.01**2, 0.1**2, 0.05**2])
  obs_noise = {
      ObservationKind.YAW_RATE: np.atleast_2d(0.001**2),
      ObservationKind.LATERAL_SLIP: np.atleast_2d(0.3**2),
  }

  _spec_cache = None

  @classmethod
  def build_spec(cls) -> FilterSpec:
    if cls._spec_cache is None:
      cls._spec_cache = build_car_spec()
    return cls._spec_cache

  def set_inputs(self, u: float, steer_angle_deg: float):
    """Per-tick control inputs as runtime params — traced arguments, so no
    recompilation (the reference's set_<var> C-global pattern)."""
    self.filter.set_global('u', float(u))
    self.filter.set_global('steer_angle_deg', float(steer_angle_deg))
