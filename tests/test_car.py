"""Vehicle parameter-estimation filter: convergence + runtime-param surface.

Ground truth is integrated with an independent numpy implementation of the
single-track equations (not the spec's jnp function) at a finer timestep,
with the TRUE steer ratio / stiffness factor / angle offset; the filter
starts from wrong calibration values and must identify all three from yaw
rate + small-slip pseudo-observations while speed and steering vary every
tick through set_global (no recompilation — asserted via the jit cache).
"""

import numpy as np

from rednose_tpu.models.car import CarKalman, DEFAULT_PARAMS, ObservationKind

TRUE_SR, TRUE_SF, TRUE_AO = 17.5, 0.82, 1.8  # deg offset


def _truth_step(vy, r, u, steer_deg, dt):
  """Independent numpy single-track integrator at the true calibration."""
  p = DEFAULT_PARAMS
  m, j = p['mass'], p['rot_inertia']
  cF, cR = TRUE_SF * p['cF0'], TRUE_SF * p['cR0']
  aF, aR = p['aF'], p['aR']
  sa = np.deg2rad(steer_deg - TRUE_AO) / TRUE_SR
  for _ in range(10):  # finer substeps than the filter's dt
    vy_dot = (-(cF + cR) / (m * u) * vy
              + ((aR * cR - aF * cF) / (m * u) - u) * r + cF / m * sa)
    r_dot = ((aR * cR - aF * cF) / (j * u) * vy
             - (aF * aF * cF + aR * aR * cR) / (j * u) * r
             + aF * cF / j * sa)
    vy, r = vy + dt / 10 * vy_dot, r + dt / 10 * r_dot
  return vy, r


def test_identifies_vehicle_parameters():
  rng = np.random.RandomState(0)
  kf = CarKalman()
  dt = 0.05
  vy = r = 0.0
  t = 0.0
  for i in range(1200):
    t += dt
    # persistent excitation: sweeping steering + varying speed
    steer = 45.0 * np.sin(0.25 * t) + 20.0 * np.sin(1.1 * t)
    u = 18.0 + 8.0 * np.sin(0.05 * t)
    vy, r = _truth_step(vy, r, u, steer, dt)
    kf.set_inputs(u, steer)
    kf.predict_and_observe(t, ObservationKind.YAW_RATE,
                           [r + rng.normal(0, 0.001)])
    if i % 5 == 0:  # small-slip pseudo-observation at sensor subrate
      kf.predict_and_observe(t + dt / 4, ObservationKind.LATERAL_SLIP,
                             [vy + rng.normal(0, 0.1)])
      t += dt / 4

  sR, sf, ao = kf.x[0], kf.x[1], kf.x[2]
  assert abs(sR - TRUE_SR) < 0.8, sR
  assert abs(sf - TRUE_SF) < 0.05, sf
  assert abs(ao - TRUE_AO) < 0.25, ao


def test_set_global_does_not_recompile():
  """Per-tick input updates through params must reuse one compiled program
  (the reference's C-global setters never re-codegen; ekf_sym.py:129-132)."""
  from rednose_tpu.core import step as step_ops

  kf = CarKalman()
  step_ops.jit_predict_and_update_batch.cache_clear()
  t = 0.0
  for i in range(10):
    t += 0.05
    kf.set_inputs(15.0 + i, float(i))
    kf.predict_and_observe(t, ObservationKind.YAW_RATE, [0.0])
  fn = step_ops.jit_predict_and_update_batch(kf.spec,
                                             ObservationKind.YAW_RATE)
  # ONE traced program despite ten distinct (u, steer) inputs: params are
  # traced arguments, not static — the actual no-recompile guarantee
  assert fn._cache_size() == 1


def test_standstill_does_not_nan():
  """u = 0 (standstill) must not NaN-poison the filter: the dynamics
  saturate speed at MIN_SPEED instead of dividing by zero."""
  kf = CarKalman()
  kf.set_inputs(0.0, 30.0)
  kf.predict_and_observe(0.1, ObservationKind.YAW_RATE, [0.0])
  kf.predict_and_observe(0.2, ObservationKind.YAW_RATE, [0.0])
  assert np.isfinite(kf.x).all() and np.isfinite(kf.P).all()
  kf.set_inputs(20.0, 0.0)
  kf.predict_and_observe(0.3, ObservationKind.YAW_RATE, [0.0])
  assert np.isfinite(kf.x).all()


def test_registry_lists_car():
  from rednose_tpu.registry import lookup

  assert lookup('car') is CarKalman
