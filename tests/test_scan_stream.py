"""On-device heterogeneous stream (lax.scan + lax.switch) parity vs the host
driver, including the R-padding trick for mixed measurement dims."""

import jax.numpy as jnp
import numpy as np
import pytest

from rednose_tpu.models.live import LiveKalman, ObservationKind as K
from rednose_tpu.models.kinematic import KinematicKalman, ObservationKind as KK
from rednose_tpu.runtime.scan import build_scan_stream, pad_log


def test_scan_stream_matches_driver_mixed_kinds():
  """live_kf stream mixing dz=1 (odo speed) and dz=3 kinds: the padded
  on-device scan must reproduce the per-observation host driver."""
  rng = np.random.default_rng(0)
  kinds = (K.ECEF_POS, K.NO_ROT, K.ODOMETRIC_SPEED)
  pos0 = LiveKalman.initial_x[0:3]

  log = []
  for i in range(24):
    t = (i + 1) * 0.05
    kind = kinds[i % 3]
    if kind == K.ECEF_POS:
      z = pos0 + rng.normal(0, 1, 3)
    elif kind == K.NO_ROT:
      z = rng.normal(0, 1e-4, 3)
    else:
      z = np.array([rng.normal(2.0, 0.1)])  # nonzero speed (|v| smooth)
    R = LiveKalman().obs_noise[kind]
    log.append((t, kind, z, R, None))

  # host driver, one dispatch per observation
  kf = LiveKalman()
  # seed a nonzero velocity so the speed observation's |v| jacobian is finite
  x0 = LiveKalman.initial_x.copy()
  x0[7:10] = [1.0, 1.0, 1.0]
  kf.init_state(x0, covs=np.diag(LiveKalman.initial_P_diag), filter_time=0.0)
  for t, kind, z, R, _ in log:
    kf.filter.predict_and_update_batch(t, kind, np.atleast_2d(z),
                                       R[None, :, :])

  # on-device scan, one dispatch total
  spec = LiveKalman.build_spec()
  scan_fn, _ = build_scan_stream(spec, kinds)
  dts, ki, zs, Rs, eas = pad_log(spec, kinds, log, t0=0.0)
  (x_f, P_f), (x_preds, P_preds, xs, Ps) = scan_fn(
      {}, jnp.asarray(x0), jnp.asarray(np.diag(LiveKalman.initial_P_diag)),
      jnp.asarray(LiveKalman.Q),
      jnp.asarray(dts), jnp.asarray(ki), jnp.asarray(zs), jnp.asarray(Rs),
      jnp.asarray(eas))

  np.testing.assert_allclose(np.asarray(x_f), kf.x, rtol=1e-8, atol=1e-10)
  np.testing.assert_allclose(np.asarray(P_f), kf.P, rtol=1e-6, atol=1e-9)
  assert xs.shape == (len(log), spec.dim_x)


def test_scan_stream_single_kind_matches_driver():
  rng = np.random.default_rng(1)
  spec = KinematicKalman.build_spec()
  log = [((i + 1) * 0.01, KK.POSITION, [rng.normal(0, 0.3)],
          np.atleast_2d(0.01), None) for i in range(100)]

  kf = KinematicKalman()
  kf.filter.set_filter_time(0.0)
  for t, kind, z, R, _ in log:
    kf.filter.predict_and_update_batch(t, kind, np.atleast_2d(z), R[None])

  scan_fn, _ = build_scan_stream(spec, (KK.POSITION,))
  dts, ki, zs, Rs, eas = pad_log(spec, (KK.POSITION,), log, t0=0.0)
  (x_f, P_f), _ = scan_fn(
      {}, jnp.asarray(KinematicKalman.initial_x),
      jnp.asarray(np.diag(KinematicKalman.initial_P_diag)),
      jnp.asarray(KinematicKalman.Q),
      jnp.asarray(dts), jnp.asarray(ki), jnp.asarray(zs), jnp.asarray(Rs),
      jnp.asarray(eas))
  np.testing.assert_allclose(np.asarray(x_f), kf.x, rtol=1e-10)
  np.testing.assert_allclose(np.asarray(P_f), kf.P, rtol=1e-10)


@pytest.mark.slow
def test_scan_stream_feeds_smoother():
  """Fully on-device offline pipeline: scan the log, smooth the stacked
  estimates — must match smoothing the host driver's estimate list."""
  import jax.numpy as jnp
  from rednose_tpu.smoothing.rts import rts_smooth_parallel

  rng = np.random.default_rng(2)
  spec = KinematicKalman.build_spec()
  log = [((i + 1) * 0.01, KK.POSITION, [rng.normal(0, 0.3)],
          np.atleast_2d(0.01), None) for i in range(64)]

  kf = KinematicKalman()
  kf.filter.set_filter_time(0.0)
  estimates = []
  for t, kind, z, R, _ in log:
    estimates.append(kf.filter.predict_and_update_batch(
        t, kind, np.atleast_2d(z), R[None]))
  ref = kf.filter.rts_smooth(estimates, parallel=True)
  ref_x = np.stack([s[0] for s in ref])

  scan_fn, _ = build_scan_stream(spec, (KK.POSITION,))
  dts, ki, zs, Rs, eas = pad_log(spec, (KK.POSITION,), log, t0=0.0)
  _, (x_pred, P_pred, x_post, P_post) = scan_fn(
      {}, jnp.asarray(KinematicKalman.initial_x),
      jnp.asarray(np.diag(KinematicKalman.initial_P_diag)),
      jnp.asarray(KinematicKalman.Q),
      jnp.asarray(dts), jnp.asarray(ki), jnp.asarray(zs), jnp.asarray(Rs),
      jnp.asarray(eas))
  ts = np.cumsum(dts)
  xs, Ps = rts_smooth_parallel(spec, {}, x_pred, P_pred, x_post, P_post,
                               jnp.asarray(ts), dts=jnp.asarray(dts[1:]))
  np.testing.assert_allclose(np.asarray(xs), ref_x, rtol=1e-8, atol=1e-10)
