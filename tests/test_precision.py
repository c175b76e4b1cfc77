"""Numeric-precision tests (SURVEY.md §5 'sanitizer' equivalents):
float32 production path vs float64 oracle path, and smoother sharding over
the time axis (the sequence-parallel dimension) on the virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rednose_tpu.models.kinematic import KinematicKalman, ObservationKind
from rednose_tpu.runtime import bank as bank_ops
from rednose_tpu.smoothing.rts import rts_smooth_parallel


def _bank_final(dtype, T=500, B=8, seed=0):
  rng = np.random.default_rng(seed)
  spec = KinematicKalman.build_spec()
  state = bank_ops.init_bank(
      spec, KinematicKalman.initial_x, np.diag(KinematicKalman.initial_P_diag),
      batch=B, dtype=dtype)
  dts = jnp.full((T,), 0.01, dtype=dtype)
  zs = jnp.asarray(rng.normal(0, 0.5, size=(T, B, 1)), dtype=dtype)
  Rs = jnp.broadcast_to(jnp.asarray(0.1**2, dtype=dtype).reshape(1, 1, 1, 1),
                        (T, B, 1, 1))
  Q = jnp.asarray(KinematicKalman.Q, dtype=dtype)
  final, _ = bank_ops.run_bank(spec, ObservationKind.POSITION, {}, state, Q,
                               dts, zs, Rs)
  return np.asarray(final.x, dtype=np.float64), np.asarray(final.P,
                                                           dtype=np.float64)


def test_f32_bank_tracks_f64_oracle():
  """The float32 production path must stay within accumulated-roundoff
  distance of the float64 oracle over a 500-step trajectory."""
  x64, P64 = _bank_final(jnp.float64)
  x32, P32 = _bank_final(jnp.float32)
  rmse = np.sqrt(np.mean((x32 - x64) ** 2))
  assert rmse < 5e-5, rmse
  # covariances stay symmetric positive-definite in f32
  for P in P32:
    np.testing.assert_allclose(P, P.T, rtol=1e-5)
    assert np.all(np.linalg.eigvalsh(P) > 0)


@pytest.mark.slow
def test_parallel_smoother_under_time_sharding():
  """The associative-scan smoother jits and runs with the TIME axis sharded
  over the 8-device mesh (SURVEY.md §2.5 item 3: the sequence-parallel
  analog), matching the unsharded result."""
  from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

  rng = np.random.default_rng(0)
  spec = KinematicKalman.build_spec()
  kf = KinematicKalman()
  kf.filter.set_filter_time(0.0)
  T = 256
  estimates = []
  for k in range(T):
    est = kf.predict_and_observe(
        (k + 1) * 0.01, ObservationKind.POSITION, [[rng.normal(0, 0.3)]],
        R=np.full((1, 1, 1), 0.01))
    estimates.append(est)

  x_pred = jnp.stack([jnp.asarray(e[0]).reshape(-1) for e in estimates])
  x_post = jnp.stack([jnp.asarray(e[1]).reshape(-1) for e in estimates])
  P_pred = jnp.stack([jnp.asarray(e[2]) for e in estimates])
  P_post = jnp.stack([jnp.asarray(e[3]) for e in estimates])
  t = jnp.asarray([e[4] for e in estimates])

  ref_x, ref_P = rts_smooth_parallel(spec, {}, x_pred, P_pred, x_post,
                                     P_post, t)

  mesh = Mesh(np.array(jax.devices()), ('time',))
  sh = NamedSharding(mesh, P('time'))
  args = [jax.device_put(a, sh) for a in (x_pred, P_pred, x_post, P_post, t)]
  fn = jax.jit(lambda *a: rts_smooth_parallel(spec, {}, *a))
  sh_x, sh_P = fn(*args)
  np.testing.assert_allclose(np.asarray(sh_x), np.asarray(ref_x), rtol=1e-10)
  np.testing.assert_allclose(np.asarray(sh_P), np.asarray(ref_P), rtol=1e-10)


def test_out_of_order_live_kf():
  """Rewind/replay on the flagship ESKF: a shuffled stream must reproduce the
  in-order trajectory (the live-filter analog of test_out_of_order)."""
  from rednose_tpu.models.live import LiveKalman, ObservationKind as K

  rng = np.random.default_rng(0)
  pos0 = LiveKalman.initial_x[0:3]
  stream = []
  for i in range(30):
    t = (i + 1) * 0.05
    kind = [K.ECEF_POS, K.NO_ROT][i % 2]
    z = pos0 + rng.normal(0, 1, 3) if kind == K.ECEF_POS else np.zeros(3)
    stream.append((t, kind, z))

  kf_in = LiveKalman()
  for t, kind, z in stream:
    kf_in.predict_and_observe(t, kind, [z])

  swapped = list(stream)
  swapped[10], swapped[14] = swapped[14], swapped[10]  # out-of-order window
  kf_ooo = LiveKalman()
  for t, kind, z in swapped:
    kf_ooo.predict_and_observe(t, kind, [z])

  np.testing.assert_allclose(kf_ooo.x, kf_in.x, rtol=1e-9, atol=1e-12)
  np.testing.assert_allclose(kf_ooo.P, kf_in.P, rtol=1e-8, atol=1e-12)
