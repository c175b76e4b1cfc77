"""Auxiliary-subsystem tests: disk checkpoint/resume, offline multipass
smoothing, the filter registry, and numeric-health hooks (SURVEY.md §5)."""

import numpy as np
import pytest

from rednose_tpu import registry
from rednose_tpu.models.kinematic import KinematicKalman, ObservationKind
from rednose_tpu.runtime import bank as bank_ops
from rednose_tpu.runtime.checkpoint import (
    load_bank, load_filter, save_bank, save_filter)
from rednose_tpu.runtime.offline import Observation, multipass_smooth, replay_log
from rednose_tpu.utils import profiling


def _make_log(T=200, seed=0):
  rng = np.random.default_rng(seed)
  dt = 0.01
  x, truth = 0.0, []
  log = []
  for i in range(T):
    t = (i + 1) * dt
    v = np.sin(t * 5)
    truth.append(x)
    log.append(Observation(t=t, kind=ObservationKind.POSITION,
                           data=[rng.normal(x, 0.1)]))
    x += v * dt
  return log, np.array(truth)


def test_checkpoint_roundtrip(tmp_path):
  log, _ = _make_log(50)
  kf = KinematicKalman()
  replay_log(kf, log[:25])
  path = tmp_path / "ckpt.npz"
  save_filter(path, kf.filter)
  x_saved, P_saved, t_saved = kf.x.copy(), kf.P.copy(), kf.t

  # diverge the original, then restore into a fresh engine
  replay_log(kf, log[25:])
  assert not np.allclose(kf.x, x_saved)

  kf2 = KinematicKalman()
  load_filter(path, kf2.filter)
  np.testing.assert_allclose(kf2.x, x_saved)
  np.testing.assert_allclose(kf2.P, P_saved)
  assert kf2.t == t_saved

  # both resume identically
  replay_log(kf2, log[25:])
  kf3 = KinematicKalman()
  replay_log(kf3, log)
  np.testing.assert_allclose(kf2.x, kf3.x, rtol=1e-12)


def test_bank_checkpoint_roundtrip(tmp_path):
  import jax.numpy as jnp

  spec = KinematicKalman.build_spec()
  state = bank_ops.init_bank(
      spec, KinematicKalman.initial_x, np.diag(KinematicKalman.initial_P_diag),
      batch=16, dtype=jnp.float64)
  path = tmp_path / "bank.npz"
  save_bank(path, state)
  state2 = load_bank(path)
  np.testing.assert_allclose(np.asarray(state2.x), np.asarray(state.x))
  np.testing.assert_allclose(np.asarray(state2.P), np.asarray(state.P))


def test_multipass_smoothing_improves():
  log, truth = _make_log()
  kf = KinematicKalman()
  smoothed1, estimates = multipass_smooth(kf, log, passes=1)
  kf2 = KinematicKalman()
  smoothed2, _ = multipass_smooth(kf2, log, passes=2)

  filt_pos = np.array([np.asarray(e[1]).reshape(-1)[0] for e in estimates])
  s1 = np.array([s[0][0] for s in smoothed1])
  s2 = np.array([s[0][0] for s in smoothed2])
  rmse = lambda a: np.sqrt(np.mean((a - truth) ** 2))
  assert rmse(s1) < rmse(filt_pos)
  # the warm-started second pass must not be worse than the first
  assert rmse(s2) <= rmse(s1) * 1.05


def test_registry():
  cls = registry.lookup('kinematic')
  assert cls is KinematicKalman
  assert set(registry.registered_filters()) >= {'kinematic', 'live'}
  with pytest.raises(KeyError):
    registry.lookup('nonexistent')
  with pytest.raises(ValueError):
    registry.register(type('Anon', (), {}))


def test_assert_finite():
  profiling.assert_finite({'x': np.ones(3)})
  with pytest.raises(FloatingPointError):
    profiling.assert_finite({'x': np.array([1.0, np.nan])})


def test_finite_flag_traced():
  import jax
  import jax.numpy as jnp

  flag = jax.jit(profiling.finite_or_nan_flag)({'a': jnp.ones(4)})
  assert bool(flag)
  flag = jax.jit(profiling.finite_or_nan_flag)(
      {'a': jnp.array([1.0, jnp.inf])})
  assert not bool(flag)


def test_extra_routines():
  import dataclasses
  import jax.numpy as jnp

  spec = KinematicKalman.build_spec()
  spec2 = dataclasses.replace(
      spec, obs=dict(spec.obs),
      extra_routines={'double_pos': lambda x: 2.0 * x[0]})
  from rednose_tpu.runtime.driver import FilterEngine
  eng = FilterEngine(spec2, KinematicKalman.Q, KinematicKalman.initial_x,
                     np.diag(KinematicKalman.initial_P_diag))
  fn = eng.get_extra_routine('double_pos')
  assert float(fn(jnp.asarray([3.0, 1.0]))) == 6.0
  with pytest.raises(KeyError):
    eng.get_extra_routine('nope')


def test_cost_report():
  """cost_report exposes XLA's compiled cost analysis (flops/bytes) for
  roofline checks."""
  import jax.numpy as jnp

  from rednose_tpu.core import step as step_ops
  from rednose_tpu.models.kinematic import KinematicKalman
  from rednose_tpu.utils.profiling import cost_report

  spec = KinematicKalman.build_spec()
  rep = cost_report(
      lambda x, P, Q, dt: step_ops.predict(spec, {}, x, P, Q, dt),
      jnp.zeros(2), jnp.eye(2), jnp.eye(2), jnp.asarray(0.01))
  assert rep.get('flops', 0) > 0


def test_jaxpr_flops_counter():
  """jaxpr_flops counts arithmetic by output size (a (22,22) mul is 484
  FLOPs), 2*out*K for dot_general, and multiplies scan bodies by their trip
  count — the auditable counting rule behind PARITY.md's roofline lines."""
  import jax
  import jax.numpy as jnp

  from rednose_tpu.utils.profiling import jaxpr_flops

  # elementwise: (4,5) mul + add = 2 * 20
  assert jaxpr_flops(lambda a, b: a * b + b,
                     jnp.zeros((4, 5)), jnp.ones((4, 5))) == 40
  # dot_general: (3,4) @ (4,2) = 2 * (3*2) * 4 = 48
  assert jaxpr_flops(lambda a, b: a @ b,
                     jnp.zeros((3, 4)), jnp.zeros((4, 2))) == 48
  # scan multiplies the body count by the trip count
  def scanned(x):
    return jax.lax.scan(lambda c, _: (c * 2.0 + 1.0, None), x,
                        None, length=7)[0]
  assert jaxpr_flops(scanned, jnp.zeros((5,))) == 7 * 2 * 5
  # data movement is free
  assert jaxpr_flops(lambda a: a.T.reshape(-1), jnp.zeros((4, 5))) == 0


def test_normalize_quaternions():
  """normalize_quaternions / normalize_slice (reference ekf_sym.py:405-410):
  every quaternion block renormalized to unit length, rest untouched."""
  from rednose_tpu.models.live import LiveKalman

  kf = LiveKalman()
  eng = kf.filter
  x = np.asarray(eng.state())
  x[3:7] = [2.0, 0.0, 0.0, 0.0]           # denormalized quaternion
  eng.init_state(x, np.asarray(eng.covs()), 0.0)
  eng.normalize_quaternions()
  out = eng.state()
  np.testing.assert_allclose(np.linalg.norm(out[3:7]), 1.0, rtol=1e-6)
  np.testing.assert_allclose(out[3:7], [1.0, 0.0, 0.0, 0.0], atol=1e-7)
  np.testing.assert_allclose(out[:3], x[:3], rtol=1e-7)  # rest untouched
  np.testing.assert_allclose(out[7:], x[7:], rtol=1e-7)
