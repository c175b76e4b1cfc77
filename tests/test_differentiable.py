"""End-to-end differentiability: the whole filter is pure jax, so gradients
flow through predict/update/scan — enabling gradient-based tuning of process
noise, measurement noise, and model parameters. The reference (codegen'd C)
cannot do this at all; it is a genuinely TPU-native capability.
"""

import jax
import jax.numpy as jnp
import numpy as np

from rednose_tpu.core import step as step_ops
from rednose_tpu.models.kinematic import KinematicKalman, ObservationKind
from rednose_tpu.runtime import bank as bank_ops


def _sim(T, q_true=2.0, seed=0):
  """Constant-velocity-ish truth with process noise q_true on velocity."""
  rng = np.random.default_rng(seed)
  xs = np.zeros((T,))
  v = 0.0
  x = 0.0
  for k in range(T):
    v += rng.normal(0, q_true * 0.01)
    x += v * 0.01
    xs[k] = x
  zs = xs + rng.normal(0, 0.1, T)
  return xs, zs


def _nll(log_q, zs):
  """Innovation negative log-likelihood of the filter under process noise
  exp(log_q) — the standard maximum-likelihood tuning objective."""
  spec = KinematicKalman.build_spec()
  q = jnp.exp(log_q)
  Q = jnp.diag(jnp.stack([jnp.asarray(0.1**2), q]))
  R = jnp.asarray([[0.1**2]])

  def body(carry, z):
    x, P = carry
    x, P = step_ops.predict(spec, {}, x, P, Q, jnp.asarray(0.01))
    h = x[0]
    S = P[0, 0] + R[0, 0]
    nll = 0.5 * (jnp.log(S) + (z - h) ** 2 / S)
    x, P, _ = step_ops.update(spec, ObservationKind.POSITION, {}, x, P,
                              z[None], R, jnp.zeros((1,)))
    return (x, P), nll

  x0 = jnp.asarray(KinematicKalman.initial_x)
  P0 = jnp.asarray(np.diag(KinematicKalman.initial_P_diag))
  _, nlls = jax.lax.scan(body, (x0, P0), zs)
  return jnp.mean(nlls)


def test_gradients_flow_through_filter():
  _, zs = _sim(200)
  g = jax.grad(_nll)(jnp.asarray(0.0), jnp.asarray(zs))
  assert np.isfinite(float(g)) and abs(float(g)) > 0


def test_ml_noise_tuning_recovers_process_noise():
  """Maximum-likelihood noise identification by gradient descent on the
  innovation NLL: from wildly wrong starting points (1e-4 and 1e4), the
  estimated velocity diffusion must converge to the simulated truth."""
  q_true = 2.0
  _, zs = _sim(800, q_true=q_true, seed=1)
  zs = jnp.asarray(zs)
  grad_fn = jax.jit(jax.grad(_nll))

  def fit(log_q0, steps=200, lr=2.0, momentum=0.9):
    log_q = jnp.asarray(log_q0)
    m = 0.0
    for _ in range(steps):
      m = momentum * m + grad_fn(log_q, zs)
      log_q = log_q - lr * m
    return float(jnp.exp(0.5 * log_q))  # Q stores variance; report std

  est_lo = fit(np.log(1e-4))
  est_hi = fit(np.log(1e4))
  # both sides find the same interior optimum
  assert abs(np.log(est_lo / est_hi)) < 0.05, (est_lo, est_hi)
  # the sim's per-step velocity noise std is q_true*0.01, and the filter adds
  # dt*Q, so the ML optimum is std = q_true*0.01/sqrt(dt) = 0.2
  truth = q_true * 0.01 / np.sqrt(0.01)
  assert 0.6 * truth < est_lo < 1.6 * truth, (est_lo, truth)


def test_gradient_through_bank():
  """Gradients also flow through the vmapped bank scan (fleet-wide tuning)."""
  spec = KinematicKalman.build_spec()
  rng = np.random.default_rng(0)
  T, B = 32, 8
  zs = jnp.asarray(rng.normal(0, 0.3, (T, B, 1)))
  dts = jnp.full((T,), 0.01)
  Rs = jnp.broadcast_to(jnp.asarray(0.01).reshape(1, 1, 1, 1), (T, B, 1, 1))

  def loss(q_diag):
    state = bank_ops.init_bank(
        spec, KinematicKalman.initial_x,
        np.diag(KinematicKalman.initial_P_diag), batch=B, dtype=jnp.float64)
    final, ys = bank_ops.run_bank(spec, ObservationKind.POSITION, {}, state,
                                  jnp.diag(q_diag), dts, zs, Rs)
    return jnp.mean(ys ** 2)

  g = jax.grad(loss)(jnp.asarray([0.01, 4.0]))
  assert g.shape == (2,) and bool(jnp.all(jnp.isfinite(g)))
