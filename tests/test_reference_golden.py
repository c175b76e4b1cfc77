"""Golden-trace parity against the reference's OWN compiled C filters.

The fixtures in tests/fixtures/ref_*.npz were produced by the reference's
actual binaries: its own gen_code sympy->C codegen compiled with g++ against
Eigen, driven by its own EKF_sym engine over cffi — the exact oracle
BASELINE.md names (reference test.sh / examples/test_compare.py:104-120).
See tools/record_reference_traces.py for the recorded streams and the build
recipe. These tests close the last inch of the RMSE claim: our engines are
asserted against reference-PRODUCED artifacts, not an in-repo rederivation.

Normalization-placement note (live): the reference engine is constructed
with quaternion_idxs=[] and the LiveKalman FACADE renormalizes x[3:7] once
after each predict_and_update_batch (live_kf.py:299-306); our live spec
instead renormalizes inside every jitted predict/update (models/live.py:338).
Both are valid filters but their trajectories drift apart at the ~1e-3
relative level over 300 obs on this weakly-observed stream. For exact
migration diffs, strip quaternion_idxs from the spec and renormalize at the
facade level, as test_live_trace_* do — that reproduces the reference to
~1e-13 relative.
"""

import dataclasses
import os

import numpy as np
import pytest

from rednose_tpu.models.kinematic import KinematicKalman
from rednose_tpu.models.live import LiveKalman, build_live_spec
from rednose_tpu.runtime.driver import FilterEngine
from rednose_tpu.runtime.generic_bank import KalmanBank
from rednose_tpu.smoothing.rts import rts_smooth

import jax.numpy as jnp

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")

CAM_KINDS = (13, 14)  # CAMERA_ODO_TRANSLATION / _ROTATION


def _load(name):
  path = os.path.join(FIXTURES, name)
  if not os.path.exists(path):  # pragma: no cover
    pytest.skip(f"fixture {name} not recorded "
                "(tools/record_reference_traces.py)")
  return np.load(path)


def _rmse(a, b):
  return float(np.sqrt(np.mean((np.asarray(a) - np.asarray(b)) ** 2)))


def _live_ref_spec():
  """Live spec with reference normalization placement (see module docstring)."""
  return dataclasses.replace(build_live_spec(), name="live_refnorm",
                             quaternion_idxs=())


def _live_obs(d, j):
  t = float(d["t"][j])
  kind = int(d["kind"][j])
  z = d["z"][j][: int(d["dz"][j])]
  stds = d["stds"][j]
  if kind in CAM_KINDS:
    R = np.diag(stds ** 2)
  else:
    R = np.atleast_2d(np.asarray(LiveKalman.obs_noise[kind], dtype=float))
  return t, kind, z, R


def test_kinematic_trace_filter_engine():
  """The reference test_compare simulation (incl. the index-20<->40 OOO swap,
  test_compare.py:104-106) through our FilterEngine: per-delivery state and
  covariance match the compiled reference filter to machine precision."""
  d = _load("ref_kinematic_trace.npz")
  kf = KinematicKalman()
  xs, Ps = [], []
  for t, z in zip(d["t"], d["z"]):
    est = kf.predict_and_observe(float(t), 1, [np.array([z])])
    assert est is not None
    xs.append(kf.x.copy())
    Ps.append(kf.P.copy())
  assert _rmse(np.stack(xs), d["golden_x"]) <= 1e-6
  assert _rmse(np.stack(Ps), d["golden_P"]) <= 1e-6
  np.testing.assert_allclose(np.stack(xs), d["golden_x"], atol=1e-12)
  np.testing.assert_allclose(np.stack(Ps), d["golden_P"], atol=1e-12)


def test_kinematic_trace_bank():
  """The same reference-produced trace through the bank engine
  (KalmanBank.observe, sparse-snapshot OOO ring): every lane matches the
  reference binary per delivery."""
  d = _load("ref_kinematic_trace.npz")
  bank = KalmanBank(KinematicKalman, batch=4, dtype=jnp.float64,
                    use_pallas=False)
  xs, Ps = [], []
  for t, z in zip(d["t"], d["z"]):
    r = bank.observe(float(t), 1, np.array([z]))
    assert r is not None
    xs.append(np.asarray(bank.x)[0])
    Ps.append(np.asarray(bank.P)[0])
  assert _rmse(np.stack(xs), d["golden_x"]) <= 1e-6
  np.testing.assert_allclose(np.stack(xs), d["golden_x"], atol=1e-10)
  np.testing.assert_allclose(np.stack(Ps), d["golden_P"], atol=1e-10)
  # every lane saw identical inputs -> identical states
  np.testing.assert_array_equal(np.asarray(bank.x)[1], np.asarray(bank.x)[0])


def test_kinematic_smooth_reference_seed():
  """rts_smooth(reference_seed=True) reproduces the reference's OWN
  rts_smooth output (recorded from ekf_sym.py:651-690 over the compiled
  filter) bit-for-bit-ish; the estimate stacks come from the same binary."""
  s = _load("ref_kinematic_smooth.npz")
  spec = KinematicKalman.build_spec()
  xs, Ps = rts_smooth(spec, {}, s["x_pred"], s["P_pred"], s["x_post"],
                      s["P_post"], s["t"], reference_seed=True)
  np.testing.assert_allclose(np.asarray(xs), s["smooth_x"], atol=1e-12)
  np.testing.assert_allclose(np.asarray(Ps), s["smooth_P"], atol=1e-12)
  # default (posterior) seed keeps the final measurement -> tails differ
  xs0, _ = rts_smooth(spec, {}, s["x_pred"], s["P_pred"], s["x_post"],
                      s["P_post"], s["t"])
  assert np.abs(np.asarray(xs0)[-1] - s["smooth_x"][-1]).max() > 1e-6


def test_live_trace_filter_engine():
  """The 300-obs all-kind live stream (camera R-from-measurement rows, OOO
  swaps inside the rewind window) through FilterEngine with reference
  normalization placement: relative state error vs the compiled reference
  filter stays at the 1e-13 level; RMSE well under 1e-6."""
  d = _load("ref_live_trace.npz")
  eng = FilterEngine(_live_ref_spec(), LiveKalman.Q, d["x0"],
                     np.diag(d["P0_diag"]))
  eng.init_state(d["x0"], np.diag(d["P0_diag"]), filter_time=0.0)
  scale = np.maximum(np.abs(d["golden_x"]).max(axis=0), 1.0)
  rel_x, abs_P = [], []
  for pos, j in enumerate(d["order"]):
    t, kind, z, R = _live_obs(d, j)
    r = eng.predict_and_update_batch(t, kind, z.reshape(1, -1), R[None])
    assert r is not None
    eng.normalize_slice(3, 7)  # facade-level renorm (live_kf.py:306)
    rel_x.append((np.abs(eng.state() - d["golden_x"][pos]) / scale).max())
    abs_P.append(np.abs(eng.covs() - d["golden_P"][pos]).max())
  assert max(rel_x) <= 1e-9, max(rel_x)
  assert max(abs_P) <= 1e-8, max(abs_P)
  assert _rmse(eng.state() / scale, d["golden_x"][-1] / scale) <= 1e-6


def test_live_trace_bank():
  """The same live stream through the bank engine (KalmanBank.observe on
  the reference-normalization spec, facade renorm applied bank-wide)."""
  d = _load("ref_live_trace.npz")
  spec = _live_ref_spec()
  # Per-observation snapshots (ckpt_every=1) to mirror the reference's ring
  # (REWIND_TO_KEEP=512, one checkpoint per obs): with sparse snapshots a
  # rewind replays through the facade-level renorms applied below, which
  # the ring cannot know about — during the early transient |q| is far from
  # unit after an update, so a renorm is NOT a small correction and the
  # replayed trajectory shifts on weakly observed components.
  bank = KalmanBank(spec=spec, batch=2, x0=d["x0"], P_diag=d["P0_diag"],
                    Q=LiveKalman.Q, obs_noise=LiveKalman.obs_noise,
                    dtype=jnp.float64, use_pallas=False,
                    ckpt_every=1, ckpt_keep=128)
  scale = np.maximum(np.abs(d["golden_x"]).max(axis=0), 1.0)
  rel_x = []
  for pos, j in enumerate(d["order"]):
    t, kind, z, R = _live_obs(d, j)
    r = bank.observe(t, kind, z, R=R)
    assert r is not None
    xb = np.asarray(bank.x).copy()
    xb[:, 3:7] /= np.linalg.norm(xb[:, 3:7], axis=1, keepdims=True)
    bank._x = jnp.asarray(xb)
    rel_x.append((np.abs(xb[0] - d["golden_x"][pos]) / scale).max())
  assert max(rel_x) <= 1e-9, max(rel_x)
  np.testing.assert_allclose(np.asarray(bank.P)[0], d["golden_P"][-1],
                             atol=1e-8)
