#!/usr/bin/env python3
"""Record golden traces from the reference's OWN compiled C filters.

BASELINE.md names the C-built reference filters (built via test.sh) as the
acceptance oracle; this script produces committed fixtures from those exact
binaries so tests/test_reference_golden.py can assert our engines against
reference-produced artifacts (not an in-repo rederivation).

Build recipe used in this image (scons/cython/eigen-pip are absent; Eigen
headers come from TensorFlow's vendored copy, the codegen is the reference's
own gen_code, and the driver is the reference's own EKF_sym Python engine
over the compiled shared library — the same cffi path the reference tests
use):

    mkdir -p /tmp/refbuild/include /tmp/refbuild/gen
    ln -sfn /opt/venv/lib/python3.12/site-packages/tensorflow/include \
        /tmp/refbuild/include/eigen3
    for gen in kinematic_kf.py test_compare.py live_kf.py; do
      PYTHONPATH=/root/reference python /root/reference/examples/$gen \
          <name> /tmp/refbuild/gen
    done
    for n in kinematic compare live; do
      g++ -std=c++1z -O2 -fPIC -shared -I /tmp/refbuild/include \
          -I /root/reference -o /tmp/refbuild/gen/lib$n.so \
          /tmp/refbuild/gen/$n.cpp
    done
    python tools/record_reference_traces.py /tmp/refbuild/gen tests/fixtures

Traces recorded:
  ref_kinematic_trace.npz — the reference examples/test_compare.py simulation
    (seed 0, dt=0.01, 500 steps, the index-20<->40 out-of-order swap,
    test_compare.py:104-106) through the compiled kinematic filter, golden
    (x, P, t) after every delivery.
  ref_kinematic_smooth.npz — an in-order run plus the reference's OWN
    rts_smooth output (ekf_sym.py:651-690) with the stacked estimate arrays.
  ref_live_trace.npz — a 300-obs randomized all-kind live_kf stream
    (odo/gyro/no-rot/accel/ecef-pos/camera-odo-trans+rot/imu-frame, camera
    kinds with measurement-supplied stds, live_kf.py:318-337) delivered with
    out-of-order swaps inside the rewind window, through the reference
    LiveKalman facade (quaternion renormalization included), golden (x, P)
    after every delivery.
"""

import os
import sys
import types

import numpy as np

REFERENCE = os.environ.get("REDNOSE_REFERENCE", "/root/reference")
sys.path.insert(0, REFERENCE)

from rednose.helpers.ekf_sym import EKF_sym  # noqa: E402

# examples/*.py import the Cython bridge at module level; the Python engine
# has the identical constructor/API surface (test_compare.py drives both),
# so stub the bridge module with it before importing the facades.
_pyx = types.ModuleType("rednose.helpers.ekf_sym_pyx")
_pyx.EKF_sym_pyx = EKF_sym
sys.modules.setdefault("rednose.helpers.ekf_sym_pyx", _pyx)
sys.path.insert(0, os.path.join(REFERENCE, "examples"))

import live_kf  # noqa: E402  (reference examples/live_kf.py)


def record_kinematic(gen_dir, swap=True):
  """The test_compare simulation through the compiled kinematic filter."""
  np.random.seed(0)
  initial_x = np.array([0.5, 0.0])
  initial_P = np.diag([1.0**2, 1.0**2])
  Q = np.diag([0.1**2, 2.0**2])
  kf = EKF_sym(gen_dir, "kinematic", Q, initial_x, initial_P, 2, 2)

  dt = 0.01
  ts = np.arange(0, 5, step=dt)
  xs = np.empty(ts.shape)
  x = 0.0
  for i, v in enumerate(np.sin(ts * 5)):
    xs[i] = x
    x += v * dt
  if swap:  # the reference's late-observation insertion
    a, b = 20, 40
    ts[a], ts[b] = ts[b], ts[a]
    xs[a], xs[b] = xs[b], xs[a]

  meas = np.random.normal(xs, 0.1)
  rec = {"t": ts, "z": meas, "golden_x": [], "golden_P": [], "golden_t": [],
         "estimates": []}
  R = np.array([[[0.1**2]]])
  for t, m in zip(ts, meas):
    est = kf.predict_and_update_batch(t, 1, np.array([[m]]), R)
    assert est is not None
    rec["estimates"].append(est)
    rec["golden_x"].append(kf.state())
    rec["golden_P"].append(kf.covs().copy())
    rec["golden_t"].append(kf.get_filter_time())
  return kf, rec


def save_kinematic(gen_dir, out_dir):
  _, rec = record_kinematic(gen_dir, swap=True)
  np.savez_compressed(
      os.path.join(out_dir, "ref_kinematic_trace.npz"),
      t=rec["t"], z=rec["z"],
      golden_x=np.stack(rec["golden_x"]),
      golden_P=np.stack(rec["golden_P"]),
      golden_t=np.array(rec["golden_t"]))

  kf, rec = record_kinematic(gen_dir, swap=False)
  # snapshot BEFORE smoothing: the reference's rts_smooth aliases the
  # estimate arrays (xk_n = xk_k; xk_n[:d1] = ...) and mutates them in place
  ests = [tuple(np.copy(np.asarray(v)) for v in e[:5])
          for e in rec["estimates"]]
  xs_smooth, Ps_smooth = kf.rts_smooth(rec["estimates"], norm_quats=False)
  np.savez_compressed(
      os.path.join(out_dir, "ref_kinematic_smooth.npz"),
      t=rec["t"], z=rec["z"],
      x_pred=np.stack([np.asarray(e[0]).reshape(-1) for e in ests]),
      x_post=np.stack([np.asarray(e[1]).reshape(-1) for e in ests]),
      P_pred=np.stack([np.asarray(e[2]) for e in ests]),
      P_post=np.stack([np.asarray(e[3]) for e in ests]),
      smooth_x=np.asarray(xs_smooth), smooth_P=np.asarray(Ps_smooth))


K = live_kf.ObservationKind
LIVE_KINDS = (K.ODOMETRIC_SPEED, K.PHONE_GYRO, K.NO_ROT, K.PHONE_ACCEL,
              K.ECEF_POS, K.CAMERA_ODO_TRANSLATION, K.CAMERA_ODO_ROTATION,
              K.IMU_FRAME)
CAMERA_KINDS = (K.CAMERA_ODO_TRANSLATION, K.CAMERA_ODO_ROTATION)
DZ = {K.ODOMETRIC_SPEED: 1}
NOISE = {K.ODOMETRIC_SPEED: 0.1, K.PHONE_GYRO: 0.01, K.NO_ROT: 1e-4,
         K.PHONE_ACCEL: 0.05, K.ECEF_POS: 2.0,
         K.CAMERA_ODO_TRANSLATION: 0.05, K.CAMERA_ODO_ROTATION: 0.02,
         K.IMU_FRAME: 0.005}
STD_RANGE = {K.CAMERA_ODO_TRANSLATION: (0.05, 0.3),
             K.CAMERA_ODO_ROTATION: (0.01, 0.1)}
N_OBS = 300
DT = 0.01
SWAP_REGIONS = ((30, 90), (150, 230))


def _live_x0():
  """Nonzero rates so every kind's Jacobian is smooth (|v| kinks at 0)."""
  x0 = np.array(live_kf.LiveKalman.initial_x, dtype=float)
  x0[7:10] = [5.0, 1.0, 0.5]
  x0[10:13] = [0.02, -0.01, 0.03]
  x0[13:16] = [0.01, -0.02, 0.005]
  x0[17:20] = [0.1, -0.05, 0.2]
  return x0


def record_live(gen_dir, out_dir):
  kf = live_kf.LiveKalman(gen_dir)
  x0 = _live_x0()
  kf.init_state(x0, covs_diag=np.array(live_kf.LiveKalman.initial_P_diag),
                filter_time=0.0)

  rng = np.random.default_rng(2024)
  # synthesize measurements with the COMPILED lib's own h functions
  xcol = x0.reshape(-1, 1)
  dummy = np.zeros(8)

  def h(kind):
    dz = DZ.get(kind, 3)
    out = np.zeros(dz)
    kf.filter.hs[kind](xcol, dummy, out)
    return out

  stream = []
  for i in range(N_OBS):
    kind = (LIVE_KINDS[i] if i < len(LIVE_KINDS)
            else LIVE_KINDS[int(rng.integers(len(LIVE_KINDS)))])
    z = h(kind) + NOISE[kind] * rng.standard_normal(DZ.get(kind, 3))
    stds = (rng.uniform(*STD_RANGE[kind], 3) if kind in CAMERA_KINDS
            else np.full(3, np.nan))
    stream.append((float((i + 1) * DT), int(kind), z, stds))

  # delivery order with OOO swaps inside the 1 s rewind window
  order = list(range(N_OBS))
  for lo, hi in SWAP_REGIONS:
    j = lo
    while j < hi - 15:
      if rng.random() < 0.35:
        k = int(rng.integers(3, 16))
        order[j], order[j + k] = order[j + k], order[j]
        j += k + 1
      else:
        j += 1
  assert order != list(range(N_OBS))

  golden_x, golden_P, golden_t = [], [], []
  for j in order:
    t, kind, z, stds = stream[j]
    if kind in CAMERA_KINDS:
      data = [np.concatenate([z, stds])]
    else:
      data = [z]
    est = kf.predict_and_observe(t, kind, data)
    assert est is not None, (t, kind)
    golden_x.append(kf.x.copy())
    golden_P.append(kf.P.copy())
    golden_t.append(kf.t)

  zpad = np.zeros((N_OBS, 3))
  dz = np.zeros((N_OBS,), dtype=np.int64)
  for i, (_, kind, z, _) in enumerate(stream):
    zpad[i, :z.shape[0]] = z
    dz[i] = z.shape[0]
  np.savez_compressed(
      os.path.join(out_dir, "ref_live_trace.npz"),
      x0=x0, P0_diag=np.array(live_kf.LiveKalman.initial_P_diag),
      t=np.array([s[0] for s in stream]),
      kind=np.array([s[1] for s in stream], dtype=np.int64),
      z=zpad, dz=dz, stds=np.stack([s[3] for s in stream]),
      order=np.array(order, dtype=np.int64),
      golden_x=np.stack(golden_x), golden_P=np.stack(golden_P),
      golden_t=np.array(golden_t))


def main():
  gen_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/refbuild/gen"
  out_dir = sys.argv[2] if len(sys.argv) > 2 else "tests/fixtures"
  os.makedirs(out_dir, exist_ok=True)
  save_kinematic(gen_dir, out_dir)
  record_live(gen_dir, out_dir)
  for f in sorted(os.listdir(out_dir)):
    if f.startswith("ref_"):
      p = os.path.join(out_dir, f)
      print(f"{p}: {os.path.getsize(p) / 1024:.0f} KiB")


if __name__ == "__main__":
  main()
