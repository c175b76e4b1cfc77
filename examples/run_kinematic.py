#!/usr/bin/env python3
"""Kinematic filter demo: the reference's example scenario
(examples/test_kinematic_kf.py) — 5 s of sinusoidal motion, noisy position
measurements. Set PLOT=1 to plot (mirrors the reference's PLOT env switch).

No codegen step: compare with the reference's two-stage
`generate_code` + SCons build (examples/kinematic_kf.py:79-81).
"""

import os

import numpy as np

from rednose_tpu.models.kinematic import KinematicKalman, ObservationKind, States


def main():
  np.random.seed(0)
  kf = KinematicKalman()

  dt = 0.01
  ts = np.arange(0, 5, step=dt)
  vs = np.sin(ts * 5)

  x = 0.0
  xs, xs_kf, xs_std = [], [], []
  for t, v in zip(ts, vs):
    kf.predict_and_observe(t, ObservationKind.POSITION,
                           [np.random.normal(x, 0.1)])
    xs.append(x)
    xs_kf.append(float(kf.x[States.POSITION].item()))
    xs_std.append(float(np.sqrt(kf.P[0, 0])))
    x += v * dt

  print(f"final position: {xs_kf[-1]:+.6f} (truth {xs[-1]:+.6f}), "
        f"std {xs_std[-1]:.4f}")

  if os.environ.get("PLOT"):
    import matplotlib.pyplot as plt

    xs, xs_kf, xs_std = map(np.array, (xs, xs_kf, xs_std))
    plt.plot(ts, xs, label="truth")
    plt.plot(ts, xs_kf, label="filtered")
    plt.fill_between(ts, xs_kf - xs_std, xs_kf + xs_std, alpha=0.2)
    plt.legend()
    plt.savefig("kinematic_kf.png")
    print("wrote kinematic_kf.png")


if __name__ == "__main__":
  main()
