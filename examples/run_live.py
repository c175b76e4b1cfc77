#!/usr/bin/env python3
"""live_kf demo: static device with GNSS fixes and IMU, then offline RTS
smoothing (sequential and parallel-in-time)."""

import numpy as np

from rednose_tpu.models.live import LiveKalman, ObservationKind as K


def main():
  rng = np.random.default_rng(0)
  kf = LiveKalman()
  pos0 = LiveKalman.initial_x[0:3]

  estimates = []
  t = 0.0
  for _ in range(100):
    t += 0.1
    estimates.append(kf.predict_and_observe(
        t, K.ECEF_POS, [pos0 + rng.normal(0, 1.0, 3)]))
    estimates.append(kf.predict_and_observe(t, K.NO_ROT, [np.zeros(3)]))

  print(f"position error after 10 s: "
        f"{np.linalg.norm(kf.x[0:3] - pos0):.3f} m, "
        f"quat norm {np.linalg.norm(kf.x[3:7]):.6f}")

  smoothed = kf.rts_smooth(estimates, parallel=True)
  x0_smoothed = smoothed[0][0]
  print(f"smoothed initial position error: "
        f"{np.linalg.norm(x0_smoothed[0:3] - pos0):.3f} m")


if __name__ == "__main__":
  main()
