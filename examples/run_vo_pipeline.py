#!/usr/bin/env python3
"""Full visual-odometry pipeline demo: a simulated feature tracker feeds
camera frames through the fixed-capacity track store into the MSCKF x ESKF
filter — detections in, pose estimates out."""

import numpy as np

from rednose_tpu.models.msckf_eskf import MSCKFEskf, N_AUGMENT
from rednose_tpu.msckf.pipeline import VisualOdometryPipeline


def main():
  rng = np.random.default_rng(0)
  v0 = np.array([4.0, 0.5, 0.0])
  x0 = MSCKFEskf.initial_x.copy()
  x0[7:10] = v0

  kf = MSCKFEskf()
  kf.init_state(x0, covs_diag=MSCKFEskf.initial_P_diag, filter_time=0.0)
  pipe = VisualOdometryPipeline(kf, n_tracks=128, max_features=32)

  landmarks = np.column_stack([
      rng.uniform(-4, 40, 20), rng.uniform(-6, 6, 20),
      rng.uniform(10, 20, 20)])
  ids = np.full(len(landmarks), -1, dtype=np.int64)

  t, updates = 0.0, 0
  for frame in range(4 * N_AUGMENT):
    t += 0.1
    true_pos = v0 * t
    uvs = np.stack([(lm - true_pos)[:2] / (lm - true_pos)[2]
                    + rng.normal(0, 0.002, 2) for lm in landmarks])
    est, ids = pipe.process_frame(t, ids, uvs)
    if est is not None and len(est[7]):
      updates += 1

  err = np.linalg.norm(kf.x[0:3] - v0 * t)
  print(f"{frame + 1} frames, {updates} feature updates, "
        f"{pipe.live_track_count} live tracks, dropped "
        f"{pipe.dropped_total}; position error vs truth {err:.3f} m "
        f"(sigma {np.sqrt(np.diag(kf.P)[0:3]).max():.3f})")
  assert err < 0.3


if __name__ == "__main__":
  main()
