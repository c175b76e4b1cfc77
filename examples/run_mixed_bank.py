#!/usr/bin/env python3
"""Heterogeneous sensor-fusion bank demo: thousands of independent live_kf
ESKFs stepping through a mixed gyro/accel/cam-rotation/position schedule —
one fused lane-major scan dispatching closed-form per-kind updates (the
Pallas kernel ops/pallas_live.live_bank_scan_mixed is the VMEM-resident
version of the same loop for TPU production)."""

import jax
import jax.numpy as jnp
import numpy as np

from rednose_tpu.models.live import LiveKalman, ObservationKind as K
from rednose_tpu.ops import live_lane


def main():
  B, T = 512, 256
  dtype = jnp.float32
  kinds = (K.PHONE_GYRO, K.PHONE_ACCEL, K.CAMERA_ODO_ROTATION, K.ECEF_POS)

  x = jnp.tile(jnp.asarray(LiveKalman.initial_x, dtype), (B, 1))
  P = jnp.tile(jnp.asarray(np.diag(LiveKalman.initial_P_diag),
                           dtype)[:, :, None], (1, 1, B))
  dts = jnp.full((T,), 0.01, dtype)
  kind_idx = jnp.asarray(np.arange(T) % len(kinds), jnp.int32)
  pos_rows = jnp.asarray((np.arange(T) % len(kinds)) == 3)
  noise = jax.random.normal(jax.random.key(0), (T, B, 3), dtype)
  zs = jnp.where(pos_rows[:, None, None],
                 jnp.asarray(LiveKalman.initial_x[0:3], dtype) + 5.0 * noise,
                 0.05 * noise)
  R_list = tuple(jnp.asarray(LiveKalman.obs_noise[k], dtype) for k in kinds)

  x_f, P_f = live_lane.jit_live_mixed_scan(kinds)(
      x, P, jnp.asarray(LiveKalman.Q, dtype), dts, kind_idx, zs, R_list)
  jax.block_until_ready(x_f)

  pos_var = jnp.mean(P_f[0, 0] + P_f[1, 1] + P_f[2, 2]) / 3.0
  print(f"{B} filters x {T} mixed-kind steps: mean position variance "
        f"{float(pos_var):.3f} (prior 1e8), quat norms all "
        f"{float(jnp.abs(jnp.linalg.norm(x_f[:, 3:7], axis=1) - 1).max()):.1e}"
        f" from unit")
  assert bool(jnp.all(jnp.isfinite(x_f)))


if __name__ == "__main__":
  main()
