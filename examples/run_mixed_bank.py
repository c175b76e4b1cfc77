#!/usr/bin/env python3
"""Heterogeneous sensor-fusion bank demo: thousands of independent live_kf
ESKFs stepping through a mixed gyro/accel/cam-rotation/position schedule via
the LiveKalmanBank facade — on TPU it runs the VMEM-resident fused Pallas
kernel (ops/pallas_live.live_bank_scan_mixed), elsewhere the lane-major jnp
scan, with identical results."""

import jax
import jax.numpy as jnp
import numpy as np

from rednose_tpu.models.live import LiveKalman, ObservationKind as K
from rednose_tpu.runtime.live_bank import LiveKalmanBank


def main():
  B, T = 512, 256
  kinds = (K.PHONE_GYRO, K.PHONE_ACCEL, K.CAMERA_ODO_ROTATION, K.ECEF_POS)

  bank = LiveKalmanBank(batch=B)
  kind_idx = np.arange(T) % len(kinds)
  rng = np.random.default_rng(0)
  noise = rng.normal(size=(T, B, 3))
  zs = np.where((kind_idx == 3)[:, None, None],
                LiveKalman.initial_x[0:3] + 5.0 * noise, 0.05 * noise)
  bank.run_mixed(np.full((T,), 0.01), kind_idx, zs, kinds)

  P_f = bank.P
  pos_var = float(jnp.mean(P_f[:, 0, 0] + P_f[:, 1, 1] + P_f[:, 2, 2]) / 3.0)
  quat_err = float(jnp.abs(
      jnp.linalg.norm(bank.x[:, 3:7], axis=1) - 1).max())
  print(f"{B} filters x {T} mixed-kind steps (pallas={bank.use_pallas}): "
        f"mean position variance {pos_var:.3f} (prior 1e8), quat norms all "
        f"{quat_err:.1e} from unit, t={bank.t:.2f}s")
  assert bool(jnp.all(jnp.isfinite(bank.x)))


if __name__ == "__main__":
  main()
