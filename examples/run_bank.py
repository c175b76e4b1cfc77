#!/usr/bin/env python3
"""Filter-bank demo: 4096 independent kinematic EKFs as one XLA program,
sharded across every available device."""

import jax
import jax.numpy as jnp
import numpy as np

from rednose_tpu.models.kinematic import KinematicKalman, ObservationKind
from rednose_tpu.parallel import sharding
from rednose_tpu.runtime import bank


def main():
  rng = np.random.default_rng(0)
  spec = KinematicKalman.build_spec()
  T, B = 500, 4096

  state = bank.init_bank(spec, KinematicKalman.initial_x,
                         np.diag(KinematicKalman.initial_P_diag), batch=B)
  dts = jnp.full((T,), 0.01, dtype=jnp.float32)
  zs = jnp.asarray(rng.normal(0, 0.5, (T, B, 1)), dtype=jnp.float32)
  Rs = jnp.broadcast_to(jnp.asarray(0.01, jnp.float32).reshape(1, 1, 1, 1),
                        (T, B, 1, 1))
  Q = jnp.asarray(KinematicKalman.Q, jnp.float32)

  mesh = sharding.make_bank_mesh()
  final, ys = sharding.sharded_run_bank(
      spec, ObservationKind.POSITION, mesh, {}, state, Q, dts, zs, Rs)
  rmse = sharding.sharded_bank_rmse(mesh, final, jnp.zeros(2, jnp.float32))
  print(f"{B} filters x {T} steps on {len(jax.devices())} device(s); "
        f"bank RMSE vs truth: {float(rmse):.4f}")


if __name__ == "__main__":
  main()
