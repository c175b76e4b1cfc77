#!/usr/bin/env python3
"""Per-kernel FLOP/step audit via the jaxpr FLOP counter.

Prints, for each flagship kernel body, the FLOPs of ONE predict+update step
per lane (utils/profiling.jaxpr_flops — arithmetic eqn output sizes, 2*out*K
for dot_general) plus the implied sustained FLOP/s at the driver-captured
throughput from BENCH_r*.json. These are the auditable numbers behind the
roofline lines in PARITY.md — rerun `python tools/flops_report.py` after any
kernel change and reconcile the table.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from rednose_tpu.utils.profiling import cost_report, jaxpr_flops  # noqa: E402


def main():
  from rednose_tpu.core import step as core_step
  from rednose_tpu.models.live import LiveKalman, ObservationKind as K
  from rednose_tpu.ops import entry_slab, live_lane, sparsity

  spec = LiveKalman.build_spec()
  dtype = jnp.float32
  x = jnp.asarray(LiveKalman.initial_x, dtype)[:, None]      # (23, 1)
  P = jnp.asarray(np.diag(LiveKalman.initial_P_diag), dtype)[..., None]
  Q = jnp.asarray(LiveKalman.Q, dtype)
  q_diag = tuple(float(v) for v in np.diag(LiveKalman.Q))
  z = jnp.asarray(LiveKalman.initial_x[:3], dtype)[:, None]  # (3, 1)
  R = jnp.asarray(np.diag([25.0] * 3), dtype)
  r_mat = tuple(tuple(float(v) for v in row) for row in np.asarray(R))
  dt = jnp.asarray(0.01, dtype)
  structure = sparsity.structure_for(spec, LiveKalman.initial_x)

  rows = []

  # hand-derived fused live step (ops/live_lane.py = the pallas_live body)
  f_hand = jaxpr_flops(
      lambda x, P, z: live_lane.live_step_slab(x, P, Q, dt, z, R), x, P, z)
  rows.append(("live fused step (hand, live_lane/pallas_live)", f_hand))

  # entry-level automatic step (ops/entry_slab.py = the pallas_bank body)
  f_entry = jaxpr_flops(
      lambda x, P, z: entry_slab.entry_step_slab(
          spec, int(K.ECEF_POS), {}, x, P, z, q_diag, r_mat, dt, structure),
      x, P, z)
  rows.append(("live generic step (entry_slab/pallas_bank)", f_entry))

  # dense oracle step (core/step.py semantics, what the generic lane bank
  # pays without structure exploitation)
  xs = jnp.asarray(LiveKalman.initial_x, dtype)
  Ps = jnp.asarray(np.diag(LiveKalman.initial_P_diag), dtype)
  ea = jnp.zeros((1,), dtype)

  def dense_step(xs, Ps, zc):
    xp, Pp = core_step.predict(spec, {}, xs, Ps, Q, dt)
    return core_step.update(spec, int(K.ECEF_POS), {}, xp, Pp, zc, R, ea)

  f_dense = jaxpr_flops(dense_step, xs, Ps, z[:, 0])
  rows.append(("live dense oracle step (core/step)", f_dense))

  print(f"{'kernel body (jaxpr walk, pre-XLA)':55s} {'FLOP/step/lane':>14s}")
  for name, f in rows:
    print(f"{name:55s} {f:14,d}")

  # XLA's post-optimization count at B=128 lanes (iota/eq one-hot patterns
  # in the entry body constant-fold away here; the jaxpr walk sees them)
  B = 128
  xb, Pb, zb = (jnp.tile(x, (1, B)), jnp.tile(P, (1, 1, B)),
                jnp.tile(z, (1, B)))
  xla_hand = cost_report(
      lambda x, P, z: live_lane.live_step_slab(x, P, Q, dt, z, R),
      xb, Pb, zb).get("flops", 0) / B
  xla_entry = cost_report(
      lambda x, P, z: entry_slab.entry_step_slab(
          spec, int(K.ECEF_POS), {}, x, P, z, q_diag, r_mat, dt, structure),
      xb, Pb, zb).get("flops", 0) / B
  print()
  print(f"{'XLA post-opt (cost_analysis, B=128) hand':55s} {xla_hand:14,.0f}")
  print(f"{'XLA post-opt (cost_analysis, B=128) entry':55s} {xla_entry:14,.0f}")

  # implied sustained FLOP/s at the BENCH_r03 driver-captured throughputs
  bench = {
      "live fused (240.0M steps/s)": (xla_hand, 240.0e6),
      "generic entry (179.2M steps/s)": (xla_entry, 179.2e6),
  }
  print()
  for name, (f, rate) in bench.items():
    print(f"{name:55s} {f * rate / 1e12:6.2f} TFLOP/s sustained")


if __name__ == "__main__":
  main()
