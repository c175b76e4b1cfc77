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

# The axon sitecustomize prepends its TPU-relay platform regardless of the
# env var; force CPU the supported way (this is a static-analysis tool).
jax.config.update("jax_platforms", "cpu")
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

  # XLA's post-optimization count at B=128 lanes. NOTE: this tool runs on
  # the CPU backend for speed/hermeticity; the TPU pipeline additionally
  # constant-folds the entry body's iota/eq one-hot assembly patterns
  # (TPU post-opt measured ~12.3k for the entry step vs ~57k on CPU —
  # PARITY.md quotes the TPU capture), so treat the CPU post-opt column
  # as an upper bound and the jaxpr walk as the algorithmic count.
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

  # --- VO frame bodies (FLOP per FRAME per lane: block predict +
  # nullspace-projected feature update + window augment) ---
  f_vo, xla_vo = _vo_frame_flops()
  f_eskf, xla_eskf = _vo_eskf_frame_flops()
  f_epoch, xla_epoch, n_slots = _gnss_epoch_flops()
  print()
  print(f"{'frame/epoch bodies':55s} {'jaxpr':>10s} {'XLA':>10s}")
  print(f"{'VO frame (msckf_vo 18-dim, pallas_bank.vo_bank_scan)':55s} "
        f"{f_vo:10,d} {xla_vo:10,.0f}")
  print(f"{'ESKFxMSCKF frame (msckf_eskf 41/36 composition)':55s} "
        f"{f_eskf:10,d} {xla_eskf:10,.0f}")
  print(f"{'GNSS epoch (LocKalman, 1 predict + %d updates)' % n_slots:55s} "
        f"{f_epoch:10,d} {xla_epoch:10,.0f}")

  # implied sustained FLOP/s at the newest driver-captured throughputs
  # (BENCH_r*.json at the repo root; the headline + "extra" sweep entries).
  # Uses the jaxpr algorithmic count. Caveat per body: for the hand
  # kernels it UNDERcounts what the chip executes (TPU post-opt is ~12%
  # higher on the fused live step); for entry-level bodies it OVERcounts
  # (the TPU pipeline folds their iota/eq one-hot assembly arithmetic).
  rates = _bench_rates()
  flops_per_unit = {
      "live_fused": f_hand,
      "generic_entry": f_entry,
      "vo_kernel": f_vo,
      "vo_eskf_kernel": f_eskf,
      "generic_epoch": f_epoch / n_slots,  # value unit is updates/s
  }
  print()
  for name, f in flops_per_unit.items():
    rate = rates.get(name)
    if rate is None:
      continue
    print(f"{name + ' (%.1fM/s captured)' % (rate / 1e6):55s} "
          f"{f * rate / 1e12:6.2f} TFLOP/s sustained (jaxpr count)")


def _vo_frame_flops():
  """FLOP/frame of the entry VO frame body on the additive 18-dim VO spec
  (the flat body vo_bank_scan compiles for BENCH_MODEL=vo
  BENCH_VO_PATH=kernel)."""
  from rednose_tpu.models.msckf_vo import (
      ObservationKind as VK,
      build_msckf_vo_spec,
  )

  spec = build_msckf_vo_spec()
  return _frame_flops(spec, int(VK.MSCKF_TEST), np.zeros(spec.dim_x),
                      np.eye(spec.dim_err) * 1e-6, 0.02**2)


def _vo_eskf_frame_flops():
  """FLOP/frame of the ESKFxMSCKF composition frame body (models/
  msckf_eskf: quaternion error state + clone window; BENCH_MODEL=vo_eskf)."""
  from rednose_tpu.models.msckf_eskf import (
      MSCKFEskf,
      ObservationKind as EK,
  )

  spec = MSCKFEskf.build_spec()
  return _frame_flops(spec, int(EK.MSCKF_FEATURE), MSCKFEskf.initial_x,
                      MSCKFEskf.Q, 0.01**2)


def _frame_flops(spec, kind, x0, Q, r_diag):
  from rednose_tpu.ops import entry_slab, sparsity

  om = spec.obs[kind]
  st = sparsity.structure_for(spec, x0)
  q_diag = tuple(float(v) for v in np.diag(np.asarray(Q)))
  r_mat = tuple(tuple(r_diag if i == j else 0.0 for j in range(om.dz))
                for i in range(om.dz))
  dt = jnp.asarray(0.05, jnp.float32)
  x = jnp.asarray(x0, jnp.float32)[:, None]
  P = jnp.asarray(np.eye(spec.dim_err) * 0.1, jnp.float32)[..., None]
  z = jnp.zeros((om.dz, 1), jnp.float32)
  ea = jnp.asarray([2.0, 1.5, 8.0], jnp.float32)[:, None]

  def frame(x, P, z, ea):
    return entry_slab.entry_vo_frame_slab(spec, kind, {}, x, P, z, ea,
                                          q_diag, r_mat, dt, st, gate=True)

  f = jaxpr_flops(frame, x, P, z, ea)
  B = 128
  xla = cost_report(frame, jnp.tile(x, (1, B)), jnp.tile(P, (1, 1, B)),
                    jnp.tile(z, (1, B)),
                    jnp.tile(ea, (1, B))).get("flops", 0) / B
  return f, xla


def _gnss_epoch_flops():
  """FLOP/epoch of the flat GNSS epoch body (LocKalman receiver: one
  predict + 4 pseudoranges + 4 rates, BENCH_GENERIC_PATH=epoch)."""
  from rednose_tpu.models.loc import LocKalman, ObservationKind as LK
  from rednose_tpu.ops import pallas_bank, sparsity

  spec = LocKalman.build_spec()
  slot_kinds = ([int(LK.PSEUDORANGE_GPS)] * 4
                + [int(LK.PSEUDORANGE_RATE_GPS)] * 4)
  st = sparsity.structure_for(spec, LocKalman.initial_x)
  q_diag = tuple(float(v) for v in np.diag(LocKalman.Q))
  r_mats = tuple(
      tuple(tuple(float(v) for v in row)
            for row in np.atleast_2d(LocKalman.obs_noise[k]))
      for k in slot_kinds)
  max_dz = max(spec.obs[k].dz for k in slot_kinds)
  max_ea = max(spec.obs[k].ea_len for k in slot_kinds)
  K = len(slot_kinds)
  dt = jnp.asarray(0.1, jnp.float32)
  x = jnp.asarray(LocKalman.initial_x, jnp.float32)[:, None]
  P = jnp.asarray(np.diag(LocKalman.initial_P_diag),
                  jnp.float32)[..., None]
  z_t = jnp.zeros((K, max_dz, 1), jnp.float32)
  ea_t = jnp.ones((K, max_ea, 1), jnp.float32) * 1e7

  def epoch(x, P, z_t, ea_t):
    return pallas_bank._epoch_step_flat(
        spec, slot_kinds, q_diag, r_mats, True, st, True, x, P, z_t, ea_t,
        dt)

  f = jaxpr_flops(epoch, x, P, z_t, ea_t)
  B = 128
  xla = cost_report(epoch, jnp.tile(x, (1, B)), jnp.tile(P, (1, 1, B)),
                    jnp.tile(z_t, (1, 1, B)),
                    jnp.tile(ea_t, (1, 1, B))).get("flops", 0) / B
  return f, xla, K


def _bench_rates():
  """Headline + extra throughputs from the newest BENCH_r*.json."""
  import glob
  import json

  root = os.path.join(os.path.dirname(__file__), "..")
  paths = sorted(glob.glob(os.path.join(root, "BENCH_r*.json")))
  if not paths:
    return {}
  with open(paths[-1]) as f:
    data = json.load(f)
  # the round driver wraps the bench JSON line under "parsed"
  if isinstance(data.get("parsed"), dict):
    data = data["parsed"]
  rates = {}
  for name, entry in data.get("extra", {}).items():
    if isinstance(entry, dict) and isinstance(entry.get("value"), (int,
                                                                   float)):
      rates[name] = float(entry["value"])
  return rates


if __name__ == "__main__":
  main()
