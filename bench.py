#!/usr/bin/env python3
"""Driver-captured benchmarks, printed as ONE json line.

Default (`python bench.py`): runs the FULL flagship sweep — the kinematic
north-star bank (headline metric, BASELINE.json "north_star" 10M
steps/sec/chip), the fused live ESKF kernel, the heterogeneous mixed-kind
schedule, the entry-level generic kernel on the unmodified live spec, and
the parallel-in-time smoother — and folds the secondary configs into an
"extra" dict inside the single JSON line. A config that fails records its
error string instead of aborting the sweep.

`BENCH_MODEL=live|generic|rts python bench.py` runs just that config and
prints it as the headline (the round-2 interface, kept for the verify
drives); BENCH_LIVE_PATH / BENCH_GENERIC_PATH select sub-paths as before.

All timings use the scalar-sync method (CLAUDE.md): the jitted program
returns a scalar that is float()ed, because block_until_ready is
unreliable through the axon relay; k applications are chained inside one
jit to amortize the ~28 ms relay round trip.
"""

import json
import os
import sys
import time
import traceback

import numpy as np

BASELINE_STEPS_PER_SEC = 10e6

REPS = int(os.environ.get("BENCH_REPS", 3))


def log(*a):
  print(*a, file=sys.stderr, flush=True)


def _time_chain(chain, args, reps=None):
  """Compile + warm up, then best-of-reps wall time of one chained call."""
  val = float(chain(*args))
  assert np.isfinite(val), "non-finite filter state"
  times = []
  for _ in range(reps or REPS):
    t0 = time.perf_counter()
    float(chain(*args))
    times.append(time.perf_counter() - t0)
  return min(times)


def bench_live_bank(path=None):
  """Live 23/22 ESKF bank, fused Pallas kernel (ops/pallas_live.py): the
  bank state stays VMEM-resident across the whole scan while measurements
  stream from HBM. path='lane' benchmarks the generic pure-jnp lane-major
  path (ops/lane_bank.py) instead; 'mixed' the heterogeneous 4-kind
  schedule."""
  import jax
  import jax.numpy as jnp

  from rednose_tpu.models.live import LiveKalman, ObservationKind
  from rednose_tpu.ops import lane_bank, pallas_live
  from rednose_tpu.runtime import bank as bank_ops

  if path is None:
    path = os.environ.get("BENCH_LIVE_PATH", "pallas")  # |mixed|lane|lane_sparse
  fused = path in ("pallas", "mixed")
  B = int(os.environ.get("BENCH_BANK", 8192 if fused else 1024))
  T = int(os.environ.get("BENCH_STEPS", 1024 if fused else 256))
  spec = LiveKalman.build_spec()
  dtype = jnp.float32
  state = bank_ops.init_bank(
      spec, LiveKalman.initial_x, np.diag(LiveKalman.initial_P_diag),
      batch=B, dtype=dtype)
  Q = jnp.asarray(LiveKalman.Q, dtype=dtype)
  dts = jnp.full((T,), 0.01, dtype=dtype)
  zs = jnp.asarray(LiveKalman.initial_x[0:3], dtype=dtype) + \
      5.0 * jax.random.normal(jax.random.key(0), (T, B, 3), dtype=dtype)
  R = jnp.asarray(np.diag([25.0] * 3), dtype=dtype)
  P0 = lane_bank.to_lane(state.P)
  chain_n = int(os.environ.get("BENCH_CHAIN", 8))

  if path in ("pallas", "mixed"):
    tile_b = int(os.environ.get("BENCH_TILE_B", 1024))
    t_chunk = int(os.environ.get("BENCH_T_CHUNK", 128))
    q_diag = tuple(float(v) for v in np.diag(LiveKalman.Q))
    xp, Pp = pallas_live.pack_live_state(state.x, P0)

    if path == "mixed":
      # realistic heterogeneous sensor schedule: gyro/accel/cam-rot/pos
      # cycling at sensor rate, one fused kernel dispatching per-kind
      # closed-form updates via lax.switch
      K = ObservationKind
      kinds = (K.PHONE_GYRO, K.PHONE_ACCEL, K.CAMERA_ODO_ROTATION,
               K.ECEF_POS)
      r_mats = tuple(
          tuple(tuple(float(v) for v in row)
                for row in LiveKalman.obs_noise[k]) for k in kinds)
      kind_idx = jnp.asarray(np.arange(T) % len(kinds), jnp.int32)
      pos_rows = jnp.asarray((np.arange(T) % len(kinds)) == 3)
      zs = jnp.where(pos_rows[:, None, None], zs,
                     0.05 * jax.random.normal(jax.random.key(1), (T, B, 3),
                                              dtype=dtype))
      zsp = pallas_live.pack_measurements(zs)

      @jax.jit
      def chain(xp, Pp, zsp):
        for _ in range(chain_n):
          xp, Pp = pallas_live.live_bank_scan_mixed(
              xp, Pp, zsp, dts, kind_idx, q_diag=q_diag, kinds=kinds,
              r_mats=r_mats, t_chunk=t_chunk, tile_b=tile_b)
        return jnp.sum(xp) + jnp.sum(Pp)
    else:
      r_mat = tuple(tuple(float(v) for v in row) for row in np.asarray(R))
      zsp = pallas_live.pack_measurements(zs)

      @jax.jit
      def chain(xp, Pp, zsp):
        for _ in range(chain_n):
          xp, Pp = pallas_live.live_bank_scan(
              xp, Pp, zsp, dts, q_diag=q_diag, r_mat=r_mat,
              t_chunk=t_chunk, tile_b=tile_b)
        return jnp.sum(xp) + jnp.sum(Pp)

    args = (xp, Pp, zsp)
  else:
    structure = None
    if path == "lane_sparse":
      from rednose_tpu.ops import sparsity
      structure = sparsity.structure_for(spec, LiveKalman.initial_x)
      log(f"lane structure: F nnz {structure.f_nnz}/{spec.dim_err**2}")

    @jax.jit
    def chain(x, P, zs):
      for _ in range(chain_n):
        x, P = lane_bank.lane_bank_scan(
            spec, ObservationKind.ECEF_POS, {}, x, P, Q, dts, zs, R,
            structure=structure)
      return jnp.sum(x) + jnp.sum(P)

    args = (state.x, P0, zs)

  best = _time_chain(chain, args)
  steps_per_sec = (B * T * chain_n) / best
  log(f"live {path} bank B={B}: best {best*1e3:.2f} ms for {chain_n} chained "
      f"scans -> {steps_per_sec/1e6:.2f}M steps/s")
  return {
      "metric": f"live_eskf_bank_predict_update_throughput_{path}",
      "value": round(steps_per_sec, 1),
      "unit": "steps/sec/chip",
      "vs_baseline": round(steps_per_sec / BASELINE_STEPS_PER_SEC, 3),
  }


def bench_generic_epoch_gnss(B, T, tile_b, chain_n):
  """GNSS epoch kernel: LocKalman (11-dim receiver), 4 pseudoranges + 4
  pseudorange rates per step through generic_bank_scan_epoch's entry
  body. One F P F^T per epoch; per-slot maha gates. Value: updates/s."""
  import jax
  import jax.numpy as jnp

  from rednose_tpu.models.live import ObservationKind as OK
  from rednose_tpu.models.loc import LocKalman
  from rednose_tpu.ops import pallas_bank, sparsity

  dtype = jnp.float32
  slot_kinds = (int(OK.PSEUDORANGE_GPS),) * 4 \
      + (int(OK.PSEUDORANGE_RATE_GPS),) * 4
  Ksl = len(slot_kinds)
  spec = LocKalman.build_spec()
  structure = sparsity.structure_for(spec, jnp.asarray(LocKalman.initial_x))
  q_diag = tuple(float(v) for v in np.diag(LocKalman.Q))
  r_mats = tuple(
      tuple(tuple(float(v) for v in row)
            for row in np.atleast_2d(LocKalman.obs_noise[k]))
      for k in slot_kinds)
  x0 = np.tile(LocKalman.initial_x, (B, 1))
  P0 = np.tile(np.diag(LocKalman.initial_P_diag), (B, 1, 1))
  xp, Pp = pallas_bank.pack_bank(
      jnp.asarray(x0, dtype), jnp.asarray(P0.transpose(1, 2, 0), dtype))
  key = jax.random.key(0)
  # per-lane satellite states: pos ~2e7 m shells, vel ~3 km/s
  sat_pos = LocKalman.initial_x[:3] + \
      2.0e7 * jax.random.normal(key, (T, Ksl, B, 3), dtype=dtype)
  sat_vel = 3e3 * jax.random.normal(jax.random.key(1), (T, Ksl, B, 3),
                                    dtype=dtype)
  eas = jnp.concatenate([sat_pos, sat_vel], axis=-1)
  rng_shell = jnp.linalg.norm(sat_pos - LocKalman.initial_x[:3], axis=-1)
  is_rho = (jnp.arange(Ksl) < 4)[None, :, None]
  zs = jnp.where(is_rho, rng_shell, 0.0)[..., None].astype(dtype)
  dts = jnp.full((T,), 0.1, dtype=dtype)
  zsp = pallas_bank.pack_bank_epochs(zs)
  easp = pallas_bank.pack_bank_epochs(eas)

  @jax.jit
  def chain(xp, Pp, zsp, easp):
    for _ in range(chain_n):
      xp, Pp = pallas_bank.generic_bank_scan_epoch(
          xp, Pp, zsp, dts, easp, spec=spec, slot_kinds=slot_kinds,
          q_diag=q_diag, r_mats=r_mats, t_chunk=32, tile_b=tile_b,
          structure=structure)
    return jnp.sum(xp) + jnp.sum(Pp)

  log(f"compiling GNSS epoch kernel (1 predict + {Ksl} updates/step)...")
  best = _time_chain(chain, (xp, Pp, zsp, easp))
  upd_per_sec = (B * T * Ksl * chain_n) / best
  log(f"GNSS epoch bank B={B}: best {best*1e3:.2f} ms for {chain_n} "
      f"chained scans -> {upd_per_sec/1e6:.2f}M updates/s "
      f"({upd_per_sec/Ksl/1e6:.2f}M epochs/s)")
  return {
      "metric": "gnss_epoch_kernel_update_throughput",
      "value": round(upd_per_sec, 1),
      "unit": "updates/sec/chip",
      "vs_baseline": round(upd_per_sec / BASELINE_STEPS_PER_SEC, 3),
  }


def bench_generic(path=None):
  """Entry-level generic VMEM-resident kernel (ops/pallas_bank.py +
  ops/entry_slab.py) on the UNMODIFIED live spec — no hand-derivation:
  the round-2 'automatic minimal kernels for any model' gap, closed.
  BENCH_GENERIC_PATH=dense runs the dense jacfwd body instead (small
  specs only); default 'sparse' uses the detected structure with the
  entry-level body; 'mixed' runs the heterogeneous 4-kind sensor
  schedule (gyro/accel/cam-rot/pos) through generic_bank_scan_mixed —
  the hand live mixed kernel's workload with zero model-specific code;
  'epoch' runs the canonical GNSS receiver epoch (LocKalman: one predict
  + 4 pseudoranges + 4 rates per tick, the reference's
  predict_and_update_batch shape, ekf_sym.py:484-531) through
  generic_bank_scan_epoch; value is measurement updates/s."""
  import jax
  import jax.numpy as jnp

  from rednose_tpu.models.live import LiveKalman, ObservationKind as K
  from rednose_tpu.ops import pallas_bank, sparsity

  if path is None:
    path = os.environ.get("BENCH_GENERIC_PATH", "sparse")
  B = int(os.environ.get("BENCH_BANK", 8192))
  T = int(os.environ.get("BENCH_STEPS", 512))
  tile_b = int(os.environ.get("BENCH_TILE_B", 1024))
  t_chunk = int(os.environ.get("BENCH_T_CHUNK", 128))
  chain_n = int(os.environ.get("BENCH_CHAIN", 4))

  if path == "epoch":
    # the canonical GNSS receiver epoch: ONE predict + 8 statically-
    # unrolled measurement updates per tick (4 pseudoranges + 4 rates,
    # per-lane satellite states streamed from HBM) — the reference's
    # predict_and_update_batch shape (ekf_sym.py:484-531) at kernel
    # speed. The flat body (2477 ops) fits the Mosaic budget and stays
    # fully unrolled (slot_mode='auto'). Hoisted above the live-bank
    # data construction below, none of which this config uses.
    return bench_generic_epoch_gnss(B, T, tile_b, chain_n)

  spec = LiveKalman.build_spec()
  structure = (sparsity.detect_structure(spec, LiveKalman.initial_x)
               if path in ("sparse", "mixed") else None)
  if structure is not None:
    log(f"detected structure: F nnz {structure.f_nnz}/{spec.dim_err**2}, "
        f"pos-H cols {structure.cols_for(K.ECEF_POS)}")

  dtype = jnp.float32
  x0 = np.tile(LiveKalman.initial_x, (B, 1))
  P0 = np.tile(np.diag(LiveKalman.initial_P_diag), (B, 1, 1))
  zs = jnp.asarray(LiveKalman.initial_x[0:3], dtype) + \
      5.0 * jax.random.normal(jax.random.key(0), (T, B, 3), dtype=dtype)
  dts = jnp.full((T,), 0.01, dtype=dtype)
  q_diag = tuple(float(v) for v in np.diag(LiveKalman.Q))
  r_mat = tuple(tuple(float(v) for v in row) for row in np.diag([25.0] * 3))
  xp, Pp = pallas_bank.pack_bank(
      jnp.asarray(x0, dtype), jnp.asarray(P0.transpose(1, 2, 0), dtype))

  if path == "epoch_live":
    # the live ALL-SENSORS tick: one predict + gyro+accel+cam-rot+pos
    # per step. The round-5 scalar-entry update rewrite cut the flat
    # body 3847 -> 3235 ops, under the point where Mosaic can compile
    # it — slot_mode='auto' now keeps the zero-dispatch FLAT unroll:
    # 306.1M upd/s vs 220.8M for the 2-region split and 130.8M for the
    # r4 per-slot switch (the config that was documented as
    # kernel-impossible before the dispatch modes existed).
    kinds = (int(K.PHONE_GYRO), int(K.PHONE_ACCEL),
             int(K.CAMERA_ODO_ROTATION), int(K.ECEF_POS))
    Ksl = len(kinds)
    r_mats = tuple(tuple(tuple(float(v) for v in row)
                         for row in LiveKalman.obs_noise[k]) for k in kinds)
    small = 0.05 * jax.random.normal(jax.random.key(1), (T, Ksl, B, 3),
                                     dtype=dtype)
    zs_e = small.at[:, 3].set(zs)          # slot 3: ECEF positions
    zsp = pallas_bank.pack_bank_epochs(zs_e)
    st = sparsity.detect_structure(spec, LiveKalman.initial_x)
    dts_e = jnp.full((T,), 0.01, dtype=dtype)

    @jax.jit
    def chain(xp, Pp, zsp):
      for _ in range(chain_n):
        xp, Pp = pallas_bank.generic_bank_scan_epoch(
            xp, Pp, zsp, dts_e, spec=spec, slot_kinds=kinds,
            q_diag=q_diag, r_mats=r_mats, t_chunk=32, tile_b=tile_b,
            structure=st)
      return jnp.sum(xp) + jnp.sum(Pp)

    log(f"compiling live all-sensors epoch kernel (switch dispatch, "
        f"{Ksl} slots/step)...")
    best = _time_chain(chain, (xp, Pp, zsp))
    upd_per_sec = (B * T * Ksl * chain_n) / best
    log(f"live epoch bank B={B}: best {best*1e3:.2f} ms for {chain_n} "
        f"chained scans -> {upd_per_sec/1e6:.2f}M updates/s "
        f"({upd_per_sec/Ksl/1e6:.2f}M full ticks/s)")
    return {
        "metric": "live_epoch_kernel_update_throughput",
        "value": round(upd_per_sec, 1),
        "unit": "updates/sec/chip",
        "vs_baseline": round(upd_per_sec / BASELINE_STEPS_PER_SEC, 3),
    }

  if path == "mixed":
    # the hand mixed kernel's schedule (bench_live_bank path='mixed'),
    # through the automatic entry-level mixed kernel
    kinds = (int(K.PHONE_GYRO), int(K.PHONE_ACCEL),
             int(K.CAMERA_ODO_ROTATION), int(K.ECEF_POS))
    r_mats = tuple(tuple(tuple(float(v) for v in row)
                         for row in LiveKalman.obs_noise[k]) for k in kinds)
    kind_idx = jnp.asarray(np.arange(T) % len(kinds), jnp.int32)
    pos_rows = jnp.asarray((np.arange(T) % len(kinds)) == 3)
    zs = jnp.where(pos_rows[:, None, None], zs,
                   0.05 * jax.random.normal(jax.random.key(1), (T, B, 3),
                                            dtype=dtype))
    zsp = pallas_bank.pack_bank_measurements(zs)

    @jax.jit
    def chain(xp, Pp, zsp):
      for _ in range(chain_n):
        xp, Pp = pallas_bank.generic_bank_scan_mixed(
            xp, Pp, zsp, dts, kind_idx, spec=spec, kinds=kinds,
            q_diag=q_diag, r_mats=r_mats, t_chunk=t_chunk, tile_b=tile_b,
            structure=structure)
      return jnp.sum(xp) + jnp.sum(Pp)
  else:
    zsp = pallas_bank.pack_bank_measurements(zs)

    @jax.jit
    def chain(xp, Pp, zsp):
      for _ in range(chain_n):
        xp, Pp = pallas_bank.generic_bank_scan(
            xp, Pp, zsp, dts, spec=spec, kind=K.ECEF_POS, q_diag=q_diag,
            r_mat=r_mat, gate=True, t_chunk=t_chunk, tile_b=tile_b,
            structure=structure)
      return jnp.sum(xp) + jnp.sum(Pp)

  log(f"compiling generic {path} kernel (entry-level body of the "
      f"{spec.dim_err}-dim live spec: first compile is minutes-scale)...")
  best = _time_chain(chain, (xp, Pp, zsp))
  steps_per_sec = (B * T * chain_n) / best
  log(f"generic {path} live bank B={B}: best {best*1e3:.2f} ms for "
      f"{chain_n} chained scans -> {steps_per_sec/1e6:.2f}M steps/s")
  return {
      "metric": f"live_generic_kernel_throughput_{path}",
      "value": round(steps_per_sec, 1),
      "unit": "steps/sec/chip",
      "vs_baseline": round(steps_per_sec / BASELINE_STEPS_PER_SEC, 3),
  }


def bench_rts():
  """Offline RTS smoothing of a live_kf log — sequential lax.scan backward
  pass vs the O(log T) parallel-in-time associative scan, both fully on
  device (f32 production path: refine defaults 0, see smoothing/rts.py)."""
  import jax
  import jax.numpy as jnp

  from rednose_tpu.models.live import LiveKalman, ObservationKind as K
  from rednose_tpu.runtime.scan import build_scan_stream
  from rednose_tpu.smoothing import rts

  T = int(os.environ.get("BENCH_STEPS", 8192))
  spec = LiveKalman.build_spec()
  dtype = jnp.float32

  # generate a T-step live_kf log fully on device via the stream scan
  kinds = (K.ECEF_POS, K.NO_ROT)
  scan_fn, _ = build_scan_stream(spec, kinds)
  pos0 = jnp.asarray(LiveKalman.initial_x[0:3], dtype)
  ts = (1 + jnp.arange(T, dtype=dtype)) * 0.01
  dts = jnp.full((T,), 0.01, dtype=dtype)
  ki = (jnp.arange(T) % 2).astype(jnp.int32)
  key = jax.random.key(0)
  zs = jnp.where(ki[:, None] == 0,
                 pos0 + jax.random.normal(key, (T, 3), dtype) * 1.0,
                 jnp.zeros((T, 3), dtype))
  R_pos = jnp.asarray(np.diag([25.0] * 3), dtype)
  R_rot = jnp.asarray(np.diag([0.00025**2] * 3), dtype)
  Rs = jnp.where((ki == 0)[:, None, None], R_pos, R_rot)
  eas = jnp.zeros((T, 1), dtype)
  _, (x_pred, P_pred, x_post, P_post) = jax.block_until_ready(scan_fn(
      {}, jnp.asarray(LiveKalman.initial_x, dtype),
      jnp.asarray(np.diag(LiveKalman.initial_P_diag), dtype),
      jnp.asarray(LiveKalman.Q, dtype),
      dts, ki, zs, Rs, eas))

  def timed(fn, chain_n):
    # the tiny input perturbation defeats CSE between the chained calls
    def chained(p, xp, Pp, xf, Pf, t):
      s = jnp.asarray(0.0, dtype)
      for i in range(chain_n):
        r = fn(p, xp, Pp, xf + (1e-6 * i), Pf, t)
        s = s + jnp.sum(r[0]) + jnp.sum(r[1])
      return s

    f = jax.jit(chained)
    args = ({}, x_pred, P_pred, x_post, P_post, ts)
    return _time_chain(f, args) / chain_n

  t_seq = timed(lambda p, *a: rts.rts_smooth(spec, p, *a, norm_quats=True),
                chain_n=1)  # 350 ms >> RTT: no chaining needed
  t_par = timed(
      lambda p, *a: rts.rts_smooth_parallel(spec, p, *a, norm_quats=True),
      chain_n=4)
  log(f"rts T={T}: sequential {t_seq*1e3:.1f} ms, parallel {t_par*1e3:.1f} ms"
      f" ({t_seq/t_par:.1f}x)")
  return {
      "metric": "live_rts_parallel_smoother_throughput",
      "value": round(T / t_par, 1),
      "unit": "smoothed steps/sec/chip",
      "vs_baseline": round(t_seq / t_par, 3),  # speedup over sequential
  }


def bench_vo(path=None):
  """Banked visual-odometry workload (BENCH_MODEL=vo): B independent
  MSCKF VO filters, each frame = block predict + nullspace-projected
  feature update (dz=8 -> Householder projection -> 5-dim Cholesky solve)
  + sliding-window augment. BENCH_VO_PATH=lane (default) runs the
  lane-major jnp paths; =kernel the VMEM-resident Pallas VO kernel
  (ops/pallas_bank.vo_bank_scan) — feature kinds in the same hot kernel
  as everything else."""
  import jax
  import jax.numpy as jnp

  from rednose_tpu.models.msckf_vo import (
      ObservationKind as VK,
      build_msckf_vo_spec,
  )
  from rednose_tpu.ops import lane_bank

  spec = build_msckf_vo_spec()
  kind = int(VK.MSCKF_TEST)
  om = spec.obs[kind]
  if path is None:
    path = os.environ.get("BENCH_VO_PATH", "lane")  # |kernel
  B = int(os.environ.get("BENCH_BANK", 4096))
  T = int(os.environ.get("BENCH_STEPS", 128))
  chain_n = int(os.environ.get("BENCH_CHAIN", 4))
  dtype = jnp.float32
  rng = np.random.RandomState(0)

  x0 = np.concatenate([[0.1, -0.2, 0.05, 0.0, 0.0, 0.0][:spec.dim_main],
                       0.3 * rng.randn(spec.n_augment * spec.dim_augment)])
  x = jnp.asarray(np.tile(x0, (B, 1)) + 0.02 * rng.randn(B, spec.dim_x),
                  dtype)
  P = jnp.asarray(np.tile(np.eye(spec.dim_err)[..., None] * 0.1,
                          (1, 1, B)), dtype)
  Q = jnp.asarray(np.eye(spec.dim_err) * 1e-6, dtype)
  R = jnp.asarray(np.eye(om.dz) * 0.02**2, dtype)
  # per-frame landmark + its projected observation from the nominal state
  eas = np.array([2.0, 1.5, 8.0])[None, None] + 0.2 * rng.randn(T, B, 3)
  # one jitted vmap for the T*8 projections — the eager per-landmark loop
  # paid the ~28 ms relay RTT per op (~14 min of setup on a cold process)
  hv = jax.jit(jax.vmap(lambda e: om.h({}, jnp.asarray(x0), e)))
  zs = np.asarray(hv(jnp.asarray(eas[:, :8].reshape(-1, 3)))) \
      .reshape(T, 8, om.dz).mean(1)[:, None].repeat(B, 1)
  zs = jnp.asarray(zs + 0.01 * rng.randn(*zs.shape), dtype)
  eas_j = jnp.asarray(eas, dtype)

  if path == "kernel":
    # VMEM-resident VO kernel (ops/pallas_bank.vo_bank_scan): feature
    # updates + augmentation inside the same hot Pallas kernel
    from rednose_tpu.ops import pallas_bank, sparsity

    st = sparsity.detect_structure(spec, np.zeros(spec.dim_x))
    q_diag = tuple(float(v) for v in np.diag(np.asarray(Q)))
    r_mat = tuple(tuple(float(v) for v in row) for row in np.asarray(R))
    tile_b = int(os.environ.get("BENCH_TILE_B", 1024))
    t_chunk = int(os.environ.get("BENCH_T_CHUNK", 64))
    xp, Pp = pallas_bank.pack_bank(x, P)
    zsp = pallas_bank.pack_bank_measurements(zs)
    easp = pallas_bank.pack_bank_measurements(eas_j)
    dts = jnp.full((T,), 0.05, dtype)

    @jax.jit
    def chain(xp, Pp, zsp, easp):
      s = jnp.asarray(0.0, dtype)
      for i in range(chain_n):
        xo, Po = pallas_bank.vo_bank_scan(
            xp + 1e-6 * i, Pp, zsp, easp, dts, spec=spec, kind=kind,
            q_diag=q_diag, r_mat=r_mat, gate=True, t_chunk=t_chunk,
            tile_b=tile_b, structure=st)
        s = s + jnp.sum(xo) + jnp.sum(Po)
      return s

    log("compiling VO kernel (first compile is minutes-scale)...")
    best = _time_chain(chain, (xp, Pp, zsp, easp))
  else:
    def frame(carry, inp):
      xc, Pc = carry
      z, ea = inp
      xc, Pc = lane_bank.lane_predict(spec, {}, xc, Pc, Q, 0.05)
      xc, Pc, _ = lane_bank.lane_update(spec, kind, {}, xc, Pc, z, R,
                                        ea=ea)
      xc, Pc = lane_bank.lane_augment(spec, xc, Pc)
      return (xc, Pc), None

    @jax.jit
    def chain(x, P, zs, eas):
      s = jnp.asarray(0.0, dtype)
      for i in range(chain_n):
        (xf, Pf), _ = jax.lax.scan(frame, (x + 1e-6 * i, P), (zs, eas))
        s = s + jnp.sum(xf) + jnp.sum(Pf)
      return s

    best = _time_chain(chain, (x, P, zs, eas_j))

  frames_per_sec = (B * T * chain_n) / best
  log(f"banked VO {path} B={B}: best {best*1e3:.2f} ms for {chain_n} "
      f"chained scans -> {frames_per_sec/1e6:.2f}M frames/s")
  return {
      "metric": f"msckf_vo_bank_frame_throughput_{path}",
      "value": round(frames_per_sec, 1),
      "unit": "frames/sec/chip",
      "vs_baseline": round(frames_per_sec / BASELINE_STEPS_PER_SEC, 3),
  }


def bench_vo_eskf():
  """The ESKFxMSCKF composition (models/msckf_eskf: 41/36 quaternion error
  state + full-pose clone window — the reference's joint msckf_params +
  eskf_params path, ekf_sym.py:57-66) at production bank scale through
  the VMEM-resident VO kernel (BENCH_MODEL=vo_eskf). auto phase_mode
  picks the FLAT frame body (4.4k ops compiles on v5e and beats the
  2-/3-phase switch forms 22.2M > 17.8M > 16.8M frames/s)."""
  import jax
  import jax.numpy as jnp

  from rednose_tpu.models.msckf_eskf import (
      MSCKFEskf,
      ObservationKind as EK,
  )
  from rednose_tpu.ops import pallas_bank, sparsity

  spec = MSCKFEskf.build_spec()
  kind = int(EK.MSCKF_FEATURE)
  om = spec.obs[kind]
  B = int(os.environ.get("BENCH_BANK", 4096))
  T = int(os.environ.get("BENCH_STEPS", 64))
  chain_n = int(os.environ.get("BENCH_CHAIN", 4))
  # tuned on v5e: t_chunk 16 > 32 > 8; tile_b 1024 > 2048 (B=4096 sweep)
  t_chunk = int(os.environ.get("BENCH_T_CHUNK", 16))
  tile_b = int(os.environ.get("BENCH_TILE_B", 1024))
  dtype = jnp.float32
  rng = np.random.RandomState(0)

  st = sparsity.detect_structure(spec, MSCKFEskf.initial_x)
  q_diag = tuple(float(v) for v in np.diag(MSCKFEskf.Q))
  r_mat = tuple(tuple(0.01**2 if i == j else 0.0 for j in range(om.dz))
                for i in range(om.dz))

  x0 = np.asarray(MSCKFEskf.initial_x, np.float64)
  xs = np.tile(x0, (B, 1)) + 0.02 * rng.randn(B, spec.dim_x)
  for a in range(spec.n_augment):
    o = spec.dim_main + spec.dim_augment * a
    xs[:, o:o + 3] += 0.5 * rng.randn(3)[None]
  for idx in spec.quaternion_idxs:
    q = xs[:, idx:idx + 4]
    xs[:, idx:idx + 4] = q / np.linalg.norm(q, axis=1, keepdims=True)
  P = jnp.asarray(np.tile((0.1 * np.eye(spec.dim_err))[..., None],
                          (1, 1, B)), dtype)
  eas = np.array([1.0, 0.5, 6.0])[None, None] + 0.1 * rng.randn(T, B, 3)
  z0 = np.asarray(om.h({}, jnp.asarray(x0), jnp.asarray([1.0, 0.5, 6.0])))
  zs = z0[None, None] + 0.005 * rng.randn(T, B, om.dz)
  dts = jnp.full((T,), 0.05, dtype)

  xp, Pp = pallas_bank.pack_bank(jnp.asarray(xs, dtype), P)
  zsp = pallas_bank.pack_bank_measurements(jnp.asarray(zs, dtype))
  easp = pallas_bank.pack_bank_measurements(jnp.asarray(eas, dtype))

  @jax.jit
  def chain(xp, Pp, zsp, easp):
    s = jnp.asarray(0.0, dtype)
    for i in range(chain_n):
      xo, Po = pallas_bank.vo_bank_scan(
          xp + 1e-6 * i, Pp, zsp, easp, dts, spec=spec, kind=kind,
          q_diag=q_diag, r_mat=r_mat, gate=True, t_chunk=t_chunk,
          tile_b=tile_b, structure=st)
      s = s + jnp.sum(xo) + jnp.sum(Po)
    return s

  log("compiling ESKFxMSCKF VO kernel (flat body; first compile may be "
      "minutes-scale)...")
  best = _time_chain(chain, (xp, Pp, zsp, easp))
  frames_per_sec = (B * T * chain_n) / best
  log(f"ESKFxMSCKF composition kernel B={B}: best {best*1e3:.2f} ms for "
      f"{chain_n} chained scans -> {frames_per_sec/1e6:.2f}M frames/s")
  return {
      "metric": "msckf_eskf_composition_bank_frame_throughput_kernel",
      "value": round(frames_per_sec, 1),
      "unit": "frames/sec/chip",
      "vs_baseline": round(frames_per_sec / BASELINE_STEPS_PER_SEC, 3),
  }


def bench_vio_pipeline():
  """End-to-end VIO at the reference design point, ONE compiled path
  (BENCH_MODEL=vio_pipeline): synthetic tracker frames -> the 6000-track x
  3000-feature store merge (msckf/feature_handler.py, the reference's
  feature_handler.c:23-26 capacities) -> harvest of the frame's completed
  tracks -> batched Gauss-Newton triangulation (msckf/triangulation.py,
  compute_pos.c:10-52) -> the triangulated landmarks streamed into the
  banked VO Pallas kernel as that frame's feature observations. The whole
  flow is one jit: a lax.scan over camera frames (merge + harvest +
  triangulate) feeding one vo_bank_scan — the composed "full MSCKF flow"
  number, not just the kernel leg.

  Synthetic tracker: cohorts of 750 tracks born per frame, each completing
  after K=4 observations, so every frame merges 3000 feature rows (3
  continuing cohorts + 1 new) and harvests 750 completed tracks — the
  store cycles at steady state. Observations are exact pinhole projections
  of per-track landmarks from a shared camera path, so GN converges and
  the kernel's maha gate passes."""
  import jax
  import jax.numpy as jnp

  from rednose_tpu.models.msckf_vo import (
      ObservationKind as VK,
      build_msckf_vo_spec,
  )
  from rednose_tpu.msckf import feature_handler as fh
  from rednose_tpu.msckf.triangulation import compute_pos_batch
  from rednose_tpu.ops import pallas_bank, sparsity
  from rednose_tpu.ops.quaternion import quat_to_rot

  spec = build_msckf_vo_spec()
  kind = int(VK.MSCKF_TEST)
  om = spec.obs[kind]
  K = spec.n_augment                       # 4-observation tracks
  N_TRACKS, N_FEATS = fh.DEFAULT_N_TRACKS, fh.DEFAULT_N_FEATURES  # 6000/3000
  COHORT = N_FEATS // K                    # 750 born + 750 completed / frame
  M = 768                                  # static harvest capacity (>=750)
  B = int(os.environ.get("BENCH_BANK", 4096))
  T = int(os.environ.get("BENCH_STEPS", 32))
  chain_n = int(os.environ.get("BENCH_CHAIN", 2))
  tile_b = int(os.environ.get("BENCH_TILE_B", 1024))
  dtype = jnp.float32
  rng = np.random.RandomState(0)

  # ---- shared camera path + per-slot landmarks (exact projections) ------
  to_c = np.eye(3)
  poses = np.zeros((K, 7))
  for k in range(K):
    poses[k, 0:3] = [0.2 * k, -0.1 * k, 0.0]
    poses[k, 3] = 1.0  # identity attitude
  land = np.array([1.0, 2.0, 10.0])[None] + \
      np.concatenate([0.5 * rng.randn(N_TRACKS, 2),
                      1.0 + 0.2 * rng.randn(N_TRACKS, 1)], axis=1)
  # uv_table[s, k]: projection of slot s's landmark from window pose k
  rel = land[:, None, :] - poses[None, :, :3]          # (S, K, 3)
  uv_table = rel[..., :2] / rel[..., 2:3]              # identity rotations

  # ---- steady-state store prefill + the (T, 3000, 5) feature stream -----
  # cohort blocks at slots [1 + a*COHORT, 1 + (a+1)*COHORT), a in 0..3.
  # Steady state at frame t: block t%4 (completed last frame) is HARVESTED
  # and its slots re-allocated to the new cohort (merge's cumsum allocator
  # consumes empty slots ascending — the cleared block sorts first);
  # block (t+1)%4 receives its 4th observation and completes; blocks
  # (t+2)%4 / (t+3)%4 get observations 3 / 2.
  tracks0 = np.zeros((N_TRACKS, K + 1, 5))
  tracks0[0, 0, fh.H_COUNT] = -1.0         # reserve slot 0 (pipeline.py)
  for a in range(K):
    slots = np.arange(1 + a * COHORT, 1 + (a + 1) * COHORT)
    count = K - a                          # a=0: COMPLETE, harvested frame 0
    tracks0[slots, 0, fh.H_COUNT] = count
    tracks0[slots, 0, fh.H_LAST_ID] = slots
    if a == 0:
      tracks0[slots, 0, fh.H_COMPLETE] = 1.0
      tracks0[slots, 0, fh.H_VALID] = 1.0
    for c in range(count):
      tracks0[slots, 1 + c, 2:4] = uv_table[slots, c]
  feats = np.full((T, N_FEATS, 5), -1.0)
  for t in range(T):
    row = 0
    for a in range(K):   # a=0: newborn cohort (obs 0); a=1: completing (3)
      blk = (t + a) % K
      slots = np.arange(1 + blk * COHORT, 1 + (blk + 1) * COHORT)
      oi = 0 if a == 0 else K - a
      feats[t, row:row + COHORT, 1] = slots       # next_id
      feats[t, row:row + COHORT, 4] = slots       # match
      feats[t, row:row + COHORT, 2:4] = uv_table[slots, oi]
      row += COHORT
  feats = jnp.asarray(feats, dtype)

  # ---- VO bank init (as bench_vo) ----------------------------------------
  st = sparsity.detect_structure(spec, np.zeros(spec.dim_x))
  x0 = np.concatenate([[0.1, -0.2, 0.05, 0.0, 0.0, 0.0][:spec.dim_main],
                       0.3 * rng.randn(spec.n_augment * spec.dim_augment)])
  x = jnp.asarray(np.tile(x0, (B, 1)) + 0.02 * rng.randn(B, spec.dim_x),
                  dtype)
  P = jnp.asarray(np.tile(np.eye(spec.dim_err)[..., None] * 0.1, (1, 1, B)),
                  dtype)
  q_diag = tuple([1e-6] * spec.dim_err)
  r_mat = tuple(tuple((0.02**2 if i == j else 0.0) for j in range(om.dz))
                for i in range(om.dz))
  # zs from the nominal state at the mean landmark (gate passes, bench_vo)
  z0 = np.asarray(om.h({}, jnp.asarray(x0), jnp.asarray([1.0, 2.0, 11.0])))
  zs = jnp.asarray(z0[None, None] + 0.01 * rng.randn(T, B, om.dz), dtype)
  xp, Pp = pallas_bank.pack_bank(x, P)
  zsp = pallas_bank.pack_bank_measurements(zs)
  dts = jnp.full((T,), 0.05, dtype)
  lane_map = jnp.asarray(np.arange(B) % COHORT, jnp.int32)
  poses_j = jnp.asarray(np.tile(poses, (M, 1, 1)), dtype)
  to_c_j = jnp.asarray(to_c, dtype)
  tracks0_j = jnp.asarray(tracks0, dtype)

  @jax.jit
  def pipeline(tracks, feats, xp, Pp, zsp):
    def frame(tr, feats_t):
      # harvest FIRST (pipeline.py pose/observation alignment); sort-free
      # compaction + mask-multiply clear (fh.harvest_complete)
      _, img, tr = fh.harvest_complete(tr, M)         # img (M, K, 2)
      # merge this frame's detections
      tr = fh.reset_seen(tr)
      empty = fh.empty_slots(tr, N_FEATS)
      tr, _ = fh.merge_features(tr, feats_t, empty)
      # triangulate the harvested tracks (batched GN)
      pos, ok = compute_pos_batch(to_c_j, poses_j, img)
      pos = jnp.where(ok[:, None], pos, jnp.asarray([1.0, 2.0, 11.0],
                                                    pos.dtype))
      return tr, pos

    tracks, poss = jax.lax.scan(frame, tracks, feats)   # poss (T, M, 3)
    eas = poss[:, lane_map]                             # (T, B, 3)
    easp = pallas_bank.pack_bank_measurements(eas)
    xo, Po = pallas_bank.vo_bank_scan(
        xp, Pp, zsp, easp, dts, spec=spec, kind=kind, q_diag=q_diag,
        r_mat=r_mat, gate=True, t_chunk=T, tile_b=tile_b, structure=st)
    return xo, Po, tracks

  @jax.jit
  def chain(tracks, feats, xp, Pp, zsp):
    s = jnp.asarray(0.0, dtype)
    for i in range(chain_n):
      xo, Po, tracks = pipeline(tracks, feats, xp + 1e-6 * i, Pp, zsp)
      s = s + jnp.sum(xo) + jnp.sum(Po) + jnp.sum(tracks[:, 0, 0])
    return s

  log("compiling VIO pipeline (merge + GN triangulation + VO kernel as "
      "one program; first compile is minutes-scale)...")
  best = _time_chain(chain, (tracks0_j, feats, xp, Pp, zsp))
  frames_per_sec = (T * chain_n) / best
  kernel_frames_per_sec = (B * T * chain_n) / best
  tri_per_sec = (COHORT * T * chain_n) / best
  log(f"VIO pipeline B={B} store={N_TRACKS}x{N_FEATS}: best "
      f"{best*1e3:.2f} ms for {chain_n} chained sweeps -> "
      f"{frames_per_sec/1e3:.1f}k camera frames/s "
      f"({kernel_frames_per_sec/1e6:.1f}M bank frames/s, "
      f"{tri_per_sec/1e3:.1f}k GN triangulations/s)")
  return {
      "metric": "vio_pipeline_camera_frame_throughput",
      "value": round(frames_per_sec, 1),
      "unit": "camera frames/sec/chip (merge+triangulate+kernel)",
      "vs_baseline": round(kernel_frames_per_sec / BASELINE_STEPS_PER_SEC, 3),
      "bank_frames_per_sec": round(kernel_frames_per_sec, 1),
      "triangulations_per_sec": round(tri_per_sec, 1),
  }


def bench_car():
  """CarKalman (paramsd-style vehicle-parameter estimation) at bank scale
  with PER-STEP runtime control inputs — forward speed + commanded
  steering streamed through SMEM into the fused generic kernel every tick
  (the reference's global_vars-at-sensor-rate pattern, ekf_sym.py:129-132;
  BENCH_MODEL=car)."""
  import jax
  import jax.numpy as jnp

  from rednose_tpu.models.car import (
      DEFAULT_PARAMS,
      CarKalman,
      ObservationKind as CK,
  )
  from rednose_tpu.ops import pallas_bank, sparsity

  spec = CarKalman.build_spec()
  kind = int(CK.YAW_RATE)
  B = int(os.environ.get("BENCH_BANK", 8192))
  T = int(os.environ.get("BENCH_STEPS", 1024))
  chain_n = int(os.environ.get("BENCH_CHAIN", 8))
  t_chunk = int(os.environ.get("BENCH_T_CHUNK", 128))
  tile_b = int(os.environ.get("BENCH_TILE_B", 1024))
  dtype = jnp.float32
  rng = np.random.RandomState(0)

  st = sparsity.structure_for(spec, CarKalman.initial_x)
  q_diag = tuple(float(v) for v in np.diag(CarKalman.Q))
  r_mat = ((0.001**2,),)
  ps_keys = ('u', 'steer_angle_deg')
  base = tuple((k, float(v)) for k, v in sorted(DEFAULT_PARAMS.items())
               if k not in ps_keys)

  xs = np.tile(np.asarray(CarKalman.initial_x), (B, 1)) \
      + 0.05 * rng.randn(B, 5)
  P = jnp.asarray(np.tile(np.diag(CarKalman.initial_P_diag)[..., None],
                          (1, 1, B)), dtype)
  zs = jnp.asarray(0.05 * rng.randn(T, B, 1), dtype)
  pss = jnp.asarray(np.stack([18.0 + 6.0 * rng.rand(T),
                              25.0 * np.sin(np.linspace(0, 20, T))],
                             axis=1), dtype)
  dts = jnp.full((T,), 0.05, dtype)

  xp, Pp = pallas_bank.pack_bank(jnp.asarray(xs, dtype), P)
  zsp = pallas_bank.pack_bank_measurements(zs)

  @jax.jit
  def chain(xp, Pp, zsp, pss):
    s = jnp.asarray(0.0, dtype)
    for i in range(chain_n):
      xo, Po = pallas_bank.generic_bank_scan(
          xp + 1e-6 * i, Pp, zsp, dts, None, pss, spec=spec, kind=kind,
          q_diag=q_diag, r_mat=r_mat, gate=True, t_chunk=t_chunk,
          tile_b=tile_b, structure=st, ps_keys=ps_keys, base_params=base)
      s = s + jnp.sum(xo) + jnp.sum(Po)
    return s

  log("compiling car params-stream kernel...")
  best = _time_chain(chain, (xp, Pp, zsp, pss))
  steps_per_sec = (B * T * chain_n) / best
  log(f"car params-stream kernel B={B}: best {best*1e3:.2f} ms for "
      f"{chain_n} chained scans -> {steps_per_sec/1e6:.1f}M steps/s")
  return {
      "metric": "car_bank_params_stream_throughput_kernel",
      "value": round(steps_per_sec, 1),
      "unit": "steps/sec/chip",
      "vs_baseline": round(steps_per_sec / BASELINE_STEPS_PER_SEC, 3),
  }


def bench_kinematic():
  """North-star config: 16k-wide kinematic EKF bank with Mahalanobis
  gating, fused Pallas scan kernel (BASELINE.json "configs" item 3)."""
  import jax
  import jax.numpy as jnp

  from rednose_tpu.models.kinematic import KinematicKalman
  from rednose_tpu.ops import pallas_step

  B = int(os.environ.get("BENCH_BANK", 16384))
  T = int(os.environ.get("BENCH_STEPS", 4096))
  TILE_B = int(os.environ.get("BENCH_TILE_B", 8192))
  T_CHUNK = int(os.environ.get("BENCH_T_CHUNK", 128))
  # applications chained inside one dispatch: amortizes the host->device
  # dispatch latency (which on a relayed TPU is ~30ms, 10x the kernel)
  CHAIN = int(os.environ.get("BENCH_CHAIN", 16))

  dev = jax.devices()[0]
  log(f"device: {dev}, bank={B}, steps={T}, tile_b={TILE_B}, t_chunk={T_CHUNK}")

  dtype = jnp.float32
  x0 = jnp.broadcast_to(
      jnp.asarray(KinematicKalman.initial_x, dtype=dtype), (B, 2))
  P0 = jnp.broadcast_to(
      jnp.asarray(np.diag(KinematicKalman.initial_P_diag), dtype=dtype),
      (B, 2, 2))
  packed = pallas_step.pack_state(x0, P0)
  # synthesize measurements on-device: no host->device bulk transfer
  zs = 0.5 * jax.random.normal(jax.random.key(0), (T, B), dtype=dtype)
  dts = jnp.full((T,), 0.01, dtype=dtype)
  rs = jnp.full((T,), 0.1**2, dtype=dtype)
  Q = KinematicKalman.Q

  @jax.jit
  def chain(s, zs):
    for _ in range(CHAIN):
      s = pallas_step.kinematic_bank_scan(
          s, zs, dts, rs, q00=float(Q[0, 0]), q11=float(Q[1, 1]), maha=True,
          t_chunk=T_CHUNK, tile_b=TILE_B)
    return jnp.sum(s)

  best = _time_chain(chain, (packed, zs))
  steps_per_sec = (B * T * CHAIN) / best
  log(f"kinematic: best {best*1e3:.3f} ms for {CHAIN} applications -> "
      f"{steps_per_sec/1e6:.1f}M steps/s")
  return {
      "metric": "kinematic_bank_fused_predict_update_throughput",
      "value": round(steps_per_sec, 1),
      "unit": "steps/sec/chip",
      "vs_baseline": round(steps_per_sec / BASELINE_STEPS_PER_SEC, 3),
  }


def main():
  model = os.environ.get("BENCH_MODEL", "")
  if model == "live":
    print(json.dumps(bench_live_bank()))
    return
  if model == "generic":
    print(json.dumps(bench_generic()))
    return
  if model == "rts":
    print(json.dumps(bench_rts()))
    return
  if model == "vo":
    print(json.dumps(bench_vo()))
    return
  if model == "vo_eskf":
    print(json.dumps(bench_vo_eskf()))
    return
  if model == "vio_pipeline":
    print(json.dumps(bench_vio_pipeline()))
    return
  if model == "car":
    print(json.dumps(bench_car()))
    return
  if model == "kinematic":
    print(json.dumps(bench_kinematic()))
    return

  # Full driver-captured sweep: kinematic headline + every flagship config
  # in "extra". A failing config records its error instead of aborting,
  # and a soft wall-clock budget skips the tail rather than risking the
  # whole JSON line (first Mosaic compiles through the relay are
  # minutes-scale: fused live ~4 min, entry-level generic ~25 min).
  start = time.perf_counter()
  budget_s = float(os.environ.get("BENCH_BUDGET_S", 5400))
  result = bench_kinematic()
  extra = {}
  sweep = (
      ("live_fused", lambda: bench_live_bank(path="pallas")),
      ("live_mixed", lambda: bench_live_bank(path="mixed")),
      ("rts", bench_rts),
      ("vo_lane", lambda: bench_vo(path="lane")),
      ("vo_kernel", lambda: bench_vo(path="kernel")),
      ("vo_eskf_kernel", bench_vo_eskf),
      ("vio_pipeline", bench_vio_pipeline),
      ("car_params_stream", bench_car),
      ("generic_entry", lambda: bench_generic(path="sparse")),
      ("generic_mixed", lambda: bench_generic(path="mixed")),
      ("generic_epoch", lambda: bench_generic(path="epoch")),
      ("epoch_live", lambda: bench_generic(path="epoch_live")),
  )
  skip = set(os.environ.get("BENCH_SKIP", "").split(",")) - {""}
  for name, fn in sweep:
    elapsed = time.perf_counter() - start
    if name in skip or elapsed > 0.6 * budget_s:
      extra[name] = {"skipped": True,
                     "reason": "env" if name in skip else
                     f"budget ({elapsed:.0f}s elapsed of {budget_s:.0f}s)"}
      continue
    t0 = time.perf_counter()
    try:
      extra[name] = fn()
    except Exception as e:  # noqa: BLE001 - sweep must survive any config
      log(traceback.format_exc())
      extra[name] = {"error": f"{type(e).__name__}: {e}"[:300]}
    extra[name]["wall_s"] = round(time.perf_counter() - t0, 1)
  result["extra"] = extra
  print(json.dumps(result))


if __name__ == "__main__":
  main()
