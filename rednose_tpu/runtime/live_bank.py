"""Production facade for wide live-ESKF banks.

The fast live paths (ops/live_lane.py jnp scan, ops/pallas_live.py fused
kernels) are functional building blocks; this facade gives them the same
ergonomics the single-filter engine has: it owns a B-wide bank, keeps time,
picks the fastest path for the current backend (fused Pallas kernel on TPU,
lane-major jnp scan elsewhere), and round-trips through
runtime/checkpoint.save_bank.

    bank = LiveKalmanBank(batch=8192)
    bank.run(dts, zs)                        # ECEF_POS stream
    bank.run_mixed(dts, kind_idx, zs, kinds) # heterogeneous schedule
    bank.x, bank.P                           # (B, 23), (B, 22, 22)
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

import logging

from rednose_tpu.models.live import LiveKalman, ObservationKind
from rednose_tpu.ops import live_lane, pallas_live
from rednose_tpu.runtime.bank_facade import BankFacadeBase
from rednose_tpu.runtime.rewind import BankRewindRing


class LiveKalmanBank(BankFacadeBase):
  """B independent live 23/22 ESKFs stepped as one compiled program.

  State/time/OOO-rewind/divergence/save-load live in BankFacadeBase; this
  class owns the hand-derived live kernel selection (ops/pallas_live.py on
  TPU, ops/live_lane.py elsewhere)."""

  def __init__(self, batch: int, x0=None, P_diag=None, Q=None,
               dtype=jnp.float32, use_pallas: bool | None = None,
               t0: float = 0.0, max_rewind_age: float = 1.0,
               ckpt_every: int = 16, ckpt_keep: int = 8,
               ckpt_bytes: int | None = None, logger=logging):
    self.batch = batch
    self.dtype = dtype
    x0 = LiveKalman.initial_x if x0 is None else np.asarray(x0)
    P_diag = (LiveKalman.initial_P_diag if P_diag is None
              else np.asarray(P_diag))
    # per-lane x0: re-seed diverged lanes from the bank's own first row
    # (same rule as KalmanBank), not the model default
    self._x0_1d = x0 if x0.ndim == 1 else np.asarray(x0[0])
    self._P_diag0 = P_diag
    self._quaternion_idxs = (3,)
    self.Q = jnp.asarray(LiveKalman.Q if Q is None else Q, dtype)
    self._q_diag = tuple(float(v)
                         for v in np.diag(np.asarray(self.Q, np.float64)))
    if x0.ndim == 1:
      self._x = jnp.tile(jnp.asarray(x0, dtype), (batch, 1))
    else:
      self._x = jnp.asarray(x0, dtype)
    self._P = jnp.tile(jnp.asarray(np.diag(P_diag), dtype)[:, :, None],
                       (1, 1, batch))
    self.t = t0
    # the fused kernel carries Q as static DIAGONAL scalars (2D-array
    # broadcasts don't lower in Pallas, see ops/live_lane.py) — off-diagonal
    # process noise must take the jnp path
    q_is_diag = bool(np.all(np.asarray(self.Q) ==
                            np.diag(np.diag(np.asarray(self.Q)))))
    # the fused kernel needs a real TPU (or interpret mode) and an 8-folded
    # bank; everything else takes the pure-jnp lane scan
    if use_pallas is None:
      use_pallas = (jax.default_backend() == 'tpu'
                    and batch % pallas_live.SUBLANES == 0 and q_is_diag)
    elif use_pallas and not q_is_diag:
      raise ValueError(
          "the fused Pallas path supports diagonal Q only (it is carried as "
          "static diagonal scalars); pass use_pallas=False for off-diagonal "
          "process noise")
    self.use_pallas = use_pallas
    # out-of-order support for the per-observation surface (observe()):
    # sparse bank-state snapshots + full observation buffer
    self.max_rewind_age = max_rewind_age
    self.logger = logger
    self._ring = BankRewindRing(ckpt_every=ckpt_every, ckpt_keep=ckpt_keep,
                                ckpt_bytes=ckpt_bytes)

  # spec/structure/_default_R power the shared run_epochs in
  # BankFacadeBase (the epoch path has no hand-derived live kernel; it
  # runs the entry-level generic kernel against the live spec — for the
  # 4-distinct-kind all-sensors tick that auto-routes to the per-slot
  # switch dispatch). Built lazily: the hand-kernel paths never need them.

  @property
  def spec(self):
    return LiveKalman.build_spec()

  @property
  def structure(self):
    from rednose_tpu.ops import sparsity
    return sparsity.structure_for(self.spec, LiveKalman.initial_x)

  def _default_R(self, kind):
    R = LiveKalman.obs_noise.get(int(kind))
    if R is None:
      raise ValueError(
          f"kind {kind} carries per-measurement noise in the reference "
          "(no obs_noise default, live_kf.py:325-337); pass R_by_slot")
    return R

  # --------------------------------------------------- per-observation API

  _OBS_KINDS = tuple(sorted(live_lane.LANE_KINDS))

  def observe(self, t, kind, z, R=None, gate: bool = False):
    """Apply ONE timestamped observation to the whole bank with
    driver-style out-of-order handling (reference: ekf_sym.py:464-482 /
    ekf_sym.cc:83-156): a late observation inside the rewind window rolls
    the bank back to the newest snapshot at-or-before t and replays the
    buffered observations around it; older than the window it is dropped
    (returns None). z is (B, dz) or (dz,) broadcast across lanes; R
    defaults to LiveKalman.obs_noise[kind]. Uses the jnp lane path (one
    compiled program serves every kind via lax.switch) — per-tick
    streaming is dispatch-latency-bound, so the fused batch kernels stay
    reserved for run()/run_mixed(). Snapshots cost one bank-state
    reference every ckpt_every observations (runtime/rewind.BankRewindRing).
    """
    kind = int(kind)
    assert kind in live_lane.LANE_KINDS, kind
    if R is None:
      R = LiveKalman.obs_noise[kind]
    dz = live_lane.LANE_KINDS[kind][0]
    z = np.asarray(z, dtype=np.float64)
    if z.ndim == 1:
      z = np.broadcast_to(z, (self.batch, z.shape[0]))
    assert z.shape == (self.batch, dz), (z.shape, dz)
    if dz < 3:
      z = np.concatenate([z, np.zeros((self.batch, 3 - dz))], axis=1)
    R = np.asarray(R, dtype=np.float64).reshape(dz, dz)
    return self._observe_ordered(t, (kind, z, R, gate))

  def _apply_one(self, t, kind, z, R, gate):
    dt = max(float(t) - self.t, 0.0)
    kinds = self._OBS_KINDS
    R_list = tuple(
        jnp.asarray(R if k == kind
                    else np.eye(live_lane.LANE_KINDS[k][0]), self.dtype)
        for k in kinds)
    self._x, self._P = live_lane.jit_live_mixed_scan(kinds, gate=gate)(
        self._x, self._P, self.Q, jnp.asarray([dt], self.dtype),
        jnp.asarray([kinds.index(kind)], jnp.int32),
        jnp.asarray(z[None], self.dtype), R_list, None)
    self.t = float(t)
    self._ring.record(self.t, (self._x, self._P), (self.t, kind, z, R, gate))

  # ------------------------------------------------------------------- runs

  def run(self, dts, zs, R=None, gate: bool = False):
    """T fused predict + ECEF_POS-update steps: dts (T,), zs (T, B, 3),
    R (3, 3) shared (defaults to LiveKalman.obs_noise). Advances bank time
    by sum(dts) (host float64)."""
    dts = np.asarray(dts, np.float64)
    R = (LiveKalman.obs_noise[ObservationKind.ECEF_POS] if R is None
         else np.asarray(R))
    T = dts.shape[0]
    if T == 0:  # no measurements this tick: clean no-op on every path
      return self
    if self.use_pallas and T % 8 == 0:
      t_chunk, tile_b = self._tiles(T)
      xp, Pp = pallas_live.pack_live_state(self._x, self._P)
      zsp = pallas_live.pack_measurements(jnp.asarray(zs, self.dtype))
      r_mat = tuple(tuple(float(v) for v in row) for row in R)
      xp, Pp = pallas_live.live_bank_scan(
          xp, Pp, zsp, jnp.asarray(dts, self.dtype), q_diag=self._q_diag,
          r_mat=r_mat, gate=gate, t_chunk=t_chunk, tile_b=tile_b)
      self._x, self._P = pallas_live.unpack_live_state(xp, Pp)
    else:
      self._x, self._P = live_lane.jit_live_lane_scan(gate=gate)(
          self._x, self._P, self.Q, jnp.asarray(dts, self.dtype),
          jnp.asarray(zs, self.dtype), jnp.asarray(R, self.dtype))
    self.t += float(dts.sum())
    self._ring.clear()  # bulk runs are not observation-addressable: no rewind across them
    return self

  def run_mixed(self, dts, kind_idx, zs, kinds: Sequence[int],
                R_by_kind=None, gate: bool = False, r_stream=None,
                stream_kinds: Sequence[int] = ()):
    """T steps of a heterogeneous sensor schedule: kinds is the static kind
    set, kind_idx (T,) indexes into it, zs (T, B, 3) rows padded to dz<=3.
    Per-kind R defaults to LiveKalman.obs_noise; kinds in `stream_kinds`
    instead take per-step DIAGONAL noise from r_stream (T, 3) — the
    camera-odometry kinds' measurement-supplied variances
    (live_kf.py:325-337)."""
    kinds = tuple(int(k) for k in kinds)
    stream_kinds = tuple(int(k) for k in stream_kinds)
    assert all(k in live_lane.LANE_KINDS for k in kinds), kinds
    assert set(stream_kinds) <= set(kinds), (
        f"stream_kinds {stream_kinds} not all in kinds {kinds}")
    assert (r_stream is None) == (not stream_kinds)
    eye = np.eye(3)  # placeholder where a kind's static R is never read
    if R_by_kind is None:
      missing = [k for k in kinds
                 if k not in LiveKalman.obs_noise and k not in stream_kinds]
      if missing:
        raise ValueError(
            f"kinds {missing} carry per-measurement noise in the reference "
            "(no obs_noise default, live_kf.py:325-337); pass R_by_kind or "
            "stream their variances via r_stream/stream_kinds")
      R_by_kind = {k: LiveKalman.obs_noise.get(k, eye) for k in kinds}
    else:
      # streamed kinds never read their static entry: fill gaps so an
      # explicit R_by_kind may omit them (docstring: streamed INSTEAD)
      R_by_kind = {k: (R_by_kind[k] if k not in stream_kinds
                       else R_by_kind.get(k, eye)) for k in kinds}
    dts = np.asarray(dts, np.float64)
    T = dts.shape[0]
    if T == 0:
      return self
    rsj = None if r_stream is None else jnp.asarray(r_stream, self.dtype)
    if self.use_pallas and T % 8 == 0:
      t_chunk, tile_b = self._tiles(T)
      xp, Pp = pallas_live.pack_live_state(self._x, self._P)
      zsp = pallas_live.pack_measurements(jnp.asarray(zs, self.dtype))
      r_mats = tuple(tuple(tuple(float(v) for v in row)
                           for row in np.asarray(R_by_kind[k]))
                     for k in kinds)
      xp, Pp = pallas_live.live_bank_scan_mixed(
          xp, Pp, zsp, jnp.asarray(dts, self.dtype),
          jnp.asarray(kind_idx, jnp.int32), rsj, q_diag=self._q_diag,
          kinds=kinds, r_mats=r_mats, stream_kinds=stream_kinds, gate=gate,
          t_chunk=t_chunk, tile_b=tile_b)
      self._x, self._P = pallas_live.unpack_live_state(xp, Pp)
    else:
      R_list = tuple(jnp.asarray(R_by_kind[k], self.dtype) for k in kinds)
      self._x, self._P = live_lane.jit_live_mixed_scan(
          kinds, gate=gate, stream_kinds=stream_kinds)(
          self._x, self._P, self.Q, jnp.asarray(dts, self.dtype),
          jnp.asarray(kind_idx, jnp.int32), jnp.asarray(zs, self.dtype),
          R_list, rsj)
    self.t += float(dts.sum())
    self._ring.clear()  # bulk runs are not observation-addressable: no rewind across them
    return self
