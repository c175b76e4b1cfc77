"""Shared machinery for the production bank facades.

LiveKalmanBank (hand-derived live kernels, runtime/live_bank.py) and
KalmanBank (entry-level generic kernels for ANY spec,
runtime/generic_bank.py) expose the same ergonomics: a B-wide bank with a
shared clock, out-of-order observe() on a sparse-snapshot rewind ring
(reference semantics: ekf_sym.py:464-482 / ekf_sym.cc:83-156), per-lane
divergence recovery, and save/load. This base class owns everything that
is not kernel-selection so the two facades cannot drift: the OOO
insertion/merge/replay logic, the too-old rejection, snapshot lifecycle,
divergence detection, and the checkpoint round trip.

Subclasses provide `_apply_one(t, *payload)` (apply one observation and
record it on the ring) plus the run_* bulk paths, and initialise the base
fields in __init__.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from rednose_tpu.runtime.bank import BankState
from rednose_tpu.runtime.checkpoint import load_bank, save_bank


def largest_divisor(n: int, candidates) -> int:
  for c in candidates:
    if n % c == 0:
      return c
  return 1


class BankFacadeBase:
  """State/time/rewind/divergence/persistence core of a bank facade.

  Required instance fields (set by the subclass __init__): batch, dtype,
  _x (B, dim_x), _P (de, de, B) lane-major, t (host f64 clock), _ring
  (BankRewindRing), max_rewind_age, logger, _x0_1d, _P_diag0, and
  _quaternion_idxs (tuple of nominal-state offsets of quaternion blocks,
  for the divergence window guard).
  """

  # runtime-tunable params (the reference's global_vars). Subclasses with
  # a params surface (KalmanBank) replace these; the default is the
  # empty-params contract every spec without default_params satisfies.
  params: dict = {}

  def _static_params(self, ps_keys=()):
    """self.params minus the streamed keys, as the kernels' static (name,
    float) tuple. The base facade carries no params."""
    del ps_keys
    return ()

  # ---------------------------------------------------------------- state

  @property
  def x(self):
    """(B, dim_x) nominal states."""
    return self._x

  @property
  def P(self):
    """(B, de, de) error-state covariances."""
    return jnp.transpose(self._P, (2, 0, 1))

  def state(self) -> BankState:
    # BankState.t is seconds SINCE epoch (runtime/bank.py contract) and
    # every lane steps in lockstep with the shared bank clock, so the real
    # per-lane filter time is exactly epoch + 0: t=0 here is not a
    # fabrication, it keeps absolute_t() == self.t while the f64 epoch
    # carries the full-precision clock (f32 lanes would quantize an
    # epoch-scale time to ~256 s, CLAUDE.md)
    return BankState(x=self._x, P=self.P,
                     t=jnp.zeros((self.batch,), self.dtype),
                     epoch=self.t)

  def diverged(self):
    """(B,) bool: lanes whose state or covariance went non-finite, or whose
    quaternion norm left the divergence window — the bank analog of the
    single-filter quat-norm guard -> KalmanError (reference:
    live_kf.py:299-306). Traced-friendly (no host sync)."""
    ok = (jnp.all(jnp.isfinite(self._x), axis=1)
          & jnp.all(jnp.isfinite(self._P), axis=(0, 1)))
    for idx in self._quaternion_idxs:
      qn = jnp.linalg.norm(self._x[:, idx:idx + 4], axis=1)
      ok = ok & (qn > 0.1) & (qn < 10.0)
    return ~ok

  def reset_diverged(self, x0=None, P_diag=None):
    """Elastic recovery: re-seed only the diverged lanes from the initial
    state (or the given one) and report how many were reset. Healthy lanes
    are untouched, so one bad lane never forces a bank-wide restart — the
    wide-bank analog of the reference's caller-side init_state re-seed on
    KalmanError."""
    bad = self.diverged()
    x0 = jnp.asarray(self._x0_1d if x0 is None else x0, self.dtype)
    if x0.ndim == 1:
      x0 = jnp.broadcast_to(x0[None, :], self._x.shape)
    assert x0.shape == self._x.shape, x0.shape  # (B, dim_x) per-lane reseed
    P_diag = self._P_diag0 if P_diag is None else np.asarray(P_diag)
    P0 = jnp.asarray(np.diag(P_diag), self.dtype)
    self._x = jnp.where(bad[:, None], x0, self._x)
    self._P = jnp.where(bad[None, None, :], P0[:, :, None], self._P)
    # a later rewind must never replay through a pre-reset snapshot and
    # resurrect the diverged lanes
    self._ring.clear()
    return int(jnp.sum(bad))

  def save(self, path):
    save_bank(path, self.state())

  def load(self, path):
    st = load_bank(path, dtype=self.dtype)
    assert st.x.shape == (self.batch, self._x.shape[1]), st.x.shape
    self._x = st.x
    self._P = jnp.transpose(st.P, (1, 2, 0))
    self.t = st.epoch
    self._ring.clear()  # snapshots from before the load are another timeline
    return self

  def _normalize_R(self, kind, R):
    """One R contract for every surface (observe/run/run_mixed/run_epochs):
    scalar (dz=1), (dz,) diagonal, or full (dz, dz) -> (dz, dz) float64."""
    dz = self.spec.obs[kind].dz
    R = np.asarray(R, dtype=np.float64)
    if R.ndim == 1 and dz > 1:
      assert R.shape == (dz,), (R.shape, dz)
      return np.diag(R)
    return R.reshape(dz, dz)

  # --------------------------------------------------------------- rewind

  def _observe_ordered(self, t, payload):
    """Driver-style out-of-order handling for one observation whose
    ring/replay payload is `(t, *payload)` (reference: ekf_sym.py:464-482 /
    ekf_sym.cc:83-156): a late observation inside the rewind window rolls
    the bank back to the newest snapshot at-or-before t and replays the
    buffered observations around it, inserted in time order; older than
    the window it is dropped (returns None)."""
    if t < self.t:  # late observation
      if not self._ring.can_rewind(t, self.max_rewind_age):
        self.logger.error(
            f"bank observation too old at {t:.3f} with bank at "
            f"{self.t:.3f}, ignoring")
        return None
      t_restore, (x, P), replay = self._ring.rewind(t)
      self._x, self._P = x, P
      self.t = t_restore
      # insert by timestamp among the replayed observations (driver
      # semantics: everything rewound past is re-applied in time order)
      merged, inserted = [], False
      for obs in replay:
        if not inserted and obs[0] > t:
          merged.append((t, *payload))
          inserted = True
        merged.append(obs)
      if not inserted:
        merged.append((t, *payload))
      for obs in merged:
        self._apply_one(*obs)
      return self
    self._apply_one(t, *payload)
    return self

  # ----------------------------------------------------------------- runs

  def run_epochs(self, dts, zs, slot_kinds, R_by_slot=None,
                 eas=None, slot_mode: str = 'auto', pss=None, ps_keys=()):
    """T epochs, each one predict + K updates (the reference's
    predict_and_update_batch semantics at bank-kernel speed): slot_kinds
    is the static epoch layout (repeat a kind for several same-kind
    measurements — e.g. 7 pseudoranges + 7 rates), zs (T, K, B, max_dz)
    rows padded to the largest dz, eas (T, K, B, max_ea_len) iff some
    slot kind takes extra args. Per-slot R defaults to its kind's
    obs_noise.

    Runs on the ENTRY-LEVEL generic kernels against self.spec on every
    facade (there is no hand-derived epoch kernel): slot_mode='auto'
    counts the flat one-epoch body's ops exactly and unrolls all K
    updates inline while it fits the Mosaic compile budget (GNSS-class
    epochs); K-fat or live-complexity epochs route to the per-slot
    lax.switch dispatch whose branch regions stay at one-update size
    (pallas_bank._epoch_kernel) — ANY epoch schedule reaches the kernel.
    Per-EPOCH runtime params stream via ps_keys (static names) + pss
    (T, len(ps_keys)) — see KalmanBank.run."""
    from rednose_tpu.ops import lane_bank, pallas_bank

    slot_kinds = tuple(int(k) for k in slot_kinds)
    ps_keys = tuple(ps_keys)
    max_ea = max(self.spec.obs[k].ea_len for k in slot_kinds)
    dts = np.asarray(dts, np.float64)
    T = dts.shape[0]
    if T == 0:
      return self
    if R_by_slot is None:
      R_by_slot = [self._default_R(k) for k in slot_kinds]
    assert len(R_by_slot) == len(slot_kinds)
    R_by_slot = [self._normalize_R(k, R)
                 for k, R in zip(slot_kinds, R_by_slot)]
    assert (eas is None) == (max_ea == 0)
    assert (pss is None) == (len(ps_keys) == 0)
    if self.use_pallas and T % 8 == 0:
      t_chunk = largest_divisor(T, (32, 16, 8))   # epoch bodies are K-fat
      tile_b = self._tile_b()
      xp, Pp = pallas_bank.pack_bank(self._x, self._P)
      zsp = pallas_bank.pack_bank_epochs(jnp.asarray(zs, self.dtype))
      easp = (pallas_bank.pack_bank_epochs(jnp.asarray(eas, self.dtype))
              if eas is not None else None)
      r_mats = tuple(tuple(tuple(float(v) for v in row)
                           for row in np.asarray(R)) for R in R_by_slot)
      base_params = self._static_params(ps_keys)
      xp, Pp = pallas_bank.generic_bank_scan_epoch(
          xp, Pp, zsp, jnp.asarray(dts, self.dtype), easp,
          None if pss is None else jnp.asarray(pss, self.dtype),
          spec=self.spec, slot_kinds=slot_kinds, q_diag=self._q_diag,
          r_mats=r_mats, t_chunk=t_chunk, tile_b=tile_b,
          structure=self.structure, slot_mode=slot_mode,
          base_params=base_params, ps_keys=ps_keys)
      self._x, self._P = pallas_bank.unpack_bank(xp, Pp)
    else:
      fn = lane_bank.jit_lane_epoch_bank_scan(self.spec, slot_kinds,
                                              self.structure, ps_keys)
      R_list = tuple(jnp.asarray(R, self.dtype) for R in R_by_slot)
      self._x, self._P = fn(
          self.params, self._x, self._P, self.Q,
          jnp.asarray(dts, self.dtype), jnp.asarray(zs, self.dtype),
          R_list, eas=None if eas is None else jnp.asarray(eas, self.dtype),
          pss=None if pss is None else jnp.asarray(pss, self.dtype))
    self.t += float(dts.sum())
    self._ring.clear()  # bulk runs are not observation-addressable
    return self

  def _tiles(self, T):
    # t_chunk >= 8: the kernel's SMEM dts stream block shape must be
    # divisible by 8 (Mosaic block-shape rule); run()/run_mixed() route
    # T % 8 != 0 to the lane path
    return largest_divisor(T, (128, 64, 32, 16, 8)), self._tile_b()

  def _tile_b(self):
    return largest_divisor(self.batch,
                           (1024, 512, 256, 128, 64, 32, 16, 8))
