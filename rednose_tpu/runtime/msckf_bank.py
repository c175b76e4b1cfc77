"""Production facade for wide MSCKF banks (additive OR ESKF-composed).

The reference runs every gen_code filter — the loc_kf-style MSCKF x ESKF
composition included (msckf_params + eskf_params together,
rednose/helpers/ekf_sym.py:57-66,86-87; augment at ekf_sym.py:365-391) —
through the same full-speed engine. This facade is that promise at bank
scale: B independent sliding-window filters of one MSCKF FilterSpec
(models/msckf_vo.py additive, models/msckf_eskf.py quaternion-composed)
stepped as one compiled program, with the camera-frame hot path on the
VMEM-resident VO kernel (ops/pallas_bank.vo_bank_scan: block predict +
nullspace-projected feature update + window augment in-kernel; the 36-dim
composition body runs as a 3-phase lax.switch so each Mosaic region stays
under the compile budget) and the lane-major jnp paths elsewhere.

    bank = MSCKFBank(MSCKFEskf, batch=4096)
    bank.run_frames(dts, zs, eas)          # T camera frames, kernel path
    bank.observe_frame(t, z, ea)           # one frame, out-of-order OK
    bank.observe(t, kind, z)               # non-feature kinds (no augment)
    bank.run(dts, zs, kind)                # bulk non-feature stream
    bank.x, bank.P                         # (B, dim_x), (B, de, de)

State/time/OOO-rewind/divergence/save-load live in BankFacadeBase — the
same contract as LiveKalmanBank / KalmanBank. A camera frame is
predict + feature update + augment (the reference's
predict_and_update_batch(..., augment=True) flow, ekf_sym.py:525-526); a
plain observation is predict + update with the window untouched.
"""

from __future__ import annotations

import functools
import logging

import jax
import jax.numpy as jnp
import numpy as np

from rednose_tpu.core.spec import FilterSpec
from rednose_tpu.ops import lane_bank, pallas_bank, sparsity
from rednose_tpu.runtime.bank_facade import BankFacadeBase
from rednose_tpu.runtime.rewind import BankRewindRing


@functools.lru_cache(maxsize=None)
def _jit_frame_step(spec: FilterSpec, kind: int, structure):
  """One fused camera frame on the lane bank: predict + projected feature
  update + window augment (the observe_frame hot path)."""
  def fn(x, P, Q, dt, z, R, ea):
    x, P = lane_bank.lane_predict(spec, {}, x, P, Q, dt,
                                  structure=structure)
    x, P, _ = lane_bank.lane_update(spec, kind, {}, x, P, z, R,
                                    structure=structure, ea=ea)
    return lane_bank.lane_augment(spec, x, P)
  return jax.jit(fn)


@functools.lru_cache(maxsize=None)
def _jit_plain_step(spec: FilterSpec, kind: int, structure):
  """One fused predict + non-feature update (window untouched)."""
  def fn(x, P, Q, dt, z, R):
    x, P = lane_bank.lane_predict(spec, {}, x, P, Q, dt,
                                  structure=structure)
    x, P, _ = lane_bank.lane_update(spec, kind, {}, x, P, z, R,
                                    structure=structure)
    return x, P
  return jax.jit(fn)


@functools.lru_cache(maxsize=None)
def _jit_frame_scan(spec: FilterSpec, kind: int, structure):
  """T camera frames as one lax.scan over the lane bank (the jnp twin of
  vo_bank_scan, and the non-TPU / odd-T fallback)."""
  def fn(x, P, Q, dts, zs, eas, R):
    def body(carry, inp):
      xc, Pc = carry
      dt, z, ea = inp
      xc, Pc = lane_bank.lane_predict(spec, {}, xc, Pc, Q, dt,
                                      structure=structure)
      xc, Pc, _ = lane_bank.lane_update(spec, kind, {}, xc, Pc, z, R,
                                        structure=structure, ea=ea)
      return lane_bank.lane_augment(spec, xc, Pc), None

    (x, P), _ = jax.lax.scan(body, (x, P), (dts, zs, eas))
    return x, P
  return jax.jit(fn)


class MSCKFBank(BankFacadeBase):
  """B independent sliding-window MSCKF filters of one spec, stepped as
  one compiled program. Pass a model class (duck-typed like the shipped
  models: build_spec() plus initial_x / initial_P_diag / Q / obs_noise)
  or an explicit spec= with x0/P_diag/Q. The spec must carry MSCKF block
  structure (clone window dims); the feature kind is detected from the
  spec (the kind with is_feature)."""

  def __init__(self, model=None, batch: int = 1024, *, spec=None,
               x0=None, P_diag=None, Q=None, obs_noise=None,
               dtype=jnp.float32, use_pallas: bool | None = None,
               structure='auto', t0: float = 0.0,
               max_rewind_age: float = 1.0, ckpt_every: int = 16,
               ckpt_keep: int = 8,
               ckpt_bytes: int | None = None, logger=logging):
    assert (model is None) != (spec is None), "pass a model class XOR spec="
    if model is not None:
      spec = model.build_spec()
      x0 = model.initial_x if x0 is None else x0
      P_diag = model.initial_P_diag if P_diag is None else P_diag
      Q = model.Q if Q is None else Q
      obs_noise = getattr(model, 'obs_noise', None) if obs_noise is None \
          else obs_noise
    assert isinstance(spec, FilterSpec), spec
    assert spec.is_msckf, (
        "MSCKFBank needs a clone-window spec (dim_main/dim_augment); "
        "plain specs: use runtime/generic_bank.KalmanBank")
    assert x0 is not None and P_diag is not None and Q is not None, (
        "spec= needs explicit x0/P_diag/Q")
    feature_kinds = [k for k, om in sorted(spec.obs.items())
                     if om.is_feature]
    assert feature_kinds, "MSCKF spec with no feature kind"
    self.feature_kind = feature_kinds[0]
    self.spec = spec
    self.batch = batch
    self.dtype = dtype
    self._quaternion_idxs = tuple(spec.quaternion_idxs)
    self.obs_noise = dict(obs_noise or {})
    x0 = np.asarray(x0)
    self._x0_1d = x0 if x0.ndim == 1 else np.asarray(x0[0])
    self._P_diag0 = np.asarray(P_diag)
    self.Q = jnp.asarray(Q, dtype)
    self._q_diag = tuple(float(v)
                         for v in np.diag(np.asarray(self.Q, np.float64)))
    if x0.ndim == 1:
      self._x = jnp.tile(jnp.asarray(x0, dtype), (batch, 1))
    else:
      self._x = jnp.asarray(x0, dtype)
    assert self._x.shape == (batch, spec.dim_x), self._x.shape
    self._P = jnp.tile(jnp.asarray(np.diag(self._P_diag0), dtype)[:, :, None],
                       (1, 1, batch))
    self.t = t0
    self.logger = logger

    if structure == 'auto':
      try:
        structure = sparsity.structure_for(spec, self._x0_1d)
      except Exception as e:  # undetectable structure: dense paths still work
        logger.warning(f"structure detection failed ({e}); using dense paths")
        structure = None
    self.structure = structure

    q_is_diag = bool(np.all(np.asarray(self.Q) ==
                            np.diag(np.diag(np.asarray(self.Q)))))
    if use_pallas is None:
      use_pallas = (jax.default_backend() == 'tpu'
                    and batch % pallas_bank.SUBLANES == 0 and q_is_diag
                    and structure is not None)
    elif use_pallas:
      assert q_is_diag and structure is not None, (
          "the VO kernel needs diagonal Q (static scalars) and a detected "
          "structure; pass use_pallas=False")
    self.use_pallas = use_pallas
    self.max_rewind_age = max_rewind_age
    self._ring = BankRewindRing(ckpt_every=ckpt_every, ckpt_keep=ckpt_keep,
                                ckpt_bytes=ckpt_bytes)

  # --------------------------------------------------- per-observation API

  def _default_R(self, kind):
    R = self.obs_noise.get(kind)
    if R is None:
      raise ValueError(
          f"kind {kind} has no default noise (obs_noise); pass R=")
    return R

  def observe_frame(self, t, z, ea, R=None):
    """Apply ONE timestamped camera frame (predict + nullspace-projected
    feature update + window augment) to the whole bank, with driver-style
    out-of-order handling: a late frame inside the rewind window rolls the
    bank back and replays (reference: ekf_sym.py:464-482); older than the
    window it is dropped (returns None). z is (B, dz) or (dz,) broadcast;
    ea (B, ea_len) or (ea_len,) per-lane triangulated landmark
    positions."""
    kind = self.feature_kind
    om = self.spec.obs[kind]
    if R is None:
      R = self._default_R(kind)
    z = np.asarray(z, dtype=np.float64)
    if z.ndim == 1:
      z = np.broadcast_to(z, (self.batch, z.shape[0]))
    assert z.shape == (self.batch, om.dz), (z.shape, om.dz)
    R = self._normalize_R(kind, R)
    ea = np.asarray(ea, dtype=np.float64)
    if ea.ndim == 1:
      ea = np.broadcast_to(ea, (self.batch, ea.shape[0]))
    assert ea.shape == (self.batch, om.ea_len), ea.shape
    return self._observe_ordered(t, (kind, z, R, ea, True))

  def observe(self, t, kind, z, R=None):
    """One timestamped NON-FEATURE observation (predict + update, clone
    window untouched) with the same out-of-order handling."""
    kind = int(kind)
    om = self.spec.obs[kind]
    assert not om.is_feature, "camera frames: use observe_frame()"
    assert om.ea_len == 0, (
        "extra-args non-feature kinds on MSCKF specs are not wired yet")
    if R is None:
      R = self._default_R(kind)
    z = np.asarray(z, dtype=np.float64)
    if z.ndim == 1:
      z = np.broadcast_to(z, (self.batch, z.shape[0]))
    assert z.shape == (self.batch, om.dz), (z.shape, om.dz)
    R = self._normalize_R(kind, R)
    return self._observe_ordered(t, (kind, z, R, None, False))

  def _apply_one(self, t, kind, z, R, ea, is_frame):
    dt = max(float(t) - self.t, 0.0)
    args = (self._x, self._P, self.Q, jnp.asarray(dt, self.dtype),
            jnp.asarray(z, self.dtype), jnp.asarray(R, self.dtype))
    if is_frame:
      step = _jit_frame_step(self.spec, kind, self.structure)
      self._x, self._P = step(*args, jnp.asarray(ea, self.dtype))
    else:
      step = _jit_plain_step(self.spec, kind, self.structure)
      self._x, self._P = step(*args)
    self.t = float(t)
    self._ring.record(self.t, (self._x, self._P),
                      (self.t, kind, z, R, ea, is_frame))

  # ------------------------------------------------------------------- runs

  def run_frames(self, dts, zs, eas, R=None):
    """T camera frames: dts (T,), zs (T, B, dz), eas (T, B, ea_len)
    per-frame per-lane landmark positions, R (dz, dz) shared (defaults to
    the feature kind's obs_noise). The TPU hot path is the VMEM-resident
    VO kernel (ops/pallas_bank.vo_bank_scan); other backends / odd T take
    the lane scan. Gating follows the feature kind's own maha_test flag
    on both paths (reference semantics: gating is a spec property)."""
    kind = self.feature_kind
    om = self.spec.obs[kind]
    dts = np.asarray(dts, np.float64)
    T = dts.shape[0]
    if T == 0:
      return self
    if R is None:
      R = self._default_R(kind)
    R = self._normalize_R(kind, R)
    gate = om.maha_test
    if self.use_pallas and T % 8 == 0:
      t_chunk, tile_b = self._tiles(T)
      xp, Pp = pallas_bank.pack_bank(self._x, self._P)
      zsp = pallas_bank.pack_bank_measurements(jnp.asarray(zs, self.dtype))
      easp = pallas_bank.pack_bank_measurements(jnp.asarray(eas, self.dtype))
      r_mat = tuple(tuple(float(v) for v in row) for row in R)
      xp, Pp = pallas_bank.vo_bank_scan(
          xp, Pp, zsp, easp, jnp.asarray(dts, self.dtype), spec=self.spec,
          kind=kind, q_diag=self._q_diag, r_mat=r_mat, gate=gate,
          t_chunk=t_chunk, tile_b=tile_b, structure=self.structure)
      self._x, self._P = pallas_bank.unpack_bank(xp, Pp)
    else:
      fn = _jit_frame_scan(self.spec, kind, self.structure)
      self._x, self._P = fn(
          self._x, self._P, self.Q, jnp.asarray(dts, self.dtype),
          jnp.asarray(zs, self.dtype), jnp.asarray(eas, self.dtype),
          jnp.asarray(R, self.dtype))
    self.t += float(dts.sum())
    self._ring.clear()  # bulk runs are not observation-addressable
    return self

  def run_mixed(self, dts, kind_idx, zs, kinds, R_by_kind=None, eas=None):
    """T steps of a heterogeneous schedule MIXING camera frames with other
    sensors — the reference's production flow (predict_and_observe per
    sensor, predict_and_update_batch(augment=True) per camera frame,
    ekf_sym.py:458-531) as ONE compiled scan: kinds is the static kind
    set, kind_idx (T,) indexes into it; steps whose kind is the feature
    kind run predict + projected feature update + window AUGMENT, other
    steps predict + update. zs (T, B, max_dz) rows padded to the largest
    dz; eas (T, B, ea_len) landmark rows (used only on feature steps;
    required iff the schedule includes the feature kind). On TPU the whole
    schedule runs VMEM-resident (generic_bank_scan_mixed — its kind
    switch carries a camera-frame branch, phase-split for the
    composition); other backends / odd T take the lane scan (a lax.switch
    whose feature branch augments). Per-kind R defaults to obs_noise."""
    kinds = tuple(int(k) for k in kinds)
    dts = np.asarray(dts, np.float64)
    T = dts.shape[0]
    if T == 0:
      return self
    if R_by_kind is None:
      R_by_kind = {k: self._default_R(k) for k in kinds}
    R_by_kind = {k: self._normalize_R(k, R_by_kind[k]) for k in kinds}
    has_feature = any(self.spec.obs[k].is_feature for k in kinds)
    assert (eas is None) == (not has_feature)
    if self.use_pallas and T % 8 == 0:
      # VMEM-resident mixed kernel: the kind switch carries a camera-frame
      # branch (feature update + augment; phase-split for the composition)
      t_chunk, tile_b = self._tiles(T)
      xp, Pp = pallas_bank.pack_bank(self._x, self._P)
      zsp = pallas_bank.pack_bank_measurements(jnp.asarray(zs, self.dtype))
      easp = (pallas_bank.pack_bank_measurements(
          jnp.asarray(eas, self.dtype)) if eas is not None else None)
      r_mats = tuple(tuple(tuple(float(v) for v in row)
                           for row in R_by_kind[k]) for k in kinds)
      xp, Pp = pallas_bank.generic_bank_scan_mixed(
          xp, Pp, zsp, jnp.asarray(dts, self.dtype),
          jnp.asarray(kind_idx, jnp.int32), easp, spec=self.spec,
          kinds=kinds, q_diag=self._q_diag, r_mats=r_mats, gate=True,
          t_chunk=t_chunk, tile_b=tile_b, structure=self.structure)
      self._x, self._P = pallas_bank.unpack_bank(xp, Pp)
    else:
      # the shared lane twin: its feature branches augment, matching the
      # kernel (ops/lane_bank.lane_mixed_bank_scan)
      fn = lane_bank.jit_lane_mixed_bank_scan(self.spec, kinds,
                                              self.structure)
      R_list = tuple(jnp.asarray(R_by_kind[k], self.dtype) for k in kinds)
      self._x, self._P = fn(
          {}, self._x, self._P, self.Q, jnp.asarray(dts, self.dtype),
          jnp.asarray(kind_idx, jnp.int32), jnp.asarray(zs, self.dtype),
          R_list,
          eas=None if eas is None else jnp.asarray(eas, self.dtype))
    self.t += float(dts.sum())
    self._ring.clear()
    return self

  def run(self, dts, zs, kind, R=None):
    """T fused predict+update steps of one NON-FEATURE kind (clone window
    untouched): dts (T,), zs (T, B, dz), R (dz, dz) shared. Lane path —
    the MSCKF block predict keeps the clone blocks exact
    (lane_bank.lane_predict, ekf_c.c:17-29 semantics)."""
    kind = int(kind)
    om = self.spec.obs[kind]
    assert not om.is_feature, "camera frames: use run_frames()"
    assert om.ea_len == 0, (
        "extra-args non-feature kinds on MSCKF specs are not wired yet")
    dts = np.asarray(dts, np.float64)
    T = dts.shape[0]
    if T == 0:
      return self
    if R is None:
      R = self._default_R(kind)
    R = self._normalize_R(kind, R)
    fn = lane_bank.jit_lane_bank_scan(self.spec, kind, self.structure)
    self._x, self._P = fn(
        {}, self._x, self._P, self.Q, jnp.asarray(dts, self.dtype),
        jnp.asarray(zs, self.dtype), jnp.asarray(R, self.dtype))
    self.t += float(dts.sum())
    self._ring.clear()
    return self
