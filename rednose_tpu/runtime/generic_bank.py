"""Production facade for wide banks of ANY scatter-free spec.

LiveKalmanBank (runtime/live_bank.py) gives the flagship live model bank
ergonomics on top of its hand-derived kernels; this facade gives the SAME
surface to an arbitrary user FilterSpec on top of the automatic paths:
the entry-level generic Pallas kernels (ops/pallas_bank.py — VMEM-resident
state, structural-interpreter minimal bodies) on TPU, the lane-major jnp
scans (ops/lane_bank.py) elsewhere. In the reference every gen_code filter
is automatically a fast filter (site_scons/site_tools/rednose_filter.py:
40-48); this is that promise at bank scale — build a spec, get the kernel.

    bank = KalmanBank(MyModel, batch=8192)        # or KalmanBank(spec=...)
    bank.run(dts, zs, kind)                        # single-kind stream
    bank.run_mixed(dts, kind_idx, zs, kinds)       # heterogeneous schedule
    bank.observe(t, kind, z)                       # out-of-order tolerant
    bank.x, bank.P                                 # (B, dim_x), (B, de, de)

Non-feature extra-args kinds (the loc_kf pseudorange family) stream their
per-measurement satellite states through ``eas=`` on every surface.
Outlier gating is a spec property (each kind's own maha_test flag), as in
the reference's baked per-kind thresholds (ekf_sym.py:144-152).
"""

from __future__ import annotations

import functools
import logging
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from rednose_tpu.core.spec import FilterSpec
from rednose_tpu.ops import lane_bank, pallas_bank, sparsity
from rednose_tpu.runtime.bank_facade import BankFacadeBase
from rednose_tpu.runtime.rewind import BankRewindRing


@functools.lru_cache(maxsize=None)
def _jit_step(spec: FilterSpec, kind: int, structure, has_ea: bool):
  """One fused lane predict+update, jitted per kind (the observe() hot
  path: per-tick streaming is dispatch-latency-bound, so the fused batch
  kernels stay reserved for run()/run_mixed()). `params` is a traced
  pytree argument — set_global updates reach the compiled program with
  zero recompilation (the reference's mutable-C-global pattern,
  ekf_sym.py:129-132)."""
  if has_ea:
    def fn(params, x, P, Q, dt, z, R, ea):
      x, P = lane_bank.lane_predict(spec, params, x, P, Q, dt,
                                    structure=structure)
      x, P, _ = lane_bank.lane_update(spec, kind, params, x, P, z, R,
                                      structure=structure, ea=ea)
      return x, P
  else:
    def fn(params, x, P, Q, dt, z, R):
      x, P = lane_bank.lane_predict(spec, params, x, P, Q, dt,
                                    structure=structure)
      x, P, _ = lane_bank.lane_update(spec, kind, params, x, P, z, R,
                                      structure=structure)
      return x, P
  return jax.jit(fn)


class KalmanBank(BankFacadeBase):
  """B independent filters of one arbitrary spec, stepped as one compiled
  program. Pass either a model class (duck-typed like the shipped models:
  build_spec() plus initial_x / initial_P_diag / Q / obs_noise attrs) or
  an explicit spec= with x0/P_diag/Q. State/time/OOO-rewind/divergence/
  save-load live in BankFacadeBase; this class owns spec handling and the
  automatic kernel selection."""

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
    assert not spec.is_msckf, (
        "MSCKF block specs: use runtime/msckf_bank.MSCKFBank (camera "
        "frames need the predict+feature-update+augment step shape)")
    assert x0 is not None and P_diag is not None and Q is not None, (
        "spec= needs explicit x0/P_diag/Q")
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

    # structural sparsity: the automatic analog of the reference codegen's
    # simplification pass — detected once per spec, drives both the
    # entry-level kernel body and the lane fast paths
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
                    and batch % pallas_bank.SUBLANES == 0 and q_is_diag)
    elif use_pallas and not q_is_diag:
      raise ValueError(
          "the fused Pallas path supports diagonal Q only (carried as "
          "static diagonal scalars); pass use_pallas=False")
    self.use_pallas = use_pallas
    self.max_rewind_age = max_rewind_age
    self._ring = BankRewindRing(ckpt_every=ckpt_every, ckpt_keep=ckpt_keep,
                                ckpt_bytes=ckpt_bytes)
    # runtime-tunable params (the reference's global_vars + set_<var>
    # setters, ekf_sym.py:129-132): traced into the lane programs (zero
    # recompile on set_global), static scalars in the kernels — per-step
    # variation streams through ps_keys/pss on run()/run_mixed()
    self.params = dict(spec.default_params)

  def set_global(self, key: str, value):
    """Update one runtime param (reference: set_<global_name>). Lane-path
    programs see the new value with no recompilation; the fused kernels
    carry non-streamed params as compile-time constants, so prefer the
    ps_keys/pss streams for values that change at sensor rate."""
    assert key in self.params, (key, sorted(self.params))
    self.params[key] = value

  def _static_params(self, ps_keys=()):
    """self.params minus the streamed keys, as the kernels' static (name,
    float) tuple; raises if a non-scalar param would need the lane path."""
    out = []
    for k in sorted(self.params):
      if k in ps_keys:
        continue
      v = np.asarray(self.params[k])
      assert v.ndim == 0, (
          f"param {k!r} is not a scalar ({v.shape}); array params need "
          "the lane path (use_pallas=False)")
      out.append((k, float(v)))
    return tuple(out)

  # --------------------------------------------------- per-observation API

  def _default_R(self, kind):
    R = self.obs_noise.get(kind)
    if R is None:
      raise ValueError(
          f"kind {kind} has no default noise (obs_noise); pass R=")
    return R

  # _normalize_R lives in BankFacadeBase (one R contract for every surface)

  def observe(self, t, kind, z, R=None, ea=None):
    """Apply ONE timestamped observation to the whole bank with driver-style
    out-of-order handling (ekf_sym.py:464-482 / ekf_sym.cc:83-156): a late
    observation inside the rewind window rolls the bank back to the newest
    snapshot at-or-before t and replays the buffered observations around
    it; older than the window it is dropped (returns None). z is (B, dz) or
    (dz,) broadcast across lanes; ea likewise ((B, ea_len) or (ea_len,))
    for extra-args kinds."""
    kind = int(kind)
    om = self.spec.obs[kind]
    if R is None:
      R = self._default_R(kind)
    z = np.asarray(z, dtype=np.float64)
    if z.ndim == 1:
      z = np.broadcast_to(z, (self.batch, z.shape[0]))
    assert z.shape == (self.batch, om.dz), (z.shape, om.dz)
    R = self._normalize_R(kind, R)
    if om.ea_len:
      assert ea is not None, f"kind {kind} takes {om.ea_len} extra args"
      ea = np.asarray(ea, dtype=np.float64)
      if ea.ndim == 1:
        ea = np.broadcast_to(ea, (self.batch, ea.shape[0]))
      assert ea.shape == (self.batch, om.ea_len), ea.shape
    else:
      assert ea is None, f"kind {kind} takes no extra args"
    return self._observe_ordered(t, (kind, z, R, ea))

  def _apply_one(self, t, kind, z, R, ea):
    dt = max(float(t) - self.t, 0.0)
    om = self.spec.obs[kind]
    step = _jit_step(self.spec, kind, self.structure, om.ea_len > 0)
    args = (self.params, self._x, self._P, self.Q,
            jnp.asarray(dt, self.dtype), jnp.asarray(z, self.dtype),
            jnp.asarray(R, self.dtype))
    if om.ea_len:
      args = args + (jnp.asarray(ea, self.dtype),)
    self._x, self._P = step(*args)
    self.t = float(t)
    self._ring.record(self.t, (self._x, self._P), (self.t, kind, z, R, ea))

  # ------------------------------------------------------------------- runs

  def run(self, dts, zs, kind, R=None, eas=None, pss=None, ps_keys=()):
    """T fused predict+update steps of one kind: dts (T,), zs (T, B, dz),
    R (dz, dz) shared (defaults to the model's obs_noise), eas
    (T, B, ea_len) for extra-args kinds. Advances bank time by sum(dts)
    (host float64).

    Per-STEP runtime params (the reference's global_vars at sensor rate —
    e.g. CarKalman's forward speed + commanded steering angle): ps_keys
    is a static tuple of param names, pss (T, len(ps_keys)) their
    per-step values; each step's params = self.params overlaid with its
    row. Streams through SMEM on the kernel path, scanned on the lane
    path — same semantics either way."""
    kind = int(kind)
    om = self.spec.obs[kind]
    ps_keys = tuple(ps_keys)
    dts = np.asarray(dts, np.float64)
    T = dts.shape[0]
    if T == 0:
      return self
    if R is None:
      R = self._default_R(kind)
    R = self._normalize_R(kind, R)  # same contract as observe()
    assert (eas is None) == (om.ea_len == 0)
    assert (pss is None) == (len(ps_keys) == 0)
    # the kernel's SMEM dts stream needs t_chunk >= 8: odd-length runs
    # take the lane path (Mosaic block-shape rule, see CLAUDE.md)
    if self.use_pallas and T % 8 == 0:
      t_chunk, tile_b = self._tiles(T)
      xp, Pp = pallas_bank.pack_bank(self._x, self._P)
      zsp = pallas_bank.pack_bank_measurements(jnp.asarray(zs, self.dtype))
      easp = (pallas_bank.pack_bank_measurements(
          jnp.asarray(eas, self.dtype)) if eas is not None else None)
      r_mat = tuple(tuple(float(v) for v in row) for row in R)
      xp, Pp = pallas_bank.generic_bank_scan(
          xp, Pp, zsp, jnp.asarray(dts, self.dtype), easp,
          None if pss is None else jnp.asarray(pss, self.dtype),
          spec=self.spec, kind=kind, q_diag=self._q_diag, r_mat=r_mat,
          gate=om.maha_test, t_chunk=t_chunk, tile_b=tile_b,
          structure=self.structure, ps_keys=ps_keys,
          base_params=self._static_params(ps_keys))
      self._x, self._P = pallas_bank.unpack_bank(xp, Pp)
    else:
      fn = lane_bank.jit_lane_bank_scan(self.spec, kind, self.structure,
                                        ps_keys)
      self._x, self._P = fn(
          self.params, self._x, self._P, self.Q,
          jnp.asarray(dts, self.dtype), jnp.asarray(zs, self.dtype),
          jnp.asarray(R, self.dtype),
          eas=None if eas is None else jnp.asarray(eas, self.dtype),
          pss=None if pss is None else jnp.asarray(pss, self.dtype))
    self.t += float(dts.sum())
    self._ring.clear()  # bulk runs are not observation-addressable
    return self

  # run_epochs lives in BankFacadeBase (entry-level kernels work for any
  # spec, so every facade shares one implementation)

  def run_mixed(self, dts, kind_idx, zs, kinds: Sequence[int],
                R_by_kind=None, eas=None, pss=None, ps_keys=()):
    """T steps of a heterogeneous sensor schedule: kinds is the static kind
    set, kind_idx (T,) indexes into it, zs (T, B, max_dz) rows padded to
    the largest dz, eas (T, B, max_ea_len) likewise (required iff some
    kind takes extra args). Per-kind R defaults to the model's obs_noise.
    Per-step runtime params via ps_keys/pss as in run()."""
    kinds = tuple(int(k) for k in kinds)
    ps_keys = tuple(ps_keys)
    max_ea = max(self.spec.obs[k].ea_len for k in kinds)
    dts = np.asarray(dts, np.float64)
    T = dts.shape[0]
    if T == 0:
      return self
    if R_by_kind is None:
      R_by_kind = {k: self._default_R(k) for k in kinds}
    R_by_kind = {k: self._normalize_R(k, R_by_kind[k]) for k in kinds}
    assert (eas is None) == (max_ea == 0)
    assert (pss is None) == (len(ps_keys) == 0)
    if self.use_pallas and T % 8 == 0:
      t_chunk, tile_b = self._tiles(T)
      xp, Pp = pallas_bank.pack_bank(self._x, self._P)
      zsp = pallas_bank.pack_bank_measurements(jnp.asarray(zs, self.dtype))
      easp = (pallas_bank.pack_bank_measurements(
          jnp.asarray(eas, self.dtype)) if eas is not None else None)
      r_mats = tuple(tuple(tuple(float(v) for v in row)
                           for row in R_by_kind[k])
                     for k in kinds)
      xp, Pp = pallas_bank.generic_bank_scan_mixed(
          xp, Pp, zsp, jnp.asarray(dts, self.dtype),
          jnp.asarray(kind_idx, jnp.int32), easp,
          None if pss is None else jnp.asarray(pss, self.dtype),
          spec=self.spec, kinds=kinds, q_diag=self._q_diag, r_mats=r_mats,
          gate=True, t_chunk=t_chunk, tile_b=tile_b,
          structure=self.structure, ps_keys=ps_keys,
          base_params=self._static_params(ps_keys))
      self._x, self._P = pallas_bank.unpack_bank(xp, Pp)
    else:
      fn = lane_bank.jit_lane_mixed_bank_scan(self.spec, kinds,
                                              self.structure, ps_keys)
      R_list = tuple(jnp.asarray(R_by_kind[k], self.dtype) for k in kinds)
      self._x, self._P = fn(
          self.params, self._x, self._P, self.Q,
          jnp.asarray(dts, self.dtype), jnp.asarray(kind_idx, jnp.int32),
          jnp.asarray(zs, self.dtype), R_list,
          eas=None if eas is None else jnp.asarray(eas, self.dtype),
          pss=None if pss is None else jnp.asarray(pss, self.dtype))
    self.t += float(dts.sum())
    self._ring.clear()  # bulk runs are not observation-addressable
    return self
