"""On-device streaming: a heterogeneous observation log as ONE lax.scan.

The host driver (runtime/driver.py) dispatches one jitted step per
observation — the right shape for online use (data arrives one sample at a
time), but for offline replay of a recorded log it pays a host->device
dispatch per observation. This module compiles the WHOLE log into a single
XLA program: `lax.scan` over time with `lax.switch` over observation kinds.

Heterogeneous measurement dimensions are handled by padding every observation
to the largest dz and giving padded slots a huge variance (PAD_R = 1e16) so
they carry zero information — the same soft-nulling trick the reference uses
for Mahalanobis rejection (ekf_c.c:92). Padded rows of H are exactly zero, so
with R_pad on the diagonal the padded slots change neither gain nor
covariance (verified to oracle precision in tests/test_scan_stream.py).
"""

from __future__ import annotations

import functools
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from rednose_tpu.core import step as step_ops
from rednose_tpu.core.spec import FilterSpec

Array = Any

# Padded-slot variance. Large enough to be information-free (leak ~1e-12
# relative), small enough that float32 closed-form 3x3 solves on S containing
# PAD_R entries cannot overflow (adjugate terms are products of three
# entries; 1e16 would push them past f32 max).
PAD_R = 1.0e12


def _padded_update(spec: FilterSpec, kind: int, max_dz: int, params, x, P,
                   z_pad, R_pad, ea):
  """One update with z/R padded to max_dz: real h/H rows for this kind's dz,
  zero rows + huge R for the padding (information-free).

  Returns only (x, P): per-kind innovations have kind-dependent shapes
  (feature kinds project y down to dz - ea_dim), which lax.switch cannot
  unify across branches."""
  om = spec.obs[kind]
  dz = om.dz

  def h_padded(params, xx, ee):
    h = om.h(params, xx, ee)
    return jnp.concatenate([h, jnp.zeros((max_dz - dz,), dtype=h.dtype)])

  import dataclasses

  om_pad = dataclasses.replace(om, h=h_padded, dz=max_dz,
                               maha_thresh=om.maha_thresh)
  spec_pad = dataclasses.replace(spec, obs={**dict(spec.obs), kind: om_pad})
  x_new, P_new, _ = step_ops.update(
      spec_pad, kind, params, x, P, z_pad, R_pad, ea[:max(om.ea_len, 1)])
  return x_new, P_new


def build_scan_stream(spec: FilterSpec, kinds: Sequence[int]):
  """Compile-time setup: returns (scan_fn, kind_index) where scan_fn runs an
  entire mixed-kind log on device. Cached on (spec, kinds): repeated calls
  return the same jitted function, so nothing re-traces or re-compiles.

  kinds: the observation kinds that may appear in the stream (static).
  scan_fn(params, x, P, Q, dts, kind_idx, zs, Rs, eas) ->
      ((x, P), (x_preds, P_preds, x_posts, P_posts)) with
    dts (T,) per-step time deltas. IMPORTANT: deltas, not absolute
      timestamps — absolute times (e.g. unix epoch ~1.7e9 s) differenced
      after a float32 cast would quantize dt to 256 s; pad_log computes the
      deltas host-side in float64 where they are exact,
    kind_idx (T,) int32 index into `kinds`,
    zs (T, max_dz) padded measurements,
    Rs (T, max_dz, max_dz) padded noise (PAD_R diagonal on padded slots),
    eas (T, max_ea) padded extra args.
  """
  return _build_scan_stream_cached(spec, tuple(kinds))


@functools.lru_cache(maxsize=None)
def _build_scan_stream_cached(spec: FilterSpec, kinds: tuple):
  max_dz = max(spec.obs[k].dz for k in kinds)

  branches = tuple(
      functools.partial(_padded_update, spec, k, max_dz) for k in kinds)

  def scan_fn(params, x, P, Q, dts, kind_idx, zs, Rs, eas):
    def body(carry, inp):
      x, P = carry
      dt, ki, z, R, ea = inp
      x_pred, P_pred = step_ops.predict(spec, params, x, P, Q, dt)
      x, P = jax.lax.switch(
          ki, branches, params, x_pred, P_pred, z, R, ea)
      # per-step (pred, post) pairs: exactly the smoother's inputs
      # (the device-side half of the driver's 9-tuple Estimate)
      return (x, P), (x_pred, P_pred, x, P)

    return jax.lax.scan(body, (x, P), (dts, kind_idx, zs, Rs, eas))

  return jax.jit(scan_fn), {k: i for i, k in enumerate(kinds)}


def pad_log(spec: FilterSpec, kinds: Sequence[int], log, t0: float = 0.0,
            dtype=np.float64):
  """Host-side packing of a list of (t, kind, z, R, ea) into the padded
  arrays build_scan_stream expects. Timestamps are differenced HERE, in
  float64, so absolute epochs survive a float32 device dtype. R defaults
  per-kind are the caller's concern; here R must be given per record."""
  kinds = tuple(kinds)
  kind_to_idx = {k: i for i, k in enumerate(kinds)}
  max_dz = max(spec.obs[k].dz for k in kinds)
  max_ea = max(max(spec.obs[k].ea_len, 1) for k in kinds)
  T = len(log)
  dts = np.zeros((T,), dtype=dtype)
  ki = np.zeros((T,), dtype=np.int32)
  zs = np.zeros((T, max_dz), dtype=dtype)
  Rs = np.zeros((T, max_dz, max_dz), dtype=dtype)
  eas = np.zeros((T, max_ea), dtype=dtype)
  t_prev = np.float64(t0)
  for i, rec in enumerate(log):
    t, kind, z, R = rec[0], rec[1], np.asarray(rec[2]).reshape(-1), rec[3]
    ea = np.asarray(rec[4]).reshape(-1) if len(rec) > 4 and rec[4] is not None \
        else np.zeros(0)
    dz = spec.obs[kind].dz
    assert z.shape[0] == dz, (kind, z.shape)
    if np.float64(t) < t_prev:
      raise ValueError(
          f"log timestamps must be non-decreasing (record {i}: {t} < "
          f"{t_prev}); out-of-order streams belong to the host driver's "
          "rewind/replay path, not the device scan")
    dts[i] = np.float64(t) - t_prev
    t_prev = np.float64(t)
    ki[i] = kind_to_idx[kind]
    zs[i, :dz] = z
    Rs[i] = np.eye(max_dz) * PAD_R
    Rs[i, :dz, :dz] = np.asarray(R).reshape(dz, dz)
    eas[i, :ea.shape[0]] = ea
  return dts, ki, zs, Rs, eas
