"""Full-scope MSCKF acceptance stream — the test_compare pattern
(reference examples/test_compare.py:104-120) for the sliding-window
filter family: ONE long randomized VIO stream of camera frames (projected
feature update + window augment) interleaved with position fixes, with
(a) out-of-order swaps inside the rewind window, (b) a too-old drop, and
(c) a mid-stream divergence + per-lane elastic reset event, driven
through THREE engines:

  1. MSCKFBank.observe_frame/observe (per-observation, sparse-snapshot
     OOO rewind ring),
  2. MSCKFBank.run_mixed on the lane path (one compiled scan whose
     feature branches augment),
  3. the mixed KERNEL path (generic_bank_scan_mixed in interpret mode —
     the camera-frame branch + nested phase switch for the composition),

each asserted against the sequential core/step.py oracle. Runs the
ESKFxMSCKF composition (models/msckf_eskf) — the reference's joint
msckf_params + eskf_params machinery — end to end."""

import jax.numpy as jnp
import numpy as np
import pytest

from rednose_tpu.core import step as step_ops
from rednose_tpu.models.msckf_eskf import (
    MSCKFEskf,
    ObservationKind as EK,
)
from rednose_tpu.ops import pallas_bank, sparsity
from rednose_tpu.runtime.msckf_bank import MSCKFBank

B = 8
N_OBS = 40
DT = 0.05
FEAT = int(EK.MSCKF_FEATURE)
POS = int(EK.POSITION)
# delivery-order swap pairs (i, i+1 exchanged); chosen away from each
# other so each late observation rewinds over exactly one neighbor
SWAPS = ((10, 11), (24, 25))


def _stream(seed=0):
  """Sorted schedule [(t, kind, z (B, dz), ea (B, 3)|None)]."""
  spec = MSCKFEskf.build_spec()
  om = spec.obs[FEAT]
  rng = np.random.RandomState(seed)
  x0 = np.asarray(MSCKFEskf.initial_x, np.float64)
  xs = np.tile(x0, (B, 1)) + 0.02 * rng.randn(B, spec.dim_x)
  for a in range(spec.n_augment):
    o = spec.dim_main + spec.dim_augment * a
    xs[:, o:o + 3] += 0.5 * rng.randn(3)[None]
  for idx in spec.quaternion_idxs:
    q = xs[:, idx:idx + 4]
    xs[:, idx:idx + 4] = q / np.linalg.norm(q, axis=1, keepdims=True)

  sched = []
  for i in range(N_OBS):
    t = DT * (i + 1)
    if i % 3 == 2:
      z = xs[:, :3] + 0.5 * rng.randn(B, 3)
      sched.append((t, POS, z, None))
    else:
      ea = np.array([1.0, 0.5, 6.0])[None] + 0.1 * rng.randn(B, 3)
      z = np.stack([
          np.asarray(om.h({}, jnp.asarray(xs[i2]), jnp.asarray(ea[i2])))
          for i2 in range(B)]) + 0.005 * rng.randn(B, om.dz)
      sched.append((t, FEAT, z, ea))
  return spec, om, xs, sched


def _oracle(spec, model, xs, sched, R_feat, R_pos):
  Q = jnp.asarray(model.Q, jnp.float64)
  outs_x, outs_P = [], []
  for i in range(B):
    x = jnp.asarray(xs[i], jnp.float64)
    P = jnp.asarray(np.diag(model.initial_P_diag), jnp.float64)
    t_prev = 0.0
    for t, kind, z, ea in sched:
      x, P = step_ops.predict(spec, {}, x, P, Q, t - t_prev)
      t_prev = t
      R = R_feat if kind == FEAT else R_pos
      x, P, _ = step_ops.update(
          spec, kind, {}, x, P, jnp.asarray(z[i], jnp.float64),
          jnp.asarray(R, jnp.float64),
          None if ea is None else jnp.asarray(ea[i], jnp.float64))
      if kind == FEAT:
        x, P = step_ops.augment(spec, x, P)
    outs_x.append(np.asarray(x))
    outs_P.append(np.asarray(P))
  return np.stack(outs_x), np.stack(outs_P, axis=-1)


@pytest.mark.slow
def test_msckf_acceptance_three_engines():
  spec, om, xs, sched = _stream()
  R_feat = np.eye(om.dz) * 0.01**2
  R_pos = np.eye(3) * 1.0
  xo, Po = _oracle(spec, MSCKFEskf, xs, sched, R_feat, R_pos)

  # ---- engine 1: per-observation OOO stream (swapped delivery order)
  order = list(range(N_OBS))
  for a, b in SWAPS:
    order[a], order[b] = order[b], order[a]
  bank = MSCKFBank(MSCKFEskf, batch=B, dtype=jnp.float64, x0=xs,
                   ckpt_every=1, max_rewind_age=10.0)
  for i in order:
    t, kind, z, ea = sched[i]
    if kind == FEAT:
      r = bank.observe_frame(t, z, ea, R=R_feat)
    else:
      r = bank.observe(t, kind, z, R=R_pos)
    assert r is not None, (i, t)
  # too-old drop leaves state untouched
  x_now = np.asarray(bank.x)
  assert bank.observe(-5.0, POS, sched[2][2], R=R_pos) is None
  np.testing.assert_array_equal(np.asarray(bank.x), x_now)
  np.testing.assert_allclose(np.asarray(bank.x), xo, rtol=1e-8, atol=1e-9)
  np.testing.assert_allclose(np.asarray(bank._P), Po, rtol=1e-7,
                             atol=1e-8)

  # divergence + per-lane elastic reset: poison two lanes, reset only them
  bad = np.asarray(bank.x).copy()
  bad[1, 3:7] = 50.0  # quaternion norm far outside the window
  bad[5] = np.nan
  bank._x = jnp.asarray(bad)
  n_reset = bank.reset_diverged()
  assert n_reset == 2
  xr = np.asarray(bank.x)
  np.testing.assert_allclose(xr[0], xo[0], rtol=1e-8, atol=1e-9)
  np.testing.assert_array_equal(xr[1], np.asarray(bank._x0_1d))
  assert np.isfinite(xr).all()

  # ---- engine 2: bulk run_mixed on the lane path
  dts = np.full((N_OBS,), DT)
  kind_idx = np.array([0 if k == POS else 1 for _, k, _, _ in sched],
                      np.int32)
  max_dz = max(om.dz, 3)
  zs = np.zeros((N_OBS, B, max_dz))
  eas = np.zeros((N_OBS, B, om.ea_len))
  for i, (t, kind, z, ea) in enumerate(sched):
    zs[i, :, :z.shape[1]] = z
    if ea is not None:
      eas[i] = ea
  bank2 = MSCKFBank(MSCKFEskf, batch=B, dtype=jnp.float64, x0=xs)
  bank2.run_mixed(dts, kind_idx, zs, (POS, FEAT),
                  R_by_kind={POS: R_pos, FEAT: R_feat}, eas=eas)
  np.testing.assert_allclose(np.asarray(bank2.x), xo, rtol=1e-8,
                             atol=1e-9)
  np.testing.assert_allclose(np.asarray(bank2._P), Po, rtol=1e-7,
                             atol=1e-8)

  # ---- engine 3: the mixed KERNEL (interpret mode, f32) on a prefix
  # (interpret emulation is slow: 8 steps validate the kernel engine)
  Tk = 8
  st = sparsity.structure_for(spec, MSCKFEskf.initial_x)
  f32 = jnp.float32
  Ps0 = np.tile(np.diag(MSCKFEskf.initial_P_diag)[..., None], (1, 1, B))
  r_mats = (tuple(tuple(float(v) for v in row) for row in R_pos),
            tuple(tuple(float(v) for v in row) for row in R_feat))
  xp, Pp = pallas_bank.pack_bank(jnp.asarray(xs, f32),
                                 jnp.asarray(Ps0, f32))
  zsp = pallas_bank.pack_bank_measurements(jnp.asarray(zs[:Tk], f32))
  easp = pallas_bank.pack_bank_measurements(jnp.asarray(eas[:Tk], f32))
  xo_p, Po_p = pallas_bank.generic_bank_scan_mixed(
      xp, Pp, zsp, jnp.asarray(dts[:Tk], f32),
      jnp.asarray(kind_idx[:Tk]), easp, spec=spec, kinds=(POS, FEAT),
      q_diag=tuple(float(v) for v in np.diag(MSCKFEskf.Q)),
      r_mats=r_mats, gate=True, t_chunk=4, tile_b=8, interpret=True,
      structure=st)
  xk, _ = pallas_bank.unpack_bank(xo_p, Po_p)
  xo8, _ = _oracle(spec, MSCKFEskf, xs, sched[:Tk], R_feat, R_pos)
  np.testing.assert_allclose(np.asarray(xk), xo8, rtol=5e-4, atol=5e-4)
