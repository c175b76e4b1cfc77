"""MSCKFBank production facade: B-wide sliding-window MSCKF banks —
additive (models/msckf_vo) AND the ESKFxMSCKF composition
(models/msckf_eskf, the reference's joint msckf_params + eskf_params
path, ekf_sym.py:57-66) — with camera-frame bulk runs, out-of-order
observe_frame(), and non-feature observations, all parity-tested against
the core/step.py oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from rednose_tpu.core import step as step_ops
from rednose_tpu.models.msckf_eskf import (
    MSCKFEskf,
    ObservationKind as EK,
)
from rednose_tpu.models.msckf_vo import (
    MSCKFVisualOdometry,
    ObservationKind as VK,
)
from rednose_tpu.runtime.msckf_bank import MSCKFBank

B = 8


def _frame_data(model, T, seed=0, spread=0.5):
  """T frames of (z, ea) consistent with a bank around the model x0."""
  spec = model.build_spec()
  kind = next(k for k, om in sorted(spec.obs.items()) if om.is_feature)
  om = spec.obs[kind]
  rng = np.random.RandomState(seed)
  x0 = np.asarray(model.initial_x, np.float64)
  xs = np.tile(x0, (B, 1)) + 0.02 * rng.randn(B, spec.dim_x)
  # spread the clone window so He has full column rank
  for a in range(spec.n_augment):
    o = spec.dim_main + spec.dim_augment * a
    xs[:, o:o + 3] += spread * rng.randn(3)[None]
  for idx in spec.quaternion_idxs:
    q = xs[:, idx:idx + 4]
    xs[:, idx:idx + 4] = q / np.linalg.norm(q, axis=1, keepdims=True)
  eas = np.array([1.0, 0.5, 6.0])[None, None] + 0.1 * rng.randn(T, B, 3)
  zs = np.stack([np.stack([
      np.asarray(om.h({}, jnp.asarray(xs[i]), jnp.asarray(eas[t, i])))
      + 0.005 * rng.randn(om.dz) for i in range(B)]) for t in range(T)])
  return spec, kind, om, xs, eas, zs


def _oracle(spec, model, kind, xs, steps):
  """Sequential core/step oracle over `steps` = [(dt, kind_or_None, z, ea,
  augment)] per bank lane; returns (B, dim_x), (de, de, B)."""
  Q = jnp.asarray(model.Q, jnp.float64)
  outs_x, outs_P = [], []
  for i in range(B):
    x = jnp.asarray(xs[i], jnp.float64)
    P = jnp.asarray(np.diag(model.initial_P_diag), jnp.float64)
    for dt, k, z, R, ea, augment in steps(i):
      x, P = step_ops.predict(spec, {}, x, P, Q, dt)
      if z is not None:
        x, P, _ = step_ops.update(
            spec, k, {}, x, P, jnp.asarray(z, jnp.float64),
            jnp.asarray(R, jnp.float64),
            None if ea is None else jnp.asarray(ea, jnp.float64))
      if augment:
        x, P = step_ops.augment(spec, x, P)
    outs_x.append(np.asarray(x))
    outs_P.append(np.asarray(P))
  return np.stack(outs_x), np.stack(outs_P, axis=-1)


@pytest.mark.parametrize("model", [MSCKFVisualOdometry, MSCKFEskf],
                         ids=["additive", "eskf_composition"])
def test_run_frames_matches_oracle(model):
  T = 3
  spec, kind, om, xs, eas, zs = _frame_data(model, T)
  bank = MSCKFBank(model, batch=B, dtype=jnp.float64, x0=xs)
  dts = np.full((T,), 0.05)
  R = np.eye(om.dz) * 0.01**2
  bank.run_frames(dts, zs, eas, R=R)

  def steps(i):
    return [(dts[t], kind, zs[t, i], R, eas[t, i], True) for t in range(T)]

  xo, Po = _oracle(spec, model, kind, xs, steps)
  np.testing.assert_allclose(np.asarray(bank.x), xo, rtol=1e-9, atol=1e-10)
  np.testing.assert_allclose(np.asarray(bank._P), Po, rtol=1e-8, atol=1e-9)
  assert abs(bank.t - dts.sum()) < 1e-12


def test_observe_frame_and_plain_match_oracle():
  """Interleaved camera frames (augment) + position fixes (no augment)
  through the per-observation API == the oracle sequence."""
  model = MSCKFEskf
  T = 2
  spec, kind, om, xs, eas, zs = _frame_data(model, T, seed=1)
  pos_kind = int(EK.POSITION)
  Rp = np.eye(3) * 1.0
  zpos = xs[:, 0:3] + 0.1 * np.random.RandomState(2).randn(B, 3)
  R = np.eye(om.dz) * 0.01**2

  bank = MSCKFBank(model, batch=B, dtype=jnp.float64, x0=xs)
  bank.observe_frame(0.05, zs[0], eas[0], R=R)
  bank.observe(0.10, pos_kind, zpos, R=Rp)
  bank.observe_frame(0.15, zs[1], eas[1], R=R)

  def steps(i):
    return [(0.05, kind, zs[0, i], R, eas[0, i], True),
            (0.05, pos_kind, zpos[i], Rp, None, False),
            (0.05, kind, zs[1, i], R, eas[1, i], True)]

  xo, Po = _oracle(spec, model, kind, xs, steps)
  np.testing.assert_allclose(np.asarray(bank.x), xo, rtol=1e-9, atol=1e-10)
  np.testing.assert_allclose(np.asarray(bank._P), Po, rtol=1e-8, atol=1e-9)


def test_observe_frame_out_of_order():
  """A late camera frame inside the rewind window produces the same bank
  state as the sorted stream (rewind + replay, ekf_sym.py:464-482)."""
  model = MSCKFVisualOdometry
  T = 3
  spec, kind, om, xs, eas, zs = _frame_data(model, T, seed=3)
  R = np.eye(om.dz) * 0.01**2
  ts = [0.05, 0.10, 0.15]

  sorted_bank = MSCKFBank(model, batch=B, dtype=jnp.float64, x0=xs,
                          ckpt_every=1)
  for t in range(T):
    sorted_bank.observe_frame(ts[t], zs[t], eas[t], R=R)

  ooo_bank = MSCKFBank(model, batch=B, dtype=jnp.float64, x0=xs,
                       ckpt_every=1)
  ooo_bank.observe_frame(ts[0], zs[0], eas[0], R=R)
  ooo_bank.observe_frame(ts[2], zs[2], eas[2], R=R)  # skip ahead
  ooo_bank.observe_frame(ts[1], zs[1], eas[1], R=R)  # late -> rewind+replay

  np.testing.assert_allclose(np.asarray(ooo_bank.x),
                             np.asarray(sorted_bank.x),
                             rtol=1e-12, atol=1e-12)
  np.testing.assert_allclose(np.asarray(ooo_bank._P),
                             np.asarray(sorted_bank._P),
                             rtol=1e-12, atol=1e-12)

  # too-old frame is dropped (returns None), state untouched
  x_before = np.asarray(ooo_bank.x)
  assert ooo_bank.observe_frame(-5.0, zs[0], eas[0], R=R) is None
  np.testing.assert_array_equal(np.asarray(ooo_bank.x), x_before)


def test_run_non_feature_kind():
  model = MSCKFEskf
  spec = model.build_spec()
  kind = int(EK.POSITION)
  rng = np.random.RandomState(4)
  T = 3
  spec_, kind_f, om, xs, eas, zs_f = _frame_data(model, 1, seed=4)
  zs = xs[None, :, 0:3] + 0.1 * rng.randn(T, B, 3)
  dts = np.full((T,), 0.1)
  R = np.eye(3) * 1.0

  bank = MSCKFBank(model, batch=B, dtype=jnp.float64, x0=xs)
  bank.run(dts, zs, kind, R=R)

  def steps(i):
    return [(dts[t], kind, zs[t, i], R, None, False) for t in range(T)]

  xo, Po = _oracle(spec, model, kind, xs, steps)
  np.testing.assert_allclose(np.asarray(bank.x), xo, rtol=1e-9, atol=1e-10)
  np.testing.assert_allclose(np.asarray(bank._P), Po, rtol=1e-8, atol=1e-9)


def test_save_load_roundtrip(tmp_path):
  model = MSCKFVisualOdometry
  spec, kind, om, xs, eas, zs = _frame_data(model, 1, seed=5)
  R = np.eye(om.dz) * 0.01**2
  bank = MSCKFBank(model, batch=B, dtype=jnp.float64, x0=xs)
  bank.run_frames([0.05], zs, eas, R=R)
  p = tmp_path / "msckf_bank.npz"
  bank.save(p)
  bank2 = MSCKFBank(model, batch=B, dtype=jnp.float64)
  bank2.load(p)
  np.testing.assert_array_equal(np.asarray(bank.x), np.asarray(bank2.x))
  np.testing.assert_array_equal(np.asarray(bank._P), np.asarray(bank2._P))
  assert bank2.t == bank.t


def test_run_mixed_frames_and_sensors():
  """Camera frames (augment) interleaved with position fixes in ONE
  compiled scan (run_mixed) == the oracle sequence — the reference's
  production flow shape (ekf_sym.py:458-531)."""
  model = MSCKFEskf
  T = 4
  spec, kind, om, xs, eas_f, zs_f = _frame_data(model, T, seed=7)
  pos_kind = int(EK.POSITION)
  rng = np.random.RandomState(8)
  zpos = xs[:, 0:3] + 0.1 * rng.randn(B, 3)
  R_feat = np.eye(om.dz) * 0.01**2
  Rp = np.eye(3) * 1.0
  dts = np.full((T,), 0.05)
  kinds = (pos_kind, kind)
  kind_idx = np.array([1, 0, 1, 0], np.int32)  # frame, pos, frame, pos
  max_dz = max(om.dz, 3)
  zs = np.zeros((T, B, max_dz))
  eas = np.zeros((T, B, om.ea_len))
  for t in range(T):
    if kind_idx[t] == 1:
      zs[t, :, :om.dz] = zs_f[t]
      eas[t] = eas_f[t]
    else:
      zs[t, :, :3] = zpos

  bank = MSCKFBank(model, batch=B, dtype=jnp.float64, x0=xs)
  bank.run_mixed(dts, kind_idx, zs, kinds,
                 R_by_kind={pos_kind: Rp, kind: R_feat}, eas=eas)

  def steps(i):
    out = []
    for t in range(T):
      if kind_idx[t] == 1:
        out.append((dts[t], kind, zs_f[t, i], R_feat, eas_f[t, i], True))
      else:
        out.append((dts[t], pos_kind, zpos[i], Rp, None, False))
    return out

  xo, Po = _oracle(spec, model, kind, xs, steps)
  np.testing.assert_allclose(np.asarray(bank.x), xo, rtol=1e-9, atol=1e-10)
  np.testing.assert_allclose(np.asarray(bank._P), Po, rtol=1e-8, atol=1e-9)


@pytest.mark.slow
@pytest.mark.parametrize("model", [MSCKFVisualOdometry, MSCKFEskf],
                         ids=["additive", "eskf_composition"])
def test_mixed_kernel_with_frame_branch(model):
  """The generic mixed KERNEL whose kind switch carries a camera-frame
  branch (feature update + window augment; phase-split inner switch for
  the over-budget composition) == the lane mixed-frame scan, interpret
  mode — the reference's full production flow in ONE VMEM-resident
  kernel."""
  from rednose_tpu.ops import lane_bank, pallas_bank, sparsity

  T = 4
  spec, kind, om, xs, eas_f, zs_f = _frame_data(model, T, seed=9)
  st = sparsity.structure_for(spec, model.initial_x)
  pos_kind = next(k for k, o in sorted(spec.obs.items())
                  if not o.is_feature)
  rng = np.random.RandomState(10)
  zpos = xs[:, 0:3] + 0.1 * rng.randn(B, 3)
  R_feat = np.eye(om.dz) * 0.01**2
  Rp = np.eye(3) * 1.0
  dts = np.full((T,), 0.05)
  kinds = (pos_kind, kind)
  kind_idx = np.array([1, 0, 1, 0], np.int32)
  max_dz = max(om.dz, 3)
  zs = np.zeros((T, B, max_dz))
  eas = np.zeros((T, B, om.ea_len))
  for t in range(T):
    if kind_idx[t] == 1:
      zs[t, :, :om.dz] = zs_f[t]
      eas[t] = eas_f[t]
    else:
      zs[t, :, :3] = zpos
  f32 = jnp.float32
  Ps = np.tile(np.diag(model.initial_P_diag)[..., None], (1, 1, B))

  fn = lane_bank.jit_lane_mixed_bank_scan(spec, kinds, st)
  R_list = (jnp.asarray(Rp, f32), jnp.asarray(R_feat, f32))
  xl, Pl = fn({}, jnp.asarray(xs, f32), jnp.asarray(Ps, f32),
              jnp.asarray(model.Q, f32), jnp.asarray(dts, f32),
              jnp.asarray(kind_idx), jnp.asarray(zs, f32), R_list,
              eas=jnp.asarray(eas, f32))

  q_diag = tuple(float(v) for v in np.diag(model.Q))
  r_mats = (tuple(tuple(float(v) for v in row) for row in Rp),
            tuple(tuple(float(v) for v in row) for row in R_feat))
  # the composition's frame branch must be over budget (phase-split); the
  # additive one flat
  fops = pallas_bank._feature_branch_ops(spec, kind, r_mats[1], True, st)
  if model is MSCKFEskf:
    assert fops > pallas_bank.EPOCH_UNROLL_OP_BUDGET, fops
  else:
    assert fops <= pallas_bank.EPOCH_UNROLL_OP_BUDGET, fops
  xp, Pp = pallas_bank.pack_bank(jnp.asarray(xs, f32),
                                 jnp.asarray(Ps, f32))
  zsp = pallas_bank.pack_bank_measurements(jnp.asarray(zs, f32))
  easp = pallas_bank.pack_bank_measurements(jnp.asarray(eas, f32))
  xo_p, Po_p = pallas_bank.generic_bank_scan_mixed(
      xp, Pp, zsp, jnp.asarray(dts, f32), jnp.asarray(kind_idx), easp,
      spec=spec, kinds=kinds, q_diag=q_diag, r_mats=r_mats, gate=True,
      t_chunk=4, tile_b=8, interpret=True, structure=st)
  xk, Pk = pallas_bank.unpack_bank(xo_p, Po_p)
  np.testing.assert_allclose(np.asarray(xk), np.asarray(xl), rtol=5e-5,
                             atol=5e-5)
  np.testing.assert_allclose(np.asarray(Pk), np.asarray(Pl), rtol=5e-4,
                             atol=5e-4)
