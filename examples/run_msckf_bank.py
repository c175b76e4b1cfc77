#!/usr/bin/env python3
"""MSCKF bank demo: B parallel sliding-window visual-inertial localizers
of the ESKFxMSCKF composition (models/msckf_eskf — quaternion error state
+ full-pose clone window, the loc_kf-style joint path the reference's
msckf_params + eskf_params exist for), stepped as ONE compiled program by
runtime/msckf_bank.MSCKFBank. A camera frame is predict + nullspace-
projected feature update + window augment; position fixes interleave
through the same run_mixed scan; one late frame exercises the
out-of-order rewind+replay path."""

import numpy as np

from rednose_tpu.models.msckf_eskf import (
    DIM_MAIN,
    MSCKFEskf,
    ObservationKind,
)
from rednose_tpu.runtime.msckf_bank import MSCKFBank

B = 64          # bank width (hypotheses / parallel streams)
T = 24          # camera frames
DT = 0.1


def main():
  import jax.numpy as jnp

  rng = np.random.RandomState(0)
  spec = MSCKFEskf.build_spec()
  om = spec.obs[int(ObservationKind.MSCKF_FEATURE)]

  # ground truth: a receiver drifting at constant velocity; the clone
  # window starts spread along the trajectory so features triangulate
  truth_v = np.array([0.6, -0.4, 0.2])
  x0 = np.asarray(MSCKFEskf.initial_x, np.float64).copy()
  for a in range(spec.n_augment):
    o = DIM_MAIN + spec.dim_augment * a
    x0[o:o + 3] = -truth_v * DT * (spec.n_augment - a)
  xs = np.tile(x0, (B, 1))
  xs[:, :3] += 0.5 * rng.randn(B, 3)  # per-lane initial position error

  bank = MSCKFBank(MSCKFEskf, batch=B, dtype=jnp.float64, x0=xs,
                   ckpt_every=1)  # snapshot every frame: OOO demo below

  landmark = np.array([2.0, 1.0, 8.0])
  pos_kind = int(ObservationKind.POSITION)
  feat_kind = int(ObservationKind.MSCKF_FEATURE)

  def frame_obs(truth_pos):
    """Feature track of the landmark from the TRUE clone window."""
    zt = []
    for a in range(spec.n_augment):
      cp = truth_pos - truth_v * DT * (spec.n_augment - a)
      d = landmark - cp
      zt.append([d[0] / d[2], d[1] / d[2]])
    return np.concatenate(zt)

  # mixed schedule: camera frame, camera frame, position fix, ...
  kinds = (pos_kind, feat_kind)
  kind_idx = np.array([1, 1, 0] * (T // 3), np.int32)
  Tm = kind_idx.shape[0]
  max_dz = max(om.dz, 3)
  zs = np.zeros((Tm, B, max_dz))
  eas = np.zeros((Tm, B, om.ea_len))
  pos = np.zeros(3)
  for t in range(Tm):
    pos = pos + truth_v * DT
    if kind_idx[t] == 1:
      zs[t, :, :om.dz] = frame_obs(pos)[None] + 0.002 * rng.randn(B, om.dz)
      eas[t] = landmark[None] + 0.02 * rng.randn(B, 3)
    else:
      zs[t, :, :3] = pos[None] + 0.5 * rng.randn(B, 3)

  err0 = float(np.linalg.norm(
      np.asarray(bank.x)[:, :3] - np.zeros(3), axis=1).mean())
  bank.run_mixed(np.full((Tm,), DT), kind_idx, zs, kinds, eas=eas)
  err1 = float(np.linalg.norm(
      np.asarray(bank.x)[:, :3] - pos[None], axis=1).mean())

  # out-of-order: a late camera frame inside the rewind window (needs a
  # snapshot at-or-before its timestamp — the bulk run clears the ring,
  # so seed it with two in-order frames first)
  t_now = bank.t
  bank.observe_frame(t_now + DT, frame_obs(pos + truth_v * DT),
                     landmark + 0.02 * rng.randn(3))
  bank.observe_frame(t_now + 2 * DT, frame_obs(pos + 2 * truth_v * DT),
                     landmark + 0.02 * rng.randn(3))
  late = bank.observe_frame(t_now + 1.5 * DT,
                            frame_obs(pos + 1.5 * truth_v * DT),
                            landmark + 0.02 * rng.randn(3))
  dropped = bank.observe_frame(-10.0, frame_obs(pos), landmark)

  print(f"MSCKFBank[{B}] ESKFxMSCKF: mean position error "
        f"{err0:.2f} m -> {err1:.2f} m over {Tm} mixed steps "
        f"(frames+fixes); late frame {'replayed' if late else 'FAILED'}, "
        f"too-old frame {'dropped' if dropped is None else 'FAILED'}")
  assert err1 < err0 and late is not None and dropped is None


if __name__ == "__main__":
  main()
