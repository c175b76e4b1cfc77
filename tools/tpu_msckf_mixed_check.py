"""TPU check: MSCKFBank.run_mixed through the VMEM-resident mixed kernel
whose kind switch carries a camera-frame branch (nested phase switch for
the ESKFxMSCKF composition) — compile + lane parity + throughput probe."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from rednose_tpu.models.msckf_eskf import (  # noqa: E402
    MSCKFEskf,
    ObservationKind as EK,
)
from rednose_tpu.runtime.msckf_bank import MSCKFBank  # noqa: E402


def main():
  print("devices:", jax.devices(), flush=True)
  spec = MSCKFEskf.build_spec()
  feat = int(EK.MSCKF_FEATURE)
  pos = int(EK.POSITION)
  om = spec.obs[feat]
  rng = np.random.RandomState(0)
  B, T = 1024, 16
  x0 = np.asarray(MSCKFEskf.initial_x, np.float64)
  xs = np.tile(x0, (B, 1)) + 0.02 * rng.randn(B, spec.dim_x)
  for a in range(spec.n_augment):
    o = spec.dim_main + spec.dim_augment * a
    xs[:, o:o + 3] += 0.5 * rng.randn(3)[None]
  for idx in spec.quaternion_idxs:
    q = xs[:, idx:idx + 4]
    xs[:, idx:idx + 4] = q / np.linalg.norm(q, axis=1, keepdims=True)
  eas = np.zeros((T, B, 3))
  zs = np.zeros((T, B, max(om.dz, 3)))
  kind_idx = np.tile(np.array([1, 1, 0, 1], np.int32), T // 4)
  z0 = np.asarray(om.h({}, jnp.asarray(x0), jnp.asarray([1.0, 0.5, 6.0])))
  for t in range(T):
    if kind_idx[t] == 1:
      zs[t, :, :om.dz] = z0[None] + 0.005 * rng.randn(B, om.dz)
      eas[t] = np.array([1.0, 0.5, 6.0])[None] + 0.1 * rng.randn(B, 3)
    else:
      zs[t, :, :3] = xs[:, :3] + 0.5 * rng.randn(B, 3)
  dts = np.full((T,), 0.05)
  kinds = (pos, feat)

  bank_k = MSCKFBank(MSCKFEskf, batch=B, x0=xs)
  assert bank_k.use_pallas
  t0 = time.time()
  print("compiling mixed kernel with camera-frame branch (nested phase "
        "switch)...", flush=True)
  bank_k.run_mixed(dts, kind_idx, zs, kinds, eas=eas)
  xk = np.asarray(bank_k.x)
  print(f"compile+run: {time.time()-t0:.1f}s finite={np.isfinite(xk).all()}",
        flush=True)

  bank_l = MSCKFBank(MSCKFEskf, batch=B, x0=xs, use_pallas=False)
  bank_l.run_mixed(dts, kind_idx, zs, kinds, eas=eas)
  xl = np.asarray(bank_l.x)
  d = np.abs(xk - xl).max(axis=1)
  print(f"lane-vs-kernel: median={np.median(d):.2e} max={d.max():.2e} "
        f"frac>1e-3: {(d > 1e-3).mean():.4f}", flush=True)
  assert np.isfinite(xk).all()
  assert np.median(d) < 1e-3, np.median(d)
  assert (d > 1e-3).mean() < 0.05

  # throughput probe
  t0 = time.time()
  for _ in range(3):
    bank_k.run_mixed(dts, kind_idx, zs, kinds, eas=eas)
  dtw = (time.time() - t0) / 3
  print(f"mixed kernel ~{B*T/dtw/1e6:.2f}M steps/s (facade wall, incl. "
        f"host packing)", flush=True)
  print("OK")


if __name__ == "__main__":
  main()
