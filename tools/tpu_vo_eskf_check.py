"""TPU check: ESKFxMSCKF composition through vo_bank_scan (3-phase switch
dispatch) — compile, lane-vs-kernel parity, and a quick throughput probe.
Run: python -u tools/tpu_vo_eskf_check.py (on the axon TPU)."""

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
from rednose_tpu.ops import lane_bank, pallas_bank, sparsity  # noqa: E402


def main():
  print("backend:", jax.default_backend(), jax.devices())
  spec = MSCKFEskf.build_spec()
  kind = int(EK.MSCKF_FEATURE)
  om = spec.obs[kind]
  st = sparsity.detect_structure(spec, MSCKFEskf.initial_x)
  q_diag = tuple(float(v) for v in np.diag(MSCKFEskf.Q))
  r_mat = tuple(tuple(0.01**2 if i == j else 0.0 for j in range(om.dz))
                for i in range(om.dz))
  print("flat body ops:",
        pallas_bank.vo_flat_body_ops(spec, kind, q_diag, r_mat, True, st))

  rng = np.random.RandomState(0)
  B, T = 1024, 32
  x0 = np.asarray(MSCKFEskf.initial_x, np.float64)
  xs = np.tile(x0, (B, 1)) + 0.02 * rng.randn(B, spec.dim_x)
  for a in range(spec.n_augment):
    o = spec.dim_main + spec.dim_augment * a
    xs[:, o:o + 3] += 0.5 * rng.randn(3)[None]
  for idx in spec.quaternion_idxs:
    q = xs[:, idx:idx + 4]
    xs[:, idx:idx + 4] = q / np.linalg.norm(q, axis=1, keepdims=True)
  Ps = np.tile((0.1 * np.eye(spec.dim_err))[..., None], (1, 1, B))
  eas = np.array([1.0, 0.5, 6.0])[None, None] + 0.1 * rng.randn(T, B, 3)
  z0 = np.asarray(om.h({}, jnp.asarray(x0), jnp.asarray([1.0, 0.5, 6.0])))
  zs = z0[None, None] + 0.005 * rng.randn(T, B, om.dz)
  dts = np.full((T,), 0.05)
  dtype = jnp.float32

  x = jnp.asarray(xs, dtype)
  P = jnp.asarray(Ps, dtype)
  zs_j = jnp.asarray(zs, dtype)
  eas_j = jnp.asarray(eas, dtype)
  dts_j = jnp.asarray(dts, dtype)

  xp, Pp = pallas_bank.pack_bank(x, P)
  zsp = pallas_bank.pack_bank_measurements(zs_j)
  easp = pallas_bank.pack_bank_measurements(eas_j)

  t0 = time.time()
  print("compiling VO composition kernel (switch mode)...", flush=True)
  xo_p, Po_p = pallas_bank.vo_bank_scan(
      xp, Pp, zsp, easp, dts_j, spec=spec, kind=kind, q_diag=q_diag,
      r_mat=r_mat, gate=True, t_chunk=8, tile_b=1024, structure=st)
  s = float(jnp.sum(xo_p)) + float(jnp.sum(Po_p))
  print(f"compile+run: {time.time()-t0:.1f}s, checksum {s:.6f}", flush=True)

  # lane-path parity
  Q = jnp.asarray(np.diag(q_diag), dtype)
  R = jnp.asarray(np.asarray(r_mat), dtype)

  def frame(carry, inp):
    xc, Pc = carry
    dt, z, ea = inp
    xc, Pc = lane_bank.lane_predict(spec, {}, xc, Pc, Q, dt, structure=st)
    xc, Pc, _ = lane_bank.lane_update(spec, kind, {}, xc, Pc, z, R,
                                      structure=st, ea=ea)
    return lane_bank.lane_augment(spec, xc, Pc), None

  @jax.jit
  def lane_run(x, P, dts, zs, eas):
    (xf, Pf), _ = jax.lax.scan(frame, (x, P), (dts, zs, eas))
    return xf, Pf

  xl, Pl = lane_run(x, P, dts_j, zs_j, eas_j)
  xk, Pk = pallas_bank.unpack_bank(xo_p, Po_p)
  dx = float(jnp.abs(xl - xk).max())
  dP = float(jnp.abs(Pl - Pk).max())
  print(f"lane-vs-kernel parity: max|dx|={dx:.3e} max|dP|={dP:.3e}",
        flush=True)
  assert dx < 1e-3 and dP < 1e-3, (dx, dP)

  # quick throughput probe: chain applications inside one jit
  chain_n = 4

  @jax.jit
  def chain(xp, Pp, zsp, easp):
    acc = jnp.asarray(0.0, dtype)
    for i in range(chain_n):
      xo, Po = pallas_bank.vo_bank_scan(
          xp + 1e-6 * i, Pp, zsp, easp, dts_j, spec=spec, kind=kind,
          q_diag=q_diag, r_mat=r_mat, gate=True, t_chunk=8, tile_b=1024,
          structure=st)
      acc = acc + jnp.sum(xo) + jnp.sum(Po)
    return acc

  float(chain(xp, Pp, zsp, easp))  # warm
  best = np.inf
  for _ in range(5):
    t0 = time.time()
    float(chain(xp, Pp, zsp, easp))
    best = min(best, time.time() - t0)
  fps = B * T * chain_n / best
  print(f"throughput probe B={B} T={T}: {fps/1e6:.2f}M frames/s "
        f"(best {best*1e3:.2f} ms)", flush=True)
  print("OK")


if __name__ == "__main__":
  main()
