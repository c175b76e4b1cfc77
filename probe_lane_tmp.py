import time
import numpy as np, jax, jax.numpy as jnp
from rednose_tpu.models.live import LiveKalman
from rednose_tpu.ops import lane_bank, sparsity
from rednose_tpu.ops.lane_bank import _matmul_ll, _matmul_lt, _sym

spec = LiveKalman.build_spec()
st = sparsity.structure_for(spec, LiveKalman.initial_x)
print("g_cols:", st.g_cols, flush=True)
B, de = 4096, 22
rng = np.random.RandomState(0)
x = jnp.asarray(np.tile(LiveKalman.initial_x, (B, 1)), jnp.float32)
P = jnp.asarray(np.tile(np.diag(LiveKalman.initial_P_diag).astype(np.float32)[:, :, None], (1, 1, B)))
Q = jnp.asarray(LiveKalman.Q, jnp.float32)
dt = 0.01

def predict_dense(x, P, pert=0):
    x = x + 1e-6 * pert
    F = jax.vmap(lambda xx: spec.F({}, xx, dt), out_axes=2)(x)
    P_new = _matmul_lt(_matmul_ll(F, P), F)
    return _sym(P_new) + (dt * Q)[:, :, None]

def predict_masked(x, P, pert=0):
    x = x + 1e-6 * pert
    F = jax.vmap(lambda xx: spec.F({}, xx, dt), out_axes=2)(x)
    P_new = sparsity.fpf_masked(F, P, st.g_cols)
    return _sym(P_new) + (dt * Q)[:, :, None]

def f_only(x, P, pert=0):
    x = x + 1e-6 * pert
    return jax.vmap(lambda xx: spec.F({}, xx, dt), out_axes=2)(x)

def timeit(name, fn, k=8):
    def chained(x, P):
        s = 0.0
        for i in range(k):
            s = s + jnp.sum(fn(x, P, pert=i))
        return s
    f = jax.jit(chained)
    float(f(x, P))
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter(); float(f(x, P)); best = min(best, time.perf_counter()-t0)
    print(f"{name}: {best/k*1e3:.3f} ms ({B/(best/k)/1e6:.1f}M banks/s)", flush=True)

timeit("F jacfwd only", f_only)
timeit("predict dense", predict_dense)
timeit("predict masked", predict_masked)
