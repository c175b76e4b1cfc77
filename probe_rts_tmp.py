import time
import numpy as np, jax, jax.numpy as jnp
from rednose_tpu.models.live import LiveKalman
from rednose_tpu.smoothing import rts
from rednose_tpu.ops.lane_bank import _matmul_ll, _matmul_lt, cho_solve_lane, cholesky_lane

spec = LiveKalman.build_spec()
T, d2 = 8192, 22
x = jnp.asarray(np.tile(LiveKalman.initial_x, (T, 1)), jnp.float32)
P = jnp.asarray(np.tile(np.diag(LiveKalman.initial_P_diag).astype(np.float32), (T, 1, 1)))
Pp = P * 1.1
dts = jnp.full((T-1,), 0.01, jnp.float32)

def timeit(name, fn, *args, k=3):
    def chained(*a):
        s = 0.0
        for i in range(k):
            r = fn(*a, pert=i)
            s = s + (jnp.sum(r) if not isinstance(r, (tuple, list)) else sum(jnp.sum(q) for q in r))
        return s
    f = jax.jit(chained)
    float(f(*args))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); float(f(*args)); best = min(best, time.perf_counter()-t0)
    print(f"{name}: {best/k*1e3:.2f} ms", flush=True)

timeit("F jacfwd", lambda xs, ds, pert=0: jax.vmap(lambda xk, dt: spec.F({}, xk, dt)[:d2,:d2], out_axes=2)(xs + 1e-6*pert, ds), x[:-1], dts)

Pk_t = jnp.transpose(P[:-1], (1,2,0))
Pk1_t = jnp.transpose(Pp[1:], (1,2,0))
F_ = jax.jit(lambda: jax.vmap(lambda xk, dt: spec.F({}, xk, dt)[:d2,:d2], out_axes=2)(x[:-1], dts))()
def gains(Pk_t, Pk1_t, F, pert=0):
    L = cholesky_lane(Pk1_t + 1e-7*pert)
    X = cho_solve_lane(L, _matmul_lt(F, Pk_t))
    return jnp.swapaxes(X, 0, 1)
timeit("gains chol+solve", gains, Pk_t, Pk1_t, F_)

C = jax.jit(lambda: gains(Pk_t, Pk1_t, F_, 0))()
b = jnp.ones((d2,1,T-1), jnp.float32)
V = jnp.ones((d2,d2,T-1), jnp.float32)*0.01
timeit("assoc scan lane", lambda c, bb, vv, pert=0: jax.lax.associative_scan(rts._affine_combine_lane, (c + 1e-7*pert, bb, vv), reverse=True, axis=2), C, b, V)
