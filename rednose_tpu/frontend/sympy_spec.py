"""sympy front-end: build a FilterSpec from reference-style symbolic models.

The reference's filters are *defined in sympy* and lowered to C by gen_code
(rednose/helpers/ekf_sym.py:29-217). Users migrating from the reference
arrive with exactly those artifacts: a symbolic f_sym, obs_eqs triples,
eskf_params / msckf_params tuples, global_vars symbols, extra_routines.
This module accepts that same input surface and lowers it to jnp functions
via sympy.lambdify(modules='jax') instead of emitting C — the resulting
FilterSpec runs on every runtime path in this framework (core/step oracle,
streaming driver, lane banks, smoothers) with Jacobians taken by jax.jacfwd
of the lambdified dynamics (symbolic jacobian and autodiff of a symbolic
expression agree exactly, so nothing is lost vs the reference's
f_err_sym.jacobian, ekf_sym.py:76-80).

Input conventions (identical to gen_code, ekf_sym.py:29-113):
  f_sym        sympy Matrix (dim_x, 1) in x_sym and dt_sym
  x_sym        MatrixSymbol (dim_x, 1) — or any iterable of scalar Symbols
  obs_eqs      list of [h_sym, kind, ea_sym] (ea_sym None for plain kinds)
  eskf_params  ([err_expr, nom_x, delta_x], [inv_err_expr, nom_x, true_x],
                H_mod_sym, f_err_sym, x_err_sym)
  msckf_params (dim_main, dim_augment, dim_main_err, dim_augment_err, N,
                feature_track_kinds)
  global_vars  scalar Symbols exposed as runtime-settable parameters
               (reference: emitted C globals + set_<name>, ekf_sym.py:129-132;
               here: entries of the params pytree, default 0.0 like a C global)
  extra_routines  [(name, expr, [arg_syms]), ...] (ekf_sym.py:109-113)

Frontend-built specs run on every runtime path INCLUDING the Pallas
kernels: the generic kernel's entry-level body (ops/entry_slab.py) routes
the lambdified functions through the structural interpreter, which absorbs
their (n, 1) matrix reshapes at the object level (round-2's lockout is
gone; parity: tests/test_entry_slab.py, tests/test_compat_sympy.py). The
only remaining constraint is the kernel-wide one: scatter-free models and
ea-free / static-scalar params on the kernel paths.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import sympy as sp

from rednose_tpu.core.spec import FilterSpec, ObservationModel, ParamsRoutine


def _sym_args(sym):
  """Normalize one lambdify argument spec: a scalar Symbol stays itself; a
  MatrixSymbol / Matrix of symbols is passed through (lambdify accepts
  both), with its length recorded for input reshaping."""
  if isinstance(sym, sp.Symbol):
    return sym, None
  if hasattr(sym, "shape"):
    r, c = (int(d) for d in sym.shape)
    return sym, (r, c)
  seq = tuple(sym)
  return seq, (len(seq), 0)  # tuple-of-symbols: pass a flat vector


def _lambdify(arg_syms, expr, global_syms, ravel_out: bool):
  """Lower `expr` to a jnp function of positional array args + a params
  mapping holding the global_vars (by symbol name)."""
  norm = [_sym_args(s) for s in arg_syms]
  lam = sp.lambdify([s for s, _ in norm] + list(global_syms), expr,
                    modules="jax")
  shapes = [shape for _, shape in norm]
  names = [g.name for g in global_syms]

  def fn(params, *args):
    vals = []
    for a, shape in zip(args, shapes):
      if shape is None:
        vals.append(a)
      elif shape[1] == 0:  # tuple-of-symbols arg: flat sequence
        vals.append(jnp.reshape(a, (shape[0],)))
      else:
        vals.append(jnp.reshape(a, shape))
    gvals = [params[n] for n in names]
    out = lam(*vals, *gvals)
    out = jnp.asarray(out)
    if ravel_out:
      out = jnp.reshape(out, (-1,))
    return out

  return fn


def spec_from_sympy(name, f_sym, dt_sym, x_sym, obs_eqs, dim_x, dim_err,
                    eskf_params=None, msckf_params=None,
                    maha_test_kinds: Sequence[int] = (),
                    quaternion_idxs: Sequence[int] = (),
                    global_vars=None, extra_routines=()) -> FilterSpec:
  """gen_code's exact input surface (ekf_sym.py:29-30) -> FilterSpec."""
  gv = tuple(global_vars or ())
  default_params = {g.name: 0.0 for g in gv}  # C globals default to 0.0

  lam_f = _lambdify([x_sym, dt_sym], f_sym, gv, ravel_out=True)
  f = lambda params, x, dt: lam_f(params, x, dt)  # noqa: E731

  err = inv_err = None
  H_mod = f_err = None
  if eskf_params is not None:
    err_eqs, inv_err_eqs, H_mod_sym, f_err_sym, x_err_sym = eskf_params
    lam_err = _lambdify([err_eqs[1], err_eqs[2]], err_eqs[0], gv,
                        ravel_out=True)
    err = lambda params, x, dx: lam_err(params, x, dx)  # noqa: E731
    lam_inv = _lambdify([inv_err_eqs[1], inv_err_eqs[2]], inv_err_eqs[0],
                        gv, ravel_out=True)
    inv_err = lambda params, nom, tru: lam_inv(params, nom, tru)  # noqa: E731
    lam_hmod = _lambdify([x_sym], H_mod_sym, gv, ravel_out=False)
    H_mod = lambda params, x: lam_hmod(params, x)  # noqa: E731
    lam_ferr = _lambdify([x_sym, x_err_sym, dt_sym], f_err_sym, gv,
                         ravel_out=True)
    f_err = lambda params, x, dx, dt: lam_ferr(params, x, dx, dt)  # noqa: E731

  if msckf_params is not None:
    (dim_main, dim_augment, dim_main_err, dim_augment_err, n_augment,
     feature_track_kinds) = msckf_params
  else:
    dim_main, dim_main_err = dim_x, dim_err
    dim_augment = dim_augment_err = n_augment = 0
    feature_track_kinds = ()

  obs = {}
  for entry in obs_eqs:
    h_sym, kind, ea_sym = entry[0], entry[1], entry[2]
    dz = int(h_sym.shape[0])
    is_feature = ea_sym is not None and kind in feature_track_kinds
    if ea_sym is not None:
      lam_h = _lambdify([x_sym, ea_sym], h_sym, gv, ravel_out=True)
      h = (lambda lh: lambda params, x, ea: lh(params, x, ea))(lam_h)
      # ea_len: the real extra-arg vector length (sized into every internal
      # placeholder); ea_dim: nullspace-projected dims, FEATURE KINDS ONLY —
      # the loc_kf pseudorange family has extra args on non-feature kinds
      # (ekf_sym.py:84-89), which must not trigger MSCKF projection.
      ea_len = int(ea_sym.shape[0])
      ea_dim = ea_len if is_feature else 0
    else:
      lam_h = _lambdify([x_sym], h_sym, gv, ravel_out=True)
      h = (lambda lh: lambda params, x, ea: lh(params, x))(lam_h)
      ea_dim = ea_len = 0
    obs[int(kind)] = ObservationModel(
        kind=int(kind), h=h, dz=dz, ea_dim=ea_dim, ea_len=ea_len,
        maha_test=kind in tuple(maha_test_kinds))

  routines = {}
  for rname, expr, arg_syms in extra_routines:
    lam_r = _lambdify(arg_syms, expr, gv, ravel_out=expr.shape[1] == 1)
    # ParamsRoutine: the engine applies its LIVE params at call time, so
    # set_global updates reach the routine (the reference's generated extra
    # routines read the live C globals; binding default_params here would
    # freeze them at 0.0 forever).
    routines[rname] = ParamsRoutine(lam_r)

  kwargs = dict(
      name=name,
      dim_x=int(dim_x),
      dim_err=int(dim_err),
      f=f,
      obs=obs,
      quaternion_idxs=tuple(quaternion_idxs),
      dim_main=int(dim_main),
      dim_main_err=int(dim_main_err),
      dim_augment=int(dim_augment),
      dim_augment_err=int(dim_augment_err),
      n_augment=int(n_augment),
      default_params=default_params,
      extra_routines=routines,
  )
  if eskf_params is not None:
    kwargs.update(err=err, inv_err=inv_err, H_mod=H_mod, f_err=f_err)
  return FilterSpec(**kwargs)
