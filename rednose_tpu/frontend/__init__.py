from rednose_tpu.frontend.sympy_spec import spec_from_sympy  # noqa: F401
