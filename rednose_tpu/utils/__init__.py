from rednose_tpu.utils.chi2 import chi2_ppf  # noqa: F401
