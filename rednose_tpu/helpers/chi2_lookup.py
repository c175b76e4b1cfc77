"""Mirror of `rednose.helpers.chi2_lookup` (see helpers/__init__.py):
same surface, but self-contained incomplete-gamma inversion instead of a
shipped .npy table (utils/chi2.py)."""

from rednose_tpu.utils.chi2 import chi2_ppf, gen_chi2_ppf_lookup  # noqa: F401
