"""chi2 PPF tests against known scipy.stats.chi2.ppf values (hardcoded so the
test needs no scipy, like the reference's baked lookup table,
rednose/helpers/chi2_lookup.py)."""

import numpy as np

from rednose_tpu.utils import chi2

def test_chi2_ppf_known_values():
  # (p, dim, scipy.stats.chi2.ppf(p, dim))
  for p, dim, want in [
      (0.95, 1, 3.841458820694124),
      (0.95, 2, 5.991464547107979),
      (0.95, 3, 7.814727903251179),
      (0.99, 1, 6.6348966010212145),
      (0.5, 10, 9.34181776559197),
      (0.95, 22, 33.92443847144379),
      (0.95, 199, 232.91182177891568),
  ]:
    got = chi2.chi2_ppf(p, dim)
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_gammainc_roundtrip():
  rng = np.random.default_rng(0)
  for _ in range(50):
    a = float(rng.uniform(0.5, 50))
    p = float(rng.uniform(0.01, 0.98))
    x = chi2.gammaincinv(a, p)
    np.testing.assert_allclose(chi2.gammainc(a, x), p, atol=1e-10)


def test_lookup_table_shape():
  table = chi2.gen_chi2_ppf_lookup(max_dim=8)
  assert table.shape == (8, 98)
  # monotone in p and dim
  assert np.all(np.diff(table[1:], axis=1) > 0)
  assert np.all(table[2:, 0] > table[1:-1, 0])
