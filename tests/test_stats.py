"""t-distribution quantile + CI (A9, stats_utils.py:5-31 semantics)."""

import math

import pytest

from warc_bench_spark.functions.stats import betainc, confidence_interval, t_cdf, t_ppf

# standard two-sided 95% critical values (published t-tables; also equal to
# scipy.stats.t.ppf(0.975, df) to the digits shown)
T_TABLE_975 = {
    1: 12.7062047362,
    2: 4.3026527297,
    4: 2.7764451052,
    9: 2.2621571628,
    19: 2.0930240544,
    29: 2.0452296421,
    99: 1.9842169516,
}


def test_t_ppf_matches_published_tables():
    for df, expected in T_TABLE_975.items():
        assert t_ppf(0.975, df) == pytest.approx(expected, abs=1e-8)


def test_t_ppf_symmetry_and_median():
    assert t_ppf(0.5, 7) == 0.0
    assert t_ppf(0.025, 9) == pytest.approx(-t_ppf(0.975, 9), abs=1e-10)


def test_t_cdf_round_trip():
    for df in (1, 3, 10, 50):
        for p in (0.6, 0.9, 0.975, 0.999):
            assert t_cdf(t_ppf(p, df), df) == pytest.approx(p, abs=1e-9)


def test_betainc_known_values():
    # I_x(1, 1) = x; I_x(2, 2) = x^2 (3 - 2x)
    assert betainc(1, 1, 0.3) == pytest.approx(0.3, abs=1e-12)
    assert betainc(2, 2, 0.25) == pytest.approx(0.25**2 * (3 - 0.5), abs=1e-12)


def test_confidence_interval_reference_shape():
    """mean ± t * s/sqrt(n), ddof=1 — the stats_utils.py formula."""
    data = [0.5, 0.6, 0.55, 0.7, 0.65]
    n = len(data)
    mean = sum(data) / n
    sd = math.sqrt(sum((x - mean) ** 2 for x in data) / (n - 1))
    lo, hi = confidence_interval(mean, sd, n)
    t_crit = T_TABLE_975[4]
    assert lo == pytest.approx(mean - t_crit * sd / math.sqrt(n), abs=1e-9)
    assert hi == pytest.approx(mean + t_crit * sd / math.sqrt(n), abs=1e-9)
    with pytest.raises(ValueError):
        confidence_interval(0.5, 0.1, 1)
