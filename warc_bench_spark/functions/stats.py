"""Student-t confidence intervals (SURVEY.md §2 A9).

The reference computes a t-distribution CI over per-run success rates with
``scipy.stats.t.ppf`` (``/root/reference/src/orby/digitalagent/utils/
stats_utils.py:5-31``: mean ± t_{(1+c)/2, n-1} * s / sqrt(n), with
``np.std(ddof=1)``). The sandbox has no scipy, so ``t_ppf`` implements the
quantile from scratch: the regularized incomplete beta function via the
standard continued-fraction expansion (Lentz's algorithm, as published in
Numerical Recipes / DLMF 8.17), inverted by bisection. Accurate to ~1e-10,
verified against standard t-tables in ``tests/test_stats.py``.

In the Spark plan, the aggregates (mean, stddev_samp, count) are columnar;
the t multiplier is a driver-side scalar exactly as in the reference (one
scalar per group size), embedded as a literal — so the oracle SQL can embed
the very same literal and hash-match bit-for-bit.
"""

from __future__ import annotations

import math


def _betacf(a: float, b: float, x: float) -> float:
    """Continued fraction for the incomplete beta function (Lentz)."""
    MAXIT, EPS, FPMIN = 200, 3e-16, 1e-300
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < FPMIN:
        d = FPMIN
    d = 1.0 / d
    h = d
    for m in range(1, MAXIT + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < FPMIN:
            d = FPMIN
        c = 1.0 + aa / c
        if abs(c) < FPMIN:
            c = FPMIN
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < FPMIN:
            d = FPMIN
        c = 1.0 + aa / c
        if abs(c) < FPMIN:
            c = FPMIN
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < EPS:
            break
    return h


def betainc(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b)."""
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    ln_front = (
        math.lgamma(a + b)
        - math.lgamma(a)
        - math.lgamma(b)
        + a * math.log(x)
        + b * math.log1p(-x)
    )
    front = math.exp(ln_front)
    if x < (a + 1.0) / (a + b + 2.0):
        return front * _betacf(a, b, x) / a
    return 1.0 - front * _betacf(b, a, 1.0 - x) / b


def t_cdf(t: float, df: float) -> float:
    """CDF of Student's t with ``df`` degrees of freedom."""
    ib = betainc(df / 2.0, 0.5, df / (df + t * t))
    return 1.0 - 0.5 * ib if t >= 0 else 0.5 * ib


def t_ppf(p: float, df: int) -> float:
    """Inverse CDF (quantile) of Student's t — ``scipy.stats.t.ppf`` analog."""
    if not 0.0 < p < 1.0:
        raise ValueError("p must be in (0, 1)")
    if p == 0.5:
        return 0.0
    if p < 0.5:
        return -t_ppf(1.0 - p, df)
    lo, hi = 0.0, 2.0
    while t_cdf(hi, df) < p:  # bracket
        hi *= 2.0
        if hi > 1e12:
            raise ValueError("quantile bracket failed")
    for _ in range(200):  # bisection to ~1e-12
        mid = 0.5 * (lo + hi)
        if t_cdf(mid, df) < p:
            lo = mid
        else:
            hi = mid
        if hi - lo < 1e-12 * max(1.0, hi):
            break
    return 0.5 * (lo + hi)


def confidence_interval(
    mean: float, std_dev: float, n: int, confidence: float = 0.95
) -> tuple[float, float]:
    """(lower, upper) of the t CI — stats_utils.py:5-31 semantics."""
    if n < 2:
        raise ValueError("At least two data points are required")
    t_critical = t_ppf((1 + confidence) / 2.0, n - 1)
    margin = t_critical * (std_dev / math.sqrt(n))
    return mean - margin, mean + margin
