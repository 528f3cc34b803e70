"""Minimal special-function math (no scipy in the runtime).

``chi2_sf`` = survival function of the chi-square distribution =
regularized upper incomplete gamma Q(k/2, x/2), computed with the classic
series / continued-fraction split (Press et al., *Numerical Recipes*,
public-domain algorithms gser/gcf).  Accurate to ~1e-12 — far below any
p-value decision threshold.
"""

from __future__ import annotations

import math

_EPS = 3e-16
_ITMAX = 500


def _gser(a: float, x: float) -> float:
    """P(a,x) by series expansion (x < a+1)."""
    if x <= 0:
        return 0.0
    ap = a
    summ = 1.0 / a
    delt = summ
    for _ in range(_ITMAX):
        ap += 1.0
        delt *= x / ap
        summ += delt
        if abs(delt) < abs(summ) * _EPS:
            break
    return summ * math.exp(-x + a * math.log(x) - math.lgamma(a))


def _gcf(a: float, x: float) -> float:
    """Q(a,x) by continued fraction (x >= a+1)."""
    tiny = 1e-300
    b = x + 1.0 - a
    c = 1.0 / tiny
    d = 1.0 / b
    h = d
    for i in range(1, _ITMAX + 1):
        an = -i * (i - a)
        b += 2.0
        d = an * d + b
        if abs(d) < tiny:
            d = tiny
        c = b + an / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        de = d * c
        h *= de
        if abs(de - 1.0) < _EPS:
            break
    return math.exp(-x + a * math.log(x) - math.lgamma(a)) * h


def gammainc_upper_regularized(a: float, x: float) -> float:
    """Q(a, x) = 1 - P(a, x)."""
    if x < 0 or a <= 0:
        raise ValueError("invalid arguments")
    if x == 0:
        return 1.0
    if x < a + 1.0:
        return 1.0 - _gser(a, x)
    return _gcf(a, x)


def chi2_sf(x: float, df: float) -> float:
    """P(Chi2_df > x)."""
    return gammainc_upper_regularized(df / 2.0, x / 2.0)


def chisquare_test(observed: list[float], expected: list[float]) -> tuple[float, float]:
    """(statistic, p_value), matching scipy.stats.chisquare semantics."""
    if len(observed) != len(expected):
        raise ValueError("length mismatch")
    stat = 0.0
    for o, e in zip(observed, expected):
        if e <= 0:
            if o > 0:
                return math.inf, 0.0
            continue
        stat += (o - e) ** 2 / e
    df = len(observed) - 1
    if df <= 0:
        return stat, 1.0
    return stat, chi2_sf(stat, df)


def kl_divergence_discrete(p_obs: dict, p_exp: dict) -> float:
    """KL(observed || expected) over a discrete support; inf when observed
    mass falls outside the expected support."""
    kl = 0.0
    for v, p in p_obs.items():
        if p <= 0:
            continue
        q = p_exp.get(v, 0.0)
        if q <= 0:
            return math.inf
        kl += p * math.log(p / q)
    return kl
