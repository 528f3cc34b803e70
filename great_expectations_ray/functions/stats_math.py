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


# --------------------------------------------------------------------------- #
# Kolmogorov-Smirnov machinery (expectations #47/#49 — real implementations;
# the reference snapshot ships 27-33 LoC stubs for both, see SURVEY §2.1)
# --------------------------------------------------------------------------- #


def kolmogorov_sf(lam: float) -> float:
    """Q_KS(λ) = 2 Σ_{j>=1} (-1)^{j-1} e^{-2 j² λ²} — the asymptotic KS
    survival function (Numerical Recipes probks, both θ-function forms for
    accuracy at small and large λ)."""
    if lam <= 0:
        return 1.0
    if lam < 1.18:
        # small-λ theta transform: P = (√(2π)/λ) Σ exp(-(2j-1)²π²/(8λ²))
        t = math.exp(-math.pi * math.pi / (8.0 * lam * lam))
        p = (math.sqrt(2.0 * math.pi) / lam) * (t + t ** 9 + t ** 25 + t ** 49)
        return max(0.0, min(1.0, 1.0 - p))
    q = 0.0
    sign = 1.0
    for j in range(1, 101):
        term = sign * math.exp(-2.0 * j * j * lam * lam)
        q += term
        if abs(term) < 1e-16:
            break
        sign = -sign
    return max(0.0, min(1.0, 2.0 * q))


def ks_p_value(d: float, n: int) -> float:
    """Asymptotic one-sample KS p-value with Stephens' finite-n correction
    λ = (√n + 0.12 + 0.11/√n)·D  (documented deviation: scipy's kstest uses
    the exact kstwo distribution; the two agree to well under 1% for n ≳ 50,
    far inside any p-threshold decision margin)."""
    if n <= 0:
        return 1.0
    sn = math.sqrt(n)
    return kolmogorov_sf((sn + 0.12 + 0.11 / sn) * d)
