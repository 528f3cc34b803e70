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


def _skewtest_z(g1: float, n: int) -> float:
    """D'Agostino (1970) transformed skewness z-statistic — the published
    formula scipy.stats.skewtest implements."""
    if n < 8:
        raise ValueError(f"skewtest requires n >= 8, got {n}")
    y = g1 * math.sqrt(((n + 1.0) * (n + 3.0)) / (6.0 * (n - 2.0)))
    beta2 = (3.0 * (n * n + 27.0 * n - 70.0) * (n + 1.0) * (n + 3.0)) / (
        (n - 2.0) * (n + 5.0) * (n + 7.0) * (n + 9.0)
    )
    w2 = -1.0 + math.sqrt(2.0 * (beta2 - 1.0))
    delta = 1.0 / math.sqrt(0.5 * math.log(w2))
    alpha = math.sqrt(2.0 / (w2 - 1.0))
    y = y if y != 0 else 1.0  # scipy's y==0 guard
    return delta * math.log(y / alpha + math.sqrt((y / alpha) ** 2 + 1.0))


def _kurtosistest_z(g2: float, n: int) -> float:
    """Anscombe & Glynn (1983) transformed kurtosis z-statistic (scipy
    kurtosistest).  ``g2`` is Fisher (excess) kurtosis; b2 = g2 + 3."""
    if n < 5:
        raise ValueError(f"kurtosistest requires n >= 5, got {n}")
    b2 = g2 + 3.0
    e = 3.0 * (n - 1.0) / (n + 1.0)
    var = 24.0 * n * (n - 2.0) * (n - 3.0) / ((n + 1.0) ** 2 * (n + 3.0) * (n + 5.0))
    x = (b2 - e) / math.sqrt(var)
    sqrtbeta1 = (
        6.0 * (n * n - 5.0 * n + 2.0) / ((n + 7.0) * (n + 9.0))
    ) * math.sqrt(6.0 * (n + 3.0) * (n + 5.0) / (n * (n - 2.0) * (n - 3.0)))
    a = 6.0 + 8.0 / sqrtbeta1 * (
        2.0 / sqrtbeta1 + math.sqrt(1.0 + 4.0 / (sqrtbeta1 ** 2))
    )
    term1 = 1.0 - 2.0 / (9.0 * a)
    denom = 1.0 + x * math.sqrt(2.0 / (a - 4.0))
    if denom == 0:
        raise ValueError("kurtosistest denominator is zero")
    term2 = math.copysign(1.0, denom) * abs((1.0 - 2.0 / a) / abs(denom)) ** (1.0 / 3.0)
    return (term1 - term2) / math.sqrt(2.0 / (9.0 * a))


def dagostino_normaltest_p(n: int, g1: float, g2: float) -> float:
    """D'Agostino-Pearson omnibus normality test p-value from the exact
    distributed moments: k2 = z_skew^2 + z_kurt^2 ~ chi2(df=2)
    (scipy.stats.normaltest contract; contrib
    expect_column_values_to_be_normally_distributed.py:25-26)."""
    if n < 8:
        raise ValueError(f"normaltest requires n >= 8, got {n}")
    z1 = _skewtest_z(g1, n)
    z2 = _kurtosistest_z(g2, n)
    return chi2_sf(z1 * z1 + z2 * z2, 2.0)


def ks_2samp_p_asymptotic(d: float, n_a: int, n_b: int) -> float:
    """Asymptotic two-sample KS p-value: Q_KS(D * sqrt(na*nb/(na+nb)))
    (Smirnov's limit law — what scipy.stats.ks_2samp(mode='asymp') uses)."""
    en = math.sqrt(n_a * n_b / (n_a + n_b))
    return kolmogorov_sf(en * d)
