"""Student-t distribution PPF (inverse CDF), implemented from scratch.

This box has NO scipy / statsmodels (SURVEY.md §0, env constraint), but the
generalized-ESD critical values lambda_k (Rosner 1983; SURVEY.md §2.1 A3)
need t-quantiles:

    lambda_k = (n-k) * t / sqrt((n-k-1 + t^2) * (n-k+1))
    with t = t_ppf(1 - alpha / (2*(n-k+1)), df = n-k-1)

Implementation: regularized incomplete beta via the Numerical-Recipes-style
continued fraction (Lentz's algorithm), t CDF through it, and the quantile by
safeguarded Newton (bisection fallback) on the CDF.  Pure ``math`` double
precision, fully deterministic — the oracle and the engine import THIS module
so "bit-for-bit" holds by construction.

Validation constants (FIXTURES.md F4):
    t_ppf(0.975, 10) = 2.228138852
    t_ppf(0.95,   4) = 2.131846786
    t_ppf(0.995, 29) = 2.756385904
"""

from __future__ import annotations

import math
from functools import lru_cache

__all__ = ["betainc", "t_cdf", "t_ppf", "esd_lambda"]

_MAX_CF_ITER = 300
_CF_EPS = 1e-16
_TINY = 1e-300


def _betacf(a: float, b: float, x: float) -> float:
    """Continued fraction for the incomplete beta function (modified Lentz)."""
    qab = a + b
    qap = a + 1.0
    qam = a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < _TINY:
        d = _TINY
    d = 1.0 / d
    h = d
    for m in range(1, _MAX_CF_ITER + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < _TINY:
            d = _TINY
        c = 1.0 + aa / c
        if abs(c) < _TINY:
            c = _TINY
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < _TINY:
            d = _TINY
        c = 1.0 + aa / c
        if abs(c) < _TINY:
            c = _TINY
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < _CF_EPS:
            break
    return h


def betainc(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b) in [0, 1]."""
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
    if df <= 0:
        raise ValueError("df must be > 0")
    if t == 0.0:
        return 0.5
    x = df / (df + t * t)
    p_tail = 0.5 * betainc(0.5 * df, 0.5, x)
    return 1.0 - p_tail if t > 0 else p_tail


def _t_pdf(t: float, df: float) -> float:
    ln = (
        math.lgamma(0.5 * (df + 1.0))
        - math.lgamma(0.5 * df)
        - 0.5 * math.log(df * math.pi)
        - 0.5 * (df + 1.0) * math.log1p(t * t / df)
    )
    return math.exp(ln)


@lru_cache(maxsize=65536)
def t_ppf(p: float, df: float) -> float:
    """Quantile t such that ``t_cdf(t, df) == p``.

    Safeguarded Newton on the CDF with a bisection bracket; converges to
    ~1 ulp.  Cached — the ESD loop re-requests the same (alpha, n, k)
    quantiles constantly.
    """
    if not 0.0 < p < 1.0:
        raise ValueError("p must be in (0, 1)")
    if p == 0.5:
        return 0.0
    if p < 0.5:
        return -t_ppf(1.0 - p, df)

    # Initial guess: normal quantile, inflated for fat tails.
    z = _norm_ppf(p)
    g1 = (z**3 + z) / 4.0
    g2 = (5 * z**5 + 16 * z**3 + 3 * z) / 96.0
    t = z + g1 / df + g2 / (df * df)  # Cornish-Fisher expansion

    lo, hi = 0.0, max(10.0, 10.0 * abs(t))
    while t_cdf(hi, df) < p:
        hi *= 4.0
    for _ in range(100):
        f = t_cdf(t, df) - p
        if f > 0:
            hi = min(hi, t)
        else:
            lo = max(lo, t)
        d = _t_pdf(t, df)
        if d > 0.0:
            step = f / d
            t_new = t - step
        else:
            t_new = 0.5 * (lo + hi)
        if not (lo < t_new < hi):
            t_new = 0.5 * (lo + hi)
        if abs(t_new - t) <= 1e-15 * max(1.0, abs(t)):
            t = t_new
            break
        t = t_new
    return t


def _norm_ppf(p: float) -> float:
    """Acklam's rational approximation to the standard normal quantile.

    Only used as the Newton starting point — final accuracy comes from the
    beta-function CDF iterations, so ~1e-9 here is plenty.
    """
    a = (-3.969683028665376e01, 2.209460984245205e02, -2.759285104469687e02,
         1.383577518672690e02, -3.066479806614716e01, 2.506628277459239e00)
    b = (-5.447609879822406e01, 1.615858368580409e02, -1.556989798598866e02,
         6.680131188771972e01, -1.328068155288572e01)
    c = (-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e00,
         -2.549732539343734e00, 4.374664141464968e00, 2.938163982698783e00)
    d = (7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e00,
         3.754408661907416e00)
    p_low = 0.02425
    if p < p_low:
        q = math.sqrt(-2.0 * math.log(p))
        return (((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5]) / \
               ((((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1.0)
    if p <= 1.0 - p_low:
        q = p - 0.5
        r = q * q
        return (((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4]) * r + a[5]) * q / \
               (((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4]) * r + 1.0)
    q = math.sqrt(-2.0 * math.log1p(-p))
    return -(((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5]) / \
        ((((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1.0)


@lru_cache(maxsize=65536)
def esd_lambda(n: int, k: int, alpha: float, two_sided: bool = True) -> float:
    """Rosner-1983 critical value lambda_k for the generalized ESD test.

    ``two_sided=False`` gives the one-tailed critical value the reference
    family uses for ``direction='pos'/'neg'`` detection (Hochenbaum,
    Vallis & Kejariwal 2017 §3: p = 1 - alpha/(n-k+1) instead of
    1 - alpha/(2(n-k+1)))."""
    df = n - k - 1
    if df <= 0:
        return math.inf
    p = 1.0 - alpha / ((2.0 if two_sided else 1.0) * (n - k + 1))
    t = t_ppf(p, float(df))
    return (n - k) * t / math.sqrt((df + t * t) * (n - k + 1))
