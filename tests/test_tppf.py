"""FIXTURES.md F4: known-value validation of the from-scratch t-PPF and the
Rosner-1983 worked example for the generalized ESD test."""

import numpy as np

from anomalydetection_ray.functions.stats import esd
from anomalydetection_ray.functions.tppf import esd_lambda, t_cdf, t_ppf


def test_known_quantiles():
    assert abs(t_ppf(0.975, 10.0) - 2.228138852) < 1e-8
    assert abs(t_ppf(0.95, 4.0) - 2.131846786) < 1e-8
    assert abs(t_ppf(0.995, 29.0) - 2.756385904) < 1e-8


def test_ppf_cdf_roundtrip():
    for df in (1.0, 2.0, 5.0, 30.0, 200.0):
        for p in (0.51, 0.9, 0.975, 0.999, 0.2, 0.05):
            t = t_ppf(p, df)
            assert abs(t_cdf(t, df) - p) < 1e-12


def test_symmetry():
    assert t_ppf(0.3, 7.0) == -t_ppf(0.7, 7.0)
    assert t_ppf(0.5, 7.0) == 0.0


def test_esd_lambda_rosner_table():
    # Rosner 1983, n=54, alpha=0.05: lambda_1 ~ 3.16, lambda_10 ~ 3.09
    assert abs(esd_lambda(54, 1, 0.05) - 3.1588) < 2e-3
    # lambda_10: published tables are rounded; formula value 3.0854
    assert abs(esd_lambda(54, 10, 0.05) - 3.089) < 5e-3


def test_esd_rosner_worked_example():
    # Rosner 1983 Table 1 rejects 3 outliers for this 54-point dataset
    # (classical, non-robust variant, K=10, alpha=0.05).
    x = np.array([
        -0.25, 0.68, 0.94, 1.15, 1.20, 1.26, 1.26, 1.34, 1.38, 1.43,
        1.49, 1.49, 1.55, 1.56, 1.58, 1.65, 1.69, 1.70, 1.76, 1.77,
        1.81, 1.91, 1.94, 1.96, 1.99, 2.06, 2.09, 2.10, 2.14, 2.15,
        2.23, 2.24, 2.26, 2.35, 2.37, 2.40, 2.47, 2.54, 2.62, 2.64,
        2.90, 2.92, 2.92, 2.93, 3.21, 3.26, 3.30, 3.59, 3.68, 4.30,
        4.64, 5.34, 5.42, 6.01,
    ])
    n_anom, idx = esd(x, alpha=0.05, k_max=10, robust=False)
    assert n_anom == 3
    assert set(idx.tolist()) == {51, 52, 53}


def test_esd_robust_finds_spikes():
    rng = np.random.default_rng(42)
    x = rng.normal(0, 1, 500)
    x[[10, 200, 499]] += 15.0
    n_anom, idx = esd(x, alpha=0.05, k_max=10, robust=True)
    assert n_anom == 3
    assert set(idx.tolist()) == {10, 200, 499}


def test_esd_constant_series():
    n_anom, idx = esd(np.full(100, 7.0), robust=True)
    assert n_anom == 0 and idx.size == 0
