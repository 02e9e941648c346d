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


def test_esd_direction_one_sided():
    """pos finds only upward spikes, neg only downward; both finds both;
    the one-tailed critical value is strictly below the two-tailed one."""
    rng = np.random.default_rng(7)
    x = rng.normal(0, 1, 400)
    x[[20, 110]] += 12.0   # upward spikes
    x[[250, 333]] -= 12.0  # downward spikes
    n_pos, idx_pos = esd(x, k_max=10, direction="pos")
    n_neg, idx_neg = esd(x, k_max=10, direction="neg")
    n_both, idx_both = esd(x, k_max=10, direction="both")
    assert set(idx_pos.tolist()) == {20, 110}
    assert set(idx_neg.tolist()) == {250, 333}
    assert set(idx_both.tolist()) == {20, 110, 250, 333}
    assert esd_lambda(100, 1, 0.05, False) < esd_lambda(100, 1, 0.05, True)


def test_esd_direction_rejects_unknown():
    import pytest

    with pytest.raises(ValueError):
        esd(np.arange(10.0), direction="sideways")


def test_esd_piecewise_local_windows():
    """The longterm piecewise mode flags a spike that the whole-series
    robust test also sees, but keeps window-local centers: a strong level
    shift between windows does not bleed anomalies across the boundary."""
    from anomalydetection_ray.stages.detectors import (_det_esd,
                                                       _det_esd_piecewise)

    rng = np.random.default_rng(11)
    # two regimes: mean 0 then mean 80, one true spike inside each
    x = np.concatenate([rng.normal(0, 1, 100), rng.normal(80, 1, 100)])
    x[40] += 15.0
    x[160] += 15.0
    out = _det_esd_piecewise(x, window=100)
    assert set(np.asarray(out["anomaly_positions"]).tolist()) == {40, 160}
    # per-window output == running plain ESD on each slice independently
    manual = []
    for w0 in (0, 100):
        o = _det_esd(x[w0:w0 + 100])
        manual.extend((np.asarray(o["anomaly_positions"]) + w0).tolist())
    assert sorted(out["anomaly_positions"].tolist()) == sorted(manual)


def test_shesd_piecewise_remainder_window():
    """Spikes inside full windows are found with window-local seasonal
    estimates; a short remainder window (fewer points than phases, so
    per-phase medians absorb everything) reports nothing rather than
    crashing, and positions stay series-global."""
    from anomalydetection_ray.stages.detectors import _det_shesd_piecewise

    rng = np.random.default_rng(3)
    x = rng.normal(0, 1, 230)  # windows: 100, 100, 30
    x[150] += 20.0  # inside the second full window
    out = _det_shesd_piecewise(x, window=100, period=24)
    pos = set(np.asarray(out["anomaly_positions"]).tolist())
    assert 150 in pos
    assert all(p < 230 for p in pos)
    assert out["n_anomalies"] == len(pos)


def test_shesd_trend_detrends_drifting_seasonal():
    """A seasonal series with a strong level drift: the cycle-median
    trend term removes the drift so the injected spike dominates the
    residual; the trend-less shesd sees drift-inflated residuals."""
    from anomalydetection_ray.stages.detectors import (_det_shesd,
                                                       _det_shesd_trend)

    period, cycles = 24, 10
    n = period * cycles
    pos = np.arange(n)
    rng = np.random.default_rng(5)
    season = 10.0 * (pos % period >= 12)
    drift = 40.0 * (pos // period)  # strong per-cycle level shifts
    x = season + drift + rng.normal(0, 1, n)
    x[130] += 500.0
    out = _det_shesd_trend(x, period=period)
    assert 130 in set(np.asarray(out["anomaly_positions"]).tolist())
    # sanity: without the trend term the drift floods the residual MAD,
    # hiding the spike — exactly the masking STL-style decomposition fixes
    plain = _det_shesd(x, period=period)
    assert 130 not in set(np.asarray(plain["anomaly_positions"]).tolist())


def test_shesd_threshold_filters_low_value_anomalies():
    """A53 (the family's ``threshold=`` knob): a strong seasonal residual
    at a LOW phase is a real S-H-ESD anomaly but its raw value sits far
    below the per-cycle maxima, so med_max filters it; the same-size
    spike at the TOP phase survives.  p95/p99 keep only anomalies at or
    above the nearest-rank order statistic of the cycle maxima."""
    from anomalydetection_ray.stages.detectors import (_det_shesd,
                                                       _det_shesd_threshold)

    period, cycles = 24, 10
    n = period * cycles
    rng = np.random.default_rng(9)
    x = 10.0 * (np.arange(n) % period) + rng.normal(0, 1, n)
    x[50] += 15.0    # phase 2: value ~35, a >10-sigma seasonal residual
    x[119] += 15.0   # phase 23: value ~245, above every cycle max
    base = _det_shesd(x, period=period, direction="pos")
    assert {50, 119} <= set(np.asarray(base["anomaly_positions"]).tolist())
    med = _det_shesd_threshold(x, period=period, threshold="med_max")
    kept = set(np.asarray(med["anomaly_positions"]).tolist())
    assert 119 in kept and 50 not in kept
    p99 = _det_shesd_threshold(x, period=period, threshold="p99")
    # rank ceil(0.99 * 10) = 10: the largest cycle max IS x[119] itself,
    # so >= keeps exactly that spike
    assert set(np.asarray(p99["anomaly_positions"]).tolist()) == {119}
    assert med["n_anomalies"] == len(kept)


def test_shesd_threshold_rejects_unknown():
    import pytest

    from anomalydetection_ray.stages.detectors import _det_shesd_threshold

    with pytest.raises(ValueError):
        _det_shesd_threshold(np.arange(48.0), threshold="p90")


def test_shesd_expected_batch_exact_int_evalue():
    """A54 (the family's ``e_value``): exp2_sum equals the brute-force
    sum of 2x the seasonal phase median at each anomaly position — an
    exact integer for integer token series."""
    import pyarrow as pa

    from anomalydetection_ray.stages.detectors import (_det_shesd,
                                                       shesd_expected_batch)

    period = 24
    rng = np.random.default_rng(17)
    tok = (10 * (np.arange(240) % period)
           + rng.integers(-3, 4, 240)).astype(np.int32)
    tok[130] += 180
    batch = pa.table({
        "doc_id": pa.array(["d0"], type=pa.string()),
        "part_id": pa.array([0], type=pa.int32()),
        "tokens": pa.array([tok.tolist()], type=pa.list_(pa.int32())),
    })
    out = shesd_expected_batch(batch, period=period)
    det = _det_shesd(tok, period=period)
    p = np.asarray(det["anomaly_positions"], dtype=np.int64)
    assert 130 in set(p.tolist())
    x = tok.astype(np.float64)
    pmed = np.array([np.median(x[ph::period]) for ph in range(period)])
    expect2 = int((2.0 * pmed[p % period]).sum())
    row = out.to_pylist()[0]
    assert row["detector"] == "shesd_evalue"
    assert row["n_anomalies"] == det["n_anomalies"]
    assert row["pos_sum"] == int(p.sum())
    assert row["exp2_sum"] == expect2
    # the doubled phase medians are integers (medians of ints are exact
    # halves), so the oracle's integer compare is well-defined
    assert float(row["exp2_sum"]) == (2.0 * pmed[p % period]).sum()


def test_shesd_onlylast_keeps_trailing_cycle_only():
    """A55 (the family's ``only_last=`` knob): detection runs over the
    whole series, but only anomalies in the last `only_last` cycles are
    reported — an early spike is detected by plain shesd yet dropped by
    only_last=1; a spike in the trailing (partial) cycle survives; and
    only_last=2 widens the window to recover a second-to-last-cycle
    spike."""
    from anomalydetection_ray.stages.detectors import (_det_shesd,
                                                       _det_shesd_onlylast)

    period = 24
    n = period * 10 + 7   # trailing partial cycle, as a partial day
    rng = np.random.default_rng(23)
    x = 10.0 * (np.arange(n) % period) + rng.normal(0, 1, n)
    x[30] += 90.0                 # cycle 1: early spike
    x[period * 9 + 3] += 90.0     # cycle 9: second-to-last
    x[period * 10 + 2] += 90.0    # cycle 10 (partial): trailing
    base = set(np.asarray(_det_shesd(x, period=period)
                          ["anomaly_positions"]).tolist())
    assert {30, period * 9 + 3, period * 10 + 2} <= base
    last1 = _det_shesd_onlylast(x, period=period, only_last=1)
    kept1 = set(np.asarray(last1["anomaly_positions"]).tolist())
    # cutoff = (ceil(247/24) - 1) * 24 = 10*24 = 240: partial cycle only
    assert period * 10 + 2 in kept1
    assert 30 not in kept1 and period * 9 + 3 not in kept1
    last2 = _det_shesd_onlylast(x, period=period, only_last=2)
    kept2 = set(np.asarray(last2["anomaly_positions"]).tolist())
    assert {period * 9 + 3, period * 10 + 2} <= kept2 and 30 not in kept2
    assert last1["n_anomalies"] == len(kept1)


def test_shesd_onlylast_rejects_nonpositive():
    import pytest

    from anomalydetection_ray.stages.detectors import _det_shesd_onlylast

    with pytest.raises(ValueError):
        _det_shesd_onlylast(np.arange(48.0), only_last=0)
