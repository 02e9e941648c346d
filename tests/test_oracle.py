"""Oracle self-consistency (SURVEY.md §5.1/§5.3): the single-process
reference must satisfy its own invariants before it can gate the engine."""

import numpy as np
import pyarrow as pa

from anomalydetection_ray.codecs import DodState
from anomalydetection_ray.constants import MAX_TOKENS_PER_PART, TIER1_BUCKET, TIER2_BUCKET
from anomalydetection_ray.functions.stats import gap_fill, moving_mean_std, robust_score, threshold_flags
from anomalydetection_ray.oracle import (
    decode_part,
    encode_part,
    rollup_series,
    rollup_table,
    split_series,
)
from anomalydetection_ray.sources.fixtures import fixture_table


def test_split_series():
    assert split_series(0) == [(0, 0, 0)]
    assert split_series(5) == [(0, 0, 5)]
    assert split_series(MAX_TOKENS_PER_PART) == [(0, 0, MAX_TOKENS_PER_PART)]
    parts = split_series(MAX_TOKENS_PER_PART + 1)
    assert parts == [(0, 0, MAX_TOKENS_PER_PART), (1, MAX_TOKENS_PER_PART, MAX_TOKENS_PER_PART + 1)]


def test_tier1_basic():
    v = np.arange(2500, dtype=np.int32)
    t1, t2 = rollup_series(v, None)
    assert t1["bucket"] == [0, 1, 2]
    assert t1["count"] == [1000, 1000, 500]
    assert t1["min"] == [0, 1000, 2000]
    assert t1["max"] == [999, 1999, 2499]
    assert t1["mean"][0] == 499.5
    # tier2: single bucket merging the three
    assert t2["bucket"] == [0]
    assert t2["count"] == [2500]
    assert t2["min"] == [0] and t2["max"] == [2499]
    assert abs(t2["mean"][0] - 1249.5) < 1e-9


def test_tier_boundary_lengths():
    for n in (1, 999, 1000, 1001, 10000, 10001):
        v = np.zeros(n, dtype=np.int32)
        t1, t2 = rollup_series(v, None)
        assert len(t1["bucket"]) == -(-n // TIER1_BUCKET)
        assert len(t2["bucket"]) == -(-n // TIER2_BUCKET)
        assert sum(t1["count"]) == n == sum(t2["count"])


def test_empty_series():
    t1, t2 = rollup_series(np.empty(0, dtype=np.int32), None)
    assert t1["bucket"] == [] and t2["bucket"] == []


def test_constant_series_zero_mad():
    v = np.full(1500, 42, dtype=np.int32)
    t1, _ = rollup_series(v, None)
    assert t1["anomaly_score"] == [0.0, 0.0]


def test_spike_scores_high():
    v = np.full(1000, 100, dtype=np.int32)
    v[500] = 2**31 - 1
    rng = np.random.default_rng(0)
    v[:500] += rng.integers(0, 10, 500).astype(np.int32)
    v[501:] += rng.integers(0, 10, 499).astype(np.int32)
    t1, _ = rollup_series(v, None)
    assert t1["anomaly_score"][0] > 1e6


def test_gap_fill_locf():
    v = np.array([0, 5, 0, 0, 9], dtype=np.int32)
    valid = np.array([False, True, False, False, True])
    out, m = gap_fill(v, valid, "locf")
    assert m is None
    assert out.tolist() == [0, 5, 5, 5, 9]


def test_gap_fill_linear():
    v = np.array([0, 10, 0, 0, 40], dtype=np.int32)
    valid = np.array([False, True, False, False, True])
    out, m = gap_fill(v, valid, "linear")
    assert m is None
    assert out.tolist() == [10, 10, 20, 30, 40]


def test_gap_fill_drop_filled_buckets():
    # one full bucket entirely null under drop policy -> filled=true row
    n = 3000
    v = np.ones(n, dtype=np.int32) * 7
    valid = np.ones(n, dtype=bool)
    valid[1000:2000] = False
    t1, t2 = rollup_series(v, valid, policy="drop")
    assert t1["filled"] == [False, True, False]
    assert t1["count"] == [1000, 0, 1000]
    assert t1["mean"] == [7.0, 7.0, 7.0]  # carry
    assert t1["min"][1] is None
    assert t2["count"] == [2000]


def test_giant_row_split_bucket_ids():
    n = MAX_TOKENS_PER_PART + 2 * TIER1_BUCKET + 5
    v = np.zeros(n, dtype=np.int32)
    t1, t2 = rollup_series(v, None)
    nb1 = MAX_TOKENS_PER_PART // TIER1_BUCKET
    assert t1["bucket"] == list(range(nb1 + 3))
    assert t1["count"][-1] == 5
    assert t2["bucket"] == list(range(MAX_TOKENS_PER_PART // TIER2_BUCKET + 1))


def test_tier2_weighted_mean_matches_direct():
    rng = np.random.default_rng(1)
    v = rng.integers(0, 50257, 10_000 + 1234).astype(np.int32)
    t1, t2 = rollup_series(v, None)
    # count-weighted tier2 mean ~ direct mean over the 10k bucket
    direct = v[:10_000].astype(np.float64).mean()
    assert abs(t2["mean"][0] - direct) < 1e-9
    direct2 = v[10_000:].astype(np.float64).mean()
    assert abs(t2["mean"][1] - direct2) < 1e-9


def test_encode_decode_part_roundtrip():
    rng = np.random.default_rng(2)
    st = DodState()
    for trial in range(10):
        n = int(rng.integers(0, 5000))
        v = rng.integers(-(2**31), 2**31 - 1, n).astype(np.int32)
        valid = None
        if trial % 3 == 0 and n > 0:
            valid = rng.random(n) > 0.1
        row = encode_part(v, valid, 0, st)
        dec, dec_valid = decode_part(row)
        if valid is None:
            assert dec_valid is None
            assert np.array_equal(dec, v)
        else:
            assert np.array_equal(dec_valid, valid)
            assert np.array_equal(dec[valid], v[valid])


def test_rollup_table_runs_on_fixtures():
    tbl = fixture_table(include_giant=False)
    t1, t2 = rollup_table(tbl)
    assert t1.num_rows > 0 and t2.num_rows > 0
    assert t1.schema.names == [
        "doc_id", "source", "tier", "bucket", "min", "max", "mean", "count", "anomaly_score", "filled",
    ]
    # every non-filled tier1 row: min <= mean <= max
    df = t1.to_pandas()
    live = df[~df["filled"]]
    assert (live["min"] <= live["mean"] + 1e-9).all()
    assert (live["mean"] <= live["max"] + 1e-9).all()
    assert (live["count"] > 0).all()


def test_moving_stats_and_threshold():
    x = np.array([1.0, 1, 1, 1, 1, 100, 1, 1, 1, 1])
    mean, std = moving_mean_std(x, 3)
    assert np.isnan(mean[0]) and np.isnan(mean[1])
    assert mean[2] == 1.0 and std[2] == 0.0
    flags = threshold_flags(x, 3, c=3.0)
    assert not flags[:5].any()


def test_robust_score_known():
    x = np.array([1.0, 1, 1, 1, 101])
    # med=1, dev=(0,0,0,0,100), mad=0 -> 0.0
    assert robust_score(x) == 0.0
    x = np.array([1.0, 2, 3, 4, 103])
    med = 3.0
    mad = 1.0
    assert robust_score(x) == 100.0 / (1.4826 * mad)


def test_ewma_matches_sequential_definition():
    """Blocked-scan EWMA == the Roberts-1959 recurrence within a few ULPs,
    across block boundaries and alpha edge cases."""
    import numpy as np

    from anomalydetection_ray.functions.stats import ewma

    rng = np.random.default_rng(17)
    x = rng.integers(0, 50257, 9000).astype(np.float64)
    for alpha in (0.001, 0.05, 0.5, 0.97):
        got = ewma(x, alpha)
        s = x[0]
        for i in (1, 100, 4095, 4096, 4097, 8999):
            # spot-check with the exact recurrence up to index i
            s = x[0]
            for j in range(1, i + 1):
                s = alpha * x[j] + (1 - alpha) * s
            assert abs(got[i] - s) <= 1e-9 * max(abs(s), 1.0), (alpha, i)
    assert np.array_equal(ewma(x, 1.0), x)
    assert np.array_equal(ewma(x, 0.0), np.full_like(x, x[0]))
