"""W1/W2/J5 window-family + IVF ANN tests (round-3 additions).

References are independent pandas/numpy implementations (different code
path than the partitioned Arrow kernels), plus partition-count invariance
— the distributed layout must not change results.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
GAP_US = 43_200_000_000


def _events_df() -> pd.DataFrame:
    import pyarrow.parquet as pq

    return pq.read_table(
        f"{SF}/events.parquet",
        columns=["event_id", "ts", "user_id", "value"]).to_pandas()


def _sessions_ref(df: pd.DataFrame) -> pd.DataFrame:
    df = df.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
    ts = df["ts"].astype("datetime64[us]").astype(np.int64)
    rows = []
    for uid, g in df.groupby("user_id", sort=True):
        idx = g.index.to_numpy()
        t = ts[idx].to_numpy()
        brk = np.ones(len(idx), dtype=bool)
        brk[1:] = (t[1:] - t[:-1]) > GAP_US
        sid = np.cumsum(brk) - 1
        for s in range(sid.max() + 1):
            m = sid == s
            rows.append({
                "user_id": uid, "session_seq": s,
                "n_events": int(m.sum()),
                "duration_us": int(t[m].max() - t[m].min()),
                "min_value": float(g["value"].to_numpy()[m].min()),
                "max_value": float(g["value"].to_numpy()[m].max()),
            })
    return pd.DataFrame(rows)


def test_sessionize_matches_reference(ray_session):
    from anomalydetection_ray.pipelines.windows import w1_sessionize_events

    got = w1_sessionize_events(SF).to_pandas()
    ref = _sessions_ref(_events_df())
    assert len(got) == len(ref)
    cols = ["user_id", "session_seq", "n_events", "duration_us",
            "min_value", "max_value"]
    g = got[cols].sort_values(["user_id", "session_seq"]).reset_index(drop=True)
    r = ref[cols].sort_values(["user_id", "session_seq"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, r, check_dtype=False)
    # bounds are consistent
    assert (got["end_ts"] >= got["start_ts"]).all()


def test_sessionize_partition_invariance(ray_session):
    from anomalydetection_ray.pipelines.windows import w1_sessionize_events

    a = w1_sessionize_events(SF, num_partitions=1).to_pandas()
    b = w1_sessionize_events(SF, num_partitions=16).to_pandas()
    key = ["user_id", "session_seq"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_lag_features_match_reference(ray_session):
    from anomalydetection_ray.pipelines.windows import w2_lag_features_events

    got = w2_lag_features_events(SF).to_pandas().sort_values(
        "event_id").reset_index(drop=True)
    df = _events_df().sort_values(["user_id", "ts", "event_id"])
    ts = df["ts"].astype("datetime64[us]").astype(np.int64)
    grp = df.groupby("user_id", sort=False)
    ref = pd.DataFrame({
        "event_id": df["event_id"],
        "prev_value": grp["value"].shift(1),
        "gap_us": ts.groupby(df["user_id"]).diff(),
        "seq": grp.cumcount(),
    }).sort_values("event_id").reset_index(drop=True)
    assert len(got) == len(ref)
    assert (got["event_id"] == ref["event_id"]).all()
    pd.testing.assert_series_equal(got["prev_value"], ref["prev_value"],
                                   check_dtype=False)
    delta = got["value"] - got["prev_value"]
    pd.testing.assert_series_equal(got["delta_value"], delta,
                                   check_names=False, check_dtype=False)
    g_gap = got["gap_us"].astype("Float64")
    r_gap = ref["gap_us"].astype("Float64")
    pd.testing.assert_series_equal(g_gap, r_gap, check_names=False)
    assert (got["seq"] == ref["seq"]).all()


def test_interval_stats_match_reference(ray_session):
    from anomalydetection_ray.pipelines.windows import (
        j5_interval_stats,
        seeded_windows,
    )

    got = j5_interval_stats(SF).to_pandas().sort_values(
        "window_id").reset_index(drop=True)
    df = _events_df()
    ts = df["ts"].astype("datetime64[us]").astype(np.int64).to_numpy()
    v = df["value"].to_numpy()
    lo, hi = seeded_windows(int(ts.min()), int(ts.max()))
    rows = []
    for k in range(len(lo)):
        m = (ts >= lo[k]) & (ts < hi[k])
        if m.any():
            rows.append({"window_id": k, "lo_us": int(lo[k]), "hi_us": int(hi[k]),
                         "n_events": int(m.sum()),
                         "min_value": float(v[m].min()),
                         "max_value": float(v[m].max())})
    ref = pd.DataFrame(rows)
    assert len(got) == len(ref) > 0
    pd.testing.assert_frame_equal(got, ref, check_dtype=False)


def test_ann_ivf_consistency(ray_session):
    """IVF results must come only from the probed inverted lists, ordered
    by exact cosine, and share neighbors with the true top-k."""
    import pyarrow.parquet as pq

    from anomalydetection_ray.pipelines.similarity import (
        _ivf_centroids,
        _ivf_params,
        ann_topk_bruteforce,
        ann_topk_ivf,
    )

    res = ann_topk_ivf(SF, k=10).take_all()
    assert 0 < len(res) <= 10
    sims = [r["cosine"] for r in res]
    assert sims == sorted(sims, reverse=True)

    # recompute assignments + probe set in plain numpy
    n_cents, dim = _ivf_params(SF)
    cents = _ivf_centroids(n_cents, dim)
    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(t.column("vec_id"), dtype=np.int64)
    m = np.asarray(t.column("embedding").combine_chunks().values,
                   dtype=np.float64).reshape(len(ids), -1)
    cid = np.argmax(m @ cents.T, axis=1)
    q = m[int(np.flatnonzero(ids == 0)[0])]
    probe = set(np.argsort(-(cents @ q), kind="stable")[:2].tolist())
    by_id = dict(zip(ids.tolist(), cid.tolist()))
    for r in res:
        assert by_id[r["vec_id"]] in probe

    bf_ids = {r["vec_id"] for r in ann_topk_bruteforce(SF, k=10).take_all()}
    assert any(r["vec_id"] in bf_ids for r in res)
