"""G1 distributed path: tier2 recomputed from tier1 re-read from parquet
must be bit-identical to the in-kernel tier2 (SURVEY.md §2.2 G1)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from anomalydetection_ray.oracle import TIER_SCHEMA
from anomalydetection_ray.sources.fixtures import fixture_table
from anomalydetection_ray.sources.validate import validate_batch
from anomalydetection_ray.stages.rollup import rollup_batch
from tests.test_rollup_engine import _sorted_np


def test_distributed_tier2_matches_kernel(ray_session, tmp_path):
    import ray.data

    tbl = fixture_table(include_giant=False)
    tiers = rollup_batch(validate_batch(tbl))
    t1 = tiers.filter(pa.compute.equal(tiers.column("tier"), 1))
    t2_kernel = tiers.filter(pa.compute.equal(tiers.column("tier"), 2))

    # write tier1 out in shuffled small files to force an arbitrary layout
    rng = np.random.default_rng(0)
    perm = rng.permutation(t1.num_rows)
    t1_shuf = t1.take(pa.array(perm))
    d = tmp_path / "tier1"
    d.mkdir()
    for i, lo in enumerate(range(0, t1_shuf.num_rows, 700)):
        pq.write_table(t1_shuf.slice(lo, 700), d / f"f{i:03d}.parquet")

    from anomalydetection_ray.stages.merge import tier2_from_tier1_ds

    t1_ds = ray.data.read_parquet(str(d))
    t2_dist = pa.concat_tables(
        [ray.get(r) for r in tier2_from_tier1_ds(t1_ds).to_arrow_refs()]
    ).select(TIER_SCHEMA.names).cast(TIER_SCHEMA)

    assert t2_dist.num_rows == t2_kernel.num_rows
    e, o = _sorted_np(t2_dist), _sorted_np(t2_kernel)
    for name in TIER_SCHEMA.names:
        if e[name].dtype == np.float64:
            assert np.array_equal(e[name].view(np.uint64), o[name].view(np.uint64)), name
        else:
            assert np.array_equal(e[name], o[name]), name


def test_salted_groupby_sum(ray_session):
    import ray.data

    from anomalydetection_ray.stages.merge import salted_groupby_sum

    n = 5000
    rng = np.random.default_rng(1)
    keys = np.where(rng.random(n) < 0.9, "hot", "cold")  # 90% skew
    vals = rng.integers(0, 100, n)
    ds = ray.data.from_arrow(pa.table({"k": keys.tolist(), "v": vals.tolist()}))
    out = {r["k"]: r for r in salted_groupby_sum(ds, "k", ["v"], num_salts=8).take_all()}
    for k in ("hot", "cold"):
        mask = keys == k
        assert out[k]["sum_v"] == int(vals[mask].sum())
        assert out[k]["count"] == int(mask.sum())


def test_merge_sorted_runs_matches_group_reference():
    """_merge_sorted_runs (vectorized) == tier2_group_merge (per group),
    including count=0 (drop-policy filled) children and empty groups."""
    import pyarrow.compute as pc

    from anomalydetection_ray.stages.merge import (
        _merge_sorted_runs,
        tier2_group_merge,
    )

    rng = np.random.default_rng(5)
    rows = []
    for d in range(12):
        doc = f"doc-{d:03d}"
        nb1 = int(rng.integers(1, 25))
        for b in range(nb1):
            cnt = int(rng.choice([0, 1000, 1000, 1000, int(rng.integers(1, 1000))]))
            mean = float(rng.normal(1000, 50)) if cnt else 0.0
            rows.append(
                {
                    "doc_id": doc, "source": "s", "tier": 1, "bucket": b,
                    "min": None if cnt == 0 else int(rng.integers(0, 100)),
                    "max": None if cnt == 0 else int(rng.integers(100, 200)),
                    "mean": mean, "count": cnt,
                    "anomaly_score": float(rng.random()),
                    "filled": cnt == 0,
                }
            )
    t1 = pa.Table.from_pylist(rows, schema=TIER_SCHEMA)
    b2 = np.asarray(t1.column("bucket"), dtype=np.int64) // 10
    t1 = t1.append_column("bucket2", pa.array(b2, type=pa.int64()))
    t1 = t1.sort_by([("doc_id", "ascending"), ("source", "ascending"),
                     ("bucket2", "ascending"), ("bucket", "ascending")])
    got = _merge_sorted_runs(t1).sort_by([("doc_id", "ascending"), ("bucket", "ascending")])

    keys = sorted({(r["doc_id"], r["source"], r["bucket"] // 10) for r in rows})
    parts = []
    for d, s, bb in keys:
        g = t1.filter(
            pc.and_(pc.equal(t1.column("doc_id"), d), pc.equal(t1.column("bucket2"), bb))
        ).drop_columns(["bucket2"])
        parts.append(tier2_group_merge(g))
    want = pa.concat_tables(parts).sort_by(
        [("doc_id", "ascending"), ("bucket", "ascending")]
    ).cast(TIER_SCHEMA)
    got = got.cast(TIER_SCHEMA)
    assert got.num_rows == want.num_rows
    for name in TIER_SCHEMA.names:
        a, b = got.column(name), want.column(name)
        if name == "mean":
            av = np.asarray(a, dtype=np.float64)
            bv = np.asarray(b, dtype=np.float64)
            assert np.array_equal(av.view(np.uint64), bv.view(np.uint64)), name
        else:
            assert a.to_pylist() == b.to_pylist(), name


def test_pkey_exchanges_same_under_hash_shuffle(ray_session):
    """configure_shuffle('hash') routes the _pkey groupby through Ray's
    hash-shuffle aggregators; outputs must be identical to the default
    sort shuffle (every per-partition kernel sorts its own partition)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from anomalydetection_ray.stages.join import copartition_attach
    from anomalydetection_ray.stages.runs import configure_shuffle, keep_first_by

    rng = np.random.default_rng(5)
    n = 6000
    t = pa.table({"k": rng.integers(0, 900, n), "v": rng.integers(0, 10**6, n)})
    r = pa.table({"rk": np.arange(900, dtype=np.int64),
                  "payload": rng.integers(0, 99, 900)})

    def run():
        ds = ray.data.from_arrow(t).repartition(8)
        rds = ray.data.from_arrow(r).repartition(4)
        first = (keep_first_by(ds, ["k"], order_by=["v"])
                 .to_pandas().sort_values(["k"]).reset_index(drop=True))
        joined = (copartition_attach(ds, rds, "k", "rk", ["payload"])
                  .to_pandas().sort_values(["k", "v"]).reset_index(drop=True))
        return first, joined

    ctx = ray.data.DataContext.get_current()
    saved = (ctx.shuffle_strategy, ctx.max_hash_shuffle_aggregators,
             ctx.default_hash_shuffle_parallelism)
    f1, j1 = run()
    try:
        configure_shuffle("hash")
        f2, j2 = run()
    finally:
        (ctx.shuffle_strategy, ctx.max_hash_shuffle_aggregators,
         ctx.default_hash_shuffle_parallelism) = saved
    assert f1.equals(f2)
    assert j1.equals(j2)


def test_asof_attach_matches_merge_asof(ray_session):
    """Distributed as-of join == pandas merge_asof(by=, direction='backward')
    on a multi-key table with out-of-range rows (nulls), duplicate left
    timestamps, and a key with no right rows at all."""
    import pandas as pd
    import ray.data

    from anomalydetection_ray.stages.join import asof_attach

    rng = np.random.default_rng(11)
    n = 4000
    left = pd.DataFrame({
        "k": rng.choice(["a", "b", "c", "orphan"], n),
        "t": rng.integers(0, 10_000, n).astype("datetime64[us]"),
        "val": rng.integers(0, 1000, n),
    })
    left.loc[left.index[:5], "t"] = left["t"].iloc[5]  # duplicate left ts
    nr = 300
    right = pd.DataFrame({
        "k": rng.choice(["a", "b", "c"], nr),
        "t": rng.integers(500, 9_500, nr).astype("datetime64[us]"),
    })
    right = right.drop_duplicates(["k", "t"]).reset_index(drop=True)
    right["payload"] = np.arange(len(right), dtype=np.int64)

    lds = ray.data.from_arrow(pa.Table.from_pandas(left)).repartition(6)
    rds = ray.data.from_arrow(pa.Table.from_pandas(right)).repartition(3)
    got = (asof_attach(lds, rds, by="k", on="t", payload_cols=["payload"],
                       num_partitions=4)
           .to_pandas().sort_values(["k", "t", "val"]).reset_index(drop=True))

    exp = pd.merge_asof(left.sort_values("t"), right.sort_values("t"),
                        on="t", by="k", direction="backward")
    exp = exp.sort_values(["k", "t", "val"]).reset_index(drop=True)
    assert got["payload"].isna().equals(exp["payload"].isna())
    pd.testing.assert_series_equal(
        got["payload"].astype("float64"), exp["payload"].astype("float64"))
    pd.testing.assert_frame_equal(got[["k", "t", "val"]], exp[["k", "t", "val"]])


def test_asof_attach_forward_matches_merge_asof(ray_session):
    """direction='forward' == pandas merge_asof(direction='forward') on the
    same adversarial table (nulls past the last right row, duplicate left
    timestamps, an orphan key).  Right side has unique (k, t) so pandas'
    arbitrary-equal-ts pick cannot diverge from ours."""
    import pandas as pd
    import ray.data

    from anomalydetection_ray.stages.join import asof_attach

    rng = np.random.default_rng(13)
    n = 4000
    left = pd.DataFrame({
        "k": rng.choice(["a", "b", "c", "orphan"], n),
        "t": rng.integers(0, 10_000, n).astype("datetime64[us]"),
        "val": rng.integers(0, 1000, n),
    })
    left.loc[left.index[:5], "t"] = left["t"].iloc[5]
    nr = 300
    right = pd.DataFrame({
        "k": rng.choice(["a", "b", "c"], nr),
        "t": rng.integers(500, 9_500, nr).astype("datetime64[us]"),
    })
    right = right.drop_duplicates(["k", "t"]).reset_index(drop=True)
    right["payload"] = np.arange(len(right), dtype=np.int64)

    lds = ray.data.from_arrow(pa.Table.from_pandas(left)).repartition(6)
    rds = ray.data.from_arrow(pa.Table.from_pandas(right)).repartition(3)
    got = (asof_attach(lds, rds, by="k", on="t", payload_cols=["payload"],
                       num_partitions=4, direction="forward")
           .to_pandas().sort_values(["k", "t", "val"]).reset_index(drop=True))

    exp = pd.merge_asof(left.sort_values("t"), right.sort_values("t"),
                        on="t", by="k", direction="forward")
    exp = exp.sort_values(["k", "t", "val"]).reset_index(drop=True)
    assert got["payload"].isna().equals(exp["payload"].isna())
    pd.testing.assert_series_equal(
        got["payload"].astype("float64"), exp["payload"].astype("float64"))


def test_asof_attach_forward_tiebreak(ray_session):
    """Equal-``on`` right rows resolve to the SMALLEST tiebreak payload in
    forward mode — the deterministic contract j11's oracle depends on."""
    import pandas as pd
    import ray.data

    left = pd.DataFrame({"k": ["a", "a"], "t": np.array([5, 20]).astype("datetime64[us]"),
                         "val": [0, 1]})
    right = pd.DataFrame({"k": ["a"] * 3,
                          "t": np.array([10, 10, 10]).astype("datetime64[us]"),
                          "payload": np.array([7, 3, 9], dtype=np.int64)})
    lds = ray.data.from_arrow(pa.Table.from_pandas(left))
    rds = ray.data.from_arrow(pa.Table.from_pandas(right))
    got = (asof_attach_import()(lds, rds, by="k", on="t",
                                payload_cols=["payload"], num_partitions=2,
                                direction="forward", tiebreak="payload")
           .to_pandas().sort_values("val").reset_index(drop=True))
    assert got.loc[0, "payload"] == 3       # earliest >= 5 at t=10, min tiebreak
    assert pd.isna(got.loc[1, "payload"])   # nothing at-or-after t=20


def asof_attach_import():
    from anomalydetection_ray.stages.join import asof_attach
    return asof_attach
