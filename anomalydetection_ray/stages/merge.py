"""G1 distributed merge path + salted groupby (SURVEY.md §2.2 G1, §4 skew).

The in-kernel tier2 merge (stages/rollup.py) covers the common case where a
part's tier1 rows are emitted together.  This module is the general path
the spec also requires: tier1 re-read from disk (arbitrary block layout)
-> groupby (doc_id, source, part-aligned tier2 bucket) -> per-group G1
merge with the same fixed-order Kahan arithmetic -> tier2 rows that are
bit-identical to the in-kernel ones (tested).

``salted_groupby_sum`` is the skew defense for hot keys (north rule:
"salted groupby-aggregate shuffles"): stage 1 groups on (key, salt) where
salt = hash(doc_id) % S so a hot key's rows land in S different reducers,
stage 2 merges the S partials — exact for sum/count/min/max.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from anomalydetection_ray.constants import TIER1_BUCKET, TIER2_BUCKET
from anomalydetection_ray.functions.stats import kahan_weighted_mean
from anomalydetection_ray.oracle import TIER_SCHEMA

_R = TIER2_BUCKET // TIER1_BUCKET


def tier2_group_merge(group: pa.Table) -> pa.Table:
    """One (doc_id, source, bucket2) group of tier1 rows -> one tier2 row.
    Children sorted by bucket id => identical Kahan order to the kernel."""
    group = group.sort_by([("bucket", "ascending")])
    counts = np.asarray(group.column("count"), dtype=np.int64)
    means = np.asarray(group.column("mean"), dtype=np.float64)
    scores = np.asarray(group.column("anomaly_score"), dtype=np.float64)
    mins = group.column("min")
    maxs = group.column("max")
    live = counts > 0
    cnt = int(counts.sum())
    bucket2 = int(group.column("bucket")[0].as_py()) // _R
    if cnt == 0:
        mn = mx = None
        mean = 0.0  # leading-carry semantics need neighbor context; the
        # distributed path only arises under the drop policy — documented
        filled = True
    else:
        mn = min(mins[i].as_py() for i in np.flatnonzero(live))
        mx = max(maxs[i].as_py() for i in np.flatnonzero(live))
        mean = kahan_weighted_mean(means, counts)
        filled = False
    return pa.table(
        {
            "doc_id": pa.array([group.column("doc_id")[0].as_py()], type=pa.string()),
            "source": pa.array([group.column("source")[0].as_py()], type=pa.string()),
            "tier": pa.array([2], type=pa.int8()),
            "bucket": pa.array([bucket2], type=pa.int64()),
            "min": pa.array([mn], type=pa.int32()),
            "max": pa.array([mx], type=pa.int32()),
            "mean": pa.array([mean], type=pa.float64()),
            "count": pa.array([cnt], type=pa.int64()),
            "anomaly_score": pa.array([float(scores.max())], type=pa.float64()),
            "filled": pa.array([filled], type=pa.bool_()),
        }
    )


def tier2_from_tier1_ds(tier1_ds):
    """Distributed G1: tier1 Dataset (any layout) -> tier2 Dataset."""

    def add_bucket2(batch: pa.Table) -> pa.Table:
        b2 = np.asarray(batch.column("bucket"), dtype=np.int64) // _R
        return batch.append_column("bucket2", pa.array(b2, type=pa.int64()))

    withb2 = tier1_ds.map_batches(add_bucket2, batch_format="pyarrow", zero_copy_batch=True)
    out = withb2.groupby(["doc_id", "source", "bucket2"]).map_groups(
        tier2_group_merge, batch_format="pyarrow"
    )
    return out.select_columns(TIER_SCHEMA.names)


def salted_groupby_sum(ds, key: str, value_cols: list[str], num_salts: int = 16):
    """Skew-defended grouped sum/count: (key, salt) partial aggregate, then
    a tiny final merge over num_salts partials per key.  Exact (integer /
    associative) aggregates only."""
    import zlib

    from ray.data.aggregate import Count, Sum

    def add_salt(batch: pa.Table) -> pa.Table:
        # salt from row content hash -> deterministic, spreads hot keys
        ks = batch.column(key).to_pylist()
        salt = np.fromiter(
            ((zlib.crc32(str((k, i)).encode()) % num_salts) for i, k in enumerate(ks)),
            dtype=np.int32,
            count=len(ks),
        )
        return batch.append_column("_salt", pa.array(salt, type=pa.int32()))

    aggs1 = [Sum(c, alias_name=f"{c}_p") for c in value_cols] + [Count(alias_name="_cnt_p")]
    partial = (
        ds.map_batches(add_salt, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([key, "_salt"])
        .aggregate(*aggs1)
    )
    aggs2 = [Sum(f"{c}_p", alias_name=f"sum_{c}") for c in value_cols] + [
        Sum("_cnt_p", alias_name="count")
    ]
    return partial.groupby(key).aggregate(*aggs2)
