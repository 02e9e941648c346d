"""G1 distributed merge path + salted groupby (SURVEY.md §2.2 G1, §4 skew).

The in-kernel tier2 merge (stages/rollup.py) covers the common case where a
part's tier1 rows are emitted together.  This module is the general path
the spec also requires: tier1 re-read from disk (arbitrary block layout)
-> hash-repartition by (doc_id, source, part-aligned tier2 bucket) ->
per-block vectorized run merge recovering each child's exact integer
value-sum from (mean, count) -> tier2 rows that are bit-identical to the
in-kernel ones (tested); the merged mean is order-free by construction.
``tier2_group_merge`` is kept as the one-group-at-a-time reference the
vectorized path is cross-checked against.

``salted_groupby_sum`` is the skew defense for hot keys (north rule:
"salted groupby-aggregate shuffles"): stage 1 groups on (key, salt) where
salt = hash(doc_id) % S so a hot key's rows land in S different reducers,
stage 2 merges the S partials — exact for sum/count/min/max.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from anomalydetection_ray.constants import TIER1_BUCKET, TIER2_BUCKET
from anomalydetection_ray.functions.stats import recover_int_sums, weighted_mean_exact
from anomalydetection_ray.oracle import TIER_SCHEMA

_R = TIER2_BUCKET // TIER1_BUCKET


def tier2_group_merge(group: pa.Table) -> pa.Table:
    """One (doc_id, source, bucket2) group of tier1 rows -> one tier2 row.
    (Reference path the vectorized merge is cross-checked against.)"""
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
        mean = weighted_mean_exact(means, counts)
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


_I32_MAX = np.int32(np.iinfo(np.int32).max)
_I32_MIN = np.int32(np.iinfo(np.int32).min)


def _group_starts(batch: pa.Table) -> np.ndarray:
    """Start indices of (doc_id, source, bucket2) runs in a sorted batch."""
    n = batch.num_rows
    b2 = np.asarray(batch.column("bucket2"), dtype=np.int64)
    neq = b2[1:] != b2[:-1]
    for col in ("doc_id", "source"):
        c = batch.column(col)
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        neq |= np.asarray(pa.compute.not_equal(c.slice(1), c.slice(0, n - 1)))
    return np.concatenate((np.zeros(1, dtype=np.int64), np.flatnonzero(neq) + 1))


def _merge_sorted_runs(batch: pa.Table) -> pa.Table:
    """Vectorized G1 over a batch sorted by (doc_id, source, bucket2,
    bucket): one output row per run; the merged mean recovers exact integer
    sums so it is order-free and bit-identical to the kernel/oracle."""
    n = batch.num_rows
    if n == 0:
        return TIER_SCHEMA.empty_table()
    starts = _group_starts(batch)
    counts = np.asarray(batch.column("count"), dtype=np.int64)
    means = np.asarray(batch.column("mean"), dtype=np.float64)
    scores = np.asarray(batch.column("anomaly_score"), dtype=np.float64)
    live = counts > 0
    # fill nulls BEFORE the int cast (a null min/max converts via float NaN
    # and an undefined NaN->int value otherwise); the sentinel substitution
    # must not depend on nulls coinciding with count == 0
    import pyarrow.compute as pc

    mins_f = np.asarray(pc.fill_null(batch.column("min"), int(_I32_MAX)), dtype=np.int64)
    maxs_f = np.asarray(pc.fill_null(batch.column("max"), int(_I32_MIN)), dtype=np.int64)
    mins = np.where(live, mins_f, _I32_MAX)
    maxs = np.where(live, maxs_f, _I32_MIN)
    cnt2 = np.add.reduceat(counts, starts)
    min2 = np.minimum.reduceat(mins, starts)
    max2 = np.maximum.reduceat(maxs, starts)
    score2 = np.maximum.reduceat(scores, starts)
    ng = starts.shape[0]
    # exact integer value-sums recovered from (mean, count) -> one division
    sums2 = np.add.reduceat(recover_int_sums(means, counts), starts)
    empty = cnt2 == 0
    with np.errstate(divide="ignore", invalid="ignore"):
        mean2 = np.where(empty, 0.0, sums2 / np.maximum(cnt2, 1))
    take = pa.array(starts, type=pa.int64())
    doc = batch.column("doc_id")
    src = batch.column("source")
    if isinstance(doc, pa.ChunkedArray):
        doc = doc.combine_chunks()
    if isinstance(src, pa.ChunkedArray):
        src = src.combine_chunks()
    return pa.table(
        {
            "doc_id": doc.take(take),
            "source": src.take(take),
            "tier": pa.array(np.full(ng, 2, dtype=np.int8)),
            "bucket": pa.array(
                np.asarray(batch.column("bucket2"), dtype=np.int64)[starts], type=pa.int64()
            ),
            "min": pa.array(min2.astype(np.int32), type=pa.int32(), mask=empty),
            "max": pa.array(max2.astype(np.int32), type=pa.int32(), mask=empty),
            "mean": pa.array(mean2, type=pa.float64()),
            "count": pa.array(cnt2, type=pa.int64()),
            "anomaly_score": pa.array(score2, type=pa.float64()),
            "filled": pa.array(empty),
        }
    )


def tier2_from_tier1_ds(tier1_ds, num_partitions: int = 64):
    """Distributed G1: tier1 Dataset (any layout) -> tier2 Dataset.

    Scale path: one exchange at PARTITION granularity — every row gets
    ``_pkey = hash(doc_id, source, bucket2) % num_partitions`` so a group
    lands wholly in one partition, the groupby exchanges on that single
    int column, and each of the ``num_partitions`` calls sorts its whole
    partition by (key, bucket) and merges all its runs fully vectorized
    (`_merge_sorted_runs`: reduceat + exact integer-sum recovery,
    bit-identical to the per-group reference ``tier2_group_merge``).
    Per-group Python work is gone: ``num_partitions`` UDF calls total,
    regardless of group count."""
    import functools

    from anomalydetection_ray.stages.runs import PKEY, add_partition_key

    def add_bucket2(batch: pa.Table) -> pa.Table:
        b2 = np.asarray(batch.column("bucket"), dtype=np.int64) // _R
        batch = batch.append_column("bucket2", pa.array(b2, type=pa.int64()))
        return add_partition_key(batch, ["doc_id", "source", "bucket2"], num_partitions)

    def merge_partition(batch: pa.Table) -> pa.Table:
        batch = batch.drop_columns([PKEY]).sort_by(
            [("doc_id", "ascending"), ("source", "ascending"),
             ("bucket2", "ascending"), ("bucket", "ascending")]
        )
        return _merge_sorted_runs(batch)

    withb2 = tier1_ds.map_batches(add_bucket2, batch_format="pyarrow", zero_copy_batch=True)
    out = withb2.groupby(PKEY).map_groups(
        functools.partial(merge_partition), batch_format="pyarrow"
    )
    return out.select_columns(TIER_SCHEMA.names)


def salted_groupby_sum(ds, key: str, value_cols: list[str], num_salts: int = 16):
    """Skew-defended grouped sum/count: (key, salt) partial aggregate, then
    a tiny final merge over num_salts partials per key.  Exact (integer /
    associative) aggregates only."""
    from ray.data.aggregate import Count, Sum

    def add_salt(batch: pa.Table) -> pa.Table:
        # deterministic vectorized salt: key hash + batch-local row index
        # (spreads a hot key's rows across all salts; exact aggregates are
        # salt-value-agnostic, so batch-relative indexing is fine)
        import pandas as pd

        c = batch.column(key)
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        h = pd.util.hash_array(np.asarray(c.to_pandas(), dtype=object), categorize=False)
        salt = ((h + np.arange(batch.num_rows, dtype=np.uint64))
                % np.uint64(num_salts)).astype(np.int32)
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
