"""Vectorized grouped-first / distinct over hash-partitioned runs.

``groupby(keys).map_groups(take-first)`` costs one Python call per group —
fine for thousands of groups, hopeless for 10^9.  ``keep_first_by`` does
the same exchange once at PARTITION granularity instead: every row gets a
deterministic ``_pkey = hash(keys) % num_partitions`` (vectorized siphash
via ``pd.util.hash_array``, fixed key -> stable across processes), the
groupby exchanges on that single int column, and each of the
``num_partitions`` calls processes its whole partition with one C-level
sort + one vectorized run-boundary ``take`` — per-group Python work is
gone.  (With ``DataContext.shuffle_strategy = HASH_SHUFFLE`` the same
shape could use ``repartition(keys=...)``; the groupby form works under
the default sort shuffle too.)  Used by D1 exact dedup, the
candidate-pair dedup stages, and the distributed G1 merge (SURVEY.md
§2.2 D1/G1).
"""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

PKEY = "_pkey"


def configure_shuffle(strategy: str | None = None) -> str:
    """Select the all-to-all exchange implementation for every ``_pkey``
    groupby in the engine (D1 dedup, G1 merge, J3 join, CC rounds).

    ``strategy``: ``"hash"`` (Ray's hash-shuffle aggregators — the
    cluster-native form: rows route straight to their reducer, no global
    sort), ``"sort-pull"`` / ``"sort-push"`` (sort-based shuffles), or
    None to read ``$ANOMRAY_SHUFFLE`` (unset -> leave Ray's default).
    Sets the session ``DataContext``, so call it once after ``ray.init``
    (bench.py / cli do); operators never mutate the context themselves.
    Outputs are strategy-independent — every per-partition kernel sorts
    its own partition — which is pytest-gated."""
    import os

    import ray.data
    from ray.data.context import ShuffleStrategy

    strategy = strategy or os.environ.get("ANOMRAY_SHUFFLE", "")
    mapping = {
        "hash": ShuffleStrategy.HASH_SHUFFLE,
        "sort-pull": ShuffleStrategy.SORT_SHUFFLE_PULL_BASED,
        "sort-push": ShuffleStrategy.SORT_SHUFFLE_PUSH_BASED,
    }
    ctx = ray.data.DataContext.get_current()
    if strategy:
        if strategy not in mapping:
            raise ValueError(f"unknown shuffle strategy {strategy!r}; "
                             f"expected one of {sorted(mapping)}")
        ctx.shuffle_strategy = mapping[strategy]
        if strategy == "hash":
            # Size the aggregator pool to the cluster: Ray's default (64
            # actors at 0.25 CPU = 16 CPUs) deadlocks a small session —
            # map tasks hold every slot and the aggregators never start.
            import ray

            total = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
            ctx.max_hash_shuffle_aggregators = max(2, total // 4)
            ctx.default_hash_shuffle_parallelism = max(16, total * 4)
    return str(ctx.shuffle_strategy)


def add_partition_key(batch: pa.Table, keys: list[str], num_partitions: int) -> pa.Table:
    """Deterministic combined hash of ``keys`` mod num_partitions, vectorized."""
    import pandas as pd

    h = np.zeros(batch.num_rows, dtype=np.uint64)
    for k in keys:
        c = batch.column(k)
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        if pa.types.is_string(c.type) or pa.types.is_large_string(c.type):
            arr = np.asarray(c.to_pandas(), dtype=object)
        else:
            arr = c.to_numpy(zero_copy_only=False)
        h = h * np.uint64(1000003) + pd.util.hash_array(arr, categorize=False)
    return batch.append_column(PKEY, pa.array(h % np.uint64(num_partitions), type=pa.int32()))


def run_starts(batch: pa.Table, keys: list[str]) -> np.ndarray:
    """Start indices of equal-``keys`` runs in a batch sorted by keys."""
    n = batch.num_rows
    neq = np.zeros(max(n - 1, 0), dtype=bool)
    for k in keys:
        c = batch.column(k)
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        neq |= np.asarray(pc.not_equal(c.slice(1), c.slice(0, n - 1)))
    return np.concatenate((np.zeros(1, dtype=np.int64), np.flatnonzero(neq) + 1))


def _first_of_runs(batch: pa.Table, keys: list[str], order_by: list[str]) -> pa.Table:
    if batch.num_rows == 0:
        return batch.drop_columns([PKEY]) if PKEY in batch.column_names else batch
    if PKEY in batch.column_names:
        batch = batch.drop_columns([PKEY])
    sort_keys = [(k, "ascending") for k in (*keys, *order_by)]
    batch = batch.sort_by(sort_keys)
    starts = run_starts(batch, keys)
    return batch.take(pa.array(starts, type=pa.int64()))


def keep_first_by(ds, keys: list[str], order_by: list[str] | None = None,
                  num_partitions: int = 64):
    """One row per distinct ``keys`` value: the first under ascending
    ``keys + order_by`` order (deterministic tiebreak).  Exactly equivalent
    to ``groupby(keys).map_groups(sort + take first)``."""
    order_by = order_by or []
    tagged = ds.map_batches(
        functools.partial(add_partition_key, keys=keys, num_partitions=num_partitions),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return tagged.groupby(PKEY).map_groups(
        functools.partial(_first_of_runs, keys=keys, order_by=order_by),
        batch_format="pyarrow",
    )
