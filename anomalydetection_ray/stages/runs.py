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
