"""Q2 at scale — distributed top-k without a global sort.

``ds.sort(key).limit(k)`` range-partition-shuffles EVERY row to order the
whole dataset, then throws away all but k rows.  ``topk`` instead prunes
each block to its local top-k with a C-level Arrow sort (map-side, no data
movement), leaving at most ``num_blocks * k`` rows for a final (trivial)
global sort.  Semantics are identical to sort+limit for any sort-key list,
including tie-breaks, because a row outside its block's local top-k can
never be in the global top-k under the same lexicographic order.

Keys follow pyarrow's ``sort_indices`` convention:
``[("anomaly_score", "descending"), ("doc_id", "ascending"), ...]``.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def _local_topk(batch: pa.Table, k: int, keys: list[tuple[str, str]]) -> pa.Table:
    if batch.num_rows <= k:
        return batch
    idx = pc.sort_indices(batch, sort_keys=keys)
    return batch.take(idx.slice(0, k))


def topk(ds, k: int, keys: list[tuple[str, str]]):
    """Top-k rows of ``ds`` under the lexicographic ``keys`` order."""
    import functools

    pruned = ds.map_batches(
        functools.partial(_local_topk, k=k, keys=keys),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return pruned.sort(
        [name for name, _ in keys],
        descending=[order == "descending" for _, order in keys],
    ).limit(k)
