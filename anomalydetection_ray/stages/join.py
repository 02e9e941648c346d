"""J3 — co-partitioned equi-join for two LARGE tables (SURVEY.md §2.2
J-family extension; J1 broadcast covers only small dims).

``copartition_attach`` hash-partitions BOTH sides on the join key with the
same ``_pkey`` (stages/runs.py machinery), unions them into one exchange,
and resolves each partition with a single vectorized ``index_in`` lookup —
one shuffle total, partition-granular Python (no per-key or per-row work).
Many-to-one semantics: each left row picks up the payload of the matching
right row (null when absent — a left join).  For many-to-many joins,
co-partition both sides the same way and merge per partition instead.

At 10^12 scale this is the standard large-large equi-join layout: one
hash exchange each side, no broadcast, skew bounded by the partition
count (salt the key upstream for pathological hot keys).
"""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa

from anomalydetection_ray.stages.runs import PKEY, add_partition_key


def _pa_schema(ds) -> pa.Schema:
    s = ds.schema()
    base = getattr(s, "base_schema", None)
    if isinstance(base, pa.Schema):
        return base
    fields = []
    for n, t in zip(s.names, s.types):
        if not isinstance(t, pa.DataType):
            # pandas-backed datasets report numpy dtypes / scalar type classes
            dt = np.dtype(t)
            t = pa.string() if dt.kind in ("O", "U") else pa.from_numpy_dtype(dt)
        fields.append((n, t))
    return pa.schema(fields)


def copartition_attach(left_ds, right_ds, left_on: str, right_on: str,
                       payload_cols: list[str], num_partitions: int = 32):
    """Attach ``payload_cols`` of ``right_ds`` (keyed by ``right_on``,
    assumed unique) to every row of ``left_ds`` via ``left_on``.  Returns
    left columns + payloads (nulls where unmatched)."""
    left_schema = _pa_schema(left_ds)
    right_schema = _pa_schema(right_ds)
    left_names = list(left_schema.names)
    key_type = left_schema.field(left_on).type

    def tag_left(batch: pa.Table) -> pa.Table:
        for c in payload_cols:
            batch = batch.append_column(c, pa.nulls(batch.num_rows, right_schema.field(c).type))
        batch = add_partition_key(batch, [left_on], num_partitions)
        return batch.append_column("_isright", pa.array(np.zeros(batch.num_rows, dtype=bool)))

    def tag_right(batch: pa.Table) -> pa.Table:
        t = pa.table({left_on: batch.column(right_on).cast(key_type)})
        for c in payload_cols:
            t = t.append_column(c, batch.column(c))
        for name in left_names:
            if name != left_on:
                t = t.append_column(name, pa.nulls(batch.num_rows, left_schema.field(name).type))
        t = t.select([*left_names, *payload_cols])
        t = add_partition_key(t, [left_on], num_partitions)
        return t.append_column("_isright", pa.array(np.ones(batch.num_rows, dtype=bool)))

    out_names = [*left_names, *payload_cols]

    def resolve(group: pa.Table) -> pa.Table:
        isr = np.asarray(group.column("_isright"))
        lidx = np.flatnonzero(~isr)
        ridx = np.flatnonzero(isr)
        if lidx.shape[0] == 0:
            return group.select(out_names).slice(0, 0)
        left = group.take(pa.array(lidx))
        right = group.take(pa.array(ridx))
        pos = pa.compute.index_in(left.column(left_on), right.column(left_on))
        cols = {name: left.column(name) for name in left_names}
        for c in payload_cols:
            payload = right.column(c)
            if isinstance(payload, pa.ChunkedArray):
                payload = payload.combine_chunks()
            cols[c] = payload.take(pos)
        return pa.table(cols)

    tl = left_ds.map_batches(tag_left, batch_format="pyarrow", zero_copy_batch=True)
    tr = right_ds.map_batches(tag_right, batch_format="pyarrow", zero_copy_batch=True)
    return tl.union(tr).groupby(PKEY).map_groups(resolve, batch_format="pyarrow")
