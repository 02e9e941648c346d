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


def _ts_i64(arr: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Order-preserving int64 view of a timestamp/integer column."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    v = np.asarray(arr)
    return v.view("int64") if v.dtype.kind == "M" else v.astype(np.int64, copy=False)


def asof_attach(left_ds, right_ds, by: str, on: str,
                payload_cols: list[str], num_partitions: int = 32,
                direction: str = "backward", tiebreak: str | None = None):
    """J4 — distributed backward as-of join (the timeseries lookup: for
    every left row, the payload of the LATEST right row with
    ``right.on <= left.on`` in the same ``by`` group; nulls when no right
    row precedes — ``ASOF LEFT JOIN`` semantics, DuckDB's spelling).
    ``direction="forward"`` flips the inequality: the EARLIEST right row
    with ``right.on >= left.on`` (the next-checkpoint lookup).  With
    ``tiebreak`` (a payload column name), equal-``on`` right rows resolve
    deterministically — forward picks the smallest tiebreak, backward the
    largest — instead of the documented arbitrary-pick.

    Layout mirrors ``copartition_attach``: both sides hash-partitioned on
    ``by`` into the same ``_pkey``, unioned into ONE exchange, resolved
    per partition.  The resolve kernel sorts the partition's right rows
    once with ``np.lexsort`` and runs one ``np.searchsorted`` per
    distinct ``by`` key in the partition — vectorized over rows, looping
    only over groups (the same granularity ``map_groups`` itself has).
    Assumes ``(by, on)`` is unique on the right side (ties would be an
    arbitrary pick, as in SQL ASOF).  Scale shape: one hash exchange per
    side, no broadcast, no global sort; skew bounded by partition count."""
    left_schema = _pa_schema(left_ds)
    right_schema = _pa_schema(right_ds)
    left_names = list(left_schema.names)
    by_type = left_schema.field(by).type
    on_type = left_schema.field(on).type

    def tag_left(batch: pa.Table) -> pa.Table:
        for c in payload_cols:
            batch = batch.append_column(c, pa.nulls(batch.num_rows, right_schema.field(c).type))
        batch = add_partition_key(batch, [by], num_partitions)
        return batch.append_column("_isright", pa.array(np.zeros(batch.num_rows, dtype=bool)))

    def tag_right(batch: pa.Table) -> pa.Table:
        t = pa.table({by: batch.column(by).cast(by_type),
                      on: batch.column(on).cast(on_type)})
        for c in payload_cols:
            t = t.append_column(c, batch.column(c))
        for name in left_names:
            if name not in (by, on):
                t = t.append_column(name, pa.nulls(batch.num_rows, left_schema.field(name).type))
        t = t.select([*left_names, *payload_cols])
        t = add_partition_key(t, [by], num_partitions)
        return t.append_column("_isright", pa.array(np.ones(batch.num_rows, dtype=bool)))

    out_names = [*left_names, *payload_cols]

    def resolve(group: pa.Table) -> pa.Table:
        isr = np.asarray(group.column("_isright"))
        lidx = np.flatnonzero(~isr)
        ridx = np.flatnonzero(isr)
        if lidx.shape[0] == 0:
            return group.select(out_names).slice(0, 0)
        left = group.take(pa.array(lidx))
        cols = {name: left.column(name) for name in left_names}
        if ridx.shape[0] == 0:
            for c in payload_cols:
                cols[c] = pa.nulls(left.num_rows, right_schema.field(c).type)
            return pa.table(cols)
        right = group.take(pa.array(ridx))
        # shared integer codes for the by-key across both sides
        def _flat(col):
            return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col

        both = pa.chunked_array([_flat(left.column(by)), _flat(right.column(by))])
        codes_all = np.asarray(both.combine_chunks().dictionary_encode().indices)
        lcode, rcode = codes_all[: left.num_rows], codes_all[left.num_rows:]
        lts = _ts_i64(left.column(on))
        rts = _ts_i64(right.column(on))
        if tiebreak is not None:
            rtb = right.column(tiebreak)
            if isinstance(rtb, pa.ChunkedArray):
                rtb = rtb.combine_chunks()
            order = np.lexsort((np.asarray(rtb), rts, rcode))
        else:
            order = np.lexsort((rts, rcode))
        rcode_s, rts_s = rcode[order], rts[order]
        # match[i] = index into sorted right of the as-of row, -1 = none
        match = np.full(left.num_rows, -1, dtype=np.int64)
        for code in np.unique(lcode):
            lo = np.searchsorted(rcode_s, code, side="left")
            hi = np.searchsorted(rcode_s, code, side="right")
            if lo == hi:
                continue
            lmask = np.flatnonzero(lcode == code)
            if direction == "forward":
                pos = np.searchsorted(rts_s[lo:hi], lts[lmask], side="left")
                ok = pos < (hi - lo)
            else:
                pos = np.searchsorted(rts_s[lo:hi], lts[lmask],
                                      side="right") - 1
                ok = pos >= 0
            match[lmask[ok]] = lo + pos[ok]
        matched = match >= 0
        take_idx = np.where(matched, order[np.where(matched, match, 0)], -1)
        pos_arr = pa.array(np.where(matched, take_idx, -1), type=pa.int64())
        pos_arr = pa.compute.if_else(pa.array(matched), pos_arr, pa.nulls(left.num_rows, pa.int64()))
        for c in payload_cols:
            payload = right.column(c)
            if isinstance(payload, pa.ChunkedArray):
                payload = payload.combine_chunks()
            cols[c] = payload.take(pos_arr)
        return pa.table(cols)

    tl = left_ds.map_batches(tag_left, batch_format="pyarrow", zero_copy_batch=True)
    tr = right_ds.map_batches(tag_right, batch_format="pyarrow", zero_copy_batch=True)
    return tl.union(tr).groupby(PKEY).map_groups(resolve, batch_format="pyarrow")
