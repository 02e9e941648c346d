"""A33/A34 — per-key nonparametric trend tests over event series.

Mann–Kendall (Mann 1945; Kendall 1975) and Theil–Sen (Theil 1950; Sen
1968) are the standard distribution-free trend screens run over rollup
series before fitting anything parametric.  Both are pairwise statistics
— O(g^2) in the per-key series length g — so they are computed with ONE
`_pkey` hash exchange on the key (stages/runs.py `partition_apply`) and a
fully vectorized chunked-broadcast pair kernel per partition: no per-group
Python calls, memory bounded by PAIR_CHUNK elements per 2-D slab.

Partitioning assumption (documented per SURVEY §2.2): the per-key series
length is bounded (events-per-user class, like J5's window count), so the
g^2 pair fan-in per key is bounded; the exchange itself carries only the
(key, ts, value) triples.

Exactness contract (the driver gate): values are float64 compared /
subtracted exactly on both sides; Mann–Kendall's S and its tie-corrected
variance numerator are exact integers; Theil–Sen's slopes are the pinned
expression (v_j - v_i) / CAST(ts_j - ts_i AS DOUBLE) and the reported
median is the LOWER median (sorted index (P-1)//2) so no interpolation
arithmetic can diverge between numpy and DuckDB.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

# groups are padded to the partition's max series length G; 3-D pair slabs
# are chunked so chunk * G * G stays ~4e6 elements (~32 MB of float64)
PAIR_CHUNK_ELEMS = 4_000_000


def _sorted_groups(part: pa.Table):
    """Partition sorted by (user_id, ts, event_id) -> (uids per group,
    group start offsets, ts int64, value float64) — the pinned pair order."""
    part = part.sort_by([("user_id", "ascending"), ("ts", "ascending"),
                         ("event_id", "ascending")])
    from anomalydetection_ray.stages.runs import run_starts

    starts = run_starts(part, ["user_id"])
    ts = part.column("ts")
    if isinstance(ts, pa.ChunkedArray):
        ts = ts.combine_chunks()
    t = np.asarray(ts.cast(pa.int64()))
    v = np.asarray(part.column("value").combine_chunks()
                   if isinstance(part.column("value"), pa.ChunkedArray)
                   else part.column("value"), dtype=np.float64)
    u = part.column("user_id").to_numpy(zero_copy_only=False)
    return u, starts, t, v


def _padded(vals: np.ndarray, starts: np.ndarray, n: int, fill):
    """(n_groups x G) padded 2-D view of per-group values + validity mask."""
    lens = np.diff(np.append(starts, n))
    g = int(lens.max()) if lens.size else 0
    rows = lens.shape[0]
    out = np.full((rows, g), fill, dtype=vals.dtype)
    mask = np.zeros((rows, g), dtype=bool)
    col = np.arange(n, dtype=np.int64) - np.repeat(starts, lens)
    row = np.repeat(np.arange(rows, dtype=np.int64), lens)
    out[row, col] = vals
    mask[row, col] = True
    return out, mask, lens


def _mk_kernel(part: pa.Table) -> pa.Table:
    empty = pa.table({
        "user_id": pa.array([], type=pa.int64()),
        "n": pa.array([], type=pa.int64()),
        "s_stat": pa.array([], type=pa.int64()),
        "var_num": pa.array([], type=pa.int64()),
        "z_mk": pa.array([], type=pa.float64()),
    })
    if part.num_rows == 0:
        return empty
    u, starts, _t, v = _sorted_groups(part)
    n = v.shape[0]
    v2, mask, lens = _padded(v, starts, n, np.nan)
    rows, g = v2.shape
    s_stat = np.zeros(rows, dtype=np.int64)
    if g >= 2:
        chunk = max(1, PAIR_CHUNK_ELEMS // (g * g))
        iu, ju = np.triu_indices(g, k=1)
        for lo in range(0, rows, chunk):
            sl = slice(lo, lo + chunk)
            a = v2[sl][:, iu]
            b = v2[sl][:, ju]
            ok = mask[sl][:, iu] & mask[sl][:, ju]
            sg = np.where(ok, np.sign(b - a), 0.0)
            s_stat[sl] = np.sum(sg, axis=1).astype(np.int64)
    # tie groups: run lengths of equal value within each user
    from anomalydetection_ray.stages.runs import run_starts as _rs

    order = np.lexsort((v, np.repeat(np.arange(rows), lens)))
    sv = v[order]
    srow = np.repeat(np.arange(rows), lens)[order]
    neq = np.zeros(max(n - 1, 0), dtype=bool)
    if n > 1:
        neq = (sv[1:] != sv[:-1]) | (srow[1:] != srow[:-1])
    tie_starts = np.concatenate(([0], np.nonzero(neq)[0] + 1)) if n else np.array([], dtype=np.int64)
    tlens = np.diff(np.append(tie_starts, n)).astype(np.int64)
    tcorr = tlens * (tlens - 1) * (2 * tlens + 5)
    tie_row = srow[tie_starts] if n else np.array([], dtype=np.int64)
    corr = np.zeros(rows, dtype=np.int64)
    np.add.at(corr, tie_row, tcorr)
    ln = lens.astype(np.int64)
    var_num = ln * (ln - 1) * (2 * ln + 5) - corr
    z = np.full(rows, np.nan)
    for r in range(rows):                     # pinned scalar float tail
        if ln[r] < 2 or var_num[r] <= 0:
            continue
        sd = math.sqrt(float(int(var_num[r])) / 18.0)
        s = int(s_stat[r])
        z[r] = 0.0 if s == 0 else (float(s - 1) / sd if s > 0 else float(s + 1) / sd)
    return pa.table({
        "user_id": pa.array(u[starts], type=pa.int64()),
        "n": pa.array(ln, type=pa.int64()),
        "s_stat": pa.array(s_stat, type=pa.int64()),
        "var_num": pa.array(var_num, type=pa.int64()),
        "z_mk": pa.array(z, type=pa.float64(), from_pandas=True),
    })


def _ts_kernel(part: pa.Table) -> pa.Table:
    empty = pa.table({
        "user_id": pa.array([], type=pa.int64()),
        "n_pairs": pa.array([], type=pa.int64()),
        "slope_med": pa.array([], type=pa.float64()),
        "slope_min": pa.array([], type=pa.float64()),
        "slope_max": pa.array([], type=pa.float64()),
    })
    if part.num_rows == 0:
        return empty
    u, starts, t, v = _sorted_groups(part)
    n = v.shape[0]
    v2, mask, lens = _padded(v, starts, n, np.nan)
    t2, _, _ = _padded(t, starts, n, np.int64(0))
    rows, g = v2.shape
    if g < 2:
        return empty
    iu, ju = np.triu_indices(g, k=1)
    chunk = max(1, PAIR_CHUNK_ELEMS // (g * g))
    gid_chunks, slope_chunks = [], []
    for lo in range(0, rows, chunk):
        sl = slice(lo, lo + chunk)
        dv = v2[sl][:, ju] - v2[sl][:, iu]
        dt = t2[sl][:, ju] - t2[sl][:, iu]
        ok = mask[sl][:, iu] & mask[sl][:, ju] & (dt != 0)
        r_i, p_i = np.nonzero(ok)
        slope_chunks.append(dv[r_i, p_i] / dt[r_i, p_i].astype(np.float64))
        gid_chunks.append(r_i + lo)
    gid = np.concatenate(gid_chunks) if gid_chunks else np.array([], dtype=np.int64)
    slope = np.concatenate(slope_chunks) if slope_chunks else np.array([], dtype=np.float64)
    if gid.size == 0:
        return empty
    order = np.lexsort((slope, gid))
    gid, slope = gid[order], slope[order]
    gstarts = np.concatenate(([0], np.nonzero(gid[1:] != gid[:-1])[0] + 1))
    glens = np.diff(np.append(gstarts, gid.shape[0]))
    med = slope[gstarts + (glens - 1) // 2]       # lower median, pinned
    mn = np.minimum.reduceat(slope, gstarts)
    mx = np.maximum.reduceat(slope, gstarts)
    return pa.table({
        "user_id": pa.array(u[starts][gid[gstarts]], type=pa.int64()),
        "n_pairs": pa.array(glens, type=pa.int64()),
        "slope_med": pa.array(med, type=pa.float64()),
        "slope_min": pa.array(mn, type=pa.float64()),
        "slope_max": pa.array(mx, type=pa.float64()),
    })


def _events(sf_dir: str):
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/events.parquet",
                                 columns=["user_id", "ts", "event_id", "value"])


def a33_mann_kendall(sf_dir: str, num_partitions: int = 64):
    """Per-user Mann–Kendall trend test over the event value series in
    (ts, event_id) order: exact-integer S and tie-corrected variance
    numerator, z with the standard continuity correction."""
    from anomalydetection_ray.stages.runs import partition_apply

    return partition_apply(_events(sf_dir), ["user_id"], _mk_kernel,
                           num_partitions=num_partitions)


def a34_theil_sen(sf_dir: str, num_partitions: int = 64):
    """Per-user Theil–Sen trend: lower-median / min / max of all pairwise
    slopes (value per microsecond) over time-distinct event pairs."""
    from anomalydetection_ray.stages.runs import partition_apply

    return partition_apply(_events(sf_dir), ["user_id"], _ts_kernel,
                           num_partitions=num_partitions)
