"""M1 — the vectorized bucket-rollup kernel (SURVEY.md §2.2 M1, §2.1 A1/A4/A5).

One stateless ``map_batches(rollup_batch, batch_format="pyarrow",
zero_copy_batch=True)`` stage turns validated ``sequences`` parts into
tier1 + tier2 rollup rows.  It is the flagship hot path: everything is
NumPy-vectorized over the batch's flat token buffer —

- bucket boundaries via repeat/arange index algebra, min/max/sum via
  ``np.{minimum,maximum,add}.reduceat`` (the bucket starts tile the flat
  buffer exactly, so one reduceat covers every bucket of every row);
- per-bucket median/MAD/max-deviation for the anomaly score via a chunked
  (bounded-memory) 2-D gather over the full buckets + a short loop over the
  at-most-one partial tail bucket per row;
- tier2 as the G1 merge of tier1 computed with reduceat over the tier1
  arrays; the tier2 mean is the exact integer value-sum divided once
  (order-free, bit-identical to the oracle and to SQL sum(v)/count).

Bit-for-bit parity with ``anomalydetection_ray.oracle`` is a test gate
(tests/test_rollup_engine.py): every float here is produced by the same
IEEE operations in the same order as the oracle's per-bucket loops.

The only non-vector path is the ``drop`` gap policy on batches that
actually contain null positions — those rows fall back to the oracle loop
(rare by construction; locf/linear fill densely and stay vectorized).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from anomalydetection_ray import oracle
from anomalydetection_ray.constants import (
    MAD_SCALE,
    MAX_TOKENS_PER_PART,
    TIER1_BUCKET,
    TIER2_BUCKET,
)

# buckets per median-gather chunk: 8192 buckets x 1000 positions x 8 B ~ 64 MiB
MEDIAN_CHUNK = 8192

_R = TIER2_BUCKET // TIER1_BUCKET
_PARTS1 = MAX_TOKENS_PER_PART // TIER1_BUCKET
_PARTS2 = MAX_TOKENS_PER_PART // TIER2_BUCKET


def _flat_tokens(batch: pa.Table) -> tuple[np.ndarray, np.ndarray | None, np.ndarray]:
    """(flat int32 values, validity or None, rebased int64 offsets) — the
    child buffer is zero-copy when null-free."""
    tokens = batch.column("tokens")
    if isinstance(tokens, pa.ChunkedArray):
        tokens = tokens.combine_chunks()
    offsets = np.asarray(tokens.offsets, dtype=np.int64)
    base = offsets[0]
    child = tokens.values.slice(base, offsets[-1] - base)
    offsets = offsets - base
    if child.null_count:
        valid = np.asarray(child.is_valid())
        vals = np.asarray(child.fill_null(0), dtype=np.int32)
    else:
        valid = None
        vals = child.to_numpy(zero_copy_only=True)
    return vals, valid, offsets


def _locf_flat(vals: np.ndarray, valid: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Vectorized per-row LOCF over the whole flat buffer: identical result
    to ``stats.gap_fill(..., "locf")`` applied row by row."""
    n = vals.shape[0]
    idx = np.arange(n, dtype=np.int64)
    last_valid = np.maximum.accumulate(np.where(valid, idx, -1))
    lens = np.diff(offsets)
    row_start = np.repeat(offsets[:-1], lens)
    out = np.where(last_valid >= row_start, vals[np.maximum(last_valid, 0)], 0)
    return out.astype(np.int32, copy=False)


def _linear_flat(vals: np.ndarray, valid: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Vectorized per-row LINEAR gap fill over the whole flat buffer:
    identical result to ``stats.gap_fill(..., "linear")`` applied row by
    row (exact integer interpolation, round half to even, edge clamp,
    all-null rows -> 0) — replaces the per-affected-row Python loop."""
    n = vals.shape[0]
    idx = np.arange(n, dtype=np.int64)
    lens = np.diff(offsets)
    row_start = np.repeat(offsets[:-1], lens)
    row_end = np.repeat(offsets[1:], lens)
    prev = np.maximum.accumulate(np.where(valid, idx, -1))
    nxt = np.minimum.accumulate(np.where(valid, idx, n)[::-1])[::-1]
    has_prev = prev >= row_start
    has_next = nxt < row_end
    out = vals.astype(np.int64, copy=True)
    gap = ~valid
    lead = gap & ~has_prev & has_next
    out[lead] = vals[nxt[lead]]
    trail = gap & has_prev & ~has_next
    out[trail] = vals[prev[trail]]
    out[gap & ~has_prev & ~has_next] = 0
    mid = gap & has_prev & has_next
    if mid.any():
        p, q, i = prev[mid], nxt[mid], idx[mid]
        vp = vals[p].astype(np.int64)
        vq = vals[q].astype(np.int64)
        den = q - p
        num = vp * (q - i) + vq * (i - p)
        quo = num // den
        r2 = (num - quo * den) * 2
        out[mid] = quo + ((r2 > den) | ((r2 == den) & (quo % 2 != 0)))
    return out.astype(np.int32, copy=False)


def _scores_dense(
    vals: np.ndarray, starts: np.ndarray, ends: np.ndarray, counts: np.ndarray,
    width: int = TIER1_BUCKET,
) -> np.ndarray:
    total = starts.shape[0]
    scores = np.empty(total, dtype=np.float64)
    if width % 2 == 1:
        # the (h-1, h) partition pair below assumes even width; odd widths
        # go through the padded-sort path (length-generic)
        _scores_partial(vals, starts, counts, np.arange(total, dtype=np.int64), scores)
        return scores
    full = counts == width
    fidx = np.flatnonzero(full)
    col = np.arange(width, dtype=np.int64)
    h = width // 2
    for lo in range(0, fidx.shape[0], MEDIAN_CHUNK):
        ch = fidx[lo : lo + MEDIAN_CHUNK]
        g = vals[starts[ch][:, None] + col]  # int32, half the float64 traffic
        # Integer-domain robust score, bit-identical to the oracle's float64
        # path: every intermediate is an integer or integer/2, exact in f64.
        #   med = (a+b)/2 with a,b the two middle order statistics
        #   dev_i = |x_i - med|        =>  2*dev_i = |2*x_i - (a+b)|  (int64)
        #   mad   = median(dev)        =>  2*mad   = median(2*dev)
        #   score = max(dev)/(1.4826*mad)  computed from the halved values.
        p = np.partition(g, (h - 1, h), axis=1)
        gmin = int(g.min())
        gmax = int(g.max())
        if 2 * (gmax - gmin) < 2**31:
            # int32 fast path (always taken for token vocabularies): shift
            # by the chunk min so |2*(g-m) - (med2-2m)| == |2*g - med2|
            # stays exact in int32 — halves the memory traffic of the
            # median pass, which is what binds parallel scaling
            g0 = (g - np.int32(gmin)).astype(np.int32, copy=False)
            med2 = (
                (p[:, h - 1].astype(np.int64) + p[:, h]) - 2 * gmin
            ).astype(np.int32)
            d2 = np.abs(2 * g0 - med2[:, None])
        else:
            med2 = p[:, h - 1].astype(np.int64) + p[:, h]  # = 2*median, exact
            d2 = np.abs(2 * g.astype(np.int64) - med2[:, None])
        mad = np.median(d2, axis=1) * 0.5  # exact: /2 is a power of two
        mx = d2.max(axis=1) * 0.5
        with np.errstate(divide="ignore", invalid="ignore"):
            scores[ch] = np.where(mad == 0.0, 0.0, mx / (MAD_SCALE * mad))
    _scores_partial(vals, starts, counts, np.flatnonzero(~full), scores)
    return scores


_PAD = np.int64(1) << 62  # sorts after any |2*int32 - med2| value


def _scores_partial(
    vals: np.ndarray, starts: np.ndarray, counts: np.ndarray,
    pidx: np.ndarray, scores: np.ndarray,
) -> None:
    """Vectorized robust score for the <= one partial tail bucket per row:
    pad each bucket to the chunk's max length with a +inf-like sentinel,
    one C-level row sort puts the sentinel last, and the two middle order
    statistics of the TRUE length come from a fancy index.  Integer-domain
    arithmetic identical to the full-bucket path (and therefore to the
    oracle's float64 loop):  med2 = s[(L-1)//2] + s[L//2],
    2*mad = (d2s[(L-1)//2] + d2s[L//2]) / 2, all exact in f64."""
    if pidx.shape[0] == 0:
        return
    # singleton buckets: med == the value -> dev == 0 -> score 0 (MAD=0)
    ones = counts[pidx] == 1
    if ones.any():
        scores[pidx[ones]] = 0.0
        pidx = pidx[~ones]
        if pidx.shape[0] == 0:
            return
    for lo in range(0, pidx.shape[0], MEDIAN_CHUNK):
        ch = pidx[lo : lo + MEDIAN_CHUNK]
        L = counts[ch]
        maxL = int(L.max())
        nr = ch.shape[0]
        col = np.arange(maxL, dtype=np.int64)
        live = col[None, :] < L[:, None]
        # clipped gather: padding cells read a duplicate in-bucket value,
        # then get overwritten by the sentinel
        gather = starts[ch][:, None] + np.minimum(col, L[:, None] - 1)
        g32 = vals[gather]
        gmin = int(g32.min())
        gmax = int(g32.max())
        rows = np.arange(nr)
        k1 = (L - 1) >> 1
        k2 = L >> 1
        if 2 * (gmax - gmin) < 2**31:
            # int32 fast path, shifted by the chunk min (same exact values
            # as the int64 path — see _scores_dense)
            pad = np.int32(2**31 - 1)
            g = (g32 - np.int32(gmin)).astype(np.int32, copy=False)
            g[~live] = pad
            gs = np.sort(g, axis=1)
            med2 = gs[rows, k1].astype(np.int64) + gs[rows, k2]
            d2 = np.abs(2 * g - med2[:, None].astype(np.int32))
            d2[~live] = pad
        else:
            g = g32.astype(np.int64)
            g[~live] = _PAD
            gs = np.sort(g, axis=1)
            med2 = gs[rows, k1] + gs[rows, k2]
            d2 = np.abs(2 * g - med2[:, None])
            d2[~live] = _PAD
        d2s = np.sort(d2, axis=1)
        mad = (d2s[rows, k1] + d2s[rows, k2]) * 0.25  # exact: /4 power of two
        mx = d2s[rows, L - 1] * 0.5
        with np.errstate(divide="ignore", invalid="ignore"):
            scores[ch] = np.where(mad == 0.0, 0.0, mx / (MAD_SCALE * mad))


def _empty_tiers() -> pa.Table:
    return oracle.TIER_SCHEMA.empty_table()


def rollup_batch(batch: pa.Table, policy: str = "locf") -> pa.Table:
    """Validated parts -> tier1 + tier2 rollup rows (one Arrow table, both
    tiers distinguished by the ``tier`` column)."""
    if batch.num_rows == 0:
        return _empty_tiers()
    vals, valid, offsets = _flat_tokens(batch)
    if valid is not None and policy == "drop":
        return _rollup_fallback(batch, policy)
    if valid is not None:
        if policy == "locf":
            vals = _locf_flat(vals, valid, offsets)
        else:  # linear: vectorized whole-buffer fill, then dense path
            vals = _linear_flat(vals, valid, offsets)
        valid = None

    lens = np.diff(offsets)
    nrows = lens.shape[0]
    part_ids = np.asarray(batch.column("part_id"), dtype=np.int64)

    # ---- tier1 ----
    nb1 = -(-lens // TIER1_BUCKET)
    total1 = int(nb1.sum())
    if total1 == 0:
        return _empty_tiers()
    rows1 = np.repeat(np.arange(nrows, dtype=np.int64), nb1)
    first1 = np.cumsum(nb1) - nb1
    local1 = np.arange(total1, dtype=np.int64) - first1[rows1]
    starts = offsets[rows1] + local1 * TIER1_BUCKET
    ends = np.minimum(starts + TIER1_BUCKET, offsets[rows1] + lens[rows1])
    counts = ends - starts
    bucket1 = part_ids[rows1] * _PARTS1 + local1

    mins = np.minimum.reduceat(vals, starts)
    maxs = np.maximum.reduceat(vals, starts)
    sums = np.add.reduceat(vals.astype(np.int64), starts)
    means = sums / counts
    scores = _scores_dense(vals, starts, ends, counts)

    # ---- tier2 = G1 merge of tier1 (exact integer sums, order-free) ----
    nb2 = -(-lens // TIER2_BUCKET)
    total2 = int(nb2.sum())
    rows2 = np.repeat(np.arange(nrows, dtype=np.int64), nb2)
    first2 = np.cumsum(nb2) - nb2
    local2 = np.arange(total2, dtype=np.int64) - first2[rows2]
    cstart = first1[rows2] + local2 * _R
    bucket2 = part_ids[rows2] * _PARTS2 + local2

    min2 = np.minimum.reduceat(mins, cstart)
    max2 = np.maximum.reduceat(maxs, cstart)
    count2 = np.add.reduceat(counts, cstart)
    score2 = np.maximum.reduceat(scores, cstart)
    # exact integer value-sums per tier2 bucket -> one IEEE division,
    # order-free and identical to SQL sum(v)/count (oracle semantics)
    mean2 = np.add.reduceat(sums, cstart) / count2

    doc_col = batch.column("doc_id")
    src_col = batch.column("source")
    if isinstance(doc_col, pa.ChunkedArray):
        doc_col = doc_col.combine_chunks()
    if isinstance(src_col, pa.ChunkedArray):
        src_col = src_col.combine_chunks()

    def tier_table(rows, tier, bucket, mn, mx, mean, cnt, score):
        nb = bucket.shape[0]
        take = pa.array(rows, type=pa.int64())
        return pa.table(
            {
                "doc_id": doc_col.take(take),
                "source": src_col.take(take),
                "tier": pa.array(np.full(nb, tier, dtype=np.int8)),
                "bucket": pa.array(bucket, type=pa.int64()),
                "min": pa.array(mn.astype(np.int32), type=pa.int32()),
                "max": pa.array(mx.astype(np.int32), type=pa.int32()),
                "mean": pa.array(mean, type=pa.float64()),
                "count": pa.array(cnt.astype(np.int64), type=pa.int64()),
                "anomaly_score": pa.array(score, type=pa.float64()),
                "filled": pa.array(np.zeros(nb, dtype=bool)),
            }
        )

    t1 = tier_table(rows1, 1, bucket1, mins, maxs, means, counts, scores)
    t2 = tier_table(rows2, 2, bucket2, min2, max2, mean2, count2, score2)
    return pa.concat_tables([t1, t2])


def _rollup_fallback(batch: pa.Table, policy: str) -> pa.Table:
    """Oracle-loop path for drop-policy batches containing nulls."""
    cols: dict[str, list] = {n: [] for n in oracle.TIER_SCHEMA.names}
    doc_ids = batch.column("doc_id").to_pylist()
    sources = batch.column("source").to_pylist()
    part_ids = batch.column("part_id").to_pylist()
    toks = batch.column("tokens")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    for i in range(batch.num_rows):
        arr = toks[i].values
        if arr.null_count:
            valid = np.asarray(arr.is_valid())
            vals = np.asarray(arr.fill_null(0), dtype=np.int32)
        else:
            valid = None
            vals = np.asarray(arr, dtype=np.int32)
        t1 = oracle.rollup_part(vals, valid, policy, part_ids[i])
        t2 = oracle.tier2_from_tier1(t1)
        for t, tier in ((t1, 1), (t2, 2)):
            nb = len(t["bucket"])
            cols["doc_id"].extend([doc_ids[i]] * nb)
            cols["source"].extend([sources[i]] * nb)
            cols["tier"].extend([tier] * nb)
            for k in ("bucket", "min", "max", "mean", "count", "anomaly_score", "filled"):
                cols[k].extend(t[k])
    return pa.table(
        {n: pa.array(cols[n], type=oracle.TIER_SCHEMA.field(n).type) for n in oracle.TIER_SCHEMA.names}
    )
