"""The single-process reference implementation (SURVEY.md §5.1).

The north star (BASELINE.json:6) gates the engine bit-for-bit against "a
single-process reference implementation" — this module IS that reference:
pure NumPy loops, no Ray, deliberately simple and obviously-correct.  The
Ray Data kernels in ``anomalydetection_ray.stages`` are vectorized
re-expressions of exactly these semantics and share the scalar pieces
(``functions.stats``, ``codecs``), so equality is exact, not approximate.

Semantics fixed here (and mirrored by the engine):

- A series (one ``sequences`` row) is split into parts of
  ``MAX_TOKENS_PER_PART`` positions (giant-row defense, SURVEY.md §4); part
  ``p`` covers global positions [p*MAX, p*MAX + plen).  All per-part
  processing is part-local: gap-fill does not carry across a part boundary
  and the filled-bucket mean carry restarts at 0.0 per part.  MAX is a
  multiple of TIER2_BUCKET, so no bucket ever straddles parts.
- tier1: tumbling buckets of TIER1_BUCKET positions; per bucket min / max /
  mean (= int64 sum / count, one IEEE division) / count / anomaly_score
  (A4 robust z, ``functions.stats.robust_score``) / filled.
- tier2 is DEFINED as the G1 merge of tier1 (SURVEY.md §2.2 G1): min of
  child mins, max of maxes, sum of counts, count-weighted mean via exact
  integer-sum recovery (order-free, == fl(sum(values)/count) and therefore
  == SQL ``sum(v)/count``), anomaly_score = max of child scores.
- Empty buckets (possible only under the ``drop`` gap policy) emit
  ``filled=true`` with null min/max, count 0, score 0.0 and the previous
  bucket's mean (0.0 if leading).
- tier0 (retention) is lossless regardless of gap policy: the stream always
  encodes the locf-filled dense array and a packed validity bitmap (None
  when no nulls), so decode + bitmap reconstructs the original exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from anomalydetection_ray.codecs import (
    DodState,
    checksum64,
    dod_encode_chunk,
    gorilla_decode,
    gorilla_decode_ref,
    gorilla_encode,
)
from anomalydetection_ray.constants import (
    CODEC_VERSION,
    MAX_TOKENS_PER_PART,
    TIER1_BUCKET,
    TIER2_BUCKET,
)
from anomalydetection_ray.functions.stats import gap_fill, robust_score, weighted_mean_exact

__all__ = [
    "split_series",
    "rollup_part",
    "tier2_from_tier1",
    "rollup_series",
    "rollup_table",
    "encode_part",
    "decode_part",
    "TIER_SCHEMA",
    "TIER0_SCHEMA",
]

TIER_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("source", pa.string()),
        ("tier", pa.int8()),
        ("bucket", pa.int64()),
        ("min", pa.int32()),
        ("max", pa.int32()),
        ("mean", pa.float64()),
        ("count", pa.int64()),
        ("anomaly_score", pa.float64()),
        ("filled", pa.bool_()),
    ]
)

TIER0_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("source", pa.string()),
        ("part_id", pa.int32()),
        ("n_tok", pa.int32()),
        ("first_val", pa.int32()),
        ("gorilla_xor", pa.binary()),
        ("dod_ntok", pa.binary()),
        ("codec_version", pa.int32()),
        ("value_checksum", pa.uint64()),
        ("null_bitmap", pa.binary()),
    ]
)


def split_series(n: int, max_part: int = MAX_TOKENS_PER_PART) -> list[tuple[int, int, int]]:
    """[(part_id, start, end)] covering positions [0, n); [(0, 0, 0)] if n == 0."""
    if n == 0:
        return [(0, 0, 0)]
    return [(p, p * max_part, min((p + 1) * max_part, n)) for p in range((n + max_part - 1) // max_part)]


def rollup_part(
    values: np.ndarray,
    valid: np.ndarray | None,
    policy: str,
    part_id: int,
) -> dict[str, list]:
    """Reference tier1 rollup of one part.  Returns columns as Python lists
    (bucket, min, max, mean, count, anomaly_score, filled)."""
    filled_vals, valid2 = gap_fill(values, valid, policy)
    n = values.shape[0]
    w = TIER1_BUCKET
    b_off = part_id * (MAX_TOKENS_PER_PART // w)
    out: dict[str, list] = {k: [] for k in ("bucket", "min", "max", "mean", "count", "anomaly_score", "filled")}
    prev_mean = 0.0
    for b in range(-(-n // w) if n else 0):
        sl = filled_vals[b * w : min((b + 1) * w, n)]
        if valid2 is not None:
            sl = sl[valid2[b * w : min((b + 1) * w, n)]]
        cnt = int(sl.size)
        out["bucket"].append(b_off + b)
        if cnt == 0:
            out["min"].append(None)
            out["max"].append(None)
            out["mean"].append(prev_mean)
            out["count"].append(0)
            out["anomaly_score"].append(0.0)
            out["filled"].append(True)
        else:
            s = int(sl.astype(np.int64).sum())
            mean = s / cnt
            out["min"].append(int(sl.min()))
            out["max"].append(int(sl.max()))
            out["mean"].append(mean)
            out["count"].append(cnt)
            out["anomaly_score"].append(robust_score(sl.astype(np.float64)))
            out["filled"].append(False)
            prev_mean = mean
    return out


def tier2_from_tier1(t1: dict[str, list]) -> dict[str, list]:
    """Reference G1 merge: one part's tier1 rows (bucket-ordered) -> tier2."""
    r = TIER2_BUCKET // TIER1_BUCKET
    out: dict[str, list] = {k: [] for k in ("bucket", "min", "max", "mean", "count", "anomaly_score", "filled")}
    if not t1["bucket"]:
        return out
    prev_mean = 0.0
    i = 0
    nb = len(t1["bucket"])
    while i < nb:
        b2 = t1["bucket"][i] // r
        j = i
        while j < nb and t1["bucket"][j] // r == b2:
            j += 1
        mins = [t1["min"][k] for k in range(i, j) if t1["count"][k] > 0]
        maxs = [t1["max"][k] for k in range(i, j) if t1["count"][k] > 0]
        cnt = sum(t1["count"][i:j])
        score = max(t1["anomaly_score"][i:j])
        out["bucket"].append(b2)
        out["anomaly_score"].append(score)
        if cnt == 0:
            out["min"].append(None)
            out["max"].append(None)
            out["mean"].append(prev_mean)
            out["count"].append(0)
            out["filled"].append(True)
        else:
            mean = weighted_mean_exact(
                np.array(t1["mean"][i:j], dtype=np.float64),
                np.array(t1["count"][i:j], dtype=np.int64),
            )
            out["min"].append(min(mins))
            out["max"].append(max(maxs))
            out["mean"].append(mean)
            out["count"].append(cnt)
            out["filled"].append(False)
            prev_mean = mean
        i = j
    return out


def rollup_series(
    values: np.ndarray, valid: np.ndarray | None, policy: str = "locf"
) -> tuple[dict[str, list], dict[str, list]]:
    """tier1 + tier2 for a whole series (splitting into parts first)."""
    t1_all: dict[str, list] = {k: [] for k in ("bucket", "min", "max", "mean", "count", "anomaly_score", "filled")}
    t2_all = {k: [] for k in t1_all}
    for part_id, start, end in split_series(values.shape[0]):
        v = values[start:end]
        m = valid[start:end] if valid is not None else None
        t1 = rollup_part(v, m, policy, part_id)
        t2 = tier2_from_tier1(t1)
        for k in t1_all:
            t1_all[k].extend(t1[k])
            t2_all[k].extend(t2[k])
    return t1_all, t2_all


def _series_from_row(tokens) -> tuple[np.ndarray, np.ndarray | None]:
    """pa scalar / list -> (int32 values, valid mask or None)."""
    if isinstance(tokens, pa.ListScalar):
        arr = tokens.values
        valid = None
        if arr.null_count:
            valid = np.asarray(arr.is_valid())
            vals = np.asarray(arr.fill_null(0), dtype=np.int32)
        else:
            vals = np.asarray(arr, dtype=np.int32)
        return vals, valid
    vals = []
    valid = []
    for t in tokens:
        if t is None:
            vals.append(0)
            valid.append(False)
        else:
            vals.append(t)
            valid.append(True)
    v = np.array(vals, dtype=np.int32)
    m = np.array(valid, dtype=bool)
    return v, (None if m.all() else m)


def rollup_table(tbl: pa.Table, policy: str = "locf") -> tuple[pa.Table, pa.Table]:
    """Oracle rollup of a whole ``sequences`` Arrow table (row loop)."""
    cols1: dict[str, list] = {name: [] for name in TIER_SCHEMA.names}
    cols2: dict[str, list] = {name: [] for name in TIER_SCHEMA.names}
    doc_ids = tbl.column("doc_id").to_pylist()
    sources = tbl.column("source").to_pylist()
    toks = tbl.column("tokens")
    for i in range(tbl.num_rows):
        values, valid = _series_from_row(toks[i])
        t1, t2 = rollup_series(values, valid, policy)
        for cols, t, tier in ((cols1, t1, 1), (cols2, t2, 2)):
            nb = len(t["bucket"])
            cols["doc_id"].extend([doc_ids[i]] * nb)
            cols["source"].extend([sources[i]] * nb)
            cols["tier"].extend([tier] * nb)
            for k in ("bucket", "min", "max", "mean", "count", "anomaly_score", "filled"):
                cols[k].extend(t[k])
    mk = lambda cols: pa.table({n: pa.array(cols[n], type=TIER_SCHEMA.field(n).type) for n in TIER_SCHEMA.names})
    return mk(cols1), mk(cols2)


def encode_part(
    values: np.ndarray,
    valid: np.ndarray | None,
    part_id: int,
    dod_state: DodState,
) -> dict:
    """Reference tier0 encoding of one part (E1 + E2 + checksum).

    ``dod_state`` is the per-partition n_tok stream state (mutated)."""
    n = int(values.shape[0])
    dense, _ = gap_fill(values, valid, "locf")
    stream = gorilla_encode(dense)
    bitmap: bytes | None = None
    if valid is not None and not bool(valid.all()):
        bitmap = np.packbits(valid).tobytes()
    return {
        "part_id": part_id,
        "n_tok": n,
        "first_val": int(dense[0]) if n else 0,
        "gorilla_xor": stream,
        "dod_ntok": dod_encode_chunk(dod_state, n),
        "codec_version": CODEC_VERSION,
        "value_checksum": checksum64(dense.astype(np.int32).tobytes()),
        "null_bitmap": bitmap,
    }


def decode_part(row: dict) -> tuple[np.ndarray, np.ndarray | None]:
    """E3: inverse of ``encode_part`` -> (int32 values, valid mask or None).

    Values at invalid positions are the locf fills; callers comparing to the
    original must compare only where valid."""
    n = int(row["n_tok"])
    # v1 greedy blocks need the generic grammar follower; v2 chunked-window
    # blocks take the vectorized fast path (dispatch on codec_version)
    dec_fn = gorilla_decode if int(row.get("codec_version", CODEC_VERSION)) >= 2 else gorilla_decode_ref
    vals = dec_fn(int(row["first_val"]), row["gorilla_xor"], n)
    bitmap = row.get("null_bitmap")
    valid = None
    if bitmap is not None:
        valid = np.unpackbits(np.frombuffer(bitmap, dtype=np.uint8), count=n).astype(bool)
    return vals, valid
