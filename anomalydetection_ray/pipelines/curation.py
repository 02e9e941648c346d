"""C1 — end-to-end corpus curation funnel (the composition a training-data
user actually runs): quality gate → language gate → exact dedup →
per-source quota, with per-source counts at every funnel stage.

This exists to prove the engine's operators COMPOSE: the quality and
lang-ID kernels run fused in one ``map_batches`` pass over the corpus
(text is read once and never shuffled), the dedup stage exchanges only
``(doc_id, source, h1, h2)`` keyed on the content hash, and the quota
stage is the Q7 grouped-top-k prune.  The driver oracle reproduces the
whole funnel — gates, content-hash dedup, seeded quota — in one SQL query, so a
single hash mismatch anywhere in the chain fails the check.

Scale shape: one corpus scan + two small exchanges (hash-keyed dedup of
quality-passers, source-keyed quota of canonicals).  The per-stage counts
are per-source aggregates (tiny); combining four of them driver-side is
metadata work bounded by the source count, not the corpus.
"""

from __future__ import annotations


import numpy as np
import pyarrow as pa

QUALITY_MIN = 0.6
LANG_KEEP = "en"
QUOTA_K = 15


def curation_funnel(sf_dir: str, q_min: float = QUALITY_MIN,
                    lang: str = LANG_KEEP, quota_k: int = QUOTA_K):
    import pyarrow.compute as pc
    import ray.data

    from anomalydetection_ray.pipelines.queries import QUOTA_SEED_MIX
    from anomalydetection_ray.pipelines.text import lang_id_batch, quality_batch
    from anomalydetection_ray.stages.runs import keep_first_by, run_starts

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "source", "text"])

    def gates(batch: pa.Table) -> pa.Table:
        q = quality_batch(batch)
        lg = lang_id_batch(batch)
        score = np.asarray(q.column("quality_score"), dtype=np.float64)
        pl = np.asarray(lg.column("pred_lang"), dtype=object)
        ok = (score >= q_min) & (pl == lang)
        from anomalydetection_ray.pipelines.dedup import content_hash_cols

        h1, h2 = content_hash_cols(batch)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "source": batch.column("source"),
            "h1": h1,
            "h2": h2,
            "qok": pa.array(ok, type=pa.bool_()),
        })

    # materialize the COMPACT projection once (doc_id, source, 32-char
    # hash, qok — no text): every funnel count re-reads these blocks
    # instead of re-running the gate kernels over the corpus.  This is a
    # bounded intermediate (4 small columns), not a corpus
    # materialization — the text never leaves the first map_batches.
    gated = ds.map_batches(gates, batch_format="pyarrow",
                           zero_copy_batch=True).materialize()

    def count_by_source(d, col: str):
        def partial(batch: pa.Table) -> pa.Table:
            g = batch.group_by("source").aggregate([([], "count_all")])
            return pa.table({"source": g.column("source"),
                             col: pc.cast(g.column("count_all"), pa.int64())})

        def merge(group: pa.Table) -> pa.Table:
            return pa.table({
                "source": group.column("source").slice(0, 1),
                col: pa.array([int(pc.sum(group.column(col)).as_py())],
                              type=pa.int64()),
            })

        rows = (d.map_batches(partial, batch_format="pyarrow")
                 .groupby("source").map_groups(merge, batch_format="pyarrow")
                 .take_all())
        return {r["source"]: r[col] for r in rows}

    n_in = count_by_source(gated, "n_in")

    def keep_passers(batch: pa.Table) -> pa.Table:
        return batch.filter(batch.column("qok")).select(
            ["doc_id", "source", "h1", "h2"])

    passers = gated.map_batches(keep_passers, batch_format="pyarrow",
                                zero_copy_batch=True)
    n_quality = count_by_source(passers, "n_quality")
    canon = keep_first_by(passers, keys=["h1", "h2"],
                          order_by=["doc_id"]).materialize()
    n_unique = count_by_source(canon, "n_unique")

    def quota_prune(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"source": pa.array([], type=pa.string()),
                             "doc_id": pa.array([], type=pa.int64()),
                             "h": pa.array([], type=pa.int64())})
        d = np.asarray(batch.column("doc_id"), dtype=np.uint64)
        h = (((d % np.uint64(2**32)) ^ np.uint64(QUOTA_SEED_MIX))
             * np.uint64(2654435761)) % np.uint64(2**32)
        t = pa.table({"source": batch.column("source"),
                      "doc_id": pa.array(d.astype(np.int64), type=pa.int64()),
                      "h": pa.array(h.astype(np.int64), type=pa.int64())})
        t = t.sort_by([("source", "ascending"), ("h", "ascending"),
                       ("doc_id", "ascending")])
        starts = run_starts(t, ["source"])
        lens = np.diff(np.append(starts, t.num_rows))
        rank = np.arange(t.num_rows, dtype=np.int64) - np.repeat(starts, lens)
        return t.filter(pa.array(rank < quota_k))

    kept = (canon.map_batches(quota_prune, batch_format="pyarrow")
            .groupby("source").map_groups(quota_prune,
                                          batch_format="pyarrow"))
    n_kept = count_by_source(kept, "n_kept")

    srcs = sorted(n_in)
    return ray.data.from_arrow(pa.table({
        "source": pa.array(srcs, type=pa.string()),
        "n_in": pa.array([n_in[s] for s in srcs], type=pa.int64()),
        "n_quality": pa.array([n_quality.get(s, 0) for s in srcs],
                              type=pa.int64()),
        "n_unique": pa.array([n_unique.get(s, 0) for s in srcs],
                             type=pa.int64()),
        "n_kept": pa.array([n_kept.get(s, 0) for s in srcs],
                           type=pa.int64()),
    }))


def c5_quality_mixture_pack(sf_dir: str, q_min: float = QUALITY_MIN,
                            k_total: int = 150, seed: int = 7,
                            seq_len: int = 256,
                            num_partitions: int = 16):
    """C5 — composed curation #4: QUALITY GATE → TEMPERATURE MIXTURE →
    SEQUENCE PACK.  The pre-training data path in one verified chain:
    documents pass the quality score, the survivors are sampled with
    the n^0.5 temperature rule (Q13's quotas computed over the PASSERS,
    not the raw corpus — head sources damped after filtering), and the
    selected docs are packed into fixed-length training sequences with
    exact global token offsets.  One hash mismatch anywhere in the
    chain fails the driver check.

    Scale shape: ONE corpus scan computes quality + token counts fused
    (text never shuffles); the mixture stage re-uses Q13's bounded
    source-count exchange + hash-rank selection; the final pack runs
    over the SELECTED set, whose size is bounded by ``k_total`` — the
    driver-side cumsum is O(k_total) metadata work by construction."""
    import math

    import pyarrow.compute as pc
    import ray.data

    from anomalydetection_ray.pipelines.queries import QUOTA_SEED_MIX  # noqa: F401
    from anomalydetection_ray.pipelines.text import quality_batch
    from anomalydetection_ray.stages.runs import partition_apply, run_starts

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "source", "text"])

    def gate(batch: pa.Table) -> pa.Table:
        q = quality_batch(batch)
        score = np.asarray(q.column("quality_score"), dtype=np.float64)
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        words = pc.split_pattern(text, " ")
        flat = pc.list_flatten(words)
        row_of = np.asarray(pc.list_parent_indices(words), dtype=np.int64)
        nonempty = np.asarray(pc.not_equal(flat, ""))
        n_tok = np.bincount(row_of[nonempty],
                            minlength=batch.num_rows).astype(np.int64)
        keep = score >= q_min
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "source": batch.column("source"),
            "n_tok": pa.array(n_tok, type=pa.int64()),
        }).filter(pa.array(keep))

    passers = ds.map_batches(gate, batch_format="pyarrow",
                             zero_copy_batch=True).materialize()

    def count_partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by("source").aggregate([([], "count_all")])
        return pa.table({"source": g.column("source"),
                         "n": g.column("count_all").cast(pa.int64())})

    counts = (passers.map_batches(count_partial, batch_format="pyarrow",
                                  zero_copy_batch=True)
              .groupby("source").sum("n").take_all())
    per = sorted((r["source"], int(r["sum(n)"])) for r in counts)
    wgt = {s: math.sqrt(float(n)) for s, n in per}
    total_w = 0.0
    for s, _ in per:                       # pinned fold in source order
        total_w = total_w + wgt[s]
    quota = {s: int(math.floor((float(k_total) * wgt[s]) / total_w))
             for s, _ in per}

    smix = (np.uint64(seed) * np.uint64(2654435761)) & np.uint64(0xFFFFFFFF)

    def hash_batch(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("doc_id"), dtype=np.uint64)
        h = (((ids & np.uint64(0xFFFFFFFF)) ^ smix)
             * np.uint64(2654435761)) & np.uint64(0xFFFFFFFF)
        return batch.append_column(
            "h", pa.array(h.astype(np.int64), type=pa.int64()))

    hashed = passers.map_batches(hash_batch, batch_format="pyarrow",
                                 zero_copy_batch=True)

    def select(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "source": pa.array([], type=pa.string()),
                             "n_tok": pa.array([], type=pa.int64()),
                             "smp_rank": pa.array([], type=pa.int64())})
        part = part.sort_by([("source", "ascending"), ("h", "ascending"),
                             ("doc_id", "ascending")])
        starts = run_starts(part, ["source"])
        n = part.num_rows
        lens = np.diff(np.append(starts, n))
        rank = np.arange(n, dtype=np.int64) - np.repeat(starts, lens)
        heads = part.column("source").take(
            pa.array(starts, type=pa.int64())).to_pylist()
        qarr = np.array([quota.get(s, 0) for s in heads], dtype=np.int64)
        keep = np.flatnonzero(rank < np.repeat(qarr, lens))
        sel = part.take(pa.array(keep, type=pa.int64()))
        return pa.table({"doc_id": sel.column("doc_id"),
                         "source": sel.column("source"),
                         "n_tok": sel.column("n_tok"),
                         "smp_rank": pa.array(rank[keep],
                                              type=pa.int64())})

    selected = partition_apply(hashed, ["source"], select,
                               num_partitions=num_partitions)

    # final pack over the k_total-bounded selection: O(k_total) driver
    # metadata work by construction (documented boundedness)
    rows = selected.take_all()
    rows.sort(key=lambda r: int(r["doc_id"]))
    off = 0
    out = {"doc_id": [], "source": [], "n_tok": [], "smp_rank": [],
           "tok_offset": [], "seq_id": []}
    for r in rows:
        out["doc_id"].append(int(r["doc_id"]))
        out["source"].append(r["source"])
        out["n_tok"].append(int(r["n_tok"]))
        out["smp_rank"].append(int(r["smp_rank"]))
        out["tok_offset"].append(off)
        out["seq_id"].append(off // seq_len)
        off += int(r["n_tok"])
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(out["doc_id"], type=pa.int64()),
        "source": pa.array(out["source"], type=pa.string()),
        "n_tok": pa.array(out["n_tok"], type=pa.int64()),
        "smp_rank": pa.array(out["smp_rank"], type=pa.int64()),
        "tok_offset": pa.array(out["tok_offset"], type=pa.int64()),
        "seq_id": pa.array(out["seq_id"], type=pa.int64()),
    }))


# ----------------------------------------------------------------- C8 ----
def c8_quality_sweep(sf_dir: str,
                     thresholds: tuple = (0.2, 0.4, 0.6, 0.8)):
    """C8 — quality-gate CALIBRATION sweep: docs and characters
    retained at each candidate quality_score threshold — the curve a
    curator reads BEFORE picking C1's single q_min (every gate value
    is a data-volume/quality trade; this surfaces the whole trade at
    once).

    Exactness: the score is the SQL-replayed composite of
    quality_batch; thresholds are exact literals shared with the
    oracle; counts/char sums exact ints.

    Scale shape: one map-side pass computes the score and collapses to
    len(thresholds) partial rows per block; ONE bounded exchange on
    the threshold key."""
    import ray.data
    from ray.data.aggregate import Sum

    from anomalydetection_ray.pipelines.text import quality_batch

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        q = quality_batch(batch)
        score = np.asarray(q.column("quality_score"), dtype=np.float64)
        nc = np.asarray(batch.column("n_chars"), dtype=np.int64)
        rows = {"threshold": [], "n_docs": [], "n_chars": []}
        for t in thresholds:
            keep = score >= t
            rows["threshold"].append(float(t))
            rows["n_docs"].append(int(keep.sum()))
            rows["n_chars"].append(int(nc[keep].sum()))
        return pa.table({
            "threshold": pa.array(rows["threshold"],
                                  type=pa.float64()),
            "n_docs": pa.array(rows["n_docs"], type=pa.int64()),
            "n_chars": pa.array(rows["n_chars"], type=pa.int64()),
        })

    return (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("threshold")
            .aggregate(Sum("n_docs", alias_name="n_docs"),
                       Sum("n_chars", alias_name="n_chars")))
