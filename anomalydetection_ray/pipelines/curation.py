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
