"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash).

Per the contract, nothing here (or in the library) calls ray.init() /
ray.shutdown(); only bench.py, CLI entry points and the test fixture own a
Ray session.

Operator coverage map (SURVEY.md §2.2 -> query name):
  S1/S3+M1(A1/A4/A5)+G1 -> entry, rollup_tier1_docs, rollup_tier2_docs,
                           rollup_events_tier1 (SQL-checked bucket math)
  S3                    -> s3_token_counts (SQL)
  M2                    -> m2_filter_lineitem (SQL)
  G2                    -> g2_source_stats, pricing_summary (SQL)
  G3                    -> g3_quantiles_nchars (SQL)
  Q1                    -> q1_sort_lineitem (SQL)
  Q2                    -> q2_topk_events (SQL), topk_anomalies_docs
  D1                    -> d1_dedup_events (SQL)
  J1                    -> j1_broadcast_join (SQL)
Non-SQL-expressible ops (anomaly_score over token series, codecs,
resume) get rows-only checks — documented per entry.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def _docs_sequences(sf_dir: str):
    import ray.data

    from anomalydetection_ray.sources.tokenize import tokenize_batch

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"])
    return docs.map_batches(tokenize_batch, batch_format="pyarrow", zero_copy_batch=True)


def entry() -> Any:
    """Flagship P1 rollup on /root/testdata/sf0.001: documents -> tokenize ->
    validate/split -> tier1+tier2 rollup.  Returns the tiers Dataset."""
    from anomalydetection_ray.pipelines.rollup import rollup_pipeline

    return rollup_pipeline(_docs_sequences("/root/testdata/sf0.001"))


def _rollup_tier(sf_dir: str, tier: int):
    from anomalydetection_ray.pipelines.rollup import rollup_pipeline

    return rollup_pipeline(_docs_sequences(sf_dir)).filter(expr=f"tier == {tier}")


def _detect(sf_dir: str, detector: str, **params):
    import functools

    from anomalydetection_ray.pipelines.rollup import validated
    from anomalydetection_ray.stages.detectors import detect_batch

    return validated(_docs_sequences(sf_dir)).map_batches(
        functools.partial(detect_batch, detector=detector, **params),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def queries() -> dict[str, Callable[[str], Any]]:
    from anomalydetection_ray.pipelines import dedup as dd
    from anomalydetection_ray.pipelines import multimodal as mm
    from anomalydetection_ray.pipelines import queries as q
    from anomalydetection_ray.pipelines import similarity as sim
    from anomalydetection_ray.pipelines import text as tx
    from anomalydetection_ray.pipelines.rollup import rollup_pipeline, topk_anomalies

    return {
        # training-data ops: dedup family (D-extras)
        "dedup_exact_docs": dd.exact_dedup,
        "dedup_minhash_pairs": dd.minhash_lsh_pairs,
        "dedup_simhash_pairs": dd.simhash_pairs,
        "dedup_ngram_jaccard": dd.ngram_jaccard_pairs,
        # threshold 0.3: the driver embeddings are near-orthogonal random
        # vectors (max off-diagonal cosine ~0.37), so 0.95 returns nothing
        "dedup_embedding_pairs": lambda sf: dd.embedding_dup_pairs(sf, min_cosine=0.3),
        # similarity search
        "ann_topk": lambda sf: sim.ann_topk_bruteforce(sf).select_columns(["vec_id", "label"]),
        "ann_lsh_topk": lambda sf: sim.ann_topk_lsh(sf).select_columns(["vec_id", "label"]),
        # text analysis
        "lang_id": tx.lang_id,
        "quality_stats": lambda sf: tx.quality(sf).select_columns(
            ["doc_id", "n_bytes", "alpha_chars", "alpha_ratio", "ws_tokens"]
        ),
        "quality_scores_full": tx.quality,
        "token_counts": tx.token_counts,
        "doc_fingerprints": tx.fingerprints,
        # multimodal plumbing (deterministic fake decoder; real decode is a
        # clearly-marked NotImplementedError stub — no media libs here)
        "media_features": mm.media_features,
        # per-series detectors (X1 registry; A2/A3/A6)
        "detect_esd": lambda sf: _detect(sf, "esd"),
        "detect_threshold": lambda sf: _detect(sf, "threshold"),
        "detect_ewma": lambda sf: _detect(sf, "ewma"),
        # flagship rollup over tokenized documents (anomaly_score/median not
        # SQL-expressible over the derived token table -> rows-only)
        "rollup_tier1_docs": lambda sf: _rollup_tier(sf, 1),
        "rollup_tier2_docs": lambda sf: _rollup_tier(sf, 2),
        "topk_anomalies_docs": lambda sf: topk_anomalies(
            rollup_pipeline(_docs_sequences(sf)), k=20
        ),
        # tier0 retention codecs (rows-only: not SQL-expressible)
        "tier0_encode": q.tier0_encode_summary,
        "roundtrip_verify": q.roundtrip_verify,
        # SQL-checked operators on driver tables
        "rollup_events_tier1": q.rollup_events_tier1,
        "a1_moving_stats_events": q.a1_moving_stats_events,
        "s3_token_counts": q.s3_token_counts,
        "g2_source_stats": q.g2_source_stats,
        "pricing_summary": q.pricing_summary,
        "q2_topk_events": q.q2_topk_events,
        "q1_sort_lineitem": q.q1_sort_lineitem,
        "m2_filter_lineitem": q.m2_filter_lineitem,
        "d1_dedup_events": q.d1_dedup_events,
        "j1_broadcast_join": q.j1_broadcast_join,
        "g3_quantiles_nchars": q.g3_quantiles_nchars,
        "m3_token_fns": q.m3_token_fns,
        "g3_approx_quantiles": q.g3_approx_quantiles,
        "g3_token_value_quantiles": q.g3_token_value_quantiles,
        "p1_persist_summary": q.p1_persist_summary,
        "p2_persist_summary": q.p2_persist_summary,
        "q3_sample_lineitem": q.q3_sample_lineitem,
        "d2_union_tiers": q.d2_union_tiers,
        "g2_salted_source_stats": q.g2_salted_source_stats,
    }


def oracle_sql() -> dict[str, str]:
    """DuckDB equivalents (views pre-registered by the driver).  Keys absent
    here (rollup_*_docs, topk_anomalies_docs) are non-SQL-expressible —
    robust median/MAD anomaly scores over a derived token table — and get
    the driver's rows-only check; their semantics are instead covered by
    (a) the bit-for-bit oracle gate in tests/ and (b) rollup_events_tier1,
    which expresses the identical bucket math in SQL over events."""
    return {
        "rollup_events_tier1": f"""
            WITH s AS (
                SELECT user_id,
                       CAST(FLOOR(value) AS INTEGER) AS v,
                       (ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id) - 1) // 100 AS bucket
                FROM events
            )
            SELECT user_id, bucket,
                   min(v) AS "min", max(v) AS "max",
                   CAST(sum(CAST(v AS BIGINT)) AS DOUBLE) / count(*) AS "mean",
                   count(*) AS "count",
                   CASE WHEN mad(v) = 0 THEN 0.0
                        ELSE greatest(CAST(max(v) AS DOUBLE) - median(v),
                                      median(v) - CAST(min(v) AS DOUBLE))
                             / (1.4826 * mad(v)) END AS anomaly_score
            FROM s GROUP BY user_id, bucket
        """,
        "a1_moving_stats_events": """
            WITH s AS (
                SELECT user_id, event_id,
                       CAST(FLOOR(value) AS BIGINT) AS v,
                       ROW_NUMBER() OVER w AS rn
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
            )
            SELECT user_id, event_id,
                   CASE WHEN rn >= 20 THEN
                       CAST(SUM(v) OVER win AS DOUBLE) / 20 END AS mov_mean,
                   CASE WHEN rn >= 20 THEN
                       SUM(v * v) OVER win END AS mov_sumsq
            FROM s
            WINDOW win AS (PARTITION BY user_id ORDER BY event_id
                           ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
        """,
        "s3_token_counts": """
            SELECT source, count(*) AS parts,
                   CAST(sum(greatest(octet_length(encode(text)) - 3, 0)) AS BIGINT) AS sum_tok
            FROM documents GROUP BY source
        """,
        "g2_source_stats": """
            SELECT source, count(*) AS docs,
                   CAST(sum(n_chars) AS BIGINT) AS sum_chars,
                   min(n_chars) AS min_chars, max(n_chars) AS max_chars
            FROM documents GROUP BY source
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
                   count(*) AS count_order,
                   CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) / count(*) AS avg_qty
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "q2_topk_events": """
            SELECT event_id, user_id, event_type, value
            FROM events ORDER BY value DESC, event_id LIMIT 50
        """,
        "q1_sort_lineitem": """
            SELECT l_orderkey, l_linenumber, l_quantity
            FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 1000
        """,
        "m2_filter_lineitem": """
            SELECT l_orderkey, l_partkey, l_quantity
            FROM lineitem WHERE l_quantity > 30 AND l_discount < 0.05
        """,
        "d1_dedup_events": """
            SELECT event_id, user_id, event_type, value FROM (
                SELECT event_id, user_id, event_type, value,
                       row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
                FROM events
            ) t WHERE rn = 1
        """,
        "j1_broadcast_join": """
            SELECT c_custkey, c_name, n_name, r_name
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
        """,
        "g3_quantiles_nchars": """
            SELECT source,
                   quantile_cont(n_chars, 0.5) AS p50,
                   quantile_cont(n_chars, 0.9) AS p90,
                   quantile_cont(n_chars, 0.99) AS p99
            FROM documents GROUP BY source
        """,
        "dedup_exact_docs": """
            SELECT md5(text) AS text_hash, min(doc_id) AS doc_id
            FROM documents GROUP BY md5(text)
        """,
        "g2_salted_source_stats": """
            SELECT source, CAST(sum(n_chars) AS BIGINT) AS sum_n_chars,
                   count(*) AS count
            FROM documents GROUP BY source
        """,
        "ann_topk": """
            SELECT vec_id, label FROM (
                SELECT vec_id, label,
                       list_cosine_similarity(embedding,
                           (SELECT embedding FROM embeddings WHERE vec_id = 0)) AS sim
                FROM embeddings WHERE vec_id <> 0
            ) t ORDER BY sim DESC, vec_id LIMIT 10
        """,
        "quality_stats": r"""
            SELECT doc_id,
                   octet_length(encode(text)) AS n_bytes,
                   length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha_chars,
                   CASE WHEN octet_length(encode(text)) = 0 THEN 0.0
                        ELSE CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
                             / octet_length(encode(text)) END AS alpha_ratio,
                   array_length(string_split_regex(text, '\s+')) AS ws_tokens
            FROM documents
        """,
        "token_counts": r"""
            SELECT doc_id,
                   length(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS word_count,
                   length(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS bpe_count
            FROM documents
        """,
    }
