"""X3 — persisted inverted index over the documents table.

The classic corpus-search structure a training-data pipeline needs for
targeted inspection / contamination checks: word -> posting list
(doc_id, term frequency), materialized ONCE as a bucket-partitioned
parquet layout (``bucket = hash(word) % B`` hive directories) through the
same distributed machinery as the ANN / embedding layouts
(state/layout.py): a Ray Data read -> per-block distinct (word, doc)
postings -> ``write_parquet(partition_cols=['bucket'])``.  No driver-side
corpus read at any scale; a probe reads ONLY the probed words' bucket
directories — at 100 TB a lookup touches 1/B of the index, never the
corpus.

The posting entries are per-block distinct (word, doc_id) pairs with
their in-document term frequency — exact because one document never
spans blocks (the same invariant the V2 document-frequency pass relies
on).

The probe query (``inverted_index_probe``) resolves the corpus' top-k
words (the V1 distributed pass), then aggregates each word's posting
list from its pruned bucket read: document frequency, total occurrences
and a doc_id sum/min/max posting fingerprint — all exact integers, so
the driver's DuckDB oracle checks the whole index content for those
words value-for-value.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from anomalydetection_ray.pipelines.dedup import _SH_C, _SH_CINV, _mix64
from anomalydetection_ray.pipelines.vocab import _read_docs, _words_flat

NUM_BUCKETS = 64


def string_hashes(arr: pa.Array) -> np.ndarray:
    """Vectorized 64-bit hash per string of an Arrow string array (the
    word_hashes polynomial + murmur mix, but with segments = the exact
    string extents rather than word runs — index keys hash verbatim).
    Empty strings must be filtered out beforehand."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n_str = len(arr)
    if n_str == 0:
        return np.empty(0, dtype=np.uint64)
    odt = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    offs = np.frombuffer(arr.buffers()[1], dtype=odt)[
        arr.offset: arr.offset + n_str + 1].astype(np.int64)
    flat = np.frombuffer(arr.buffers()[2], dtype=np.uint8)[offs[0]: offs[-1]]
    offs = offs - offs[0]
    n = flat.shape[0]
    P = np.empty(n, dtype=np.uint64)
    P[0] = 1
    if n > 1:
        np.cumprod(np.full(n - 1, _SH_C, dtype=np.uint64), out=P[1:])
    Pinv = np.empty(n, dtype=np.uint64)
    Pinv[0] = 1
    if n > 1:
        np.cumprod(np.full(n - 1, _SH_CINV, dtype=np.uint64), out=Pinv[1:])
    vals = flat.astype(np.uint64) * Pinv
    S = np.add.reduceat(vals, offs[:-1])
    return _mix64(S * P[offs[1:] - 1])


def word_bucket(arr: pa.Array, num_buckets: int = NUM_BUCKETS) -> np.ndarray:
    return (string_hashes(arr) % np.uint64(num_buckets)).astype(np.int64)


def _postings_batch(batch: pa.Table,
                    num_buckets: int = NUM_BUCKETS) -> pa.Table:
    flat, doc_flat = _words_flat(batch)
    occ = pa.table({"word": flat, "doc_id": doc_flat}).group_by(
        ["word", "doc_id"]).aggregate([([], "count_all")])
    w = occ.column("word")
    if isinstance(w, pa.ChunkedArray):
        w = w.combine_chunks()
    return pa.table({
        "bucket": pa.array(word_bucket(w, num_buckets), type=pa.int64()),
        "word": w,
        "doc_id": pc.cast(occ.column("doc_id"), pa.int64()),
        "tf": pc.cast(occ.column("count_all"), pa.int64()),
    })


def build_inverted_index(sf_dir: str,
                         num_buckets: int = NUM_BUCKETS) -> str:
    """Materialize the inverted index once (idempotent,
    content-fingerprinted, atomic — state/layout.py protocol).  Built
    DISTRIBUTED: each write task ships only its own blocks' postings."""
    import functools

    from anomalydetection_ray.state.layout import persist_bucketed

    src = f"{sf_dir}/documents.parquet"

    def build(tmp: str) -> None:
        import ray.data

        (ray.data.read_parquet(src, columns=["doc_id", "text"])
            .map_batches(functools.partial(_postings_batch,
                                           num_buckets=num_buckets),
                         batch_format="pyarrow", zero_copy_batch=True)
            .write_parquet(tmp, partition_cols=["bucket"]))

    return persist_bucketed("invidx", src, f"B{num_buckets}", build)


def inverted_index_probe(sf_dir: str, k: int = 5,
                         num_buckets: int = NUM_BUCKETS):
    """Probe the persisted index for the corpus' top-``k`` words (V1
    pass, deterministic under (count desc, word asc)): per word, the
    posting-list aggregate (df, total occurrences, doc_id sum/min/max) —
    read ONLY from the probed words' bucket partitions."""
    import ray.data

    from anomalydetection_ray.pipelines.vocab import vocab_topk
    from anomalydetection_ray.state.layout import bucket_files

    words = [r["word"] for r in vocab_topk(sf_dir, k).take_all()]
    path = build_inverted_index(sf_dir, num_buckets)
    warr = pa.array(words, type=pa.string())
    buckets = sorted(set(word_bucket(warr, num_buckets).tolist()))
    files = [f for b in buckets for f in bucket_files(path, b)]
    probe_set = pa.array(sorted(words), type=pa.string())

    def filt(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch.column("word"),
                                     value_set=probe_set))

    def agg(group: pa.Table) -> pa.Table:
        d = np.asarray(group.column("doc_id"), dtype=np.int64)
        tf = np.asarray(group.column("tf"), dtype=np.int64)
        return pa.table({
            "word": group.column("word").slice(0, 1),
            "df": pa.array([len(d)], type=pa.int64()),
            "n_occ": pa.array([int(tf.sum())], type=pa.int64()),
            "doc_sum": pa.array([int(d.sum())], type=pa.int64()),
            "doc_min": pa.array([int(d.min())], type=pa.int64()),
            "doc_max": pa.array([int(d.max())], type=pa.int64()),
        })

    ds = ray.data.read_parquet(files, columns=["word", "doc_id", "tf"])
    return (ds.map_batches(filt, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("word").map_groups(agg, batch_format="pyarrow"))
