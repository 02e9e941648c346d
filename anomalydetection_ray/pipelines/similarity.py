"""Similarity search over the embedding column (driver round-1 extras).

- ann_topk_bruteforce: exact cosine top-k — per-batch numpy matmul against
  a broadcast query matrix (the baseline; also the per-bucket kernel of
  the scale path)
- ann_topk_lsh: random-hyperplane LSH-bucketed ANN — the scale path:
  bucket signature via seeded hyperplanes, probe the query's bucket plus
  hamming<=1 neighbors, exact rerank inside the candidate set

Deterministic (seeded hyperplanes, stable tiebreak on vec_id).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_SEED = 42
_PLANES = 12  # 4096 buckets


def _emb(sf_dir: str):
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                 columns=["vec_id", "embedding", "label"])


def _query_vec(sf_dir: str, query_id: int, normalize: bool = True) -> np.ndarray:
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"],
                      filters=[("vec_id", "==", int(query_id))])
    if t.num_rows == 0:
        raise KeyError(f"vec_id {query_id} not in {sf_dir}/embeddings.parquet")
    v = np.asarray(t.column("embedding")[0].values, dtype=np.float64)
    return v / max(np.linalg.norm(v), 1e-30) if normalize else v


def ann_topk_bruteforce(sf_dir: str, query_id: int = 0, k: int = 10):
    """Exact cosine top-k for one query vector (excluding the query itself);
    deterministic tiebreak (cosine desc, vec_id asc).  Pattern: partial
    top-k inside each map_batches task, tiny global sort+limit at the end."""
    q = _query_vec(sf_dir, query_id)

    def partial_topk(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("vec_id"), dtype=np.int64)
        labels = np.asarray(batch.column("label"), dtype=np.int32)
        emb = batch.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        # zero-copy flat child buffer -> (n, d); no per-row Python
        m = np.asarray(emb.values, dtype=np.float64).reshape(len(ids), -1)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        sims = m @ q
        keep = ids != query_id
        ids, labels, sims = ids[keep], labels[keep], sims[keep]
        if ids.shape[0] > k:
            part = np.argpartition(-sims, k)[:k]
            ids, labels, sims = ids[part], labels[part], sims[part]
        return pa.table({"vec_id": pa.array(ids, type=pa.int64()),
                         "label": pa.array(labels, type=pa.int32()),
                         "cosine": pa.array(sims, type=pa.float64())})

    partials = _emb(sf_dir).map_batches(partial_topk, batch_format="pyarrow", zero_copy_batch=True)
    return partials.sort(["cosine", "vec_id"], descending=[True, False]).limit(k)


def _plane_params(sf_dir: str) -> tuple[int, int]:
    """(n_planes, dim) for a corpus — bucket count adapts to corpus size,
    aiming for >= ~64 vectors per probed neighborhood."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(f"{sf_dir}/embeddings.parquet")
    n_total = pf.metadata.num_rows
    t = pf.read_row_group(0, columns=["embedding"])
    dim = len(t.column("embedding")[0].values)
    n_planes = max(2, min(_PLANES, int(np.log2(max(n_total, 4) / 4))))
    return n_planes, dim


def _planes(n_planes: int, dim: int) -> np.ndarray:
    return np.random.default_rng(_SEED).standard_normal((n_planes, dim))


def _sig_batch(m_norm: np.ndarray, planes: np.ndarray) -> np.ndarray:
    n_planes = planes.shape[0]
    return ((m_norm @ planes.T) > 0).astype(np.uint32) @ (1 << np.arange(n_planes, dtype=np.uint32))


def build_ann_index(sf_dir: str) -> str:
    """Materialize the ANN LSH index ONCE as bucket-partitioned parquet:
    one ``bucket=<sig>`` hive directory per non-empty hyperplane bucket.
    This is the real partition-pruned layout — a query reads ONLY its
    probed bucket files, never rescans or re-signs the corpus.

    Built DISTRIBUTED: a Ray Data read signs each block against the
    (tiny, seeded) hyperplane matrix and a
    ``write_parquet(partition_cols=['bucket'])`` pass lands the hive
    layout — no driver-side corpus read at any scale.  Idempotent and
    content-fingerprinted (state/layout.py: atomic tmp+rename + _DONE),
    so repeated queries reuse it and a regenerated source rebuilds it."""
    from anomalydetection_ray.state.layout import persist_bucketed

    n_planes, dim = _plane_params(sf_dir)
    planes = _planes(n_planes, dim)
    src = f"{sf_dir}/embeddings.parquet"

    def build(tmp: str) -> None:
        import ray.data

        def add_sig(batch: pa.Table) -> pa.Table:
            ids = np.asarray(batch.column("vec_id"), dtype=np.int64)
            emb = batch.column("embedding")
            if isinstance(emb, pa.ChunkedArray):
                emb = emb.combine_chunks()
            m = np.asarray(emb.values, dtype=np.float64).reshape(len(ids), -1)
            norm = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
            sig = _sig_batch(norm, planes)
            return batch.append_column(
                "bucket", pa.array(sig.astype(np.int64), type=pa.int64()))

        (ray.data.read_parquet(src, columns=["vec_id", "embedding", "label"])
            .map_batches(add_sig, batch_format="pyarrow", zero_copy_batch=True)
            .write_parquet(tmp, partition_cols=["bucket"]))

    return persist_bucketed("annidx", src, f"P{n_planes}:S{_SEED}", build)


def _rerank_pruned(paths: list[str], q: np.ndarray, query_id: int, k: int):
    """Exact cosine top-k over a partition-pruned candidate read: the
    shared tail of both persisted-index ANN paths (LSH and IVF)."""
    import ray.data

    def rerank(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("vec_id"), dtype=np.int64)
        labels = np.asarray(batch.column("label"), dtype=np.int32)
        emb = batch.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        m = np.asarray(emb.values, dtype=np.float64).reshape(len(ids), -1)
        norm = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        keep = ids != query_id
        sims = norm[keep] @ q
        return pa.table({"vec_id": pa.array(ids[keep], type=pa.int64()),
                         "label": pa.array(labels[keep], type=pa.int32()),
                         "cosine": pa.array(sims, type=pa.float64())})

    cands = ray.data.read_parquet(paths, columns=["vec_id", "embedding", "label"])
    reranked = cands.map_batches(rerank, batch_format="pyarrow", zero_copy_batch=True)
    return reranked.sort(["cosine", "vec_id"], descending=[True, False]).limit(k)


def ann_topk_lsh(sf_dir: str, query_id: int = 0, k: int = 10):
    """LSH-bucketed ANN over the PERSISTED index: candidates = the query's
    bucket U its hamming-1 neighbor buckets, loaded by a partition-pruned
    parquet read of just those directories; exact cosine rerank inside the
    candidate set.  No full-corpus scan or re-signing per query."""
    from anomalydetection_ray.state.layout import bucket_files

    n_planes, dim = _plane_params(sf_dir)
    planes = _planes(n_planes, dim)
    q = _query_vec(sf_dir, query_id)
    idx = build_ann_index(sf_dir)
    qsig = int(_sig_batch(q[None, :], planes)[0])
    probe = {qsig} | {qsig ^ (1 << b) for b in range(n_planes)}
    paths = [p for b in sorted(probe) for p in bucket_files(idx, b)]
    if not paths:
        return ann_topk_bruteforce(sf_dir, query_id, k)
    return _rerank_pruned(paths, q, query_id, k)


# ----------------------------------------------------------- IVF ANN ----
_IVF_SEED = 7
_IVF_MAXK = 32  # centroid pool; first n_cents rows are the live centroids
_IVF_PROBE = 2


def _ivf_params(sf_dir: str) -> tuple[int, int]:
    """(n_cents, dim): centroid count adapts to corpus size (~8 K vectors
    per centroid at the small end, capped by the seeded pool)."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(f"{sf_dir}/embeddings.parquet")
    n_total = pf.metadata.num_rows
    t = pf.read_row_group(0, columns=["embedding"])
    dim = len(t.column("embedding")[0].values)
    n_cents = max(4, min(_IVF_MAXK, int(np.sqrt(n_total / 8.0))))
    return n_cents, dim


def _ivf_centroids(n_cents: int, dim: int) -> np.ndarray:
    """Seeded unit-norm centroid matrix: first ``n_cents`` rows of the
    ``_IVF_MAXK x dim`` pool (numpy Generator fills C-order from a
    sequential stream, so any smaller draw is a prefix — the same literal
    VALUES-table trick the LSH oracle uses)."""
    pool = np.random.default_rng(_IVF_SEED).standard_normal((_IVF_MAXK, dim))
    c = pool[:n_cents]
    return c / np.linalg.norm(c, axis=1, keepdims=True)


def build_ivf_index(sf_dir: str) -> str:
    """IVF-style persisted index — the coarse-quantizer scale path next to
    the LSH one: assign every vector to its nearest seeded unit centroid
    (argmax raw-dot, ties to the lowest centroid id) and land the corpus
    as one hive partition per inverted list via the same distributed
    ``write_parquet(partition_cols=['bucket'])`` pass (state/layout.py).
    A query then reads ONLY its probed lists.  Seeded fixed centroids
    stand in for a k-means pass (they keep the whole index a pure seeded
    function, SQL-checkable); swap ``_ivf_centroids`` for trained ones
    without touching the layout."""
    from anomalydetection_ray.state.layout import persist_bucketed

    n_cents, dim = _ivf_params(sf_dir)
    cents = _ivf_centroids(n_cents, dim)
    src = f"{sf_dir}/embeddings.parquet"

    def build(tmp: str) -> None:
        import ray.data

        def add_cid(batch: pa.Table) -> pa.Table:
            ids = np.asarray(batch.column("vec_id"), dtype=np.int64)
            emb = batch.column("embedding")
            if isinstance(emb, pa.ChunkedArray):
                emb = emb.combine_chunks()
            m = np.asarray(emb.values, dtype=np.float64).reshape(len(ids), -1)
            cid = np.argmax(m @ cents.T, axis=1)  # first max == lowest id
            return batch.append_column(
                "bucket", pa.array(cid.astype(np.int64), type=pa.int64()))

        (ray.data.read_parquet(src, columns=["vec_id", "embedding", "label"])
            .map_batches(add_cid, batch_format="pyarrow", zero_copy_batch=True)
            .write_parquet(tmp, partition_cols=["bucket"]))

    return persist_bucketed("ivfidx", src, f"K{n_cents}:S{_IVF_SEED}", build)


def ann_topk_ivf(sf_dir: str, query_id: int = 0, k: int = 10,
                 probe: int = _IVF_PROBE):
    """IVF ANN over the persisted inverted lists: probe the ``probe``
    centroids nearest the query (raw-dot order, ties to lowest id), read
    only those hive partitions, exact cosine rerank inside them."""
    from anomalydetection_ray.state.layout import bucket_files

    n_cents, dim = _ivf_params(sf_dir)
    cents = _ivf_centroids(n_cents, dim)
    q_raw = _query_vec(sf_dir, query_id, normalize=False)
    sims_c = cents @ q_raw
    order = np.argsort(-sims_c, kind="stable")[:probe]
    idx = build_ivf_index(sf_dir)
    paths = [p for cid in sorted(int(c) for c in order)
             for p in bucket_files(idx, cid)]
    if not paths:
        return ann_topk_bruteforce(sf_dir, query_id, k)
    q = q_raw / max(np.linalg.norm(q_raw), 1e-30)
    return _rerank_pruned(paths, q, query_id, k)


def k17_ann_recall(sf_dir: str, query_id: int = 0, k: int = 10):
    """K17 — ANN index RECALL@k (evaluation family #3): the LSH index's
    top-k for the query vector scored against the exact brute-force
    top-k — the one number an ANN deployment is accepted or rejected
    on.  recall = |lsh_set INTERSECT exact_set| / k, an exact integer
    ratio.

    Scale shape: both sides are the existing pipelines (persisted
    bucket-pruned probe vs brute scan); the comparison is a k-row set
    intersection on the driver — O(k) metadata work by construction."""
    import ray.data

    exact = {int(r["vec_id"])
             for r in ann_topk_bruteforce(sf_dir, query_id=query_id,
                                          k=k).take_all()}
    approx = {int(r["vec_id"])
              for r in ann_topk_lsh(sf_dir, query_id=query_id,
                                    k=k).take_all()}
    n_common = len(exact & approx)
    return ray.data.from_arrow(pa.table({
        "k": pa.array([k], type=pa.int64()),
        "n_common": pa.array([n_common], type=pa.int64()),
        "recall": pa.array([float(n_common) / float(k)],
                           type=pa.float64()),
    }))


def ann_multi_topk(sf_dir: str, query_ids: tuple = (0, 1, 2, 3, 4),
                   k: int = 10):
    """Batched exact cosine top-k: ALL query vectors answered in ONE
    corpus pass — the broadcast-query-matrix pattern (each map task
    computes one (block x Q) matmul against the tiny normalized query
    matrix shipped in the closure; per-query partial top-k inside the
    task; a bounded per-query finalize).  This is the serving shape
    for batch retrieval: corpus bytes are read once for Q queries,
    not Q times.  Ties (cosine desc, vec_id asc); self-matches
    excluded.  Registered output drops the float column (ann_topk's
    discipline) so the driver hash covers the ID ranking."""
    qm = np.stack([_query_vec(sf_dir, qid) for qid in query_ids])
    qids = np.asarray(query_ids, dtype=np.int64)

    def partial_topk(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("vec_id"), dtype=np.int64)
        labels = np.asarray(batch.column("label"), dtype=np.int32)
        emb = batch.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        m = np.asarray(emb.values, dtype=np.float64).reshape(
            len(ids), -1)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True),
                           1e-30)
        sims = m @ qm.T                     # (n, Q) — ONE matmul
        out_q, out_i, out_l, out_s = [], [], [], []
        for j in range(qids.shape[0]):
            keep = ids != qids[j]
            s = sims[keep, j]
            ii, ll = ids[keep], labels[keep]
            if ii.shape[0] > k:
                part = np.argpartition(-s, k)[:k]
                ii, ll, s = ii[part], ll[part], s[part]
            out_q.append(np.full(ii.shape[0], qids[j],
                                 dtype=np.int64))
            out_i.append(ii)
            out_l.append(ll)
            out_s.append(s)
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q),
                                 type=pa.int64()),
            "vec_id": pa.array(np.concatenate(out_i),
                               type=pa.int64()),
            "label": pa.array(np.concatenate(out_l),
                              type=pa.int32()),
            "cosine": pa.array(np.concatenate(out_s),
                               type=pa.float64()),
        })

    partials = _emb(sf_dir).map_batches(partial_topk,
                                        batch_format="pyarrow",
                                        zero_copy_batch=True)

    def finalize(group: pa.Table) -> pa.Table:
        g = group.sort_by([("cosine", "descending"),
                           ("vec_id", "ascending")]).slice(0, k)
        return g

    return partials.groupby("query_id").map_groups(
        finalize, batch_format="pyarrow")
