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


def _query_vec(sf_dir: str, query_id: int) -> np.ndarray:
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(t.column("vec_id"), dtype=np.int64)
    i = int(np.flatnonzero(ids == query_id)[0])
    v = np.asarray(t.column("embedding")[i].values, dtype=np.float64)
    return v / max(np.linalg.norm(v), 1e-30)


def ann_topk_bruteforce(sf_dir: str, query_id: int = 0, k: int = 10):
    """Exact cosine top-k for one query vector (excluding the query itself);
    deterministic tiebreak (cosine desc, vec_id asc).  Pattern: partial
    top-k inside each map_batches task, tiny global sort+limit at the end."""
    q = _query_vec(sf_dir, query_id)

    def partial_topk(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("vec_id"), dtype=np.int64)
        labels = np.asarray(batch.column("label"), dtype=np.int32)
        m = np.stack([np.asarray(e, dtype=np.float64) for e in batch.column("embedding").to_pylist()])
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
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


def ann_topk_lsh(sf_dir: str, query_id: int = 0, k: int = 10):
    """LSH-bucketed ANN: seeded random hyperplanes -> bucket signatures;
    candidates = query bucket U hamming-1 buckets; exact rerank there.
    At 10^12 scale the bucket assignment is the partitioning key and only
    the probed buckets are read (partition-pruned parquet layout)."""
    import pyarrow.parquet as pq

    rng = np.random.default_rng(_SEED)
    q = _query_vec(sf_dir, query_id)
    # adapt bucket count to corpus size: ~2^planes buckets, aiming for
    # >= ~64 vectors per probed neighborhood
    n_total = pq.ParquetFile(f"{sf_dir}/embeddings.parquet").metadata.num_rows
    n_planes = max(2, min(_PLANES, int(np.log2(max(n_total, 4) / 4))))
    planes = rng.standard_normal((n_planes, q.shape[0]))

    qsig = int((planes @ q > 0).astype(np.uint32) @ (1 << np.arange(n_planes, dtype=np.uint32)))
    probe = {qsig} | {qsig ^ (1 << b) for b in range(n_planes)}
    probe_list = sorted(probe)

    def bucketize(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("vec_id"), dtype=np.int64)
        labels = np.asarray(batch.column("label"), dtype=np.int32)
        m = np.stack([np.asarray(e, dtype=np.float64) for e in batch.column("embedding").to_pylist()])
        norm = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        sig = ((norm @ planes.T) > 0).astype(np.uint32) @ (1 << np.arange(n_planes, dtype=np.uint32))
        keep = np.isin(sig, probe_list) & (ids != query_id)
        sims = norm[keep] @ q
        return pa.table({"vec_id": pa.array(ids[keep], type=pa.int64()),
                         "label": pa.array(labels[keep], type=pa.int32()),
                         "cosine": pa.array(sims, type=pa.float64())})

    cands = _emb(sf_dir).map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)
    return cands.sort(["cosine", "vec_id"], descending=[True, False]).limit(k)
