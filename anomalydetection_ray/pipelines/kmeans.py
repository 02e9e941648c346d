"""Distributed k-means (Lloyd) over the embeddings table — the trained
coarse quantizer next to the seeded IVF one (round-3 K family).

The classic iterative-ML dataflow on Ray Data: per iteration, broadcast
the (tiny) centroid state into ONE fused ``map_batches`` pass that both
assigns every vector and emits per-cluster partial sums; the partials
(``K`` rows per block) reduce through a small ``groupby``, and only the
``K``-row result ever reaches the driver, which updates the state and
launches the next pass.  One data pass per iteration, no shuffle of
vectors, state scales with ``K * dim`` regardless of corpus size.

Numeric determinism (what makes the driver's exact-hash gate possible on
an iterative float algorithm):

- coordinate sums are INT64 over the micro-quantized embedding
  ``floor(e * 2^20 + 0.5)`` — associative, so the distributed reduction
  is independent of block order and equals the SQL oracle's
  ``SUM(CAST(...))`` verbatim;
- dot products fold LEFT over the 64 positions in pinned order (a
  64-step vectorized loop, not a pairwise-reassociating matmul), which
  the oracle reproduces with DuckDB ``list_reduce`` (same fold order,
  IEEE-identical term products);
- scores are ``dot / count`` (two pinned float ops), cluster means are
  ``sum / (2^20 * count)``.

Assignment is argmax-dot-over-count with ties to the lowest cluster id
(numpy first-max == the oracle's ``ORDER BY score DESC, cid ASC``).
Empty clusters carry their previous centroid (denominator 1).  Lloyd
(1982); the quantized-sum trick is the same exact-integer-mean device the
tier2 rollup merge uses.
"""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa

from anomalydetection_ray.pipelines.similarity import _ivf_centroids

ESCALE = 1 << 20  # embedding micro-quantization for exact int sums
K_DEFAULT = 8
ITERS_DEFAULT = 2


def init_centroids(k: int, dim: int) -> np.ndarray:
    """Float64 initial centroids: the seeded unit pool of the IVF index
    (similarity._ivf_centroids), quantized and exactly representable so
    the SQL oracle can carry them as integer literals."""
    pool = _ivf_centroids(k, dim)
    return np.floor(pool * ESCALE + 0.5)  # integral float64, SQL-literal


def _fold_scores(ef: np.ndarray, cent: np.ndarray, denom: np.ndarray) -> np.ndarray:
    """(n, K) score matrix ``dot(e, c_k) / denom_k`` with the dot folded
    left over positions in pinned order — NOT a matmul, so every float
    add happens in the same sequence the SQL oracle's list_reduce uses."""
    n, dim = ef.shape
    k = cent.shape[0]
    acc = np.zeros((n, k), dtype=np.float64)
    for p in range(dim):
        acc += ef[:, p:p + 1] * cent[:, p]
    return acc / denom


def _emb_f64(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = np.asarray(batch.column("vec_id"), dtype=np.int64)
    emb = batch.column("embedding")
    if isinstance(emb, pa.ChunkedArray):
        emb = emb.combine_chunks()
    ef = np.asarray(emb.values, dtype=np.float64).reshape(len(ids), -1)
    return ids, ef


def _assign_update_partial(batch: pa.Table, cent: np.ndarray,
                           denom: np.ndarray) -> pa.Table:
    """Fused assignment + per-cluster partial (count, int64 coordinate
    sums) for one batch: K output rows regardless of batch size."""
    k, dim = cent.shape
    s = np.zeros((k, dim), dtype=np.int64)
    cnt = np.zeros(k, dtype=np.int64)
    if batch.num_rows:
        _, ef = _emb_f64(batch)
        cid_all = np.argmax(_fold_scores(ef, cent, denom), axis=1)
        eint = np.floor(ef * ESCALE + 0.5).astype(np.int64)
        np.add.at(s, cid_all, eint)
        cnt = np.bincount(cid_all, minlength=k).astype(np.int64)
    return pa.table({
        "cid": pa.array(np.arange(k, dtype=np.int64)),
        "cnt": pa.array(cnt, type=pa.int64()),
        "s": pa.array(s.tolist(), type=pa.list_(pa.int64())),
    })


def _merge_partials(group: pa.Table) -> pa.Table:
    cid = group.column("cid").slice(0, 1)
    cnt = int(pa.compute.sum(group.column("cnt")).as_py())
    sl = group.column("s")
    if isinstance(sl, pa.ChunkedArray):
        sl = sl.combine_chunks()
    dim = len(sl[0])
    mat = np.asarray(sl.values, dtype=np.int64).reshape(-1, dim)
    tot = mat.sum(axis=0)  # int64, associative
    return pa.table({
        "cid": cid,
        "cnt": pa.array([cnt], type=pa.int64()),
        "s": pa.array([tot.tolist()], type=pa.list_(pa.int64())),
    })


def _reduced_state(sf_dir: str, cent: np.ndarray,
                   denom: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """One Lloyd pass: returns (cnt[K], s[K, dim]) int64 exact."""
    import ray.data

    k, dim = cent.shape
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    partials = ds.map_batches(
        functools.partial(_assign_update_partial, cent=cent, denom=denom),
        batch_format="pyarrow", zero_copy_batch=True)
    reduced = partials.groupby("cid").map_groups(_merge_partials,
                                                batch_format="pyarrow")
    rows = reduced.take_all()  # K rows — the only driver materialization
    cnt = np.zeros(k, dtype=np.int64)
    s = np.zeros((k, dim), dtype=np.int64)
    for r in rows:
        cnt[int(r["cid"])] = int(r["cnt"])
        s[int(r["cid"])] = np.asarray(r["s"], dtype=np.int64)
    return cnt, s


def kmeans_state(sf_dir: str, k: int = K_DEFAULT,
                 iters: int = ITERS_DEFAULT) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Run ``iters`` fused Lloyd passes; returns (cnt, s, dim) of the
    final update (cnt[K] int64 assignment counts, s[K, dim] int64
    quantized coordinate sums)."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(f"{sf_dir}/embeddings.parquet")
    dim = len(pf.read_row_group(0, columns=["embedding"]).column("embedding")[0].values)
    cent = init_centroids(k, dim)
    denom = np.ones(k, dtype=np.float64)
    cnt = np.zeros(k, dtype=np.int64)
    s = np.zeros((k, dim), dtype=np.int64)
    for _ in range(iters):
        cnt, s = _reduced_state(sf_dir, cent, denom)
        live = cnt > 0
        cent = np.where(live[:, None], s.astype(np.float64), cent)
        denom = np.where(live, cnt.astype(np.float64), denom)
    return cnt, s, dim


def kmeans_train(sf_dir: str, k: int = K_DEFAULT, iters: int = ITERS_DEFAULT):
    """K1 — distributed Lloyd k-means: ``iters`` fused
    assign-and-partial-sum passes, exact integer reductions, pinned-order
    float scoring.  Returns the long-form centroid table (cid, pos,
    coord_sum_q, n_assigned, mean) — K * dim rows; ``mean`` is the
    dequantized centroid coordinate, null for empty clusters."""
    import ray.data

    cnt, s, dim = kmeans_state(sf_dir, k, iters)
    cid = np.repeat(np.arange(k, dtype=np.int64), dim)
    pos = np.tile(np.arange(1, dim + 1, dtype=np.int64), k)
    sq = s.reshape(-1)
    nas = np.repeat(cnt, dim)
    empty = nas == 0
    mean = sq / (float(ESCALE) * np.where(empty, 1, nas))
    out = pa.table({
        "cid": pa.array(cid, type=pa.int64()),
        "pos": pa.array(pos, type=pa.int64()),
        "coord_sum_q": pa.array(sq, type=pa.int64()),
        "n_assigned": pa.array(nas, type=pa.int64()),
        "mean": pa.array(mean, type=pa.float64(), mask=empty),
    })
    return ray.data.from_arrow(out)


def kmeans_assign(sf_dir: str, k: int = K_DEFAULT, iters: int = ITERS_DEFAULT):
    """K3 — cluster assignment (the predict surface): per-vector cluster
    id and its pinned assignment score under the centroid state reached
    after ``iters - 1`` Lloyd updates — exactly the assignment K1's final
    training pass uses, so the SQL oracle shares the unrolled CTE chain.
    Map-only: the K x dim state broadcasts into one pass, nothing
    shuffles, and the output streams (one row per vector)."""
    import pyarrow.parquet as pq
    import ray.data

    pf = pq.ParquetFile(f"{sf_dir}/embeddings.parquet")
    dim = len(pf.read_row_group(0, columns=["embedding"])
              .column("embedding")[0].values)
    cent = init_centroids(k, dim)
    denom = np.ones(k, dtype=np.float64)
    for _ in range(iters - 1):
        cnt, s = _reduced_state(sf_dir, cent, denom)
        live = cnt > 0
        cent = np.where(live[:, None], s.astype(np.float64), cent)
        denom = np.where(live, cnt.astype(np.float64), denom)

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])

    def assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"vec_id": pa.array([], type=pa.int64()),
                             "cid": pa.array([], type=pa.int64()),
                             "score": pa.array([], type=pa.float64())})
        ids, ef = _emb_f64(batch)
        sc = _fold_scores(ef, cent, denom)
        cid = np.argmax(sc, axis=1)
        return pa.table({
            "vec_id": pa.array(ids, type=pa.int64()),
            "cid": pa.array(cid.astype(np.int64), type=pa.int64()),
            "score": pa.array(sc[np.arange(len(ids)), cid],
                              type=pa.float64()),
        })

    return ds.map_batches(assign, batch_format="pyarrow",
                          zero_copy_batch=True)


def vector_quantize(sf_dir: str):
    """K4 — embedding serving prep: per-vector L2 norm (over the exact
    2^20-quantized coordinates) and an int8 quantization ``code_p =
    floor(127 * q_p / norm + 0.5)``, summarized as content-pinning
    integer checksums.  Map-only, one pass, nothing shuffles.  Every
    float is pinned: norm = one sqrt of an exact int64 sum-of-squares,
    each code = one multiply + one divide + one floor — the SQL oracle
    replays them verbatim with list_transform/list_reduce."""
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])

    def quant(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                "vec_id": pa.array([], type=pa.int64()),
                "ssq": pa.array([], type=pa.int64()),
                "norm_q": pa.array([], type=pa.float64()),
                "code_sum": pa.array([], type=pa.int64()),
                "code_sumsq": pa.array([], type=pa.int64()),
            })
        ids, ef = _emb_f64(batch)
        q = np.floor(ef * ESCALE + 0.5).astype(np.int64)
        ssq = (q * q).sum(axis=1)
        norm = np.sqrt(ssq.astype(np.float64))
        zero = norm == 0.0
        safe = np.where(zero, 1.0, norm)
        codes = np.floor(127.0 * q.astype(np.float64) / safe[:, None] + 0.5) \
            .astype(np.int64)
        cs = codes.sum(axis=1)
        csq = (codes * codes).sum(axis=1)
        return pa.table({
            "vec_id": pa.array(ids, type=pa.int64()),
            "ssq": pa.array(ssq, type=pa.int64()),
            "norm_q": pa.array(norm, type=pa.float64()),
            "code_sum": pa.array(cs, type=pa.int64(), mask=zero),
            "code_sumsq": pa.array(csq, type=pa.int64(), mask=zero),
        })

    return ds.map_batches(quant, batch_format="pyarrow",
                          zero_copy_batch=True)


# ---------------------------------------------------------------- K5 ----
def k5_dim_standardize(sf_dir: str):
    """K5 — per-dimension feature standardization stats over the
    embedding matrix: exact micro-quantized first/second moments per
    dimension, plus the pinned-float mean and standard deviation the
    serving layer divides by — the preprocessing twin of K4's
    quantization (models want zero-mean unit-variance dims; this is the
    fit() half).

    Exactness: per-block partials are int64 sums of ``floor(e * 2^20 +
    0.5)`` and its square (64 rows per block regardless of block size);
    the final merge combines partials with arbitrary-precision Python
    ints (the W5 discipline) before casting back.  The float tail is the
    pinned elementwise sequence ``ex = sum/n; ex2 = sumsq/n; std_q =
    sqrt(ex2 - ex*ex)`` — identical IEEE ops in the SQL oracle."""
    import math

    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["embedding"])

    def partial(batch: pa.Table) -> pa.Table:
        _, ef = _emb_f64(batch.append_column(
            "vec_id", pa.array(np.zeros(batch.num_rows, dtype=np.int64))))
        q = np.floor(ef * ESCALE + 0.5).astype(np.int64)
        dim = q.shape[1] if q.size else 0
        return pa.table({
            "dim": pa.array(np.arange(dim, dtype=np.int64)),
            "n": pa.array(np.full(dim, q.shape[0]), type=pa.int64()),
            "sum_q": pa.array(q.sum(axis=0), type=pa.int64()),
            "sumsq_q": pa.array((q * q).sum(axis=0), type=pa.int64()),
        })

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)

    def merge(group: pa.Table) -> pa.Table:
        n = sum(int(v) for v in group.column("n").to_pylist())
        s = sum(int(v) for v in group.column("sum_q").to_pylist())
        s2 = sum(int(v) for v in group.column("sumsq_q").to_pylist())
        ex = float(s) / float(n)
        ex2 = float(s2) / float(n)
        std_q = math.sqrt(ex2 - ex * ex)
        return pa.table({
            "dim": group.column("dim").slice(0, 1),
            "n": pa.array([n], type=pa.int64()),
            "sum_q": pa.array([s], type=pa.int64()),
            "sumsq_q": pa.array([s2], type=pa.int64()),
            "mean": pa.array([(float(s) / float(n)) / float(ESCALE)],
                             type=pa.float64()),
            "std": pa.array([std_q / float(ESCALE)], type=pa.float64()),
        })

    return partials.groupby("dim").map_groups(merge, batch_format="pyarrow")


# ---------------------------------------------------------------- K6 ----
def k6_dim_correlation(sf_dir: str, n_dims: int = 8):
    """K6 — dimension-pair Pearson correlation over the first ``n_dims``
    embedding dimensions: the feature-redundancy audit before PCA /
    whitening decisions (K5 gives the diagonal; this gives the
    off-diagonal structure).

    Exactness: all five moment sums are exact int64 over the 2^20
    micro-quantized components (per-block partials, n_dims*(n_dims-1)/2
    rows per block); the correlation is the pinned elementwise sequence
    ``exy - ex*ey`` over ``sqrt(vx) * sqrt(vy)`` both sides replay."""
    import math

    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["embedding"])
    ii, jj = np.triu_indices(n_dims, k=1)

    def partial(batch: pa.Table) -> pa.Table:
        _, ef = _emb_f64(batch.append_column(
            "vec_id", pa.array(np.zeros(batch.num_rows, dtype=np.int64))))
        q = np.floor(ef[:, :n_dims] * ESCALE + 0.5).astype(np.int64)
        n = q.shape[0]
        a = q[:, ii]
        b = q[:, jj]
        return pa.table({
            "dim_a": pa.array(ii.astype(np.int64)),
            "dim_b": pa.array(jj.astype(np.int64)),
            "n": pa.array(np.full(len(ii), n), type=pa.int64()),
            "sx": pa.array(a.sum(axis=0), type=pa.int64()),
            "sy": pa.array(b.sum(axis=0), type=pa.int64()),
            "sxx": pa.array((a * a).sum(axis=0), type=pa.int64()),
            "syy": pa.array((b * b).sum(axis=0), type=pa.int64()),
            "sxy": pa.array((a * b).sum(axis=0), type=pa.int64()),
        })

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)

    def merge(group: pa.Table) -> pa.Table:
        n = sum(int(v) for v in group.column("n").to_pylist())
        sx = sum(int(v) for v in group.column("sx").to_pylist())
        sy = sum(int(v) for v in group.column("sy").to_pylist())
        sxx = sum(int(v) for v in group.column("sxx").to_pylist())
        syy = sum(int(v) for v in group.column("syy").to_pylist())
        sxy = sum(int(v) for v in group.column("sxy").to_pylist())
        ex = float(sx) / float(n)
        ey = float(sy) / float(n)
        cov = float(sxy) / float(n) - ex * ey
        vx = float(sxx) / float(n) - ex * ex
        vy = float(syy) / float(n) - ey * ey
        corr = cov / (math.sqrt(vx) * math.sqrt(vy))
        return pa.table({
            "dim_a": group.column("dim_a").slice(0, 1),
            "dim_b": group.column("dim_b").slice(0, 1),
            "n": pa.array([n], type=pa.int64()),
            "sx": pa.array([sx], type=pa.int64()),
            "sy": pa.array([sy], type=pa.int64()),
            "sxy": pa.array([sxy], type=pa.int64()),
            "corr": pa.array([corr], type=pa.float64()),
        })

    return partials.groupby(["dim_a", "dim_b"]).map_groups(
        merge, batch_format="pyarrow")


# ---------------------------------------------------------------- K7 ----
PSCALE = 1 << 10  # power-iteration quantization: coarser than ESCALE so
#                   every per-block product sum stays inside int64


def k7_power_iteration(sf_dir: str, iters: int = 2):
    """K7 — distributed power iteration (von Mises & Pollaczek-Geiringer
    1929): the dominant eigenvector of the UNCENTERED Gram matrix X^T X
    over the embedding table — the one-component PCA direction every
    embedding-drift / projection audit starts from, here as the iterative
    linear-algebra sibling of K1's Lloyd loop.

    Exactness (the k-means pinning discipline applied to eigensolving):
    embeddings quantize to PSCALE=2^10 integer units; each iteration's
    matvec w = X^T (X v) is EXACT integer arithmetic (per-block int64
    partials — |w| <= rows * 2^10 * dim * 2^20 stays in range at block
    granularity — combined per dim in arbitrary-precision Python ints);
    renormalization is the pinned float tail (one order-pinned fold for
    the norm, one division + floor per dim) and re-quantizes v to 2^10
    units, so the SQL oracle replays both iterations verbatim.

    Scale shape: one map_batches pass per iteration emitting dim partial
    rows per block; only O(blocks * dim) ints reach the driver (the
    kmeans K-row discipline).  Returns a dim-row pyarrow table
    (dim, w1, v1_q, w2, v2_q)."""
    import math

    import ray.data

    path = f"{sf_dir}/embeddings.parquet"
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(path)
    dim = len(pf.read_row_group(0, columns=["embedding"])
              .column("embedding")[0].values)

    def matvec_partial(batch: pa.Table, v: np.ndarray) -> pa.Table:
        _, ef = _emb_f64(batch)
        q = np.floor(ef * float(PSCALE) + 0.5).astype(np.int64)
        y = q @ v                      # exact int64 per row
        w = q.T @ y                    # exact int64 per block
        return pa.table({
            "d": pa.array(np.arange(dim, dtype=np.int64)),
            "w": pa.array(w, type=pa.int64()),
        })

    out_cols: dict = {"dim": np.arange(dim, dtype=np.int64)}
    v = np.full(dim, PSCALE, dtype=np.int64)   # deterministic all-ones start
    for it in range(1, iters + 1):
        import functools

        ds = ray.data.read_parquet(path, columns=["vec_id", "embedding"])
        parts = ds.map_batches(
            functools.partial(matvec_partial, v=v),
            batch_format="pyarrow", zero_copy_batch=True).take_all()
        w = [0] * dim                          # arbitrary-precision merge
        for r in parts:
            w[int(r["d"])] += int(r["w"])
        acc = 0.0
        for d in range(dim):                   # order-pinned norm fold
            acc = acc + float(w[d]) * float(w[d])
        nrm = math.sqrt(acc)
        v = np.array([math.floor(float(w[d]) / nrm * float(PSCALE) + 0.5)
                      for d in range(dim)], dtype=np.int64)
        out_cols[f"w{it}"] = np.array(w, dtype=np.int64)
        out_cols[f"v{it}_q"] = v.copy()
    return pa.table({k: pa.array(vv, type=pa.int64())
                     for k, vv in out_cols.items()})


def k13_centroid_cosines(sf_dir: str, k: int = K_DEFAULT,
                         iters: int = ITERS_DEFAULT):
    """K13 — inter-centroid cosine matrix: pairwise cosine similarity of
    the trained K1 centroids — the cluster-separation audit (two
    centroids at cosine ~1 mean the clustering wasted a cluster on one
    mode; uniformly low cosines mean well-spread modes).

    Exactness: centroid means are K1's pinned dequantization
    float(sum_q) / (ESCALE * n); dot products and norms fold
    SEQUENTIALLY over positions from a 0.0 seed (the kmeans oracle's
    list_reduce discipline), and the cosine is one division by a
    product of two libm sqrts.  Only the K x dim state is touched —
    driver-side K^2 * dim scalar work, no data pass at all beyond K1's
    own training reads."""
    import math

    import ray.data

    cnt, s, dim = kmeans_state(sf_dir, k, iters)
    means = []
    for j in range(k):
        if cnt[j] == 0:
            means.append(None)
            continue
        denom = float(ESCALE) * float(cnt[j])
        means.append([float(int(s[j, p])) / denom for p in range(dim)])

    def fold_dot(a, b) -> float:
        acc = 0.0
        for p in range(dim):
            acc = acc + a[p] * b[p]
        return acc

    rows_a, rows_b, dots, coss = [], [], [], []
    for i in range(k):
        if means[i] is None:
            continue
        for j in range(i + 1, k):
            if means[j] is None:
                continue
            d = fold_dot(means[i], means[j])
            nii = fold_dot(means[i], means[i])
            njj = fold_dot(means[j], means[j])
            c = d / (math.sqrt(nii) * math.sqrt(njj))
            rows_a.append(i)
            rows_b.append(j)
            dots.append(d)
            coss.append(c)
    return ray.data.from_arrow(pa.table({
        "cid_a": pa.array(rows_a, type=pa.int64()),
        "cid_b": pa.array(rows_b, type=pa.int64()),
        "dot": pa.array(dots, type=pa.float64()),
        "cosine": pa.array(coss, type=pa.float64()),
    }))


def k14_quant_saturation(sf_dir: str):
    """K14 — int8 quantization saturation audit per label: how many K4
    codes hit the +/-127 rail and how many collapse to zero — the two
    failure modes of symmetric per-vector int8 (rails = clipping loss on
    dominant dims, zeros = underflow loss on flat dims).  The
    serving-quality gate next to K4's checksums.

    Exactness: codes are K4's pinned floor(127*q/norm + 0.5); rail/zero
    tests and all counts are exact ints; sat_frac and zero_frac are one
    pinned int->double division each.  Map-only collapse to <= |label|
    partial rows per block, ONE bounded exchange."""
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "label", "embedding"])

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                "label": pa.array([], type=pa.int64()),
                "n_vecs": pa.array([], type=pa.int64()),
                "n_codes": pa.array([], type=pa.int64()),
                "n_saturated": pa.array([], type=pa.int64()),
                "n_zero": pa.array([], type=pa.int64()),
            })
        ids, ef = _emb_f64(batch)
        lab = np.asarray(batch.column("label"), dtype=np.int64)
        q = np.floor(ef * ESCALE + 0.5).astype(np.int64)
        ssq = (q * q).sum(axis=1)
        norm = np.sqrt(ssq.astype(np.float64))
        safe = np.where(norm == 0.0, 1.0, norm)
        codes = np.floor(127.0 * q.astype(np.float64) / safe[:, None]
                         + 0.5).astype(np.int64)
        sat = (np.abs(codes) >= 127).sum(axis=1)
        zer = (codes == 0).sum(axis=1)
        t = pa.table({"label": pa.array(lab, type=pa.int64()),
                      "one": pa.array(np.ones(len(lab), dtype=np.int64)),
                      "nc": pa.array(np.full(len(lab), codes.shape[1],
                                             dtype=np.int64)),
                      "sat": pa.array(sat.astype(np.int64)),
                      "zer": pa.array(zer.astype(np.int64))})
        g = t.group_by(["label"]).aggregate(
            [("one", "sum"), ("nc", "sum"), ("sat", "sum"),
             ("zer", "sum")])
        return pa.table({
            "label": g.column("label"),
            "n_vecs": g.column("one_sum").cast(pa.int64()),
            "n_codes": g.column("nc_sum").cast(pa.int64()),
            "n_saturated": g.column("sat_sum").cast(pa.int64()),
            "n_zero": g.column("zer_sum").cast(pa.int64()),
        })

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("label")
           .sum(["n_vecs", "n_codes", "n_saturated", "n_zero"]))

    def finalize(batch: pa.Table) -> pa.Table:
        lab = np.asarray(batch.column("label"), dtype=np.int64)
        nv = np.asarray(batch.column("sum(n_vecs)"), dtype=np.int64)
        nc = np.asarray(batch.column("sum(n_codes)"), dtype=np.int64)
        ns = np.asarray(batch.column("sum(n_saturated)"), dtype=np.int64)
        nz = np.asarray(batch.column("sum(n_zero)"), dtype=np.int64)
        return pa.table({
            "label": pa.array(lab, type=pa.int64()),
            "n_vecs": pa.array(nv, type=pa.int64()),
            "n_codes": pa.array(nc, type=pa.int64()),
            "n_saturated": pa.array(ns, type=pa.int64()),
            "n_zero": pa.array(nz, type=pa.int64()),
            "sat_frac": pa.array(ns.astype(np.float64)
                                 / nc.astype(np.float64),
                                 type=pa.float64()),
            "zero_frac": pa.array(nz.astype(np.float64)
                                  / nc.astype(np.float64),
                                  type=pa.float64()),
        })

    return agg.map_batches(finalize, batch_format="pyarrow")


def k15_cluster_balance(sf_dir: str, k: int = K_DEFAULT,
                        iters: int = ITERS_DEFAULT):
    """K15 — cluster-balance audit over the trained K1 state: the
    Gini-Simpson evenness of cluster sizes (exact rational — the W33
    identity) plus the max share — one degenerate mega-cluster (share
    -> 1, D -> 0) means k was wasted, near-uniform shares mean the
    modes are balanced.  Touches only the K-row count vector; no data
    pass beyond K1's own training reads."""
    import ray.data

    cnt, _s, _dim = kmeans_state(sf_dir, k, iters)
    sizes = [int(c) for c in cnt.tolist() if int(c) > 0]
    n = sum(sizes)
    ssq = sum(c * c for c in sizes)
    num = n * n - ssq
    den = n * n
    d = float(num) / float(den) if den > 0 else None
    mx = max(sizes) if sizes else 0
    max_share = float(mx) / float(n) if n > 0 else None
    return ray.data.from_arrow(pa.table({
        "k_nonempty": pa.array([len(sizes)], type=pa.int64()),
        "n_vectors": pa.array([n], type=pa.int64()),
        "bal_num": pa.array([num], type=pa.int64()),
        "bal_den": pa.array([den], type=pa.int64()),
        "gini_simpson": pa.array([d], type=pa.float64(),
                                 from_pandas=True),
        "max_share": pa.array([max_share], type=pa.float64(),
                              from_pandas=True),
    }))


def k16_cluster_purity(sf_dir: str, k: int = K_DEFAULT,
                       iters: int = ITERS_DEFAULT,
                       num_partitions: int = 16):
    """K16 — cluster PURITY against the ground-truth labels: for every
    trained K1 cluster, the majority label, its count, and
    purity = top_count / n_vecs — the second member of the EVALUATION
    family (T18 scores lang_id; this scores the clustering).  Low
    purity with balanced sizes means the embedding space does not
    separate the labels — a finding about the DATA, which is the point.

    Scale shape: K3's map-only assignment + ONE co-partitioned label
    attach; per-(cid, label) counts collapse per block (<= k x |labels|
    rows), the majority argmax runs on that bounded grid.  Ties break
    to the smallest label on both sides."""
    import ray.data

    from anomalydetection_ray.stages.join import copartition_attach

    asg = kmeans_assign(sf_dir, k=k, iters=iters)
    labels = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                   columns=["vec_id", "label"])
    with_lab = copartition_attach(asg, labels, "vec_id", "vec_id",
                                  ["label"],
                                  num_partitions=num_partitions)

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"cid": batch.column("cid").cast(pa.int64()),
                      "label": batch.column("label").cast(pa.int64()),
                      "one": pa.array(np.ones(batch.num_rows,
                                              dtype=np.int64))})
        g = t.group_by(["cid", "label"]).aggregate([("one", "sum")])
        return pa.table({"cid": g.column("cid"),
                         "label": g.column("label"),
                         "n": g.column("one_sum").cast(pa.int64())})

    counts = (with_lab.map_batches(partial, batch_format="pyarrow",
                                   zero_copy_batch=True)
              .groupby(["cid", "label"]).sum("n"))

    def finalize(group: pa.Table) -> pa.Table:
        cid = int(group.column("cid")[0].as_py())
        lab = np.asarray(group.column("label"), dtype=np.int64)
        n = np.asarray(group.column("sum(n)"), dtype=np.int64)
        tot = int(n.sum())
        order = np.lexsort((lab, -n))
        top = order[0]
        return pa.table({
            "cid": pa.array([cid], type=pa.int64()),
            "n_vecs": pa.array([tot], type=pa.int64()),
            "top_label": pa.array([int(lab[top])], type=pa.int64()),
            "top_count": pa.array([int(n[top])], type=pa.int64()),
            "purity": pa.array([float(int(n[top])) / float(tot)],
                               type=pa.float64()),
        })

    return counts.groupby("cid").map_groups(finalize,
                                            batch_format="pyarrow")


# ---------------------------------------------------------------- K18 ----
def k18_label_medoids(sf_dir: str):
    """K18 — per-label MEDOID: the actual member vector minimizing the
    sum of squared distances to its labelmates (ties -> smallest
    vec_id) — the robust, member-constrained cousin of K2's centroids
    (a centroid can land in empty space; the medoid is always a real
    example, which is what few-shot selection wants).

    Exactness: K5's 2^20 micro-quantization makes every pairwise
    squared distance an exact int64; per-label totals come from one
    integer Gram matmul (total_a = n*|qa|^2 + sum|qb|^2 - 2*rowsum(G)),
    and the argmin is pure integer comparison.  NO floats anywhere.

    Scale shape: ONE exchange on the bounded label domain; the
    per-label kernel is one (n x d)(d x n) int matmul.  At web scale
    per-label membership is the bound — medoids of million-member
    labels need the sampled/CLARANS variant (documented limit)."""
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "label", "embedding"])

    def kernel(group: pa.Table) -> pa.Table:
        emb = group.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        x = np.asarray(emb.values, dtype=np.float64).reshape(
            group.num_rows, -1)
        q = np.floor(x * (1 << 20) + 0.5).astype(np.int64)
        vid = np.asarray(group.column("vec_id"), dtype=np.int64)
        norms = (q * q).sum(axis=1)
        gram = q @ q.T
        n = q.shape[0]
        total = n * norms + norms.sum() - 2 * gram.sum(axis=1)
        order = np.lexsort((vid, total))
        best = order[0]
        return pa.table({
            "label": group.column("label").slice(0, 1).cast(pa.int64()),
            "n": pa.array([n], type=pa.int64()),
            "medoid_vec_id": pa.array([int(vid[best])],
                                      type=pa.int64()),
            "total_d2": pa.array([int(total[best])], type=pa.int64()),
        })

    return ds.groupby("label").map_groups(kernel,
                                          batch_format="pyarrow")


# ---------------------------------------------------------------- K19 ----
def k19_anova_f(sf_dir: str):
    """K19 — per-dimension one-way ANOVA F across labels over the
    embedding matrix: which dimensions actually separate the classes
    (the feature-selection screen next to K5's scaling stats and K6's
    redundancy map).  F = (SSB/(k-1)) / (SSW/(N-k)) with SSW/SSB from
    the micro-quantized per-(dim, label) moments.

    Determinism: per-(dim, label) n/sum/sumsq are exact int64 (K5's
    quantization); SSW folds over labels in ascending label order from
    0.0 with the per-label term ``q2 - s*s/n`` (the oracle replays the
    fold via list_reduce), SST is the same three-op expression on the
    exact totals, SSB = SST - SSW, and F is the final two pinned
    divisions.  k < 2, N <= k or SSW <= 0 emits NULL.

    Scale shape: per-block (dim, label) moment partials (dims x labels
    rows per block regardless of block size), ONE bounded exchange, a
    per-DIM finalize."""
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["embedding", "label"])

    def partial(batch: pa.Table) -> pa.Table:
        _, ef = _emb_f64(batch.append_column(
            "vec_id", pa.array(np.zeros(batch.num_rows, dtype=np.int64))))
        q = np.floor(ef * ESCALE + 0.5).astype(np.int64)
        lab = np.asarray(batch.column("label"), dtype=np.int64)
        dim = q.shape[1] if q.size else 0
        out = {"dim": [], "label": [], "n": [], "s": [], "q2": []}
        for g in np.unique(lab):
            rows = q[lab == g]
            out["dim"].append(np.arange(dim, dtype=np.int64))
            out["label"].append(np.full(dim, g, dtype=np.int64))
            out["n"].append(np.full(dim, rows.shape[0], dtype=np.int64))
            out["s"].append(rows.sum(axis=0))
            out["q2"].append((rows * rows).sum(axis=0))
        if not out["dim"]:
            return pa.table({k: pa.array([], type=pa.int64())
                             for k in out})
        return pa.table({k: pa.array(np.concatenate(v), type=pa.int64())
                         for k, v in out.items()})

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)

    def finalize(group: pa.Table) -> pa.Table:
        d = group.column("dim")[0].as_py()
        lab = np.asarray(group.column("label"), dtype=np.int64)
        n = np.asarray(group.column("n"), dtype=np.int64)
        s = np.asarray(group.column("s"), dtype=np.int64)
        q2 = np.asarray(group.column("q2"), dtype=np.int64)
        labels = sorted(set(lab.tolist()))
        k = len(labels)
        NN = int(n.sum())
        SS = sum(int(v) for v in s.tolist())
        QQ = sum(int(v) for v in q2.tolist())
        ssw = 0.0
        for g in labels:                  # ascending-label fold
            sel = lab == g
            ng = int(n[sel].sum())
            sg = sum(int(v) for v in s[sel].tolist())
            qg = sum(int(v) for v in q2[sel].tolist())
            ssw = ssw + (float(qg) - float(sg) * float(sg) / float(ng))
        sst = float(QQ) - float(SS) * float(SS) / float(NN)
        ssb = sst - ssw
        f = ((ssb / float(k - 1)) / (ssw / float(NN - k))
             if k >= 2 and NN > k and ssw > 0 else None)
        return pa.table({
            "dim": pa.array([d], type=pa.int64()),
            "n": pa.array([NN], type=pa.int64()),
            "k_labels": pa.array([k], type=pa.int64()),
            "ssw": pa.array([ssw], type=pa.float64()),
            "ssb": pa.array([ssb], type=pa.float64()),
            "f_stat": pa.array([f], type=pa.float64(),
                               from_pandas=True),
        })

    return partials.groupby("dim").map_groups(finalize,
                                              batch_format="pyarrow")


# ---------------------------------------------------------------- K20 ----
def k20_confusion_matrix(sf_dir: str, k: int = K_DEFAULT,
                         iters: int = ITERS_DEFAULT,
                         num_partitions: int = 16):
    """K20 — the full (assigned cluster x true label) CONFUSION MATRIX
    behind K16's purity scalar: which labels each cluster absorbs and
    where each label scatters — the readout that tells you WHETHER a
    low-purity cluster is a 50/50 merge or a long mixing tail (purity
    can't distinguish them).

    Scale shape: K16's exactly — map-only assignment, ONE
    co-partitioned label attach, per-(cid, label) count partials on a
    <= k x |labels| bounded grid."""
    import ray.data

    from anomalydetection_ray.stages.join import copartition_attach

    asg = kmeans_assign(sf_dir, k=k, iters=iters)
    labels = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                   columns=["vec_id", "label"])
    with_lab = copartition_attach(asg, labels, "vec_id", "vec_id",
                                  ["label"],
                                  num_partitions=num_partitions)

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"cid": batch.column("cid").cast(pa.int64()),
                      "label": batch.column("label").cast(pa.int64()),
                      "one": pa.array(np.ones(batch.num_rows,
                                              dtype=np.int64))})
        g = t.group_by(["cid", "label"]).aggregate([("one", "sum")])
        return pa.table({"cid": g.column("cid"),
                         "label": g.column("label"),
                         "n": g.column("one_sum").cast(pa.int64())})

    counts = (with_lab.map_batches(partial, batch_format="pyarrow",
                                   zero_copy_batch=True)
              .groupby(["cid", "label"]).sum("n"))

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({
            "cid": batch.column("cid").cast(pa.int64()),
            "label": batch.column("label").cast(pa.int64()),
            "n": batch.column("sum(n)").cast(pa.int64()),
        })

    return counts.map_batches(rename, batch_format="pyarrow")


# ---------------------------------------------------------------- K21 ----
def k21_cluster_radii(sf_dir: str, k: int = K_DEFAULT,
                      iters: int = ITERS_DEFAULT):
    """K21 — per-cluster radius statistics: the maximum and LOWER-median
    member distance to the cluster's own (final-state) centroid — the
    compactness diagnostic that closes the evaluation family (K15 sizes,
    K16 purity, K20 confusion; this says whether a cluster is a tight
    ball or a diffuse catch-all).

    Exactness: with cnt/s the final Lloyd state, the cnt-scaled squared
    distance r2s = sum_p (cnt*q_p - s_p)^2 is an exact integer per
    member (Python here, HUGEINT in the oracle; it can pass int64, so
    partials carry it as an exact (hi, lo) 32-bit pair), order
    statistics are taken on the exact ints, and the dequantized radii
    are the pinned sqrt(split(r2s)) / (cnt * 2^20) chain.

    Scale shape: K3's map-only assignment with the K x dim state
    broadcast; ONE cid-keyed exchange of (cid, hi, lo) rows; per-cid
    finalize holds only that cluster's members (the documented
    membership bound shared with K18)."""
    import math

    import ray.data

    from anomalydetection_ray.stages.detectors import _split_double

    cnt, s, dim = kmeans_state(sf_dir, k, iters)
    cent = init_centroids(k, dim)
    denom = np.ones(k, dtype=np.float64)
    for _ in range(iters - 1):
        c2, s2 = _reduced_state(sf_dir, cent, denom)
        live = c2 > 0
        cent = np.where(live[:, None], s2.astype(np.float64), cent)
        denom = np.where(live, c2.astype(np.float64), denom)

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])

    def kernel(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                "cid": pa.array([], type=pa.int64()),
                "vec_id": pa.array([], type=pa.int64()),
                "hi": pa.array([], type=pa.int64()),
                "lo": pa.array([], type=pa.int64()),
            })
        ids, ef = _emb_f64(batch)
        sc = _fold_scores(ef, cent, denom)
        cid = np.argmax(sc, axis=1).astype(np.int64)
        q = np.floor(ef * ESCALE + 0.5).astype(np.int64)
        n = q.shape[0]
        hi = np.empty(n, dtype=np.int64)
        lo = np.empty(n, dtype=np.int64)
        for r in range(n):
            c = int(cid[r])
            cc = int(cnt[c])
            sv = s[c]
            row = q[r]
            acc = 0
            for p in range(dim):
                d = cc * int(row[p]) - int(sv[p])
                acc += d * d
            hi[r] = acc >> 32
            lo[r] = acc & 0xFFFFFFFF
        return pa.table({
            "cid": pa.array(cid, type=pa.int64()),
            "vec_id": pa.array(ids, type=pa.int64()),
            "hi": pa.array(hi, type=pa.int64()),
            "lo": pa.array(lo, type=pa.int64()),
        })

    members = ds.map_batches(kernel, batch_format="pyarrow",
                             zero_copy_batch=True)

    def finalize(group: pa.Table) -> pa.Table:
        c = int(group.column("cid")[0].as_py())
        hi = group.column("hi").to_pylist()
        lo = group.column("lo").to_pylist()
        r2s = sorted((int(h) << 32) | int(v)
                     for h, v in zip(hi, lo))
        m = len(r2s)
        mx = r2s[-1]
        md = r2s[(m + 1) // 2 - 1]
        den = float(int(cnt[c])) * float(ESCALE)
        return pa.table({
            "cid": pa.array([c], type=pa.int64()),
            "n": pa.array([m], type=pa.int64()),
            "r2max_hi": pa.array([mx >> 32], type=pa.int64()),
            "r2max_lo": pa.array([mx & 0xFFFFFFFF], type=pa.int64()),
            "radius_max": pa.array(
                [math.sqrt(_split_double(mx)) / den],
                type=pa.float64()),
            "radius_med": pa.array(
                [math.sqrt(_split_double(md)) / den],
                type=pa.float64()),
        })

    return members.groupby("cid").map_groups(finalize,
                                             batch_format="pyarrow")


def k23_centroid_margin(sf_dir: str, k: int = K_DEFAULT,
                        iters: int = ITERS_DEFAULT):
    """K23 — nearest-other-centroid margin: for every trained K1
    centroid, the MOST similar other centroid (max cosine, ties to the
    smaller cid) — K13's full pairwise matrix reduced to the one row
    per cluster a "merge these two?" audit actually reads.  A margin
    near cosine 1 marks a redundant cluster.

    Exactness: K13's pinned fold (sequential 0.0-seeded dot products,
    one division by the product of two libm sqrts), then an exact
    (cosine DESC, cid ASC) argmax per centroid.  Driver-side
    K^2 * dim scalar work only."""
    import math

    import ray.data

    cnt, s, dim = kmeans_state(sf_dir, k, iters)
    means = []
    for j in range(k):
        if cnt[j] == 0:
            means.append(None)
            continue
        denom = float(ESCALE) * float(cnt[j])
        means.append([float(int(s[j, p])) / denom for p in range(dim)])

    def fold_dot(a, b) -> float:
        acc = 0.0
        for p in range(dim):
            acc = acc + a[p] * b[p]
        return acc

    live = [i for i in range(k) if means[i] is not None]
    norms = {i: math.sqrt(fold_dot(means[i], means[i])) for i in live}
    best = {}
    for i in live:
        for j in live:
            if j <= i:
                continue
            c = fold_dot(means[i], means[j]) / (norms[i] * norms[j])
            for a, b in ((i, j), (j, i)):
                cur = best.get(a)
                if cur is None or c > cur[1] \
                        or (c == cur[1] and b < cur[0]):
                    best[a] = (b, c)
    cids = sorted(best)
    return ray.data.from_arrow(pa.table({
        "cid": pa.array(cids, type=pa.int64()),
        "nearest_cid": pa.array([best[i][0] for i in cids],
                                type=pa.int64()),
        "max_cosine": pa.array([best[i][1] for i in cids],
                               type=pa.float64()),
    }))


def k26_label_norms(sf_dir: str):
    """K26 — per-label embedding norm statistics: count, exact min /
    max squared micro-quantized norm, and the RMS norm in original
    units — the "are this label's vectors on the same shell?" scale
    audit next to K5's per-dimension moments (a label whose norms
    straddle decades will dominate any unnormalized distance).

    Exactness: norm2 = sum(q_p^2) is an exact int64 per vector
    (q < 2^21, dim 64 -> norm2 < 2^48); per-label totals accumulate as
    2^32 hi/lo int64 halves (the c3 discipline) and re-assemble as
    exact Python ints.  Float tail pinned: mean_norm2 = split(total) /
    n, then rms = sqrt(mean_norm2) / 2^20 — three IEEE ops, replayed
    verbatim.

    Scale shape: per-block (label, partials) rows — bounded by the
    label domain — ONE tiny exchange, per-label widen."""
    import math

    import ray.data
    from ray.data.aggregate import Max, Min, Sum

    from anomalydetection_ray.stages.detectors import _split_double

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["embedding", "label"])

    def partial(batch: pa.Table) -> pa.Table:
        lab = np.asarray(batch.column("label"), dtype=np.int64)
        _, ef = _emb_f64(batch.append_column(
            "vec_id", pa.array(np.zeros(batch.num_rows,
                                        dtype=np.int64))))
        q = np.floor(ef * ESCALE + 0.5).astype(np.int64)
        norm2 = (q * q).sum(axis=1)
        t = pa.table({
            "label": pa.array(lab, type=pa.int64()),
            "one": pa.array(np.ones(lab.shape[0], dtype=np.int64)),
            "hi": pa.array(norm2 >> 32, type=pa.int64()),
            "lo": pa.array(norm2 & 0xFFFFFFFF, type=pa.int64()),
            "mn": pa.array(norm2, type=pa.int64()),
            "mx": pa.array(norm2, type=pa.int64()),
        })
        return t.group_by(["label"]).aggregate(
            [("one", "sum"), ("hi", "sum"), ("lo", "sum"),
             ("mn", "min"), ("mx", "max")])

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("label")
           .aggregate(Sum("one_sum", alias_name="n"),
                      Sum("hi_sum", alias_name="hi"),
                      Sum("lo_sum", alias_name="lo"),
                      Min("mn_min", alias_name="mn"),
                      Max("mx_max", alias_name="mx")))

    def widen(batch: pa.Table) -> pa.Table:
        n = np.asarray(batch.column("n"), dtype=np.int64)
        hi = np.asarray(batch.column("hi"), dtype=np.int64)
        lo = np.asarray(batch.column("lo"), dtype=np.int64)
        out_hi = np.zeros(n.shape[0], dtype=np.int64)
        out_lo = np.zeros(n.shape[0], dtype=np.int64)
        rms = np.zeros(n.shape[0], dtype=np.float64)
        for i in range(n.shape[0]):
            total = (int(hi[i]) << 32) + int(lo[i])
            out_hi[i] = total >> 32
            out_lo[i] = total & 0xFFFFFFFF
            mean_norm2 = _split_double(total) / float(int(n[i]))
            rms[i] = math.sqrt(mean_norm2) / 1048576.0
        return pa.table({
            "label": batch.column("label").cast(pa.int64()),
            "n_vecs": pa.array(n, type=pa.int64()),
            "min_norm2_q": batch.column("mn").cast(pa.int64()),
            "max_norm2_q": batch.column("mx").cast(pa.int64()),
            "sum_norm2_hi": pa.array(out_hi, type=pa.int64()),
            "sum_norm2_lo": pa.array(out_lo, type=pa.int64()),
            "rms_norm": pa.array(rms, type=pa.float64()),
        })

    return agg.map_batches(widen, batch_format="pyarrow")


def k27_centroid_outliers(sf_dir: str, k: int = 10):
    """K27 — standardized-distance outlier vectors: the top-``k``
    embeddings by Mahalanobis-lite score sum_p ((e_p - mu_p)/sd_p)^2
    against K5's per-dimension standardization stats — the "which
    vectors don't belong to this corpus at all?" screen upstream of
    any clustering (K1 centroids chase these; this names them).

    Exactness: mu/sd are K5's pinned per-dim floats (exact int moments
    -> the pinned mean/std chain, parity-gated); the score is a
    SEQUENTIAL ascending-dim fold (acc + z_p^2, 0.0 seed) — the
    kernel loops dims (vectorized across rows) so the oracle's
    list_reduce replays it term-for-term.  Ties (score desc, vec_id).

    Scale shape: the 64-row stats table broadcasts in the closure;
    per-block partial top-k; tiny final sort-limit."""
    import ray.data  # noqa: F401

    stats = k5_dim_standardize(sf_dir).take_all()   # bounded: dims
    stats.sort(key=lambda r: r["dim"])
    mu = np.array([r["mean"] for r in stats], dtype=np.float64)
    sd = np.array([r["std"] for r in stats], dtype=np.float64)

    from anomalydetection_ray.stages.topk import topk

    def partial_topk(batch: pa.Table) -> pa.Table:
        ids, ef = _emb_f64(batch)
        labels = np.asarray(batch.column("label"), dtype=np.int32)
        score = np.zeros(ids.shape[0], dtype=np.float64)
        for p in range(ef.shape[1] if ef.size else 0):
            z = (ef[:, p] - mu[p]) / sd[p]
            score = score + z * z
        if ids.shape[0] > k:
            part = np.argpartition(-score, k)[:k]
            ids, labels, score = ids[part], labels[part], score[part]
        return pa.table({
            "vec_id": pa.array(ids, type=pa.int64()),
            "label": pa.array(labels, type=pa.int32()),
            "score": pa.array(score, type=pa.float64()),
        })

    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding", "label"])
    partials = ds.map_batches(partial_topk, batch_format="pyarrow",
                              zero_copy_batch=True)
    return topk(partials, k, [("score", "descending"),
                              ("vec_id", "ascending")])
