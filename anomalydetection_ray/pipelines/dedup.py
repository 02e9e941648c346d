"""Deduplication operators (driver round-1 extras; D1 family).

- exact_dedup:        content-hash partition + per-group min(doc_id)
- minhash_lsh_pairs:  char-shingle MinHash signatures -> banded LSH
                      buckets (groupby) -> candidate pairs + estimated
                      Jaccard from full-signature agreement
- simhash_pairs:      64-bit SimHash over word features, pigeonhole
                      banding (4 x 16 bits) -> candidates -> exact
                      Hamming distance filter
- ngram_jaccard_pairs: exact word-3-gram Jaccard verification of the
                      MinHash candidates (broadcast small doc-set at test
                      scale; the 100 TB path co-partitions texts by doc_id
                      and joins candidates to shards — documented)
- embedding_dup_pairs: cosine near-duplicate pairs over the embeddings
                      table via a broadcast normalized matrix

Everything is seeded/deterministic (seed constants below, no wall-clock,
no python hash()).
"""

from __future__ import annotations

import re
import zlib

import numpy as np
import pyarrow as pa

_SHINGLE_K = 5  # char shingles
_NUM_PERM = 64
_BANDS = 8
_ROWS_PER_BAND = _NUM_PERM // _BANDS
_SEED = 42

_WORD_RE = re.compile(r"\w+")

# deterministic 64 x (a, b) permutation parameters: x -> a*x + b mod 2^64
# with a odd is a bijection on uint64 (multiply-shift family) — exactly the
# consistent pseudo-random ordering MinHash needs, with no modulo in the
# hot loop (integer division was the dominant cost of a prime-field mod)
_MERSENNE = (1 << 61) - 1
_rng = np.random.default_rng(_SEED)
_PERM_A = _rng.integers(1, _MERSENNE, _NUM_PERM, dtype=np.int64).astype(np.uint64) | np.uint64(1)
_PERM_B = _rng.integers(0, _MERSENNE, _NUM_PERM, dtype=np.int64).astype(np.uint64)


_SHINGLE_MULT = np.uint64(1099511628211)  # FNV-ish odd multiplier


def _shingle_stencil(flat: np.ndarray) -> np.ndarray:
    """Vectorized k-byte shingle hashes over a flat byte buffer: h[i]
    combines bytes i..i+k-1 with a polynomial in a 64-bit ring (one C
    pass per window position — no per-shingle Python; a crc32-per-window
    loop measured ~100x slower)."""
    n = flat.shape[0]
    if n < _SHINGLE_K:
        return np.empty(0, dtype=np.uint64)
    acc = np.zeros(n - _SHINGLE_K + 1, dtype=np.uint64)
    for k in range(_SHINGLE_K):
        acc = acc * _SHINGLE_MULT + flat[k : k + acc.shape[0]].astype(np.uint64)
    # finalizer spreads low-byte-only differences across the word
    acc ^= acc >> np.uint64(33)
    acc *= np.uint64(0xFF51AFD7ED558CCD)
    acc ^= acc >> np.uint64(33)
    return acc


def minhash_signature(text: str) -> np.ndarray:
    """_NUM_PERM x uint64 MinHash signature over char shingles (scalar
    helper; `signatures_batch` is the vectorized batch path)."""
    b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    sh = _shingle_stencil(b)
    if sh.shape[0] == 0:
        sh = np.array([zlib.crc32(b.tobytes())], dtype=np.uint64)
    vals = _PERM_A[:, None] * sh[None, :] + _PERM_B[:, None]
    return vals.min(axis=1)


def signatures_batch(batch: pa.Table) -> pa.Table:
    """Batch MinHash: shingle-hash the batch's whole flat string buffer
    once, then for each permutation take the per-row segmented min with
    ``np.minimum.reduceat`` — duplicate shingles cannot change a min, so
    no per-row unique is needed.  No per-doc Python in the hot path."""
    from anomalydetection_ray.pipelines.text import _flat_utf8

    flat, offsets = _flat_utf8(batch)
    nrows = offsets.shape[0] - 1
    sh_all = _shingle_stencil(flat)
    lens = np.diff(offsets)
    out_lens = np.maximum(lens - (_SHINGLE_K - 1), 0)
    sig = np.empty((nrows, _NUM_PERM), dtype=np.uint64)
    ok = out_lens > 0
    starts = offsets[:-1][ok]
    if starts.shape[0]:
        # rows shorter than k contribute no windows; windows of row r span
        # [offsets[r], offsets[r] + out_lens[r]) in stencil coordinates,
        # but the stencil array is dense over the flat buffer, so segments
        # of consecutive rows overlap the (k-1)-byte row boundary — gather
        # the exact per-row ranges instead of reduceat over raw offsets
        total = int(out_lens[ok].sum())
        reps = out_lens[ok]
        idx = np.repeat(starts, reps) + (
            np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(reps) - reps, reps)
        )
        row_sh = sh_all[idx]
        seg_starts = np.concatenate(([0], np.cumsum(reps)[:-1]))
        for p in range(_NUM_PERM):
            vals = _PERM_A[p] * row_sh + _PERM_B[p]
            sig[ok, p] = np.minimum.reduceat(vals, seg_starts)
    # rows with no shingle window: hash the whole (short) content
    for r in np.flatnonzero(~ok):
        b = flat[offsets[r] : offsets[r + 1]].tobytes()
        x = np.uint64(zlib.crc32(b))
        sig[r] = _PERM_A * x + _PERM_B
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "signature": pa.array(list(sig), type=pa.list_(pa.uint64(), _NUM_PERM)),
        }
    )


def band_rows_batch(batch: pa.Table) -> pa.Table:
    """signature rows -> one row per (doc, band): the LSH bucket key is a
    crc32 of the band slice."""
    doc_ids = batch.column("doc_id").to_pylist()
    sigs = batch.column("signature").to_pylist()
    out_doc, out_band, out_bucket, out_sig = [], [], [], []
    for d, s in zip(doc_ids, sigs):
        sa = np.asarray(s, dtype=np.uint64)
        for b in range(_BANDS):
            sl = sa[b * _ROWS_PER_BAND : (b + 1) * _ROWS_PER_BAND]
            out_doc.append(d)
            out_band.append(b)
            out_bucket.append(zlib.crc32(sl.tobytes()))
            out_sig.append(sa)
    return pa.table(
        {
            "doc_id": pa.array(out_doc),
            "band": pa.array(out_band, type=pa.int32()),
            "bucket": pa.array(out_bucket, type=pa.int64()),
            "signature": pa.array(list(out_sig), type=pa.list_(pa.uint64(), _NUM_PERM)),
        }
    )


_PAIR_TILE = 4_000_000  # max i<j pairs materialized per tile (bounds memory)


def iter_pair_tiles(n: int, max_pairs: int = _PAIR_TILE):
    """Yield (ii, jj) index chunks covering every i<j pair of ``range(n)``
    with at most ~max_pairs pairs per chunk.  A hot LSH bucket of ~20k
    near-identical docs has ~2e8 pairs; enumerating them all at once (e.g.
    np.triu_indices) costs tens of GB of transient arrays in one task —
    tiling keeps peak memory O(max_pairs) while the total work is the same."""
    rows_per_tile = max(1, max_pairs // max(n - 1, 1))
    for a in range(0, max(n - 1, 0), rows_per_tile):
        b = min(a + rows_per_tile, n - 1)
        lens = n - 1 - np.arange(a, b, dtype=np.int64)
        ii = np.repeat(np.arange(a, b, dtype=np.int64), lens)
        total = int(lens.sum())
        jj = (np.arange(total, dtype=np.int64)
              - np.repeat(np.cumsum(lens) - lens, lens)) + ii + 1
        yield ii, jj


def bucket_pairs(group: pa.Table, min_est: float = 0.0) -> pa.Table:
    """One LSH bucket -> candidate pairs with signature-estimated Jaccard.
    Vectorized and memory-tiled: doc-sorted order, i<j pairs in bounded
    chunks (``iter_pair_tiles``), per-permutation agreement accumulated into
    an int16 counter (never an (npairs, P) boolean matrix) — hot buckets
    are exactly the skewed case, so no per-pair Python AND no O(n^2)
    transient blow-up."""
    n = group.num_rows
    empty = pa.table({"doc_a": pa.array([], type=group.column("doc_id").type),
                      "doc_b": pa.array([], type=group.column("doc_id").type),
                      "est_jaccard": pa.array([], type=pa.float64())})
    if n < 2:
        return empty
    order = pa.compute.sort_indices(group.column("doc_id"))
    g = group.take(order)
    docs = g.column("doc_id")
    sig_col = g.column("signature")
    if isinstance(sig_col, pa.ChunkedArray):
        sig_col = sig_col.combine_chunks()
    sigs = np.asarray(sig_col.values, dtype=np.uint64).reshape(n, _NUM_PERM)
    parts = []
    for ii, jj in iter_pair_tiles(n):
        agree = np.zeros(ii.shape[0], dtype=np.int16)
        for p in range(_NUM_PERM):
            agree += sigs[ii, p] == sigs[jj, p]
        est = agree / np.float64(_NUM_PERM)
        keep = est >= min_est
        ii, jj, est = ii[keep], jj[keep], est[keep]
        if ii.shape[0] == 0:
            continue
        # drop same-doc pairs (duplicate (band,bucket) rows for one doc)
        keep = np.asarray(pa.compute.not_equal(docs.take(pa.array(ii)), docs.take(pa.array(jj))))
        ii, jj, est = ii[keep], jj[keep], est[keep]
        if ii.shape[0]:
            parts.append(pa.table({"doc_a": docs.take(pa.array(ii)),
                                   "doc_b": docs.take(pa.array(jj)),
                                   "est_jaccard": pa.array(est, type=pa.float64())}))
    return pa.concat_tables(parts) if parts else empty


def _docs(sf_dir: str):
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])


def exact_dedup(sf_dir: str):
    """Exact content dedup: md5(text) groups, keep min(doc_id)."""
    import hashlib

    def hash_batch(batch: pa.Table) -> pa.Table:
        hs = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in batch.column("text").to_pylist()]
        return pa.table({"text_hash": pa.array(hs, type=pa.string()),
                         "doc_id": batch.column("doc_id")})

    from anomalydetection_ray.stages.runs import keep_first_by

    hashed = _docs(sf_dir).map_batches(hash_batch, batch_format="pyarrow", zero_copy_batch=True)
    # vectorized grouped-first: hash exchange + per-block run select (no
    # per-group Python; stages/runs.py)
    return keep_first_by(hashed, keys=["text_hash"], order_by=["doc_id"])


def minhash_lsh_pairs(sf_dir: str, min_est: float = 0.5):
    """Candidate near-duplicate pairs via MinHash + banded LSH.  The
    estimate threshold is applied INSIDE the bucket kernel (same est for a
    pair regardless of which band surfaced it, so pre- vs post-dedupe
    filtering is equivalent) — sub-threshold pairs never enter the
    pair-dedup exchange."""
    import functools

    sigs = _docs(sf_dir).map_batches(signatures_batch, batch_format="pyarrow", zero_copy_batch=True)
    bands = sigs.map_batches(band_rows_batch, batch_format="pyarrow")
    pairs = bands.groupby(["band", "bucket"]).map_groups(
        functools.partial(bucket_pairs, min_est=min_est), batch_format="pyarrow"
    )

    from anomalydetection_ray.stages.runs import keep_first_by

    return keep_first_by(pairs, keys=["doc_a", "doc_b"])


# ------------------------------------------------------------ simhash ----
# word-char classes on lowercased ASCII bytes (multi-byte UTF-8 treated as
# word bytes); polynomial word hash in the odd-multiplier uint64 ring:
# h(word) = sum(byte_i * C^(last-i)) computed segment-wise over the flat
# buffer as (sum byte_i * C^-i) * C^last — C odd => C^-1 exists mod 2^64,
# so both power tables are plain cumprods and every word hash falls out of
# one add.reduceat.  No per-word Python.
_SH_C = np.uint64(0x9E3779B97F4A7C15 | 1)
_SH_CINV = np.uint64(pow(0x9E3779B97F4A7C15 | 1, -1, 1 << 64))
_LOWER = np.arange(256, dtype=np.uint8)
_LOWER[65:91] += 32
_IS_WORDB = np.zeros(256, dtype=bool)
_IS_WORDB[48:58] = _IS_WORDB[97:123] = True  # digits + lowercase alpha
_IS_WORDB[ord("_")] = True
_IS_WORDB[0x80:] = True  # multi-byte UTF-8 bytes count as word bytes
_BIT_K = np.arange(64, dtype=np.uint64)
# byte popcount LUT (numpy 1.26 has no bitwise_count)
_POPCNT8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.int64)


def _mix64(x: np.ndarray) -> np.ndarray:
    x = (x ^ (x >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
    x = (x ^ (x >> np.uint64(33))) * np.uint64(0xC4CEB9FE1A85EC53)
    return x ^ (x >> np.uint64(33))


def word_hashes(flat: np.ndarray, offsets: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(hash per word, doc index per word) for the lowercased word runs of
    a flat utf-8 buffer — the shared vectorized tokenizer of simhash and
    lang-id.  Word hash = segment-wise invertible polynomial + murmur mix."""
    n = flat.shape[0]
    if n == 0:
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64)
    low = _LOWER[flat]
    wm = _IS_WORDB[low]
    # word-run starts/ends, row-boundary aware
    start = np.empty(n, dtype=bool)
    start[0] = wm[0]
    start[1:] = wm[1:] & ~wm[:-1]
    rs = offsets[:-1][offsets[:-1] < n]
    start[rs] = wm[rs]
    end = np.empty(n, dtype=bool)
    end[-1] = wm[-1]
    end[:-1] = wm[:-1] & ~wm[1:]
    re_ = offsets[1:][offsets[1:] < n] - 1
    re_ = re_[re_ >= 0]
    end[re_] = wm[re_]
    wstarts = np.flatnonzero(start)
    wlast = np.flatnonzero(end)
    if wstarts.shape[0] == 0:
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64)
    # power tables: P[i] = C^i, Pinv[i] = C^-i  (odd C -> exact inverses)
    P = np.empty(n, dtype=np.uint64)
    P[0] = 1
    np.cumprod(np.full(n - 1, _SH_C, dtype=np.uint64), out=P[1:])
    Pinv = np.empty(n, dtype=np.uint64)
    Pinv[0] = 1
    np.cumprod(np.full(n - 1, _SH_CINV, dtype=np.uint64), out=Pinv[1:])
    widx = np.flatnonzero(wm)
    seg = np.flatnonzero(start[widx])
    S = np.add.reduceat(low[widx].astype(np.uint64) * Pinv[widx], seg)
    hwords = _mix64(S * P[wlast])
    doc_of = np.searchsorted(offsets, wstarts, side="right") - 1
    return hwords, doc_of


def simhash_batch_values(flat: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """64-bit SimHash per row of a flat utf-8 buffer, fully vectorized."""
    nrows = offsets.shape[0] - 1
    out = np.zeros(nrows, dtype=np.uint64)
    hwords, doc_of = word_hashes(flat, offsets)
    nwords_total = hwords.shape[0]
    if nwords_total == 0:
        return out
    dseg = np.concatenate(
        (np.zeros(1, dtype=np.int64), np.flatnonzero(doc_of[1:] != doc_of[:-1]) + 1)
    )
    docs = doc_of[dseg]
    nw = np.diff(np.concatenate((dseg, np.array([nwords_total], dtype=np.int64))))
    # majority vote per bit: set bit k where 2 * popcount_k > nwords
    # (ties -> 0, matching the classic acc > 0 rule); 64 reduceats over
    # the word-level bit arrays
    sim = np.zeros(docs.shape[0], dtype=np.uint64)
    for k in range(64):
        bitk = (hwords >> np.uint64(k)) & np.uint64(1)
        hits = np.add.reduceat(bitk, dseg)
        sim |= ((2 * hits > nw.astype(np.uint64)).astype(np.uint64)) << np.uint64(k)
    out[docs] = sim
    return out


def simhash64(text: str) -> int:
    """Scalar wrapper over the vectorized batch path (identical output)."""
    b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    return int(simhash_batch_values(b, np.array([0, b.shape[0]], dtype=np.int64))[0])


def simhash_pairs(sf_dir: str, max_hamming: int = 3):
    """Near-dup pairs by SimHash: pigeonhole banding (4 x 16 bits) ->
    exact Hamming verify (<= max_hamming with 4 bands guarantees recall
    for distance <= 3)."""

    def sh_batch(batch: pa.Table) -> pa.Table:
        from anomalydetection_ray.pipelines.text import _flat_utf8

        flat, offsets = _flat_utf8(batch)
        hs = simhash_batch_values(flat, offsets)
        nrows = hs.shape[0]
        take = pa.array(np.repeat(np.arange(nrows, dtype=np.int64), 4))
        bands = np.tile(np.arange(4, dtype=np.int32), nrows)
        keys = (np.repeat(hs, 4) >> (np.uint64(16) * bands.astype(np.uint64))) & np.uint64(0xFFFF)
        doc_id = batch.column("doc_id")
        if isinstance(doc_id, pa.ChunkedArray):
            doc_id = doc_id.combine_chunks()
        return pa.table({"doc_id": doc_id.take(take), "band": pa.array(bands, type=pa.int32()),
                         "key": pa.array(keys.astype(np.int64), type=pa.int64()),
                         "simhash": pa.array(np.repeat(hs, 4), type=pa.uint64())})

    def pairs(group: pa.Table) -> pa.Table:
        n = group.num_rows
        empty = pa.table({"doc_a": pa.array([], type=group.column("doc_id").type),
                          "doc_b": pa.array([], type=group.column("doc_id").type),
                          "hamming": pa.array([], type=pa.int32())})
        if n < 2:
            return empty
        g = group.take(pa.compute.sort_indices(group.column("doc_id")))
        docs = g.column("doc_id")
        hs = np.asarray(g.column("simhash"), dtype=np.uint64)
        parts = []
        # memory-tiled i<j enumeration (hot 16-bit bands are the skew case)
        for ii, jj in iter_pair_tiles(n):
            x = hs[ii] ^ hs[jj]
            ham = _POPCNT8[x.view(np.uint8)].reshape(-1, 8).sum(axis=1)
            keep = ham <= max_hamming
            ii, jj, ham = ii[keep], jj[keep], ham[keep]
            if ii.shape[0] == 0:
                continue
            keep = np.asarray(
                pa.compute.not_equal(docs.take(pa.array(ii)), docs.take(pa.array(jj)))
            )
            ii, jj, ham = ii[keep], jj[keep], ham[keep]
            if ii.shape[0]:
                parts.append(pa.table({"doc_a": docs.take(pa.array(ii)),
                                       "doc_b": docs.take(pa.array(jj)),
                                       "hamming": pa.array(ham.astype(np.int32), type=pa.int32())}))
        return pa.concat_tables(parts) if parts else empty

    bands = _docs(sf_dir).map_batches(sh_batch, batch_format="pyarrow", zero_copy_batch=True)
    cand = bands.groupby(["band", "key"]).map_groups(pairs, batch_format="pyarrow")

    from anomalydetection_ray.stages.runs import keep_first_by

    return keep_first_by(cand, keys=["doc_a", "doc_b"])


def ngram_jaccard_pairs(sf_dir: str, n: int = 3, min_jaccard: float = 0.3):
    """Exact word-n-gram Jaccard over the MinHash candidate pairs.

    Test-scale implementation broadcasts {doc_id -> ngram set} via the
    object store (ray.put once, read per task); the 100 TB path replaces
    the broadcast with a co-partitioned join of candidates to text shards
    (same groupby machinery as the LSH stage)."""
    import ray

    texts = _docs(sf_dir).take_all()

    def grams(t: str) -> frozenset:
        ws = _WORD_RE.findall(t.lower())
        return frozenset(tuple(ws[i : i + n]) for i in range(max(0, len(ws) - n + 1)))

    gram_map = {r["doc_id"]: grams(r["text"]) for r in texts}
    ref = ray.put(gram_map)

    cands = minhash_lsh_pairs(sf_dir, min_est=0.2)

    def verify(batch: pa.Table) -> pa.Table:
        gm = ray.get(ref)
        a_o, b_o, j_o = [], [], []
        for a, b in zip(batch.column("doc_a").to_pylist(), batch.column("doc_b").to_pylist()):
            sa, sb = gm.get(a, frozenset()), gm.get(b, frozenset())
            union = len(sa | sb)
            j = (len(sa & sb) / union) if union else 0.0
            if j >= min_jaccard:
                a_o.append(a)
                b_o.append(b)
                j_o.append(j)
        id_type = batch.column("doc_a").type
        return pa.table({"doc_a": pa.array(a_o, type=id_type),
                         "doc_b": pa.array(b_o, type=id_type),
                         "jaccard": pa.array(j_o, type=pa.float64())})

    return cands.map_batches(verify, batch_format="pyarrow")


def embedding_dup_pairs(sf_dir: str, min_cosine: float = 0.95):
    """Embedding-cosine near-dup pairs: broadcast the L2-normalized matrix
    once (ray.put), each batch multiplies against it (numpy matmul)."""
    import ray
    import ray.data

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    all_rows = emb.take_all()
    ids = np.array([r["vec_id"] for r in all_rows], dtype=np.int64)
    mat = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in all_rows])
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    ref = ray.put((ids, mat))

    def pairs(batch: pa.Table) -> pa.Table:
        g_ids, g_mat = ray.get(ref)
        q_ids = np.asarray(batch.column("vec_id"), dtype=np.int64)
        q = np.stack([np.asarray(e, dtype=np.float64) for e in batch.column("embedding").to_pylist()])
        q /= np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-30)
        sims = q @ g_mat.T
        a_o, b_o, s_o = [], [], []
        for r in range(sims.shape[0]):
            hit = np.flatnonzero(sims[r] >= min_cosine)
            for c in hit:
                if q_ids[r] < g_ids[c]:  # dedup + drop self
                    a_o.append(int(q_ids[r]))
                    b_o.append(int(g_ids[c]))
                    s_o.append(float(sims[r, c]))
        return pa.table({"vec_a": pa.array(a_o, type=pa.int64()),
                         "vec_b": pa.array(b_o, type=pa.int64()),
                         "cosine": pa.array(s_o, type=pa.float64())})

    return emb.map_batches(pairs, batch_format="pyarrow")
