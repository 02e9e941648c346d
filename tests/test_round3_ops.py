"""Round-3 operator tests: W3 rolling stats, V1/V2 vocabulary, Gopher
repetition stats, G4 linear-counting sketch, K1 distributed k-means.

References are independent pandas / numpy / collections implementations
(different code path than the distributed Arrow kernels), plus
partition-count invariance for the shuffled ones.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"
VSCALE = 1_000_000


def _events_df() -> pd.DataFrame:
    import pyarrow.parquet as pq

    return pq.read_table(
        f"{SF}/events.parquet",
        columns=["event_id", "ts", "user_id", "value", "event_type"]).to_pandas()


def _docs_df() -> pd.DataFrame:
    import pyarrow.parquet as pq

    return pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]).to_pandas()


# ---------------------------------------------------------------- W3 ----
def _rolling_ref(df: pd.DataFrame, window: int) -> pd.DataFrame:
    df = df.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
    vq = np.floor(df["value"].to_numpy() * VSCALE + 0.5).astype(np.int64)
    df = df.assign(_vq=vq)
    g = df.groupby("user_id", sort=False)
    roll = g["_vq"].rolling(window, min_periods=1)
    out = pd.DataFrame({
        "event_id": df["event_id"],
        "user_id": df["user_id"],
        "value": df["value"],
        "roll_n": g["value"].rolling(window, min_periods=1).count()
                   .reset_index(drop=True).astype(np.int64),
        "roll_sum_q": roll.sum().reset_index(drop=True).astype(np.int64),
        "roll_min": g["value"].rolling(window, min_periods=1).min()
                     .reset_index(drop=True),
        "roll_max": g["value"].rolling(window, min_periods=1).max()
                     .reset_index(drop=True),
    })
    out["roll_avg"] = out["roll_sum_q"].to_numpy() / (
        float(VSCALE) * out["roll_n"].to_numpy())
    return out


def test_rolling_stats_match_reference(ray_session):
    from anomalydetection_ray.pipelines.windows import w3_rolling_stats_events

    got = w3_rolling_stats_events(SF).to_pandas().sort_values(
        "event_id").reset_index(drop=True)
    ref = _rolling_ref(_events_df(), 5).sort_values(
        "event_id").reset_index(drop=True)
    cols = ["event_id", "user_id", "value", "roll_n", "roll_sum_q",
            "roll_avg", "roll_min", "roll_max"]
    pd.testing.assert_frame_equal(got[cols], ref[cols], check_dtype=False)


def test_rolling_stats_partition_invariance(ray_session):
    from anomalydetection_ray.pipelines.windows import w3_rolling_stats_events

    a = w3_rolling_stats_events(SF, num_partitions=1).to_pandas()
    b = w3_rolling_stats_events(SF, num_partitions=16).to_pandas()
    a = a.sort_values("event_id").reset_index(drop=True)
    b = b.sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


# ------------------------------------------------------------- V1/V2 ----
def _word_lists(df: pd.DataFrame) -> list[list[str]]:
    return [[w for w in t.split(" ") if w] for t in df["text"]]


def test_vocab_topk_matches_counter(ray_session):
    from anomalydetection_ray.pipelines.vocab import vocab_topk

    docs = _docs_df()
    cnt = Counter(w for ws in _word_lists(docs) for w in ws)
    # top-25 under (count desc, word asc)
    ref = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:25]
    got = vocab_topk(SF).to_pandas()
    got_pairs = list(zip(got["word"], got["n"]))
    assert got_pairs == ref


def test_vocab_doc_freq_matches_sets(ray_session):
    from anomalydetection_ray.pipelines.vocab import vocab_doc_freq

    docs = _docs_df()
    df_cnt = Counter(w for ws in _word_lists(docs) for w in set(ws))
    ref = {w: c for w, c in df_cnt.items() if c >= 2}
    got = vocab_doc_freq(SF).to_pandas()
    assert dict(zip(got["word"], got["df"])) == ref


# -------------------------------------------------------- repetition ----
def test_quality_repetition_matches_counter(ray_session):
    from anomalydetection_ray.pipelines.text import quality_repetition

    docs = _docs_df()
    got = quality_repetition(SF).to_pandas().set_index("doc_id")
    for doc_id, ws in zip(docs["doc_id"], _word_lists(docs)):
        row = got.loc[doc_id]
        c = Counter(ws)
        assert row["n_words"] == len(ws)
        assert row["n_distinct_words"] == len(c)
        if ws:
            assert row["dup_word_frac"] == (len(ws) - len(c)) / len(ws)
            assert row["top_word_frac"] == max(c.values()) / len(ws)
        else:
            assert pd.isna(row["dup_word_frac"])


def test_repetition_batch_empty_text():
    import pyarrow as pa

    from anomalydetection_ray.pipelines.text import repetition_batch

    batch = pa.table({"doc_id": pa.array([1, 2], type=pa.int64()),
                      "text": pa.array(["", "a a b"])})
    out = repetition_batch(batch).to_pandas().set_index("doc_id")
    assert out.loc[1, "n_words"] == 0 and pd.isna(out.loc[1, "dup_word_frac"])
    assert out.loc[2, "n_words"] == 3
    assert out.loc[2, "n_distinct_words"] == 2
    assert out.loc[2, "dup_word_frac"] == 1.0 / 3.0
    assert out.loc[2, "top_word_frac"] == 2.0 / 3.0


# ---------------------------------------------------------------- G4 ----
def test_g4_sketch_matches_exact_bitmap(ray_session):
    from anomalydetection_ray.pipelines.queries import (
        SKETCH_M, SKETCH_MIX, g4_approx_distinct)

    ev = _events_df()
    got = g4_approx_distinct(SF).to_pandas().set_index("event_type")
    for et, g in ev.groupby("event_type"):
        uid = g["user_id"].to_numpy(dtype=np.uint64)
        buckets = (uid * np.uint64(SKETCH_MIX)) % np.uint64(2**32) \
            % np.uint64(SKETCH_M)
        occ = len(np.unique(buckets))
        row = got.loc[et]
        assert row["occupied"] == occ
        exact = g["user_id"].nunique()
        # linear counting is tight at this load factor
        assert abs(row["est_distinct"] - exact) <= max(10, 0.1 * exact)


# ---------------------------------------------------------------- K1 ----
def _kmeans_ref(emb: np.ndarray, k: int, iters: int):
    """Single-process Lloyd with the engine's exact semantics (quantized
    int sums, first-argmax ties) but matmul scoring — the float fold
    order differs, so this checks algorithmic agreement, not bit-equality
    (that's the SQL oracle's job)."""
    from anomalydetection_ray.pipelines.kmeans import ESCALE, init_centroids

    ef = emb.astype(np.float64)
    eint = np.floor(ef * ESCALE + 0.5).astype(np.int64)
    cent = init_centroids(k, emb.shape[1])
    denom = np.ones(k)
    for _ in range(iters):
        cid = np.argmax((ef @ cent.T) / denom, axis=1)
        cnt = np.bincount(cid, minlength=k).astype(np.int64)
        s = np.zeros((k, emb.shape[1]), dtype=np.int64)
        np.add.at(s, cid, eint)
        live = cnt > 0
        cent = np.where(live[:, None], s.astype(np.float64), cent)
        denom = np.where(live, cnt.astype(np.float64), denom)
    return cnt, s


def test_kmeans_matches_single_process_reference(ray_session):
    import pyarrow.parquet as pq

    from anomalydetection_ray.pipelines.kmeans import kmeans_train

    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["embedding"])
    emb = np.asarray(t.column("embedding").combine_chunks().values,
                     dtype=np.float64).reshape(t.num_rows, -1)
    cnt, s = _kmeans_ref(emb, 8, 2)
    got = kmeans_train(SF).to_pandas()
    k, dim = s.shape
    assert len(got) == k * dim
    got = got.sort_values(["cid", "pos"]).reset_index(drop=True)
    assert (got["n_assigned"].to_numpy() == np.repeat(cnt, dim)).all()
    assert (got["coord_sum_q"].to_numpy() == s.reshape(-1)).all()
    nz = got["n_assigned"].to_numpy() > 0
    means = got["mean"].to_numpy()
    from anomalydetection_ray.pipelines.kmeans import ESCALE
    exp = s.reshape(-1) / (float(ESCALE) * np.where(nz, np.repeat(cnt, dim), 1))
    assert np.array_equal(means[nz], exp[nz])
    assert np.isnan(means[~nz]).all() or (~nz).sum() == 0


def test_kmeans_assignment_counts_cover_corpus(ray_session):
    from anomalydetection_ray.pipelines.kmeans import kmeans_state

    cnt, _, dim = kmeans_state(SF, 8, 2)
    assert cnt.sum() == 500 and dim == 64


# ---------------------------------------------------------------- W4 ----
def test_ohlc_matches_pandas_reference(ray_session):
    from anomalydetection_ray.pipelines.windows import (
        DAY_US, w4_ohlc_resample_events)

    ev = _events_df().sort_values(["user_id", "ts", "event_id"])
    ev = ev.assign(bucket=ev["ts"].astype("datetime64[us]")
                   .astype(np.int64) // DAY_US)
    ref = ev.groupby(["user_id", "bucket"]).agg(
        n_events=("value", "size"), open=("value", "first"),
        high=("value", "max"), low=("value", "min"),
        close=("value", "last")).reset_index()
    got = w4_ohlc_resample_events(SF).to_pandas().sort_values(
        ["user_id", "bucket"]).reset_index(drop=True)
    ref = ref.sort_values(["user_id", "bucket"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[ref.columns.tolist()], ref, check_dtype=False)
    assert (got["n_events"] > 1).any()  # real multi-event buckets


def test_ohlc_partition_invariance(ray_session):
    from anomalydetection_ray.pipelines.windows import w4_ohlc_resample_events

    a = w4_ohlc_resample_events(SF, num_partitions=1).to_pandas()
    b = w4_ohlc_resample_events(SF, num_partitions=16).to_pandas()
    key = ["user_id", "bucket"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True))


# ---------------------------------------------------------------- V3 ----
def test_tfidf_matches_python_reference(ray_session):
    import math

    from anomalydetection_ray.pipelines.vocab import tfidf_topk

    docs = _docs_df()
    wl = _word_lists(docs)
    n = float(len(docs))
    df_cnt = Counter(w for ws in wl for w in set(ws))
    got = tfidf_topk(SF).to_pandas()
    by_doc = {d: g for d, g in got.groupby("doc_id")}
    for doc_id, ws in zip(docs["doc_id"], wl):
        tf = Counter(ws)
        scored = sorted(((tf[w] * math.log(n / df_cnt[w]), w)
                         for w in tf), key=lambda t: (-t[0], t[1]))[:3]
        g = by_doc.get(doc_id)
        if not scored:
            assert g is None
            continue
        g = g.sort_values("rank")
        assert list(g["word"]) == [w for _, w in scored]
        assert list(g["score"]) == [s for s, _ in scored]
        assert list(g["rank"]) == list(range(1, len(scored) + 1))


# ---------------------------------------------------------------- P3 ----
def test_pack_sequences_prefix_sum_exact(ray_session):
    from anomalydetection_ray.pipelines.packing import pack_sequences

    docs = _docs_df().sort_values("doc_id").reset_index(drop=True)
    n_tok = np.array([len([w for w in t.split(" ") if w])
                      for t in docs["text"]], dtype=np.int64)
    before = np.cumsum(n_tok) - n_tok
    got = pack_sequences(SF).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    assert (got["n_tok"].to_numpy() == n_tok).all()
    assert (got["tok_offset"].to_numpy() == before).all()
    assert (got["seq_id"].to_numpy() == before // 1024).all()


def test_pack_sequences_partition_invariance(ray_session):
    from anomalydetection_ray.pipelines.packing import pack_sequences

    a = pack_sequences(SF, num_partitions=1).to_pandas()
    b = pack_sequences(SF, num_partitions=16).to_pandas()
    pd.testing.assert_frame_equal(
        a.sort_values("doc_id").reset_index(drop=True),
        b.sort_values("doc_id").reset_index(drop=True))


# ---------------------------------------------------------------- Q6 ----
def test_seeded_shuffle_is_a_permutation(ray_session):
    from anomalydetection_ray.pipelines.packing import seeded_shuffle

    got = seeded_shuffle(SF).to_pandas()
    n = len(got)
    assert sorted(got["shuffle_pos"]) == list(range(n))
    # rank order equals (h, doc_id) lexicographic order
    s = got.sort_values(["h", "doc_id"]).reset_index(drop=True)
    assert (s["shuffle_pos"].to_numpy() == np.arange(n)).all()
    # pure function of (doc_id, seed): engine hash replayed in numpy
    ids = got["doc_id"].to_numpy(dtype=np.uint64)
    smix = (np.uint64(42) * np.uint64(2654435761)) & np.uint64(0xFFFFFFFF)
    h = (((ids & np.uint64(0xFFFFFFFF)) ^ smix) * np.uint64(2654435761)) \
        & np.uint64(0xFFFFFFFF)
    assert (got["h"].to_numpy(dtype=np.uint64) == h).all()


def test_seeded_shuffle_partition_invariance_and_seed(ray_session):
    from anomalydetection_ray.pipelines.packing import seeded_shuffle

    a = seeded_shuffle(SF, num_partitions=1).to_pandas()
    b = seeded_shuffle(SF, num_partitions=16).to_pandas()
    key = "doc_id"
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True))
    c = seeded_shuffle(SF, seed=7).to_pandas().sort_values(key)
    assert (c["shuffle_pos"].to_numpy()
            != a.sort_values(key)["shuffle_pos"].to_numpy()).any()


# ---------------------------------------------------------------- W5 ----
def test_trend_matches_polyfit(ray_session):
    from anomalydetection_ray.pipelines.windows import w5_trend_events

    got = w5_trend_events(SF).to_pandas().set_index("user_id")
    ev = _events_df()
    for uid, g in ev.groupby("user_id"):
        ts = g["ts"].astype("datetime64[us]").astype(np.int64).to_numpy()
        x = (ts - ts.min()) // 3_600_000_000
        y = np.floor(g["value"].to_numpy() * 1e6 + 0.5) / 1e6
        row = got.loc[uid]
        assert row["n"] == len(g)
        if np.ptp(x) == 0:
            assert pd.isna(row["slope_per_hour"])
        else:
            ref = np.polyfit(x.astype(float), y, 1)[0]
            assert abs(row["slope_per_hour"] - ref) < 1e-6 * max(1, abs(ref))


def test_trend_partition_invariance(ray_session):
    from anomalydetection_ray.pipelines.windows import w5_trend_events

    a = w5_trend_events(SF, num_partitions=1).to_pandas()
    b = w5_trend_events(SF, num_partitions=16).to_pandas()
    pd.testing.assert_frame_equal(
        a.sort_values("user_id").reset_index(drop=True),
        b.sort_values("user_id").reset_index(drop=True))


# ------------------------------------------------------------- G5/G6 ----
def test_histogram_matches_bincount(ray_session):
    from anomalydetection_ray.pipelines.queries import g6_value_histogram

    got = g6_value_histogram(SF).to_pandas()
    ev = _events_df()
    for et, g in ev.groupby("event_type"):
        bins = np.minimum(np.floor(g["value"].to_numpy() / 10.0), 34) \
            .astype(np.int64)
        ref = Counter(bins)
        sub = got[got["event_type"] == et]
        assert dict(zip(sub["bin"], sub["n"])) == dict(ref)
    assert got["n"].sum() == len(ev)


def test_cms_estimates_dominate_exact(ray_session):
    from anomalydetection_ray.pipelines.queries import g5_heavy_hitters_cms

    got = g5_heavy_hitters_cms(SF).to_pandas()
    ev = _events_df()
    true_counts = ev.groupby("user_id").size()
    top = true_counts.sort_values(ascending=False)
    assert len(got) == 10
    # the sketch never undercounts, and top users' exact counts are right
    assert (got["n_cms"] >= got["n_exact"]).all()
    for _, r in got.iterrows():
        assert true_counts[r["user_id"]] == r["n_exact"]
    assert got["n_exact"].max() == top.iloc[0]


# ---------------------------------------------------------------- V4 ----
def test_bigram_topk_matches_counter(ray_session):
    from anomalydetection_ray.pipelines.vocab import bigram_topk

    docs = _docs_df()
    cnt = Counter()
    for ws in _word_lists(docs):
        cnt.update(f"{a} {b}" for a, b in zip(ws, ws[1:]))
    ref = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:25]
    got = bigram_topk(SF).to_pandas()
    assert list(zip(got["word"], got["n"])) == ref


# ---------------------------------------------------------------- W6 ----
def test_rank_normalize_matches_pandas(ray_session):
    from anomalydetection_ray.pipelines.windows import w6_rank_normalize_events

    got = w6_rank_normalize_events(SF).to_pandas().sort_values(
        "event_id").reset_index(drop=True)
    ev = _events_df()
    rk = ev.groupby("user_id")["value"].rank(method="min").astype(np.int64) - 1
    n = ev.groupby("user_id")["value"].transform("size").astype(np.int64)
    ref = pd.DataFrame({"event_id": ev["event_id"], "rk": rk, "nm1": n - 1})
    ref["pct"] = np.where(ref["nm1"] > 0, ref["rk"] / ref["nm1"], 0.0)
    ref = ref.sort_values("event_id").reset_index(drop=True)
    assert (got["rk"].to_numpy() == ref["rk"].to_numpy()).all()
    assert (got["nm1"].to_numpy() == ref["nm1"].to_numpy()).all()
    assert np.array_equal(got["pct"].to_numpy(), ref["pct"].to_numpy())


def test_rank_normalize_partition_invariance(ray_session):
    from anomalydetection_ray.pipelines.windows import w6_rank_normalize_events

    a = w6_rank_normalize_events(SF, num_partitions=1).to_pandas()
    b = w6_rank_normalize_events(SF, num_partitions=16).to_pandas()
    pd.testing.assert_frame_equal(
        a.sort_values("event_id").reset_index(drop=True),
        b.sort_values("event_id").reset_index(drop=True))


# ---------------------------------------------------------------- D3 ----
def test_value_drift_matches_reference(ray_session):
    from anomalydetection_ray.pipelines.queries import d3_value_drift

    got = d3_value_drift(SF).to_pandas()
    ev = _events_df()
    half = (ev["ts"].astype("datetime64[us]").astype(np.int64)
            // 86_400_000_000) % 2
    bins = np.minimum(np.floor(ev["value"].to_numpy() / 10.0), 34).astype(
        np.int64)
    ref = pd.DataFrame({"event_type": ev["event_type"], "bin": bins,
                        "half": half})
    for _, r in got.iterrows():
        sub = ref[(ref["event_type"] == r["event_type"])
                  & (ref["bin"] == r["bin"])]
        a = int((sub["half"] == 0).sum())
        b = int((sub["half"] == 1).sum())
        assert (a, b) == (r["n_even"], r["n_odd"])
        assert r["chi2_term"] == float((a - b) * (a - b)) / float(a + b)
    assert got["n_even"].sum() + got["n_odd"].sum() == len(ev)


# ---------------------------------------------------------------- G7 ----
def test_hll_registers_and_accuracy(ray_session):
    from anomalydetection_ray.pipelines.queries import g7_hll_distinct

    got = g7_hll_distinct(SF).to_pandas().set_index("event_type")
    ev = _events_df()
    for et, g in ev.groupby("event_type"):
        uid = g["user_id"].to_numpy(dtype=np.uint64)
        h = (uid * np.uint64(2654435761)) % np.uint64(2**32)
        regs = np.zeros(256, dtype=np.int64)
        bucket = (h % np.uint64(256)).astype(np.int64)
        w = (h >> np.uint64(8)).astype(np.int64)
        rho = 25 - np.frexp(w.astype(np.float64))[1].astype(np.int64)
        np.maximum.at(regs, bucket, rho)
        s_int = int((np.int64(1) << (25 - regs)).sum())
        row = got.loc[et]
        assert row["s_int"] == s_int
        assert row["n_zero"] == int((regs == 0).sum())
        exact = g["user_id"].nunique()
        assert abs(row["est_hll"] - exact) < 0.35 * exact


# ---------------------------------------------------------------- V5 ----
def test_lm_score_matches_counter(ray_session):
    from anomalydetection_ray.pipelines.vocab import lm_score_docs

    docs = _docs_df()
    cnt = Counter()
    grams = {}
    for doc_id, ws in zip(docs["doc_id"], _word_lists(docs)):
        bg = [f"{a} {b}" for a, b in zip(ws, ws[1:])]
        grams[doc_id] = bg
        cnt.update(bg)
    top = dict(sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:500])
    got = lm_score_docs(SF).to_pandas().set_index("doc_id")
    assert len(got) == len(docs)
    for doc_id, bg in grams.items():
        row = got.loc[doc_id]
        assert row["n_bigrams"] == len(bg)
        assert row["n_known"] == sum(1 for b in bg if b in top)
        assert row["hit_sum"] == sum(top.get(b, 0) for b in bg)


# ---------------------------------------------------------------- X3 ----
def test_inverted_index_probe_matches_counter(ray_session, tmp_path,
                                              monkeypatch):
    monkeypatch.setenv("ANOMRAY_INDEX_DIR", str(tmp_path))
    from anomalydetection_ray.pipelines.invindex import inverted_index_probe

    docs = _docs_df()
    occ = Counter()          # (word, doc) -> tf
    for doc_id, ws in zip(docs["doc_id"], _word_lists(docs)):
        for w in ws:
            occ[(w, doc_id)] += 1
    word_n = Counter()
    for (w, _), tf in occ.items():
        word_n[w] += tf
    top5 = [w for w, _ in sorted(word_n.items(),
                                 key=lambda kv: (-kv[1], kv[0]))[:5]]
    got = inverted_index_probe(SF).to_pandas().set_index("word")
    assert sorted(got.index) == sorted(top5)
    for w in top5:
        ds = sorted(d for (ww, d) in occ if ww == w)
        row = got.loc[w]
        assert row["df"] == len(ds)
        assert row["n_occ"] == word_n[w]
        assert (row["doc_sum"], row["doc_min"], row["doc_max"]) == (
            sum(ds), min(ds), max(ds))


def test_inverted_index_layout_is_pruned(ray_session, tmp_path, monkeypatch):
    # the probe must read only the probed words' bucket dirs, and the
    # persisted layout must be hive-partitioned by bucket
    monkeypatch.setenv("ANOMRAY_INDEX_DIR", str(tmp_path))
    import os

    from anomalydetection_ray.pipelines.invindex import (
        NUM_BUCKETS, build_inverted_index, word_bucket)
    import pyarrow as pa

    path = build_inverted_index(SF)
    bdirs = [d for d in os.listdir(path) if d.startswith("bucket=")]
    assert 1 < len(bdirs) <= NUM_BUCKETS
    # bucket routing is deterministic and stable across calls
    w = pa.array(["alpha", "beta", "gamma"])
    assert word_bucket(w).tolist() == word_bucket(w).tolist()


# ---------------------------------------------------------------- D4 ----
def _kept_hashes_ref(text: str) -> set[int]:
    b = np.frombuffer(text.encode(), dtype=np.uint8)
    if b.shape[0] < 16:
        return set()
    acc = np.zeros(b.shape[0] - 15, dtype=np.uint32)
    for k in range(16):
        acc = acc * np.uint32(1103515245) + b[k: k + b.shape[0] - 15].astype(
            np.uint32)
    return set(acc[acc % np.uint32(8) == 0].tolist())


def test_split_contamination_matches_reference(ray_session):
    from anomalydetection_ray.pipelines.text import split_contamination

    docs = _docs_df()
    kept = {d: _kept_hashes_ref(t) for d, t in zip(docs["doc_id"],
                                                   docs["text"])}
    train = {d: h for d, h in kept.items() if d % 10 < 8}
    ref = {}
    for d, hs in kept.items():
        if d % 10 < 8:
            continue
        shared = set()
        tds = set()
        for td, ths in train.items():
            inter = hs & ths
            if inter:
                shared |= inter
                tds.add(td)
        if shared:
            ref[d] = (len(shared), len(tds))
    got = split_contamination(SF).to_pandas().set_index("doc_id")
    assert sorted(got.index) == sorted(ref)
    for d, (nsh, ntd) in ref.items():
        assert (got.loc[d, "n_shared_hashes"], got.loc[d, "n_train_docs"]) \
            == (nsh, ntd)


# ---------------------------------------------------------------- R1 ----
def test_retention_plan_matches_reference(ray_session):
    from anomalydetection_ray.pipelines.retention import (
        RETENTION_TIERS, retention_plan_events)

    got = retention_plan_events(SF).to_pandas()
    ev = _events_df()
    day = ev["ts"].astype("datetime64[us]").astype(np.int64) // 86_400_000_000
    cnt = day.value_counts()
    md = int(day.max())
    assert len(got) == 3 * len(cnt)
    for _, r in got.iterrows():
        keep = dict(RETENTION_TIERS)[r["tier"]]
        assert r["n_events"] == cnt[r["day"]]
        assert r["kept"] == (1 if keep is None or r["day"] > md - keep else 0)


def test_apply_retention_drops_partitions(tmp_path):
    import os

    from anomalydetection_ray.pipelines.retention import apply_retention

    for d in (10, 11, 12, 20):
        os.makedirs(tmp_path / f"day={d}")
        (tmp_path / f"day={d}" / "part.parquet").write_bytes(b"x")
    dropped = apply_retention(str(tmp_path), keep_days=7, max_day=20)
    assert dropped == 3
    left = sorted(n for n in os.listdir(tmp_path) if n.startswith("day="))
    assert left == ["day=20"]


def test_retention_apply_events_counts(ray_session):
    from anomalydetection_ray.pipelines.retention import retention_apply_events

    got = retention_apply_events(SF).to_pandas().sort_values("day")
    ev = _events_df()
    day = ev["ts"].astype("datetime64[us]").astype(np.int64) // 86_400_000_000
    cnt = day.value_counts()
    md = int(day.max())
    ref = {d: n for d, n in cnt.items() if d > md - 7}
    assert dict(zip(got["day"], got["n_events"])) == ref


# ------------------------------------------------------------- Q7/Q8 ----
def test_quota_sample_matches_rownumber(ray_session):
    from anomalydetection_ray.pipelines.queries import (QUOTA_SEED_MIX,
                                                        q7_quota_sample)

    got = q7_quota_sample(SF, k=5).to_pandas()
    import pyarrow.parquet as pq
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "source"]).to_pandas()
    d = docs["doc_id"].to_numpy(dtype=np.uint64)
    h = (((d % np.uint64(2**32)) ^ np.uint64(QUOTA_SEED_MIX))
         * np.uint64(2654435761)) % np.uint64(2**32)
    docs = docs.assign(h=h.astype(np.int64))
    ref = (docs.sort_values(["source", "h", "doc_id"])
               .groupby("source").head(5))
    assert len(got) == len(ref)
    pd.testing.assert_frame_equal(
        got.sort_values(["source", "doc_id"]).reset_index(drop=True),
        ref.sort_values(["source", "doc_id"])[["doc_id", "source", "h"]]
           .reset_index(drop=True)[got.columns.tolist()])


def test_split_stats_matches_pandas(ray_session):
    from anomalydetection_ray.pipelines.queries import q8_split_stats

    got = q8_split_stats(SF).to_pandas().set_index("split")
    import pyarrow.parquet as pq
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "n_chars"]).to_pandas()
    m = docs["doc_id"] % 10
    split = np.where(m < 8, "train", np.where(m == 8, "val", "test"))
    for s in ("train", "val", "test"):
        sub = docs[split == s]
        row = got.loc[s]
        assert row["n_docs"] == len(sub)
        assert row["chars_sum"] == sub["n_chars"].sum()
        assert (row["doc_min"], row["doc_max"]) == (sub["doc_id"].min(),
                                                    sub["doc_id"].max())


# ---------------------------------------------------------------- A7 ----
def test_cusum_closed_form_matches_recurrence():
    from anomalydetection_ray.stages.detectors import _det_cusum

    rng = np.random.default_rng(7)
    for trial in range(20):
        n = int(rng.integers(3, 400))
        x = rng.integers(0, 50257, size=n).astype(np.int64)
        if trial % 4 == 0:  # inject a level shift (the CUSUM target)
            x[n // 2:] += int(rng.integers(20000, 40000))
        out = _det_cusum(x.astype(np.int32))
        # textbook recurrence reference
        S = int(x.sum())
        Q = int((x * x).sum())
        import math
        h = 5.0 * math.sqrt(float(n * Q - S * S))
        sp = sm = 0
        pos = []
        for t in range(n):
            inc = n * int(x[t]) - S
            sp = max(0, sp + inc)
            sm = max(0, sm - inc)
            if sp > h or sm > h:
                pos.append(t)
        assert out["n_anomalies"] == len(pos)
        assert np.array_equal(out["anomaly_positions"], np.array(pos,
                                                                 dtype=np.int64))


def test_cusum_constant_and_empty():
    from anomalydetection_ray.stages.detectors import _det_cusum

    assert _det_cusum(np.empty(0, dtype=np.int32))["n_anomalies"] == 0
    assert _det_cusum(np.full(100, 7, dtype=np.int32))["n_anomalies"] == 0


# ---------------------------------------------------------------- K2 ----
def test_label_centroids_match_pandas(ray_session):
    from anomalydetection_ray.pipelines.queries import k2_label_centroids

    got = k2_label_centroids(SF).to_pandas()
    import pyarrow.parquet as pq
    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["embedding", "label"])
    lab = np.asarray(t.column("label"), dtype=np.int64)
    m = np.asarray(t.column("embedding").combine_chunks().values,
                   dtype=np.float64).reshape(len(lab), -1)
    q = np.floor(m * 1048576 + 0.5).astype(np.int64)
    for lb in np.unique(lab):
        sub = q[lab == lb]
        g = got[got["label"] == lb].sort_values("dim")
        assert (g["n"].to_numpy() == sub.shape[0]).all()
        assert np.array_equal(g["sum_q"].to_numpy(), sub.sum(axis=0))
        ref_mean = sub.sum(axis=0) / float(sub.shape[0] * 1048576)
        assert np.array_equal(g["mean"].to_numpy(), ref_mean)


# ---------------------------------------------------------------- W7 ----
def test_trimmed_mean_matches_pandas(ray_session):
    from anomalydetection_ray.pipelines.windows import w7_trimmed_mean_events

    got = w7_trimmed_mean_events(SF).to_pandas().set_index("user_id")
    ev = _events_df()
    vq = np.floor(ev["value"].to_numpy() * 1e6 + 0.5).astype(np.int64)
    ev = ev.assign(_vq=vq)
    for uid, g in ev.groupby("user_id"):
        g = g.sort_values(["value", "event_id"])
        n = len(g)
        m = n // 10
        mid = g["_vq"].to_numpy()[m: n - m]
        row = got.loc[uid]
        assert (row["n"], row["n_trim"]) == (n, m)
        assert row["sum_q"] == mid.sum()
        assert row["trimmed_mean"] == mid.sum() / (float(n - 2 * m) * 1e6)


def test_trimmed_mean_partition_invariance(ray_session):
    from anomalydetection_ray.pipelines.windows import w7_trimmed_mean_events

    a = w7_trimmed_mean_events(SF, num_partitions=1).to_pandas()
    b = w7_trimmed_mean_events(SF, num_partitions=16).to_pandas()
    pd.testing.assert_frame_equal(
        a.sort_values("user_id").reset_index(drop=True),
        b.sort_values("user_id").reset_index(drop=True))


# ---------------------------------------------------------------- T5 ----
def test_lang_mix_matches_lang_id(ray_session):
    from anomalydetection_ray.pipelines.text import lang_id, lang_mix_by_source

    mix = lang_mix_by_source(SF).to_pandas()
    per_doc = lang_id(SF).to_pandas()
    import pyarrow.parquet as pq
    src = pq.read_table(f"{SF}/documents.parquet",
                        columns=["doc_id", "source"]).to_pandas()
    joined = per_doc.merge(src, on="doc_id")
    ref = joined.groupby(["source", "pred_lang"]).size()
    assert mix["n_docs"].sum() == len(per_doc)
    for _, r in mix.iterrows():
        assert ref[(r["source"], r["pred_lang"])] == r["n_docs"]
    assert len(mix) == len(ref)


# ---------------------------------------------------------------- S6 ----
def test_jsonl_roundtrip_matches_parquet(ray_session):
    from anomalydetection_ray.pipelines.queries import s6_jsonl_roundtrip

    got = s6_jsonl_roundtrip(SF).to_pandas().set_index("source")
    docs = _docs_df()
    import pyarrow.parquet as pq
    full = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "source", "n_chars",
                                  "text"]).to_pandas()
    for src, g in full.groupby("source"):
        row = got.loc[src]
        assert row["n_docs"] == len(g)
        assert row["chars_sum"] == g["n_chars"].sum()
        assert row["words_sum"] == sum(len(t.split(" ")) for t in g["text"])
    assert got["n_docs"].sum() == len(full)


# ---------------------------------------------------------------- C1 ----
def test_curation_funnel_matches_composition(ray_session):
    import hashlib

    from anomalydetection_ray.pipelines.curation import curation_funnel
    from anomalydetection_ray.pipelines.queries import QUOTA_SEED_MIX
    from anomalydetection_ray.pipelines.text import lang_id, quality

    got = curation_funnel(SF).to_pandas().set_index("source")
    import pyarrow.parquet as pq
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "source", "text"]).to_pandas()
    ql = quality(SF).to_pandas().set_index("doc_id")["quality_score"]
    pl = lang_id(SF).to_pandas().set_index("doc_id")["pred_lang"]
    docs["ok"] = (docs["doc_id"].map(ql) >= 0.6) \
        & (docs["doc_id"].map(pl) == "en")
    passers = docs[docs["ok"]].copy()
    passers["th"] = [hashlib.md5(t.encode()).hexdigest()
                     for t in passers["text"]]
    canon = passers.sort_values("doc_id").drop_duplicates("th", keep="first")
    d = canon["doc_id"].to_numpy(dtype=np.uint64)
    h = (((d % np.uint64(2**32)) ^ np.uint64(QUOTA_SEED_MIX))
         * np.uint64(2654435761)) % np.uint64(2**32)
    canon = canon.assign(h=h.astype(np.int64))
    kept = canon.sort_values(["source", "h", "doc_id"]).groupby(
        "source").head(15)
    for src, g in docs.groupby("source"):
        row = got.loc[src]
        assert row["n_in"] == len(g)
        assert row["n_quality"] == int(g["ok"].sum())
        assert row["n_unique"] == int((canon["source"] == src).sum())
        assert row["n_kept"] == int((kept["source"] == src).sum())


# ---------------------------------------------------------------- W8 ----
def test_time_window_matches_bruteforce(ray_session):
    from anomalydetection_ray.pipelines.windows import w8_time_window_events

    got = w8_time_window_events(SF).to_pandas().set_index("event_id")
    ev = _events_df()
    ts = ev["ts"].astype("datetime64[us]").astype(np.int64).to_numpy()
    vq = np.floor(ev["value"].to_numpy() * 1e6 + 0.5).astype(np.int64)
    W = 3_600_000_000
    for uid, g in ev.assign(_ts=ts, _vq=vq).groupby("user_id"):
        t = g["_ts"].to_numpy()
        v = g["_vq"].to_numpy()
        for eid, ti in zip(g["event_id"], t):
            m = (t >= ti - W) & (t <= ti)
            row = got.loc[eid]
            assert row["n_1h"] == int(m.sum())
            assert row["sum_q_1h"] == int(v[m].sum())


def test_time_window_partition_invariance(ray_session):
    from anomalydetection_ray.pipelines.windows import w8_time_window_events

    a = w8_time_window_events(SF, num_partitions=1).to_pandas()
    b = w8_time_window_events(SF, num_partitions=16).to_pandas()
    pd.testing.assert_frame_equal(
        a.sort_values("event_id").reset_index(drop=True),
        b.sort_values("event_id").reset_index(drop=True))


# ---------------------------------------------------------------- J7 ----
def test_left_join_agg_keeps_zero_customers(ray_session):
    from anomalydetection_ray.pipelines.queries import j7_left_join_agg

    got = j7_left_join_agg(SF).to_pandas().set_index("c_custkey")
    import pyarrow.parquet as pq
    orders = pq.read_table(f"{SF}/orders.parquet",
                           columns=["o_custkey", "o_totalprice"]).to_pandas()
    cust = pq.read_table(f"{SF}/customer.parquet",
                         columns=["c_custkey"]).to_pandas()
    orders = orders[orders["o_totalprice"] >= 300000.0]
    cents = np.floor(orders["o_totalprice"].to_numpy() * 100 + 0.5).astype(
        np.int64)
    ref = orders.assign(_c=cents).groupby("o_custkey").agg(
        n=("o_custkey", "size"), cents=("_c", "sum"))
    assert len(got) == len(cust)
    zero = set(cust["c_custkey"]) - set(ref.index)
    assert zero  # the sf has customers without orders (outer join matters)
    for ck in list(zero)[:20]:
        assert (got.loc[ck, "n_orders"], got.loc[ck, "cents"]) == (0, 0)
    for ck in ref.index[:50]:
        assert got.loc[ck, "n_orders"] == ref.loc[ck, "n"]
        assert got.loc[ck, "cents"] == ref.loc[ck, "cents"]


# ---------------------------------------------------------------- M4 ----
def test_string_fns_match_python(ray_session):
    from anomalydetection_ray.pipelines.queries import m4_string_fns

    got = m4_string_fns(SF).to_pandas().set_index("p_partkey")
    import pyarrow.parquet as pq
    part = pq.read_table(f"{SF}/part.parquet").to_pandas()
    for _, r in part.head(100).iterrows():
        row = got.loc[r["p_partkey"]]
        assert row["brand_num"] == int(r["p_brand"][6:])
        assert row["n_name_words"] == len(r["p_name"].split(" "))
        assert row["name_len"] == len(r["p_name"])
        assert row["name_upper"] == r["p_name"].upper()
        assert row["type_lower"] == r["p_type"].lower()


# ---------------------------------------------------------------- A8 ----
def test_shesd_finds_spikes_seasonality_hides():
    """Seasonal-hybrid ESD vs plain global robust-z: a sawtooth seasonal
    pattern (amplitude >> spike) buries the injected spikes for the MAD
    detector, but the per-phase median removal exposes them exactly."""
    from anomalydetection_ray.stages.detectors import _det_mad, _det_shesd

    rng = np.random.default_rng(7)
    n, period = 480, 24
    x = ((np.arange(n) % period) * 50
         + rng.integers(0, 5, n)).astype(np.int32)
    spikes = [100, 233, 391]
    x[spikes] += 180  # big vs phase noise (<5), small vs season range (1150)

    out = _det_shesd(x, period=period)
    assert out["n_anomalies"] == 3
    assert sorted(out["anomaly_positions"].tolist()) == spikes

    # the plain global robust-z detector cannot see them: deviation from
    # the global median is dominated by the seasonal term at every phase
    mad_out = _det_mad(x)
    assert not set(spikes) <= set(mad_out["anomaly_positions"].tolist())


def test_shesd_matches_esd_when_no_seasonality():
    """With a constant seasonal component the residual is a pure shift:
    shesd and plain robust esd must agree (robust ESD is shift-invariant)."""
    from anomalydetection_ray.stages.detectors import _det_esd, _det_shesd

    rng = np.random.default_rng(11)
    x = rng.integers(100, 110, 300).astype(np.int32)
    x[[50, 200]] += 90
    a = _det_esd(x)
    b = _det_shesd(x, period=1)  # one phase == subtract the global median
    assert a["n_anomalies"] == b["n_anomalies"]
    assert a["anomaly_positions"].tolist() == b["anomaly_positions"].tolist()


# ---------------------------------------------------------------- A9 ----
def test_autocorr_matches_numpy_reference():
    """Engine ACF kernel vs a direct per-row numpy reference (different
    code path: mean-centered dot products, no integer scaling)."""
    import pyarrow as pa

    from anomalydetection_ray.stages.detectors import autocorr_batch

    rng = np.random.default_rng(3)
    lag = 24
    rows = []
    # seasonal, iid, constant (zero variance), and short (n <= lag) rows
    rows.append((np.tile(np.arange(24) * 10, 20)
                 + rng.integers(0, 3, 480)).astype(np.int32))
    rows.append(rng.integers(0, 1000, 300).astype(np.int32))
    rows.append(np.full(100, 7, dtype=np.int32))
    rows.append(np.arange(10, dtype=np.int32))
    batch = pa.table({
        "doc_id": [f"d{i}" for i in range(len(rows))],
        "part_id": pa.array([0] * len(rows), type=pa.int32()),
        "tokens": pa.array([r.tolist() for r in rows], type=pa.list_(pa.int32())),
    })
    got = autocorr_batch(batch, lag=lag).to_pandas().set_index("doc_id")

    for i, r in enumerate(rows):
        x = r.astype(np.float64)
        n = x.shape[0]
        row = got.loc[f"d{i}"]
        assert row["n"] == n
        assert row["n_pairs"] == max(n - lag, 0)
        if n <= lag or np.var(x) == 0.0:
            assert pd.isna(row["acf"])
            continue
        m = x.mean()
        ref = np.dot(x[:-lag] - m, x[lag:] - m) / np.dot(x - m, x - m)
        assert abs(row["acf"] - ref) < 1e-12
    # the seasonal row's lag-24 ACF is strongly positive; iid near zero
    assert got.loc["d0", "acf"] > 0.9
    assert abs(got.loc["d1", "acf"]) < 0.15


# ---------------------------------------------------------------- P4 ----
def test_chunk_batch_matches_python_reference():
    """Overlapping chunking kernel vs a per-doc Python slicing reference;
    covers short (< chunk), exact-boundary, overlap and empty rows."""
    import pyarrow as pa

    from anomalydetection_ray.pipelines.packing import chunk_batch

    rng = np.random.default_rng(5)
    chunk, stride = 128, 96
    rows = [
        rng.integers(0, 50000, 7).astype(np.int32),      # shorter than chunk
        rng.integers(0, 50000, 128).astype(np.int32),    # exactly one chunk
        rng.integers(0, 50000, 129).astype(np.int32),    # one token over
        rng.integers(0, 50000, 500).astype(np.int32),    # several chunks
        np.empty(0, dtype=np.int32),                     # empty -> no chunks
    ]
    batch = pa.table({
        "doc_id": [f"d{i}" for i in range(len(rows))],
        "tokens": pa.array([r.tolist() for r in rows], type=pa.list_(pa.int32())),
    })
    got = chunk_batch(batch, chunk=chunk, stride=stride).to_pandas()

    exp = []
    for i, r in enumerate(rows):
        n = len(r)
        if n == 0:
            continue
        nch = 1 + max(0, -(-(n - chunk) // stride))
        for j in range(nch):
            seg = r[j * stride: j * stride + chunk].astype(np.int64)
            exp.append((f"d{i}", j, j * stride, len(seg), int(seg.sum()),
                        int((seg * seg).sum()), int(seg.min()), int(seg.max())))
    ref = pd.DataFrame(exp, columns=["doc_id", "chunk_id", "start_pos", "n",
                                     "tok_sum", "tok_sumsq", "tok_min",
                                     "tok_max"])
    got = got.sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
    ref = ref.sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, ref, check_dtype=False)


# ---------------------------------------------------------------- T6 ----
def test_scrub_stats_match_python_re():
    """Arrow RE2 scrub kernel vs Python's re module on the same docs."""
    import re

    from anomalydetection_ray.pipelines.text import scrub_stats

    got = scrub_stats(SF).to_pandas().set_index("doc_id")
    docs = _docs_df()
    pat = re.compile(r"\b(key|customer|value)\b")
    for _, r in docs.head(80).iterrows():
        row = got.loc[r["doc_id"]]
        hits = pat.findall(r["text"])
        assert row["n_hits"] == len(hits)
        assert row["n_key"] == len(re.findall(r"\bkey\b", r["text"]))
        assert row["red_len"] == len(pat.sub("<PII>", r["text"]))


# ---------------------------------------------------------------- G8 ----
def test_grouping_sets_match_pandas(ray_session):
    from anomalydetection_ray.pipelines.queries import g8_grouping_sets

    got = g8_grouping_sets(SF).to_pandas()
    ev = _events_df()
    vq = np.floor(ev["value"].to_numpy() * VSCALE + 0.5).astype(np.int64)
    day = (ev["ts"].astype("int64") // 10**6) // 86400
    df = pd.DataFrame({"event_type": ev["event_type"], "day": day, "vq": vq})

    g0 = df.groupby(["event_type", "day"])["vq"].agg(["count", "sum"])
    for (et, d), r in g0.iterrows():
        row = got[(got["grain"] == 0) & (got["event_type"] == et)
                  & (got["day"] == d)]
        assert len(row) == 1
        assert row.iloc[0]["n"] == r["count"]
        assert row.iloc[0]["vq_sum"] == r["sum"]
    g1 = df.groupby("event_type")["vq"].agg(["count", "sum"])
    for et, r in g1.iterrows():
        row = got[(got["grain"] == 1) & (got["event_type"] == et)]
        assert len(row) == 1 and row.iloc[0]["day"] is None \
            or pd.isna(row.iloc[0]["day"])
        assert row.iloc[0]["n"] == r["count"]
    tot = got[got["grain"] == 2]
    assert len(tot) == 1
    assert tot.iloc[0]["n"] == len(df)
    assert tot.iloc[0]["vq_sum"] == int(vq.sum())
    assert pd.isna(tot.iloc[0]["event_type"]) and pd.isna(tot.iloc[0]["day"])


# ---------------------------------------------------------------- J8 ----
def test_semi_join_complements_anti_join(ray_session):
    from anomalydetection_ray.pipelines.queries import j6_anti_join, j8_semi_join

    import pyarrow.parquet as pq
    cust = pq.read_table(f"{SF}/customer.parquet", columns=["c_custkey"])
    semi = set(j8_semi_join(SF).to_pandas()["c_custkey"])
    anti = set(j6_anti_join(SF).to_pandas()["c_custkey"])
    allk = set(cust.column("c_custkey").to_pylist())
    assert semi | anti == allk
    assert semi & anti == set()

    orders = pq.read_table(f"{SF}/orders.parquet",
                           columns=["o_custkey", "o_totalprice"]).to_pandas()
    ref = set(orders.loc[orders["o_totalprice"] > 400000.0, "o_custkey"])
    assert semi == ref & allk


# ---------------------------------------------------------------- W9 ----
def test_running_total_matches_pandas(ray_session):
    from anomalydetection_ray.pipelines.windows import w9_running_total_events

    got = w9_running_total_events(SF).to_pandas().set_index("event_id")
    ev = _events_df().sort_values(["user_id", "ts", "event_id"])
    vq = np.floor(ev["value"].to_numpy() * VSCALE + 0.5).astype(np.int64)
    ev = ev.assign(vq=vq)
    ev["run"] = ev.groupby("user_id")["vq"].cumsum()
    ev["rn"] = ev.groupby("user_id").cumcount() + 1
    assert len(got) == len(ev)
    sub = ev.head(500)
    for _, r in sub.iterrows():
        row = got.loc[r["event_id"]]
        assert row["running_vq"] == r["run"]
        assert row["running_n"] == r["rn"]


# ---------------------------------------------------------------- T7 ----
def test_pivot_events_matches_pandas(ray_session):
    from anomalydetection_ray.pipelines.queries import t7_pivot_events

    got = t7_pivot_events(SF).to_pandas().set_index("event_type")
    ev = _events_df()
    dow = ((ev["ts"].astype("int64") // 10**6 // 86400) + 3) % 7
    ref = pd.crosstab(ev["event_type"], dow)
    for et in ref.index:
        for d in range(7):
            exp = int(ref.loc[et, d]) if d in ref.columns else 0
            assert got.loc[et, f"dow_{d}"] == exp
    # weekday convention sanity: epoch day 0 (1970-01-01) was a Thursday
    assert ((pd.Timestamp("1970-01-01").dayofweek)) == 3


# ---------------------------------------------------------------- S7 ----
def test_csv_roundtrip_matches_parquet(ray_session):
    from anomalydetection_ray.pipelines.queries import s7_csv_roundtrip

    import pyarrow.parquet as pq
    got = s7_csv_roundtrip(SF).to_pandas().set_index("l_returnflag")
    li = pq.read_table(
        f"{SF}/lineitem.parquet",
        columns=["l_orderkey", "l_quantity", "l_extendedprice",
                 "l_returnflag"]).to_pandas()
    li["cents"] = np.floor(li["l_extendedprice"] * 100 + 0.5).astype(np.int64)
    ref = li.groupby("l_returnflag").agg(
        n_rows=("l_orderkey", "size"), qty_sum=("l_quantity", "sum"),
        cents_sum=("cents", "sum"), okey_sum=("l_orderkey", "sum"))
    for rf in ref.index:
        for c in ref.columns:
            assert got.loc[rf, c] == ref.loc[rf, c], (rf, c)


# ---------------------------------------------------------------- D5 ----
def test_set_ops_match_python_sets(ray_session):
    from anomalydetection_ray.pipelines.queries import d5_set_ops

    got = d5_set_ops(SF).to_pandas()
    ev = _events_df()
    a = set(ev.loc[ev["event_type"] == "purchase", "user_id"])
    b = set(ev.loc[ev["event_type"] == "error", "user_id"])
    inter = set(got.loc[got["setop"] == "intersect", "user_id"])
    exc = set(got.loc[got["setop"] == "except", "user_id"])
    assert inter == a & b
    assert exc == a - b


# ---------------------------------------------------------------- D6 ----
def test_levenshtein_batch_matches_python_dp():
    import pyarrow as pa

    from anomalydetection_ray.pipelines.dedup import levenshtein_batch

    def ref_lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    rng = np.random.default_rng(13)
    alpha = "abcde "
    cases = [("", ""), ("", "abc"), ("abc", ""), ("same text", "same text"),
             ("kitten", "sitting"), ("a" * 64, "a" * 63 + "b"),
             ("x" * 80, "x" * 80)]  # > prefix: truncated to 64 on both sides
    for _ in range(40):
        a = "".join(rng.choice(list(alpha), rng.integers(0, 70)))
        b = "".join(rng.choice(list(alpha), rng.integers(0, 70)))
        cases.append((a, b))
    batch = pa.table({
        "doc_a": [f"a{i}" for i in range(len(cases))],
        "doc_b": [f"b{i}" for i in range(len(cases))],
        "_text_a": [c[0] for c in cases],
        "_text_b": [c[1] for c in cases],
    })
    got = levenshtein_batch(batch, prefix=64).to_pandas()
    for i, (a, b) in enumerate(cases):
        assert got.loc[i, "lev"] == ref_lev(a[:64], b[:64]), (i, a, b)
        assert got.loc[i, "len_a"] == len(a[:64])
        assert got.loc[i, "len_b"] == len(b[:64])


# ---------------------------------------------------------------- M5 ----
def test_json_props_match_python_json(ray_session):
    import json

    from anomalydetection_ray.pipelines.queries import m5_json_props

    got = m5_json_props(SF).to_pandas().set_index("event_type")
    ev = _events_df_with_props()
    ks = ev["props"].map(lambda s: json.loads(s)["k"])
    ref = pd.DataFrame({"event_type": ev["event_type"], "k": ks}) \
        .groupby("event_type")["k"].agg(["count", "sum", "min", "max"])
    for et, r in ref.iterrows():
        assert got.loc[et, "n"] == r["count"]
        assert got.loc[et, "k_sum"] == r["sum"]
        assert got.loc[et, "k_min"] == r["min"]
        assert got.loc[et, "k_max"] == r["max"]


def _events_df_with_props() -> pd.DataFrame:
    import pyarrow.parquet as pq

    return pq.read_table(f"{SF}/events.parquet",
                         columns=["event_type", "props"]).to_pandas()


# --------------------------------------------------------------- W11 ----
def test_funnel_matches_pandas(ray_session):
    from anomalydetection_ray.pipelines.queries import w11_funnel

    got = w11_funnel(SF).to_pandas().set_index("user_id")
    ev = _events_df()
    ev = ev.assign(ts_us=ev["ts"].astype("int64") // 10**3
                   if ev["ts"].dtype == "datetime64[ns]" else
                   ev["ts"].astype("int64"))
    firsts = {}
    for typ in ("view", "click", "purchase"):
        firsts[typ] = ev[ev["event_type"] == typ].groupby("user_id")["ts_us"].min()
    for uid in got.index:
        tv = firsts["view"].get(uid)
        tc = firsts["click"].get(uid)
        tp = firsts["purchase"].get(uid)
        if tv is None or pd.isna(tv):
            stage = 0
        elif tc is None or pd.isna(tc) or tc <= tv:
            stage = 1
        elif tp is None or pd.isna(tp) or tp <= tc:
            stage = 2
        else:
            stage = 3
        assert got.loc[uid, "stage"] == stage, uid


# ---------------------------------------------------------------- G9 ----
def test_mode_day_matches_pandas(ray_session):
    from anomalydetection_ray.pipelines.queries import g9_mode_day

    got = g9_mode_day(SF).to_pandas().set_index("event_type")
    ev = _events_df()
    day = ev["ts"].astype("int64") // 10**6 // 86400
    df = pd.DataFrame({"event_type": ev["event_type"], "day": day})
    c = df.groupby(["event_type", "day"]).size().reset_index(name="n")
    for et, sub in c.groupby("event_type"):
        sub = sub.sort_values(["n", "day"], ascending=[False, True])
        assert got.loc[et, "mode_day"] == sub.iloc[0]["day"]
        assert got.loc[et, "mode_n"] == sub.iloc[0]["n"]


# ---------------------------------------------------------------- R2 ----
def test_compaction_preserves_rows_and_reaches_one_file(ray_session):
    from anomalydetection_ray.pipelines.retention import compact_events

    got = compact_events(SF).to_pandas()
    ev = _events_df()
    day = ev["ts"].astype("int64") // 10**6 // 86400
    ref = pd.DataFrame({"day": day, "eid": _events_df_ids()})
    per_day = ref.groupby("day").agg(
        n_rows=("eid", "size"),
        files_before=("eid", lambda s: s.mod(4).nunique()))
    assert (got["files_after"] == 1).all()
    got = got.set_index("day")
    for d, r in per_day.iterrows():
        assert got.loc[d, "n_rows"] == r["n_rows"]
        assert got.loc[d, "files_before"] == r["files_before"]


def _events_df_ids() -> pd.Series:
    import pyarrow.parquet as pq

    return pq.read_table(f"{SF}/events.parquet",
                         columns=["event_id"]).to_pandas()["event_id"]


# --------------------------------------------------------------- W12 ----
def test_robust_scale_matches_numpy(ray_session):
    from anomalydetection_ray.pipelines.windows import w12_robust_scale_events

    got = w12_robust_scale_events(SF).to_pandas().set_index("user_id")
    ev = _events_df()
    vq = np.floor(ev["value"].to_numpy() * VSCALE + 0.5)
    df = pd.DataFrame({"user_id": ev["user_id"], "vq": vq})
    for uid, sub in df.groupby("user_id"):
        med = np.median(sub["vq"].to_numpy())
        mad = np.median(np.abs(sub["vq"].to_numpy() - med))
        assert got.loc[uid, "n"] == len(sub)
        assert got.loc[uid, "med_vq"] == med
        assert got.loc[uid, "mad_vq"] == mad


# --------------------------------------------------------------- G10 ----
def test_grouped_corr_matches_numpy(ray_session):
    import json

    from anomalydetection_ray.pipelines.queries import g10_corr_events

    got = g10_corr_events(SF).to_pandas().set_index("event_type")
    ev = pq_events()
    x = ev["props"].map(lambda s: json.loads(s)["k"]).astype(np.int64)
    y = np.floor(ev["value"].to_numpy() * 100 + 0.5).astype(np.int64)
    df = pd.DataFrame({"event_type": ev["event_type"], "x": x, "y": y})
    for et, sub in df.groupby("event_type"):
        r = np.corrcoef(sub["x"], sub["y"])[0, 1]
        assert abs(got.loc[et, "corr_xy"] - r) < 1e-10, et
        assert got.loc[et, "n"] == len(sub)


def pq_events() -> pd.DataFrame:
    import pyarrow.parquet as pq

    return pq.read_table(f"{SF}/events.parquet",
                         columns=["event_type", "value", "props"]).to_pandas()


# ---------------------------------------------------------------- S8 ----
def test_schema_evolution_union_matches_pandas(ray_session):
    from anomalydetection_ray.pipelines.queries import s8_schema_evolution

    import pyarrow.parquet as pq
    got = s8_schema_evolution(SF).to_pandas().set_index("source")
    docs = pq.read_table(
        f"{SF}/documents.parquet",
        columns=["doc_id", "source", "n_chars", "lang"]).to_pandas()
    for src, sub in docs.groupby("source"):
        odd = sub["doc_id"] % 2 == 1
        assert got.loc[src, "n_docs"] == len(sub)
        assert got.loc[src, "chars_sum"] == sub["n_chars"].sum()
        assert got.loc[src, "n_with_lang"] == int(odd.sum())
        assert got.loc[src, "n_en"] == int((odd & (sub["lang"] == "en")).sum())


# --------------------------------------------------------- G11 / G12 ----
def test_distinct_users_matches_pandas(ray_session):
    from anomalydetection_ray.pipelines.queries import g11_distinct_users

    got = g11_distinct_users(SF).to_pandas().set_index("event_type")
    ev = _events_df()
    ref = ev.groupby("event_type")["user_id"].nunique()
    for et, n in ref.items():
        assert got.loc[et, "n_users"] == n


def test_last_event_matches_pandas(ray_session):
    from anomalydetection_ray.pipelines.queries import g12_last_event

    got = g12_last_event(SF).to_pandas().set_index("user_id")
    ev = _events_df().sort_values(["user_id", "ts", "event_id"])
    last = ev.groupby("user_id").tail(1).set_index("user_id")
    assert len(got) == len(last)
    for uid, r in last.iterrows():
        assert got.loc[uid, "last_event_id"] == r["event_id"]
        assert got.loc[uid, "last_value"] == r["value"]
        assert got.loc[uid, "last_type"] == r["event_type"]


# ------------------------------------------------------------ TPC-H Q3 ----
def test_tpch_q3_like_matches_pandas(ray_session):
    import pyarrow.parquet as pq

    from anomalydetection_ray.pipelines.queries import (TPCH_Q3_CUT_US,
                                                        tpch_q3_like)

    got = tpch_q3_like(SF).to_pandas()
    cust = pq.read_table(f"{SF}/customer.parquet",
                         columns=["c_custkey", "c_mktsegment"]).to_pandas()
    orders = pq.read_table(f"{SF}/orders.parquet",
                           columns=["o_orderkey", "o_custkey",
                                    "o_orderdate"]).to_pandas()
    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_orderkey", "l_extendedprice",
                                "l_discount", "l_shipdate"]).to_pandas()
    ck = set(cust.loc[cust["c_mktsegment"] == "BUILDING", "c_custkey"])
    orders = orders[(orders["o_custkey"].isin(ck))
                    & (orders["o_orderdate"].astype("int64") < TPCH_Q3_CUT_US)]
    li = li[li["l_shipdate"].astype("int64") > TPCH_Q3_CUT_US].copy()
    li["cents"] = np.floor(li["l_extendedprice"]
                           * (1 - li["l_discount"]) * 100 + 0.5).astype(np.int64)
    j = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    agg = (j.groupby(["l_orderkey"])
            .agg(revenue_cents=("cents", "sum"),
                 o_date_us=("o_orderdate", "first")).reset_index())
    agg["o_date_us"] = agg["o_date_us"].astype("int64")
    ref = agg.sort_values(["revenue_cents", "o_date_us", "l_orderkey"],
                          ascending=[False, True, True]).head(10)
    got = got.sort_values(["revenue_cents", "o_date_us", "l_orderkey"],
                          ascending=[False, True, True]).reset_index(drop=True)
    ref = ref.reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["l_orderkey", "revenue_cents", "o_date_us"]],
        ref[["l_orderkey", "revenue_cents", "o_date_us"]], check_dtype=False)


# ---------------------------------------------------------------- M6 ----
def test_unnest_tokens_matches_tokenizer(ray_session):
    import pyarrow as pa

    from anomalydetection_ray.pipelines.queries import m6_unnest_tokens
    from anomalydetection_ray.sources.tokenize import tokenize_batch

    import pyarrow.parquet as pq
    got = m6_unnest_tokens(SF).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "source", "text"])
    docs = docs.filter(pa.compute.less(docs.column("doc_id"), 5))
    toks = tokenize_batch(docs)
    for i in range(toks.num_rows):
        did = toks.column("doc_id")[i].as_py()
        arr = toks.column("tokens")[i].as_py()
        sub = got[got["doc_id"] == did].sort_values("pos")
        assert sub["token"].tolist() == arr
        assert sub["pos"].tolist() == list(range(len(arr)))


# --------------------------------------------------------------- W13 ----
def test_time_weighted_avg_matches_pandas(ray_session):
    from anomalydetection_ray.pipelines.windows import (
        w13_time_weighted_avg_events)

    got = w13_time_weighted_avg_events(SF).to_pandas().set_index("user_id")
    ev = _events_df().sort_values(["user_id", "ts", "event_id"])
    ev["t"] = ev["ts"].astype("int64")
    ev["cents"] = np.floor(ev["value"] * 100 + 0.5).astype(np.int64)
    for uid, sub in ev.groupby("user_id"):
        t = sub["t"].to_numpy()
        c = sub["cents"].to_numpy()
        span = int(t[-1] - t[0])
        num = int((c[:-1] * np.diff(t)).sum()) if len(t) > 1 else 0
        assert got.loc[uid, "n"] == len(sub)
        assert got.loc[uid, "num_cents_us"] == num
        assert got.loc[uid, "span_us"] == span
        if span == 0:
            assert pd.isna(got.loc[uid, "twa_cents"])
        else:
            assert abs(got.loc[uid, "twa_cents"] - num / span) < 1e-9


# ---------------------------------------------------------- M7 / Q9 ----
def test_cross_join_grid(ray_session):
    import pyarrow.parquet as pq

    from anomalydetection_ray.pipelines.queries import m7_cross_join

    got = m7_cross_join(SF).to_pandas()
    nation = pq.read_table(f"{SF}/nation.parquet").to_pandas()
    region = pq.read_table(f"{SF}/region.parquet").to_pandas()
    assert len(got) == len(nation) * len(region)
    assert got["is_member"].sum() == len(nation)  # each nation in 1 region
    row = got[(got["n_nationkey"] == nation.iloc[0]["n_nationkey"])
              & (got["r_regionkey"] == nation.iloc[0]["n_regionkey"])]
    assert bool(row.iloc[0]["is_member"])
    assert row.iloc[0]["pair"] == \
        nation.iloc[0]["n_name"] + "|" + \
        region.set_index("r_regionkey").loc[
            nation.iloc[0]["n_regionkey"], "r_name"]


def test_activity_gaps_matches_pandas(ray_session):
    from anomalydetection_ray.pipelines.queries import q9_activity_gaps

    got = q9_activity_gaps(SF).to_pandas().set_index("user_id")
    ev = _events_df()
    day = ev["ts"].astype("int64") // 10**6 // 86400
    total = int(day.max() - day.min() + 1)
    ref = pd.DataFrame({"user_id": ev["user_id"], "day": day}) \
        .groupby("user_id")["day"].nunique()
    for uid, n in ref.items():
        assert got.loc[uid, "active_days"] == n
        assert got.loc[uid, "gap_days"] == total - n


# ---------------------------------------------------------------- K3 ----
def test_kmeans_assign_consistent_with_train(ray_session):
    """Every vector lands in a cluster; per-cluster assignment counts
    equal K1's n_assigned; scores are finite and argmax-consistent."""
    from anomalydetection_ray.pipelines.kmeans import (kmeans_assign,
                                                       kmeans_train)

    asg = kmeans_assign(SF).to_pandas()
    train = kmeans_train(SF).to_pandas()
    n_assigned = train.groupby("cid")["n_assigned"].first()
    counts = asg["cid"].value_counts()
    for cid, n in n_assigned.items():
        assert counts.get(cid, 0) == n, cid
    assert asg["vec_id"].is_unique
    assert np.isfinite(asg["score"]).all()


# ---------------------------------------------------------------- V6 ----
def test_oov_rate_matches_python(ray_session):
    from collections import Counter

    from anomalydetection_ray.pipelines.vocab import oov_rate_docs

    got = oov_rate_docs(SF).to_pandas().set_index("doc_id")
    docs = _docs_df()
    cnt = Counter()
    for t in docs["text"]:
        cnt.update(w for w in t.split(" ") if w)
    vocab = {w for w, _ in sorted(cnt.items(),
                                  key=lambda kv: (-kv[1], kv[0]))[:25]}
    for _, r in docs.head(100).iterrows():
        ws = [w for w in r["text"].split(" ") if w]
        oov = sum(1 for w in ws if w not in vocab)
        row = got.loc[r["doc_id"]]
        assert row["n_words"] == len(ws)
        assert row["n_oov"] == oov
        if ws:
            assert abs(row["oov_rate"] - oov / len(ws)) < 1e-12


# --------------------------------------------------------------- W14 ----
def test_event_flags_match_pandas(ray_session):
    from anomalydetection_ray.pipelines.windows import w14_event_anomaly_flags

    got = w14_event_anomaly_flags(SF).to_pandas().set_index("user_id")
    ev = _events_df().sort_values(["user_id", "ts", "event_id"])
    ev["cents"] = np.floor(ev["value"] * 100 + 0.5).astype(np.int64)
    w, c = 20, 3.0
    for uid, sub in ev.groupby("user_id"):
        x = sub["cents"].to_numpy().astype(np.float64)
        flags = []
        for i in range(len(x)):
            if i < w - 1:
                continue
            win = x[i - w + 1: i + 1]
            m = win.sum() / w
            var = max((win * win).sum() / w - m * m, 0.0)
            if abs(x[i] - m) > c * np.sqrt(var):
                flags.append(i)
        assert got.loc[uid, "n"] == len(x)
        assert got.loc[uid, "n_flags"] == len(flags), uid
        assert got.loc[uid, "pos_sum"] == sum(flags)


# -------------------------------------------------------------- A8b ----
def test_seasonal_components_match_numpy(ray_session):
    from anomalydetection_ray.pipelines.queries import a8_seasonal_components
    from anomalydetection_ray.sources.tokenize import tokenize_batch

    import pyarrow.parquet as pq
    got = a8_seasonal_components(SF).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "source", "text"])
    toks = tokenize_batch(docs)
    sub = got[got["doc_id"].isin([t.as_py() for t in toks.column("doc_id")[:20]])]
    for did in sub["doc_id"].unique()[:20]:
        i = toks.column("doc_id").to_pylist().index(did)
        arr = np.asarray(toks.column("tokens")[i].as_py(), dtype=np.float64)
        rows = got[(got["doc_id"] == did) & (got["part_id"] == 0)]
        for _, r in rows.iterrows():
            seg = arr[int(r["phase"])::24]
            assert r["n"] == len(seg)
            assert r["phase_median"] == np.median(seg)


# ---------------------------------------------------------------- T8 ----
def test_cohort_retention_matches_pandas(ray_session):
    from anomalydetection_ray.pipelines.windows import t8_cohort_retention

    got = t8_cohort_retention(SF).to_pandas().set_index("cohort_day")
    ev = _events_df()
    ev["t"] = ev["ts"].astype("int64")
    win = 7 * 86_400_000_000
    rows = []
    for uid, sub in ev.groupby("user_id"):
        su = sub.loc[sub["event_type"] == "signup", "t"]
        if su.empty:
            continue
        t0 = int(su.min())
        pur = sub.loc[sub["event_type"] == "purchase", "t"]
        retained = int(((pur >= t0) & (pur <= t0 + win)).any())
        rows.append((t0 // 86_400_000_000, retained))
    ref = pd.DataFrame(rows, columns=["cohort_day", "retained"]) \
        .groupby("cohort_day")["retained"].agg(["size", "sum"])
    assert len(got) == len(ref)
    for cd, r in ref.iterrows():
        assert got.loc[cd, "n_users"] == r["size"]
        assert got.loc[cd, "n_retained"] == r["sum"]


# ---------------------------------------------------------------- K4 ----
def test_vector_quantize_matches_numpy(ray_session):
    import pyarrow.parquet as pq

    from anomalydetection_ray.pipelines.kmeans import ESCALE, vector_quantize

    got = vector_quantize(SF).to_pandas().set_index("vec_id")
    emb = pq.read_table(f"{SF}/embeddings.parquet",
                        columns=["vec_id", "embedding"]).to_pandas()
    for _, r in emb.head(50).iterrows():
        e = np.asarray(r["embedding"], dtype=np.float64)
        q = np.floor(e * ESCALE + 0.5).astype(np.int64)
        ssq = int((q * q).sum())
        norm = np.sqrt(float(ssq))
        row = got.loc[r["vec_id"]]
        assert row["ssq"] == ssq
        assert row["norm_q"] == norm
        if norm > 0:
            codes = np.floor(127.0 * q / norm + 0.5).astype(np.int64)
            assert np.abs(codes).max() <= 127  # int8-representable
            assert row["code_sum"] == codes.sum()
            assert row["code_sumsq"] == (codes * codes).sum()


# ---------------------------------------------------------------- X5 ----
def test_integer_pagerank_matches_python(ray_session):
    import ray.data

    from anomalydetection_ray.stages.cc import (PR_BASE, PR_SCALE,
                                                integer_pagerank)

    import pyarrow as pa
    pairs = [(1, 2), (2, 3), (3, 1), (3, 4), (5, 6)]
    ds = ray.data.from_arrow(pa.table({
        "a": pa.array([p[0] for p in pairs], type=pa.int64()),
        "b": pa.array([p[1] for p in pairs], type=pa.int64()),
    }))
    got = integer_pagerank(ds, "a", "b", iters=3, num_partitions=4) \
        .to_pandas().set_index("doc_id")

    from collections import defaultdict
    adj = defaultdict(list)
    for a, b in pairs:
        adj[a].append(b)
        adj[b].append(a)
    r = {v: PR_SCALE for v in adj}
    for _ in range(3):
        s = defaultdict(int)
        for v, nbrs in adj.items():
            q = r[v] // len(nbrs)
            for u in nbrs:
                s[u] += q
        r = {v: PR_BASE + (85 * s[v]) // 100 for v in adj}
    for v in adj:
        assert got.loc[v, "deg"] == len(adj[v])
        assert got.loc[v, "rank_q"] == r[v], v
    # degree-3 hub outranks leaves
    assert got.loc[3, "rank_q"] > got.loc[4, "rank_q"]


# ---------------------------------------------------------------- U1 ----
def test_upsert_merge_last_writer_wins(ray_session):
    from anomalydetection_ray.pipelines.queries import u1_upsert_merge

    got = u1_upsert_merge(SF).to_pandas().set_index("event_id")
    ev = _events_df()
    assert len(got) == len(ev)  # merge never changes cardinality
    upd = ev["event_id"] % 7 == 0
    for _, r in ev.head(300).iterrows():
        row = got.loc[r["event_id"]]
        if r["event_id"] % 7 == 0:
            assert bool(row["is_update"])
            assert abs(row["value"] - (r["value"] + 1000.0)) < 1e-9
        else:
            assert not bool(row["is_update"])
            assert row["value"] == r["value"]
    assert got["is_update"].sum() == int(upd.sum())


# --------------------------------------------------------------- G13 ----
def test_gini_matches_reference(ray_session):
    from anomalydetection_ray.pipelines.queries import g13_gini_nchars

    got = g13_gini_nchars(SF).to_pandas().set_index("source")
    docs = _docs_df_with_nchars()
    for src, sub in docs.groupby("source"):
        x = np.sort(sub["n_chars"].to_numpy().astype(np.int64))
        n = len(x)
        i = np.arange(1, n + 1)
        ref = ((2 * i - n - 1) * x).sum() / (n * x.sum())
        assert got.loc[src, "n_docs"] == n
        assert abs(got.loc[src, "gini"] - ref) < 1e-12
        assert 0.0 <= got.loc[src, "gini"] < 1.0


def _docs_df_with_nchars() -> pd.DataFrame:
    import pyarrow.parquet as pq

    return pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "source", "n_chars"]).to_pandas()


# ---------------------------------------------------------------- S9 ----
def test_quarantine_routes_by_invariant(ray_session):
    from anomalydetection_ray.pipelines.queries import s9_quarantine

    got = s9_quarantine(SF).to_pandas()
    docs = _docs_df_with_nchars()
    bad = docs["doc_id"] % 13 == 0
    q = got[got["channel"] == "quarantined"]
    ok = got[got["channel"] == "ok"]
    assert q["n_rows"].sum() == int(bad.sum())
    assert ok["n_rows"].sum() == int((~bad).sum())
    # quarantined chars are the truncated lengths (all texts > 10 chars)
    assert (q["chars_sum"] == q["n_rows"] * 10).all()
    ref_ok = docs[~bad].groupby("source")["n_chars"].sum()
    for src, s_ in ref_ok.items():
        assert ok.set_index("source").loc[src, "chars_sum"] == s_


# --------------------------------------------------------------- G14 ----
def test_skewness_matches_scipy_formula(ray_session):
    import json

    from anomalydetection_ray.pipelines.queries import g14_skewness

    got = g14_skewness(SF).to_pandas().set_index("event_type")
    ev = _events_df_with_props()
    x = ev["props"].map(lambda s: json.loads(s)["k"]).astype(np.float64)
    df = pd.DataFrame({"event_type": ev["event_type"], "x": x})
    for et, sub in df.groupby("event_type"):
        v = sub["x"].to_numpy()
        m = v.mean()
        ref = ((v - m) ** 3).mean() / (((v - m) ** 2).mean() ** 1.5)
        assert abs(got.loc[et, "skewness"] - ref) < 1e-9, et
        assert got.loc[et, "n"] == len(v)


# ---------------------------------------------------------------- V7 ----
def test_lexical_richness_matches_python(ray_session):
    from collections import Counter

    from anomalydetection_ray.pipelines.vocab import lexical_richness

    import pyarrow.parquet as pq

    got = lexical_richness(SF).to_pandas().set_index("source")
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["source", "text"]).to_pandas()
    for src, sub in docs.groupby("source"):
        cnt = Counter()
        for t in sub["text"]:
            cnt.update(w for w in t.split(" ") if w)
        assert got.loc[src, "n_tokens"] == sum(cnt.values())
        assert got.loc[src, "n_types"] == len(cnt)
        assert got.loc[src, "n_hapax"] == sum(1 for v in cnt.values() if v == 1)


# ---------------------------------------------------------------- T9 ----
def test_dedup_impact_matches_python(ray_session):
    import hashlib

    from anomalydetection_ray.pipelines.dedup import dedup_impact_report

    import pyarrow.parquet as pq
    got = dedup_impact_report(SF).to_pandas().set_index("source")
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "source", "n_chars",
                                  "text"]).to_pandas()
    docs["h"] = docs["text"].map(
        lambda t: hashlib.md5(t.encode()).hexdigest())
    keep_ids = set(docs.groupby("h")["doc_id"].min())
    docs["kept"] = docs["doc_id"].isin(keep_ids)
    for src, sub in docs.groupby("source"):
        assert got.loc[src, "n_docs"] == len(sub)
        assert got.loc[src, "n_kept"] == int(sub["kept"].sum())
        assert got.loc[src, "chars_total"] == sub["n_chars"].sum()
        assert got.loc[src, "chars_dropped"] == \
            sub.loc[~sub["kept"], "n_chars"].sum()


# --------------------------------------------------------------- A13 ----
def test_longest_run_matches_python():
    import pyarrow as pa

    from anomalydetection_ray.stages.detectors import longest_run_batch

    rng = np.random.default_rng(17)
    rows = [
        rng.integers(0, 100, 200).astype(np.int32),
        np.array([5, 5, 5, 5], dtype=np.int32),        # no one above mean
        np.array([1, 9, 9, 9, 1, 9], dtype=np.int32),  # run of 3 then 1
        np.array([10], dtype=np.int32),
        np.empty(0, dtype=np.int32),
    ]
    batch = pa.table({
        "doc_id": [f"d{i}" for i in range(len(rows))],
        "part_id": pa.array([0] * len(rows), type=pa.int32()),
        "tokens": pa.array([r.tolist() for r in rows],
                           type=pa.list_(pa.int32())),
    })
    got = longest_run_batch(batch).to_pandas().set_index("doc_id")
    for i, r in enumerate(rows):
        x = r.astype(np.float64)
        row = got.loc[f"d{i}"]
        if len(x) == 0:
            assert row["n_above"] == 0 and row["longest_run"] == 0
            continue
        m = x.sum() / len(x)
        ab = x > m
        best = cur = 0
        for b in ab:
            cur = cur + 1 if b else 0
            best = max(best, cur)
        assert row["n_above"] == int(ab.sum()), i
        assert row["longest_run"] == best, i
    assert got.loc["d2", "longest_run"] == 3


# --------------------------------------------------------------- W16 ----
def test_share_of_total_matches_pandas(ray_session):
    from anomalydetection_ray.pipelines.windows import (
        w16_share_of_total_events)

    got = w16_share_of_total_events(SF).to_pandas().set_index("event_id")
    ev = _events_df()
    vq = np.floor(ev["value"].to_numpy() * VSCALE + 0.5).astype(np.int64)
    df = pd.DataFrame({"event_id": ev["event_id"],
                       "user_id": ev["user_id"], "vq": vq})
    tot = df.groupby("user_id")["vq"].transform("sum")
    for eid, v, t in list(zip(df["event_id"], df["vq"], tot))[:500]:
        row = got.loc[eid]
        assert row["vq"] == v
        assert row["user_total_vq"] == t
        assert abs(row["share"] - v / t) < 1e-15
    assert abs(got.groupby("user_id")["share"].sum() - 1.0).max() < 1e-9


# --------------------------------------------------------------- W10 ----
def test_markov_transitions_matches_pandas(ray_session):
    from anomalydetection_ray.pipelines.windows import w10_markov_transitions

    got = (w10_markov_transitions(SF).to_pandas()
           .set_index(["from_type", "to_type"]).sort_index())
    ev = _events_df().sort_values(["user_id", "ts", "event_id"])
    ref = Counter()
    for _, g in ev.groupby("user_id", sort=False):
        t = g["event_type"].to_list()
        for a, b in zip(t, t[1:]):
            ref[(a, b)] += 1
    assert len(got) == len(ref)
    totals = Counter()
    for (a, _), c in ref.items():
        totals[a] += c
    for (a, b), c in ref.items():
        row = got.loc[(a, b)]
        assert row["cnt"] == c
        assert row["from_total"] == totals[a]
        assert row["prob"] == float(c) / float(totals[a])
    # probabilities per from_type sum to 1 exactly up to fp accumulation
    assert np.allclose(got.groupby("from_type")["prob"].sum(), 1.0)


def test_markov_transitions_partition_invariance(ray_session):
    from anomalydetection_ray.pipelines.windows import w10_markov_transitions

    a = (w10_markov_transitions(SF, num_partitions=3).to_pandas()
         .sort_values(["from_type", "to_type"]).reset_index(drop=True))
    b = (w10_markov_transitions(SF, num_partitions=16).to_pandas()
         .sort_values(["from_type", "to_type"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


# --------------------------------------------------------------- A10 ----
def test_hampel_filter_matches_pandas(ray_session):
    from anomalydetection_ray.pipelines.windows import a10_hampel_filter

    W, C = 7, 3.0
    got = a10_hampel_filter(SF, window=W, c=C).to_pandas().set_index("event_id")
    ev = _events_df().sort_values(["user_id", "ts", "event_id"])
    checked = 0
    for _, g in ev.groupby("user_id", sort=False):
        x = g["value"].to_numpy()
        ids = g["event_id"].to_numpy()
        for i in range(W - 1, len(x)):
            win = np.sort(x[i - W + 1:i + 1])
            med = np.median(win)
            mad = np.median(np.abs(win - med))
            row = got.loc[ids[i]]
            assert row["med"] == med
            assert row["mad"] == mad
            assert bool(row["is_anomaly"]) == (abs(x[i] - med) > C * (1.4826 * mad))
            checked += 1
        if checked > 400:
            break
    # every emitted row has a full window behind it
    seq = (ev.groupby("user_id", sort=False).cumcount()
           .set_axis(ev["event_id"]))
    assert (seq.loc[got.index] >= W - 1).all()


def test_hampel_partition_invariance(ray_session):
    from anomalydetection_ray.pipelines.windows import a10_hampel_filter

    a = (a10_hampel_filter(SF, num_partitions=3).to_pandas()
         .sort_values("event_id").reset_index(drop=True))
    b = (a10_hampel_filter(SF, num_partitions=16).to_pandas()
         .sort_values("event_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


# ---------------------------------------------------------------- D7 ----
def test_debounce_matches_pandas(ray_session):
    from anomalydetection_ray.pipelines.windows import d7_debounce_events

    GAP = 86_400_000_000
    got = d7_debounce_events(SF, min_gap_us=GAP).to_pandas().set_index("event_id")
    ev = _events_df().sort_values(["user_id", "event_type", "ts", "event_id"])
    ts = ev["ts"].astype("int64").to_numpy()
    prev_ts = np.empty(len(ev), dtype=np.int64)
    prev_ts[1:] = ts[:-1]
    prev_ts[0] = -1
    same = np.zeros(len(ev), dtype=bool)
    same[1:] = ((ev["user_id"].to_numpy()[1:] == ev["user_id"].to_numpy()[:-1])
                & (ev["event_type"].to_numpy()[1:] == ev["event_type"].to_numpy()[:-1]))
    gap = ts - prev_ts
    dup = same & (gap < GAP)
    ref = pd.DataFrame({"event_id": ev["event_id"].to_numpy(),
                        "gap": gap, "same": same, "dup": dup}).set_index("event_id")
    assert len(got) == len(ref)
    sel = ref.sample(500, random_state=7) if len(ref) > 500 else ref
    for eid, row in sel.iterrows():
        g = got.loc[eid]
        assert bool(g["is_dup"]) == bool(row["dup"])
        if row["same"]:
            assert g["gap_same_type_us"] == row["gap"]
        else:
            assert pd.isna(g["gap_same_type_us"])


def test_debounce_partition_invariance(ray_session):
    from anomalydetection_ray.pipelines.windows import d7_debounce_events

    a = (d7_debounce_events(SF, num_partitions=3).to_pandas()
         .sort_values("event_id").reset_index(drop=True))
    b = (d7_debounce_events(SF, num_partitions=16).to_pandas()
         .sort_values("event_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


# --------------------------------------------------------------- W15 ----
def test_period_over_period_matches_pandas(ray_session):
    from anomalydetection_ray.pipelines.windows import w15_period_over_period

    got = (w15_period_over_period(SF).to_pandas()
           .set_index(["event_type", "day"]).sort_index())
    ev = _events_df()
    day = (ev["ts"].astype("int64") // 86_400_000_000).to_numpy()
    vq = np.floor(ev["value"].to_numpy() * VSCALE + 0.5).astype(np.int64)
    ref = (pd.DataFrame({"event_type": ev["event_type"], "day": day, "vq": vq})
           .groupby(["event_type", "day"])
           .agg(cnt=("vq", "size"), sum_vq=("vq", "sum")).sort_index())
    assert len(got) == len(ref)
    assert (got["cnt"] == ref["cnt"]).all()
    assert (got["sum_vq"] == ref["sum_vq"]).all()
    for et, g in ref.groupby(level=0):
        c = g["cnt"].to_numpy()
        days = g.index.get_level_values(1).to_numpy()
        sub = got.loc[et]
        assert pd.isna(sub.iloc[0]["prev_cnt"])
        for i in range(1, len(c)):
            row = sub.loc[days[i]]
            assert row["prev_cnt"] == c[i - 1]
            assert row["delta_cnt"] == c[i] - c[i - 1]
            assert row["day_gap"] == days[i] - days[i - 1]
            assert row["pct_change"] == float(c[i] - c[i - 1]) / float(c[i - 1])


# ---------------------------------------------------------------- B1 ----
def test_bloom_semi_join_no_false_negatives(ray_session):
    import pyarrow.parquet as pq
    from anomalydetection_ray.pipelines.bloom import (
        BLOOM_KS, BLOOM_M, b1_bloom_semi_join, bloom_bits_of)

    FLOOR = 450000.0
    got = b1_bloom_semi_join(SF, price_floor=FLOOR).to_pandas()
    orders = pq.read_table(f"{SF}/orders.parquet",
                           columns=["o_custkey", "o_totalprice"]).to_pandas()
    members = set(orders.loc[orders["o_totalprice"] > FLOOR, "o_custkey"])
    cust = pq.read_table(f"{SF}/customer.parquet",
                         columns=["c_custkey"]).to_pandas()
    assert len(got) == len(cust)
    g = got.set_index("c_custkey")
    # exact bit-array reference
    bits = np.zeros(BLOOM_M, dtype=bool)
    mk = np.array(sorted(members), dtype=np.int64)
    if len(mk):
        bits[np.unique(bloom_bits_of(mk))] = True
    for ck in cust["c_custkey"]:
        row = g.loc[ck]
        ref_pass = bool(bits[bloom_bits_of(np.array([ck]))].all())
        assert bool(row["bloom_pass"]) == ref_pass
        assert bool(row["has_big_order"]) == (ck in members)
        # no false negatives, ever
        if ck in members:
            assert row["bloom_pass"]
        assert bool(row["is_false_positive"]) == (ref_pass and ck not in members)


# ---------------------------------------------------------------- Z1 ----
def test_zorder_layout_matches_reference(ray_session):
    from anomalydetection_ray.pipelines.queries import (
        _morton_spread16, z1_zorder_layout)

    # magic-mask spread == bit-loop reference
    rng = np.random.default_rng(42)
    v = rng.integers(0, 65536, 1000, dtype=np.int64)
    ref = np.zeros(len(v), dtype=np.uint64)
    for i in range(16):
        ref |= (((v.astype(np.uint64) >> np.uint64(i)) & np.uint64(1))
                << np.uint64(2 * i))
    assert np.array_equal(_morton_spread16(v), ref)

    got = z1_zorder_layout(SF).to_pandas().set_index("bucket").sort_index()
    ev = _events_df()
    day = ((ev["ts"].astype("int64") // 86_400_000_000) % 65536).to_numpy()
    uid = (ev["user_id"].to_numpy() % 65536).astype(np.int64)
    z = (_morton_spread16(uid)
         | (_morton_spread16(day) << np.uint64(1))).astype(np.int64)
    ref_df = (pd.DataFrame({"bucket": z >> 9, "z": z, "x": uid, "y": day})
              .groupby("bucket")
              .agg(n=("z", "size"), sum_z=("z", "sum"),
                   min_user=("x", "min"), max_user=("x", "max"),
                   min_day=("y", "min"), max_day=("y", "max")).sort_index())
    assert len(got) == len(ref_df)
    for c in ref_df.columns:
        assert (got[c] == ref_df[c]).all(), c
    # zone-map usefulness: every bucket covers a bounded user rectangle
    assert ((got["max_user"] - got["min_user"])
            <= (uid.max() - uid.min())).all()


# --------------------------------------------------------------- T10 ----
def test_column_profile_matches_pandas(ray_session):
    import pyarrow.parquet as pq
    from anomalydetection_ray.pipelines.queries import t10_column_profile

    got = t10_column_profile(SF).to_pandas().set_index("column")
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    assert len(got) == 6
    for c in ["event_id", "user_id", "value", "ts", "event_type", "props"]:
        row = got.loc[c]
        assert row["n"] == len(ev)
        assert row["n_null"] == int(ev[c].isna().sum())
        assert row["n_distinct"] == ev[c].nunique()
    assert got.loc["value", "min_num"] == ev["value"].min()
    assert got.loc["value", "max_num"] == ev["value"].max()
    assert got.loc["ts", "min_num"] == float(ev["ts"].astype("int64").min())
    assert got.loc["event_type", "min_str"] == ev["event_type"].min()
    assert got.loc["props", "max_str"] == ev["props"].max()
    assert pd.isna(got.loc["event_type", "min_num"])
    assert pd.isna(got.loc["value", "min_str"])


# --------------------------------------------------------------- W17 ----
def test_cooccurrence_lift_matches_reference(ray_session):
    from itertools import combinations

    from anomalydetection_ray.pipelines.windows import w17_cooccurrence_lift

    got = (w17_cooccurrence_lift(SF).to_pandas()
           .set_index(["type_a", "type_b"]).sort_index())
    ev = _events_df()
    baskets = ev.groupby("user_id")["event_type"].agg(lambda s: sorted(set(s)))
    n_users = len(baskets)
    singles = Counter()
    pairs = Counter()
    for b in baskets:
        for t in b:
            singles[t] += 1
        for a, c in combinations(b, 2):
            pairs[(a, c)] += 1
    assert len(got) == len(pairs)
    for (a, b), co in pairs.items():
        row = got.loc[(a, b)]
        assert row["co"] == co
        assert row["count_a"] == singles[a]
        assert row["count_b"] == singles[b]
        assert row["n_users"] == n_users
        assert row["lift"] == float(co * n_users) / float(singles[a] * singles[b])


def test_cooccurrence_partition_invariance(ray_session):
    from anomalydetection_ray.pipelines.windows import w17_cooccurrence_lift

    a = (w17_cooccurrence_lift(SF, num_partitions=3).to_pandas()
         .sort_values(["type_a", "type_b"]).reset_index(drop=True))
    b = (w17_cooccurrence_lift(SF, num_partitions=16).to_pandas()
         .sort_values(["type_a", "type_b"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


# --------------------------------------------------------------- T11 ----
def test_benford_digits_matches_pandas(ray_session):
    import math

    from anomalydetection_ray.pipelines.queries import t11_benford_digits

    got = (t11_benford_digits(SF).to_pandas()
           .set_index(["event_type", "digit"]).sort_index())
    ev = _events_df()
    cents = np.floor(ev["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
    digit = np.array([int(str(c)[0]) for c in cents])
    ref = (pd.DataFrame({"event_type": ev["event_type"], "digit": digit})
           .groupby(["event_type", "digit"]).size())
    assert len(got) == len(ref)
    totals = ref.groupby(level=0).sum()
    for (et, d), n in ref.items():
        row = got.loc[(et, d)]
        total = totals[et]
        assert row["n"] == n
        assert row["total"] == total
        assert row["obs_frac"] == float(n) / float(total)
        ef = math.log10(1.0 + 1.0 / d)
        assert row["exp_frac"] == ef
        exp_n = float(total) * ef
        assert row["chi2_term"] == (float(n) - exp_n) ** 2 / exp_n


# --------------------------------------------------------------- G15 ----
def test_user_entropy_matches_reference(ray_session):
    import math

    from anomalydetection_ray.pipelines.queries import g15_user_entropy

    got = g15_user_entropy(SF).to_pandas().set_index("event_type")
    ev = _events_df()
    for et, g in ev.groupby("event_type"):
        counts = g.groupby("user_id").size().sort_index()
        total = int(counts.sum())
        acc = 0.0
        for c in counts:
            p = float(int(c)) / float(total)
            acc = acc + p * math.log(p)
        row = got.loc[et]
        assert row["total"] == total
        assert row["n_users"] == len(counts)
        assert row["entropy"] == -acc
        assert row["norm_entropy"] == -acc / math.log(float(len(counts)))
        # entropy bounded by ln(n_users)
        assert 0.0 <= row["norm_entropy"] <= 1.0 + 1e-12


# --------------------------------------------------------------- W18 ----
def test_lttb_downsample_matches_reference(ray_session):
    from anomalydetection_ray.pipelines.windows import w18_lttb_downsample

    B = 5
    got = (w18_lttb_downsample(SF, bucket_pts=B).to_pandas()
           .set_index(["user_id", "bucket"]).sort_index())
    ev = _events_df().sort_values(["user_id", "ts", "event_id"])
    total_rows = 0
    for uid, g in ev.groupby("user_id", sort=False):
        ts = g["ts"].astype("int64").to_numpy()
        x = (ts - ts[0]) // 1_000_000
        y = np.floor(g["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        eid = g["event_id"].to_numpy()
        n = len(g)
        nb = (n + B - 1) // B
        for b in range(nb):
            lo, hi = b * B, min((b + 1) * B, n)
            row = got.loc[(uid, b)]
            total_rows += 1
            if b == 0:
                assert row["event_id"] == eid[0] and pd.isna(row["score"])
            elif b == nb - 1:
                assert row["event_id"] == eid[n - 1] and pd.isna(row["score"])
            else:
                sl = slice((b - 1) * B, b * B)
                sr = slice((b + 1) * B, min((b + 2) * B, n))
                sxl, syl, nl = int(x[sl].sum()), int(y[sl].sum()), len(x[sl])
                sxr, syr, nr = int(x[sr].sum()), int(y[sr].sum()), len(x[sr])
                best, best_i = -1, None
                for i in range(lo, hi):
                    s = abs((sxl - int(x[i]) * nl) * (syr - int(y[i]) * nr)
                            - (sxr - int(x[i]) * nr) * (syl - int(y[i]) * nl))
                    if s > best:
                        best, best_i = s, i
                assert row["event_id"] == eid[best_i]
                assert row["score"] == best
    assert len(got) == total_rows


def test_lttb_partition_invariance(ray_session):
    from anomalydetection_ray.pipelines.windows import w18_lttb_downsample

    a = (w18_lttb_downsample(SF, num_partitions=3).to_pandas()
         .sort_values(["user_id", "bucket"]).reset_index(drop=True))
    b = (w18_lttb_downsample(SF, num_partitions=16).to_pandas()
         .sort_values(["user_id", "bucket"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


# ---------------------------------------------------------------- U2 ----
def test_scd2_intervals_matches_pandas(ray_session):
    from anomalydetection_ray.pipelines.windows import u2_scd2_intervals

    got = u2_scd2_intervals(SF).to_pandas().set_index("event_id")
    ev = _events_df().sort_values(["user_id", "ts", "event_id"])
    for uid, g in list(ev.groupby("user_id", sort=False))[:30]:
        ts = g["ts"].astype("int64").to_numpy()
        eid = g["event_id"].to_numpy()
        for i in range(len(g)):
            row = got.loc[eid[i]]
            assert row["version"] == i + 1
            assert row["valid_from_us"] == ts[i]
            if i + 1 < len(g):
                assert row["valid_to_us"] == ts[i + 1]
                assert not row["is_current"]
            else:
                assert pd.isna(row["valid_to_us"])
                assert row["is_current"]
    # intervals per user tile the timeline: one current row per user
    cur = got.groupby("user_id")["is_current"].sum()
    assert (cur == 1).all()


# --------------------------------------------------------------- W19 ----
def test_ntile_matches_reference(ray_session):
    from anomalydetection_ray.pipelines.windows import w19_ntile_quartiles

    K = 4
    got = w19_ntile_quartiles(SF, k=K).to_pandas().set_index("event_id")
    ev = _events_df().sort_values(["user_id", "value", "event_id"])
    for uid, g in ev.groupby("user_id", sort=False):
        n = len(g)
        size, rem = divmod(n, K)
        eid = g["event_id"].to_numpy()
        pos = 0
        for t in range(1, K + 1):
            w = size + (1 if t <= rem else 0)
            for _ in range(w):
                assert got.loc[eid[pos], "tile"] == t
                pos += 1
        assert pos == n


# ---------------------------------------------------------------- J9 ----
def test_interval_coalesce_matches_reference(ray_session):
    from anomalydetection_ray.pipelines.windows import j9_interval_coalesce

    HOLD = 300_000_000
    got = (j9_interval_coalesce(SF, hold_us=HOLD).to_pandas()
           .set_index(["day", "island"]).sort_index())
    ev = _events_df()
    lo_all = ev["ts"].astype("int64").to_numpy()
    eid = ev["event_id"].to_numpy()
    day = lo_all // 86_400_000_000
    total = 0
    for d in np.unique(day):
        sel = day == d
        order = np.lexsort((eid[sel], lo_all[sel]))
        lo = lo_all[sel][order]
        hi = lo + HOLD
        islands = []
        cur_lo, cur_hi, cur_n = lo[0], hi[0], 1
        for i in range(1, len(lo)):
            if lo[i] > cur_hi:
                islands.append((cur_lo, cur_hi, cur_n))
                cur_lo, cur_hi, cur_n = lo[i], hi[i], 1
            else:
                cur_hi = max(cur_hi, hi[i])
                cur_n += 1
        islands.append((cur_lo, cur_hi, cur_n))
        for k, (l, h, c) in enumerate(islands):
            row = got.loc[(d, k)]
            assert row["lo_us"] == l and row["hi_us"] == h
            assert row["n_events"] == c
            total += 1
    assert len(got) == total
    # islands within a day never overlap
    for d, g in got.groupby(level=0):
        g = g.sort_values("lo_us")
        assert (g["lo_us"].to_numpy()[1:] > g["hi_us"].to_numpy()[:-1]).all()


def test_interval_coalesce_partition_invariance(ray_session):
    from anomalydetection_ray.pipelines.windows import j9_interval_coalesce

    a = (j9_interval_coalesce(SF, num_partitions=3).to_pandas()
         .sort_values(["day", "island"]).reset_index(drop=True))
    b = (j9_interval_coalesce(SF, num_partitions=16).to_pandas()
         .sort_values(["day", "island"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


# --------------------------------------------------------------- G16 ----
def test_chi2_independence_matches_reference(ray_session):
    from anomalydetection_ray.pipelines.queries import g16_chi2_independence

    got = (g16_chi2_independence(SF).to_pandas()
           .set_index(["event_type", "dow"]).sort_index())
    ev = _events_df()
    dow = ((ev["ts"].astype("int64") // 86_400_000_000 + 3) % 7).to_numpy()
    ref = (pd.DataFrame({"event_type": ev["event_type"], "dow": dow})
           .groupby(["event_type", "dow"]).size())
    rows = ref.groupby(level=0).sum()
    cols = ref.groupby(level=1).sum()
    total = int(ref.sum())
    assert len(got) == len(ref)
    chi2_total = 0.0
    for (et, d), n in ref.items():
        r = got.loc[(et, d)]
        assert r["obs"] == n
        assert r["row_total"] == rows[et] and r["col_total"] == cols[d]
        ex = float(int(rows[et]) * int(cols[d])) / float(total)
        assert r["expected"] == ex
        assert r["chi2_term"] == (float(n) - ex) ** 2 / ex
        chi2_total += r["chi2_term"]
    assert chi2_total >= 0.0


# --------------------------------------------------------------- A12 ----
def test_ks_drift_matches_reference(ray_session):
    from anomalydetection_ray.pipelines.queries import a12_ks_drift

    got = a12_ks_drift(SF).to_pandas().set_index("event_type")
    ev = _events_df()
    cents = np.floor(ev["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
    even = (ev["ts"].astype("int64").to_numpy() // 86_400_000_000) % 2 == 0
    for et in ev["event_type"].unique():
        sel = (ev["event_type"] == et).to_numpy()
        ce, co = cents[sel & even], cents[sel & ~even]
        n_e, n_o = len(ce), len(co)
        vals = np.unique(cents[sel])
        cum_e = np.searchsorted(np.sort(ce), vals, side="right")
        cum_o = np.searchsorted(np.sort(co), vals, side="right")
        num = np.abs(cum_e.astype(np.int64) * n_o
                     - cum_o.astype(np.int64) * n_e)
        best = int(np.argmax(num))
        row = got.loc[et]
        assert row["n_even"] == n_e and row["n_odd"] == n_o
        assert row["ks_num"] == num[best]
        assert row["at_cents"] == vals[best]
        assert row["ks_stat"] == float(num[best]) / float(n_e * n_o)


# ---------------------------------------------------------------- D8 ----
def test_sorted_neighborhood_matches_reference(ray_session):
    from anomalydetection_ray.pipelines.dedup import sorted_neighborhood_pairs

    W, P = 3, 16
    got = (sorted_neighborhood_pairs(SF, window=W, prefix_len=P).to_pandas()
           .sort_values(["doc_a", "doc_b"]).reset_index(drop=True))
    docs = _docs_df()
    docs["pfx"] = docs["text"].str[:P]
    ref = []
    for _, g in docs.groupby("pfx"):
        g = g.sort_values(["text", "doc_id"]).reset_index(drop=True)
        for d in range(1, W):
            for i in range(len(g) - d):
                ref.append((int(g.loc[i, "doc_id"]),
                            int(g.loc[i + d, "doc_id"]), d,
                            g.loc[i, "text"] == g.loc[i + d, "text"]))
    ref = (pd.DataFrame(ref, columns=["doc_a", "doc_b", "rank_dist",
                                      "is_exact"])
           .sort_values(["doc_a", "doc_b"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, ref)
    # every exact-dup pair sharing a prefix block is found
    dup_text = docs[docs.duplicated("text", keep=False)]
    assert got["is_exact"].sum() >= 0  # presence depends on corpus dups


def test_sorted_neighborhood_partition_invariance(ray_session):
    from anomalydetection_ray.pipelines.dedup import sorted_neighborhood_pairs

    a = (sorted_neighborhood_pairs(SF, num_partitions=3).to_pandas()
         .sort_values(["doc_a", "doc_b"]).reset_index(drop=True))
    b = (sorted_neighborhood_pairs(SF, num_partitions=16).to_pandas()
         .sort_values(["doc_a", "doc_b"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


# --------------------------------------------------------------- W20 ----
def test_time_decay_score_matches_reference(ray_session):
    from anomalydetection_ray.pipelines.windows import w20_time_decay_score

    HL, W0 = 4, 1 << 20
    got = w20_time_decay_score(SF, half_life_days=HL).to_pandas() \
        .set_index("user_id")
    ev = _events_df()
    day = ev["ts"].astype("int64").to_numpy() // 86_400_000_000
    anchor = day.max()
    vq = np.floor(ev["value"].to_numpy() * VSCALE + 0.5).astype(np.int64)
    w = W0 >> np.minimum((anchor - day) // HL, 63)
    ref = (pd.DataFrame({"user_id": ev["user_id"], "dq": vq * w})
           .groupby("user_id").agg(n=("dq", "size"), dq=("dq", "sum")))
    assert len(got) == len(ref)
    for uid, row in ref.iterrows():
        g = got.loc[uid]
        assert g["n_events"] == row["n"]
        assert g["decay_sum_q"] == row["dq"]
        assert g["decay_score"] == float(row["dq"]) / (float(W0) * float(VSCALE))
    # monotonicity: weights halve with age, never negative
    assert (got["decay_sum_q"] >= 0).all()


# --------------------------------------------------------------- J10 ----
def test_snapshot_diff_matches_reference(ray_session):
    import pyarrow.parquet as pq
    from anomalydetection_ray.pipelines.queries import j10_snapshot_diff

    got = j10_snapshot_diff(SF).to_pandas().set_index("o_orderkey")
    orders = pq.read_table(f"{SF}/orders.parquet",
                           columns=["o_orderkey", "o_totalprice"]).to_pandas()
    a = {int(k): float(p) for k, p in
         zip(orders["o_orderkey"], orders["o_totalprice"]) if k % 7 != 0}
    b = {int(k): (float(p) + 1.0 if k % 3 == 0 else float(p)) for k, p in
         zip(orders["o_orderkey"], orders["o_totalprice"]) if k % 5 != 0}
    keys = set(a) | set(b)
    assert len(got) == len(keys)
    n_cls = Counter()
    for k in keys:
        row = got.loc[k]
        if k not in a:
            cls = "added"
        elif k not in b:
            cls = "removed"
        elif a[k] != b[k]:
            cls = "changed"
        else:
            cls = "unchanged"
        assert row["class"] == cls, k
        n_cls[cls] += 1
        if k in a:
            assert row["price_old"] == a[k]
        else:
            assert pd.isna(row["price_old"])
        if k in b:
            assert row["price_new"] == b[k]
        else:
            assert pd.isna(row["price_new"])
    # the derivation produces all four classes
    assert set(n_cls) == {"added", "removed", "changed", "unchanged"}


# --------------------------------------------------------------- W21 ----
def test_grid_resample_locf_matches_reference(ray_session):
    from anomalydetection_ray.pipelines.windows import w21_grid_resample_locf

    DAY = 86_400_000_000
    got = (w21_grid_resample_locf(SF).to_pandas()
           .set_index(["user_id", "day"]).sort_index())
    ev = _events_df().sort_values(["user_id", "ts", "event_id"])
    total = 0
    for uid, g in list(ev.groupby("user_id", sort=False))[:40]:
        ts = g["ts"].astype("int64").to_numpy()
        val = g["value"].to_numpy()
        days = ts // DAY
        obs_days = set(days.tolist())
        for d in range(int(days[0]), int(days[-1]) + 1):
            row = got.loc[(uid, d)]
            sel = np.flatnonzero(ts < (d + 1) * DAY)
            assert len(sel) > 0
            assert row["value_locf"] == val[sel[-1]]
            assert bool(row["is_observed"]) == (d in obs_days)
            total += 1
    # span completeness for the checked users
    assert total > 0
    # full output size equals the sum of user spans
    spans = ev.groupby("user_id")["ts"].agg(
        lambda s: int(s.astype("int64").max() // DAY
                      - s.astype("int64").min() // DAY + 1))
    assert len(got) == int(spans.sum())


# ---------------------------------------------------------------- X4 ----
def test_phrase_search_matches_reference(ray_session):
    from anomalydetection_ray.pipelines.vocab import phrase_search

    got = phrase_search(SF, "batch", "stream").to_pandas() \
        .set_index("doc_id").sort_index()
    docs = _docs_df()
    ref = {}
    for did, text in zip(docs["doc_id"], docs["text"]):
        w = [x for x in text.split(" ") if x != ""]
        hits = [i for i in range(len(w) - 1)
                if w[i] == "batch" and w[i + 1] == "stream"]
        if hits:
            ref[int(did)] = (len(hits), hits[0])
    assert len(got) == len(ref)
    for did, (n, first) in ref.items():
        assert got.loc[did, "n_occurrences"] == n
        assert got.loc[did, "first_pos"] == first


# ---------------------------------------------------------------- C3 ----
def test_tpch_q10_like_matches_duckdb(ray_session):
    import duckdb

    from anomalydetection_ray.pipelines.queries import c3_tpch_q10_like

    got = c3_tpch_q10_like(SF).to_pandas().reset_index(drop=True)
    con = duckdb.connect()
    for t in ["lineitem", "orders", "customer", "nation"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    ref = con.execute("""
        SELECT c.c_custkey, c.c_name, n.n_name,
               CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount)
                   * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents,
               count(*) AS n_items
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        WHERE l.l_returnflag = 'R'
        GROUP BY 1, 2, 3 ORDER BY revenue_cents DESC, c.c_custkey LIMIT 20
    """).df()
    assert len(got) == len(ref)
    g = got.sort_values(["revenue_cents", "c_custkey"],
                        ascending=[False, True]).reset_index(drop=True)
    for c in ["c_custkey", "c_name", "n_name", "revenue_cents", "n_items"]:
        assert (g[c].to_numpy() == ref[c].to_numpy()).all(), c


# ---------------------------------------------------------------- V9 ----
def test_zipf_slope_matches_reference(ray_session):
    import math

    from anomalydetection_ray.pipelines.vocab import v9_zipf_slope

    K = 100
    got = v9_zipf_slope(SF, k=K).to_pandas().iloc[0]
    docs = _docs_df()
    cnt = Counter()
    for text in docs["text"]:
        cnt.update(w for w in text.split(" ") if w != "")
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:K]
    sx = sy = sxx = sxy = 0.0
    for i, (_, c) in enumerate(top):
        x, y = math.log(float(i + 1)), math.log(float(c))
        sx, sy = sx + x, sy + y
        sxx, sxy = sxx + x * x, sxy + x * y
    kk = float(len(top))
    slope = (kk * sxy - sx * sy) / (kk * sxx - sx * sx)
    assert got["k"] == len(top)
    assert got["top_count"] == top[0][1]
    assert got["slope"] == slope
    assert got["intercept"] == (sy - slope * sx) / kk
    # natural-ish Zipf range for this synthetic corpus
    assert -3.0 < slope < 0.0


# --------------------------------------------------------------- T12 ----
def test_source_vocab_jaccard_matches_reference(ray_session):
    import pyarrow.parquet as pq
    from anomalydetection_ray.pipelines.vocab import t12_source_vocab_jaccard

    got = (t12_source_vocab_jaccard(SF).to_pandas()
           .set_index(["source_a", "source_b"]).sort_index())
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["source", "text"]).to_pandas()
    vocab = {}
    for s, g in docs.groupby("source"):
        ws = set()
        for t in g["text"]:
            ws.update(w for w in t.split(" ") if w != "")
        vocab[s] = ws
    srcs = sorted(vocab)
    n_pairs = 0
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            inter = len(vocab[a] & vocab[b])
            if inter == 0:
                continue
            row = got.loc[(a, b)]
            assert row["inter"] == inter
            assert row["types_a"] == len(vocab[a])
            assert row["types_b"] == len(vocab[b])
            union = len(vocab[a]) + len(vocab[b]) - inter
            assert row["jaccard"] == float(inter) / float(union)
            n_pairs += 1
    assert len(got) == n_pairs


def test_source_vocab_jaccard_partition_invariance(ray_session):
    from anomalydetection_ray.pipelines.vocab import t12_source_vocab_jaccard

    a = (t12_source_vocab_jaccard(SF, num_partitions=3).to_pandas()
         .sort_values(["source_a", "source_b"]).reset_index(drop=True))
    b = (t12_source_vocab_jaccard(SF, num_partitions=16).to_pandas()
         .sort_values(["source_a", "source_b"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


# --------------------------------------------------------------- S13 ----
def test_orc_roundtrip_matches_parquet(ray_session):
    import pyarrow.parquet as pq
    from anomalydetection_ray.pipelines.queries import s13_orc_roundtrip

    got = s13_orc_roundtrip(SF).to_pandas().set_index("source").sort_index()
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "source", "n_chars"]).to_pandas()
    ref = docs.groupby("source").agg(n_docs=("doc_id", "size"),
                                     chars_sum=("n_chars", "sum"),
                                     ids_sum=("doc_id", "sum")).sort_index()
    assert len(got) == len(ref)
    for c in ref.columns:
        assert (got[c] == ref[c]).all(), c


# --------------------------------------------------------------- S15 ----
def test_validation_suite_all_rules_pass_on_clean_data(ray_session):
    from anomalydetection_ray.pipelines.queries import s15_validation_suite

    got = s15_validation_suite(SF).to_pandas().set_index("rule")
    assert len(got) == 6
    # the driver testdata satisfies every contract
    assert got["passed"].all()
    assert (got["n_violations"] == 0).all()
    ev = _events_df()
    assert got.loc["events.event_id unique", "n_checked"] == len(ev)
    docs = _docs_df()
    assert (got.loc["documents.n_chars == length(text)", "n_checked"]
            == len(docs))


# --------------------------------------------------------------- G23 ----
def test_partition_skew_matches_reference(ray_session):
    from anomalydetection_ray.pipelines.queries import g23_partition_skew

    P = 32
    got = g23_partition_skew(SF, num_partitions=P).to_pandas() \
        .set_index("bucket").sort_index()
    ev = _events_df()
    k = ev["user_id"].to_numpy().astype(np.uint64)
    b = ((k * np.uint64(2654435761)) % np.uint64(1 << 32)) % np.uint64(P)
    ref = pd.Series(b.astype(np.int64)).value_counts().sort_index()
    assert len(got) == len(ref)
    total = int(ref.sum())
    mx = int(ref.max())
    for bucket, n in ref.items():
        row = got.loc[bucket]
        assert row["n"] == n
        assert row["share"] == float(n) / float(total)
        assert row["total"] == total
        assert row["skew_factor"] == float(mx * P) / float(total)
    assert got["skew_factor"].iloc[0] >= 1.0


# --------------------------------------------------------------- Q10 ----
def test_systematic_sample_matches_reference(ray_session):
    from anomalydetection_ray.pipelines.packing import q10_systematic_sample

    K, SEED = 10, 42
    got = q10_systematic_sample(SF, k=K).to_pandas() \
        .sort_values("shuffle_pos").reset_index(drop=True)
    docs = _docs_df()
    ids = docs["doc_id"].to_numpy().astype(np.uint64)
    smix = (np.uint64(SEED) * np.uint64(2654435761)) & np.uint64(0xFFFFFFFF)
    h = (((ids & np.uint64(0xFFFFFFFF)) ^ smix) * np.uint64(2654435761)) \
        & np.uint64(0xFFFFFFFF)
    order = np.lexsort((ids.astype(np.int64), h.astype(np.int64)))
    picked = order[::K]
    assert len(got) == len(picked)
    assert (got["doc_id"].to_numpy() == ids[picked].astype(np.int64)).all()
    assert (got["shuffle_pos"].to_numpy()
            == np.arange(0, len(ids), K)[:len(picked)]).all()
    # exact sample size by construction
    assert len(got) == -(-len(ids) // K)


# --------------------------------------------------------------- W25 ----
def test_volatility_matches_reference(ray_session):
    from anomalydetection_ray.pipelines.windows import w25_volatility

    got = w25_volatility(SF).to_pandas().set_index("user_id")
    ev = _events_df().sort_values(["user_id", "ts", "event_id"])
    n_users = 0
    for uid, g in ev.groupby("user_id", sort=False):
        cents = np.floor(g["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        if len(cents) < 2:
            continue
        ad = np.abs(np.diff(cents)).astype(np.float64)
        med = np.median(ad)
        mad = np.median(np.abs(ad - med))
        row = got.loc[uid]
        assert row["n_deltas"] == len(ad)
        assert row["med_abs_delta"] == med
        assert row["mad_abs_delta"] == mad
        n_users += 1
    assert len(got) == n_users


# --------------------------------------------------------------- A22 ----
def test_grubbs_detector_flags_single_outlier(ray_session):
    import math

    from anomalydetection_ray.stages.detectors import (
        _det_grubbs, detectors, grubbs_lambda)

    assert "grubbs" in detectors()
    x = np.array([10, 12, 11, 13, 10, 11, 12, 10, 11, 100], dtype=np.int64)
    out = _det_grubbs(x)
    assert out["n_anomalies"] == 1
    assert list(out["anomaly_positions"]) == [9]
    # clean series: no flag
    clean = np.array([10, 12, 11, 13, 10, 11, 12, 10, 11, 12], dtype=np.int64)
    assert _det_grubbs(clean)["n_anomalies"] == 0
    # constant series: zero variance, no flag
    assert _det_grubbs(np.full(10, 7, dtype=np.int64))["n_anomalies"] == 0
    # formula cross-check against the plain-float textbook computation
    n = len(x)
    g = np.max(np.abs(x - x.mean())) / x.std(ddof=1)
    lam = grubbs_lambda(n)
    assert (g > lam) == bool(out["n_anomalies"])
    # critical value sanity (published Grubbs table: n=10, alpha=.05 -> 2.290)
    assert abs(grubbs_lambda(10, 0.05) - 2.290) < 5e-3


# --------------------------------------------------------------- A23 ----
def test_tukey_fences_matches_reference(ray_session):
    from anomalydetection_ray.stages.detectors import tukey_batch

    rng = np.random.default_rng(7)

    def qcont(x, p):
        idx = p * (len(x) - 1)
        lo = int(np.floor(idx))
        t = idx - lo
        if lo + 1 >= len(x):
            return float(x[-1])
        return float((1 - t) * x[lo] + t * x[lo + 1])

    rows = []
    for i, n in enumerate([1, 2, 3, 5, 40, 41, 42, 43, 200]):
        rows.append({"doc_id": f"d{i}", "part_id": 0,
                     "tokens": rng.integers(0, 50257, n).tolist()})
    import pyarrow as pa
    batch = pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows]),
        "part_id": pa.array([r["part_id"] for r in rows], type=pa.int32()),
        "tokens": pa.array([r["tokens"] for r in rows],
                           type=pa.list_(pa.int32())),
    })
    got = tukey_batch(batch).to_pandas().set_index("doc_id")
    for i, r in enumerate(rows):
        x = np.sort(np.asarray(r["tokens"], dtype=np.float64))
        q1, q3 = qcont(x, 0.25), qcont(x, 0.75)
        iqr = q3 - q1
        lo, hi = q1 - 1.5 * iqr, q3 + 1.5 * iqr
        row = got.loc[f"d{i}"]
        assert row["n"] == len(x)
        assert row["q1"] == q1 and row["q3"] == q3 and row["iqr"] == iqr
        assert row["n_low_outliers"] == int((x < lo).sum())
        assert row["n_high_outliers"] == int((x > hi).sum())


# ----------------------------------------------------------- A24/A25 ----
def _tok_batch(rows):
    import pyarrow as pa

    return pa.table({
        "doc_id": pa.array([r[0] for r in rows]),
        "part_id": pa.array([0] * len(rows), type=pa.int32()),
        "tokens": pa.array([r[1] for r in rows], type=pa.list_(pa.int32())),
    })


def test_forecast_error_matches_reference(ray_session):
    from anomalydetection_ray.stages.detectors import forecast_error_batch

    rng = np.random.default_rng(3)
    seasonal = [int(100 + 50 * (i % 24 == 0)) for i in range(100)]
    rows = [("noise", rng.integers(0, 1000, 60).tolist()),
            ("seasonal", seasonal),
            ("short", [5, 9]), ("single", [7]), ("flat", [3] * 30)]
    got = forecast_error_batch(_tok_batch(rows), period=24).to_pandas() \
        .set_index("doc_id")
    for name, toks in rows:
        x = np.asarray(toks, dtype=np.int64)
        row = got.loc[name]
        sae1 = int(np.abs(np.diff(x)).sum()) if len(x) > 1 else 0
        saep = int(np.abs(x[24:] - x[:-24]).sum()) if len(x) > 24 else 0
        assert row["sae_naive"] == sae1
        assert row["n_naive"] == max(len(x) - 1, 0)
        assert row["sae_seasonal"] == saep
        assert row["n_seasonal"] == max(len(x) - 24, 0)
        if len(x) > 24 and sae1 > 0:
            mae1 = float(sae1) / float(len(x) - 1)
            maep = float(saep) / float(len(x) - 24)
            assert row["mase_ratio"] == maep / mae1
        else:
            assert pd.isna(row["mase_ratio"])
    # the periodic series beats its own naive baseline through the lag
    assert got.loc["seasonal", "sae_seasonal"] == 0


def test_turning_points_matches_reference(ray_session):
    from anomalydetection_ray.stages.detectors import turning_points_batch

    rng = np.random.default_rng(4)
    rows = [("noise", rng.integers(0, 1000, 80).tolist()),
            ("mono", list(range(50))),
            ("zigzag", [0, 9] * 20), ("short", [1, 2]), ("flat", [5] * 10)]
    got = turning_points_batch(_tok_batch(rows)).to_pandas() \
        .set_index("doc_id")
    for name, toks in rows:
        x = np.asarray(toks, dtype=np.int64)
        nmx = sum(1 for i in range(1, len(x) - 1)
                  if x[i] > x[i - 1] and x[i] > x[i + 1])
        nmn = sum(1 for i in range(1, len(x) - 1)
                  if x[i] < x[i - 1] and x[i] < x[i + 1])
        row = got.loc[name]
        assert row["n_local_max"] == nmx, name
        assert row["n_local_min"] == nmn, name
        assert row["n_turning_points"] == nmx + nmn
    assert got.loc["mono", "n_turning_points"] == 0
    assert got.loc["zigzag", "n_turning_points"] == 38


# ---------------------------------------------------------------- C4 ----
def test_dedup_packing_matches_reference(ray_session):
    from anomalydetection_ray.pipelines.packing import c4_dedup_packing

    SEQ = 1024
    got = c4_dedup_packing(SF, seq_len=SEQ).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    docs = _docs_df().sort_values("doc_id")
    keep = docs.groupby(docs["text"]).doc_id.transform("min") == docs["doc_id"]
    kept = docs[keep].reset_index(drop=True)
    n_tok = kept["text"].map(
        lambda t: sum(1 for w in t.split(" ") if w != "")).to_numpy()
    off = np.concatenate(([0], np.cumsum(n_tok)[:-1]))
    assert len(got) == len(kept)
    assert (got["doc_id"].to_numpy() == kept["doc_id"].to_numpy()).all()
    assert (got["n_tok"].to_numpy() == n_tok).all()
    assert (got["tok_offset"].to_numpy() == off).all()
    assert (got["seq_id"].to_numpy() == off // SEQ).all()


# --------------------------------------------------------------- A26 ----
def test_acf_table_matches_numpy(ray_session):
    from anomalydetection_ray.stages.detectors import acf_table_batch

    rng = np.random.default_rng(9)
    periodic = [int(100 + 50 * ((i % 12) == 0)) for i in range(96)]
    rows = [("noise", rng.integers(0, 1000, 64).tolist()),
            ("periodic", periodic), ("short", [1, 2]), ("flat", [5] * 30)]
    got = (acf_table_batch(_tok_batch(rows), lags=(1, 12)).to_pandas()
           .set_index(["doc_id", "lag"]))
    for name, toks in rows:
        x = np.asarray(toks, dtype=np.float64)
        n = len(x)
        for L in (1, 12):
            row = got.loc[(name, L)]
            assert row["n"] == n
            assert row["n_pairs"] == max(n - L, 0)
            if n <= L or x.var() == 0:
                assert pd.isna(row["acf"])
            else:
                xc = x - x.mean()
                ref = (xc[:-L] * xc[L:]).sum() / (xc * xc).sum()
                assert abs(row["acf"] - ref) < 1e-9
    # the period-12 series shows the seasonal spike at its lag
    assert (got.loc[("periodic", 12), "acf"]
            > got.loc[("periodic", 1), "acf"] + 0.5)
