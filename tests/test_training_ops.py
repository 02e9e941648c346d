"""Training-data extras: dedup family, ANN, text analysis, multimodal
plumbing, detector registry."""

import numpy as np
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def test_minhash_similarity_estimates():
    from anomalydetection_ray.pipelines.dedup import minhash_signature

    a = "the quick brown fox jumps over the lazy dog " * 20
    b = a.replace("lazy", "sleepy")
    c = "completely different content with other words entirely " * 20
    sab = float((minhash_signature(a) == minhash_signature(b)).mean())
    sac = float((minhash_signature(a) == minhash_signature(c)).mean())
    assert sab > 0.6
    assert sac < 0.2
    # deterministic
    assert np.array_equal(minhash_signature(a), minhash_signature(a))


def test_simhash_near_dup():
    from anomalydetection_ray.pipelines.dedup import simhash64

    a = "the quick brown fox jumps over the lazy dog " * 10
    b = a + "tail"
    ham = bin(simhash64(a) ^ simhash64(b)).count("1")
    assert ham <= 8
    assert simhash64(a) == simhash64(a)


def test_exact_dedup_ray(ray_session):
    from anomalydetection_ray.pipelines.dedup import exact_dedup

    rows = exact_dedup(SF).take_all()
    # all driver docs are distinct at sf0.001 -> one group per doc
    assert len(rows) == len({(r["h1"], r["h2"]) for r in rows})
    assert all(isinstance(r["doc_id"], int) for r in rows)


def test_content_hash128_matches_scalar_reference():
    import pyarrow as pa

    from anomalydetection_ray.pipelines.dedup import (_CH_C1, _CH_C2,
                                                      content_hash_cols)

    def ref(text: str, c: int) -> int:
        h = 0
        for b in text.encode("utf-8"):
            h = (h * c + b) % (1 << 64)
        return h - (1 << 64) if h >= (1 << 63) else h

    texts = ["hello world", "a", "", "hello world", "x" * 1000,
             "The quick brown fox! 123", "élève café"]
    t = pa.table({"text": pa.array(texts, type=pa.string())})
    h1, h2 = content_hash_cols(t)
    assert h1.to_pylist() == [ref(s, int(_CH_C1)) for s in texts]
    assert h2.to_pylist() == [ref(s, int(_CH_C2)) for s in texts]
    # equal content -> equal hash; distinct content -> distinct hash here
    assert h1[0] == h1[3] and h2[0] == h2[3]
    assert len({(a, b) for a, b in zip(h1.to_pylist(), h2.to_pylist())}) \
        == len(texts) - 1


def test_ann_bruteforce_vs_lsh(ray_session):
    from anomalydetection_ray.pipelines.similarity import ann_topk_bruteforce, ann_topk_lsh

    bf = ann_topk_bruteforce(SF, k=10).take_all()
    assert len(bf) == 10
    sims = [r["cosine"] for r in bf]
    assert sims == sorted(sims, reverse=True)
    lsh = ann_topk_lsh(SF, k=10).take_all()
    assert 0 < len(lsh) <= 10
    # LSH recall: its candidates are a subset ordering of true cosine space,
    # and the top-1 of the probed neighborhood should be a strong neighbor
    bf_ids = [r["vec_id"] for r in bf]
    assert any(r["vec_id"] in bf_ids for r in lsh)


def test_text_ops(ray_session):
    from anomalydetection_ray.pipelines.text import (
        fingerprint_batch,
        lang_id_batch,
        quality_batch,
        token_count_batch,
    )

    batch = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], type=pa.int64()),
            "text": [
                "the cat and the dog sat in the house for a while",
                "",
                "der hund und die katze ist nicht in den haus mit",
            ],
        }
    )
    lang = lang_id_batch(batch)
    assert lang.column("pred_lang").to_pylist()[0] == "en"
    assert lang.column("pred_lang").to_pylist()[1] == "unknown"
    assert lang.column("pred_lang").to_pylist()[2] == "de"

    q = quality_batch(batch)
    assert q.column("n_bytes").to_pylist()[1] == 0
    assert 0.0 <= q.column("quality_score").to_pylist()[0] <= 1.0

    t = token_count_batch(batch)
    assert t.column("word_count").to_pylist() == [12, 0, 11]

    f1 = fingerprint_batch(batch)
    f2 = fingerprint_batch(batch)
    assert f1.equals(f2)


def test_multimodal_plumbing(ray_session):
    from anomalydetection_ray.pipelines.multimodal import (
        FEATURE_DIM,
        MediaFeatureExtractor,
        media_features,
    )

    # stub contract: real decode path raises a clear NotImplementedError
    ext = MediaFeatureExtractor(deterministic_fake=False)
    with pytest.raises(NotImplementedError):
        ext._decode(b"xx", "image")

    rows = media_features(SF).take_all()
    assert len(rows) > 0
    assert len(rows[0]["features"]) == FEATURE_DIM
    # deterministic across runs
    rows2 = media_features(SF).take_all()
    key = lambda r: r["media_id"]
    for a, b in zip(sorted(rows, key=key), sorted(rows2, key=key)):
        assert np.allclose(a["features"], b["features"])


def test_detector_registry(ray_session):
    from anomalydetection_ray.stages.detectors import detectors, get_detector, register_detector

    assert {"esd", "threshold", "ewma"} <= set(detectors())
    register_detector("custom", lambda v: {"n_anomalies": 0, "anomaly_positions": []})
    assert "custom" in detectors()
    rng = np.random.default_rng(0)
    base = rng.integers(0, 20, 200).astype(np.int32)
    series = np.concatenate([base, np.array([100000], dtype=np.int32)])
    out = get_detector("esd")(series)
    assert out["n_anomalies"] >= 1
    assert 200 in out["anomaly_positions"]
    # MAD == 0 degenerate series (constant + spike): robust scale collapses,
    # S-H-ESD cannot standardize -> defined as 0 anomalies (documented)
    degen = np.concatenate([np.full(200, 7, dtype=np.int32), np.array([100000], dtype=np.int32)])
    assert get_detector("esd")(degen)["n_anomalies"] == 0


def test_iter_pair_tiles_covers_all_pairs():
    import numpy as np

    from anomalydetection_ray.pipelines.dedup import iter_pair_tiles

    for n in (0, 1, 2, 5, 37, 100):
        got = set()
        for ii, jj in iter_pair_tiles(n, max_pairs=17):
            assert (jj > ii).all()
            got |= set(zip(ii.tolist(), jj.tolist()))
        ti, tj = np.triu_indices(n, 1)
        assert got == set(zip(ti.tolist(), tj.tolist()))


def test_minhash_lsh_pipeline_matches_reference(ray_session):
    """The banded/no-signature-shuffle pipeline returns exactly the pairs a
    direct computation of the LSH semantics gives: (a, b) such that some
    band's signature slice matches AND full-signature est >= min_est."""
    import pyarrow.parquet as pq

    from anomalydetection_ray.pipelines.dedup import (
        _BANDS,
        _ROWS_PER_BAND,
        minhash_lsh_pairs,
        minhash_signature,
    )

    sf = "/root/testdata/sf0.001"
    t = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    ids = t.column("doc_id").to_pylist()
    sigs = {d: minhash_signature(x) for d, x in zip(ids, t.column("text").to_pylist())}
    min_est = 0.5
    expected = set()
    sids = sorted(ids)
    for x in range(len(sids)):
        for y in range(x + 1, len(sids)):
            a, b = sids[x], sids[y]
            sa, sb = sigs[a], sigs[b]
            banded = any(
                np.array_equal(sa[k * _ROWS_PER_BAND:(k + 1) * _ROWS_PER_BAND],
                               sb[k * _ROWS_PER_BAND:(k + 1) * _ROWS_PER_BAND])
                for k in range(_BANDS)
            )
            if banded and float((sa == sb).mean()) >= min_est:
                expected.add((a, b))
    got_rows = minhash_lsh_pairs(sf, min_est=min_est).take_all()
    got = {(min(r["doc_a"], r["doc_b"]), max(r["doc_a"], r["doc_b"])) for r in got_rows}
    assert len(got_rows) == len(got)  # no duplicate pairs
    assert got == expected
    for r in got_rows:
        sa, sb = sigs[r["doc_a"]], sigs[r["doc_b"]]
        assert r["est_jaccard"] == float((sa == sb).mean())


def test_embedding_pairs_bucket_join_exact(ray_session):
    """The bucket-pair self-join equals a direct all-pairs cosine filter."""
    import pyarrow.parquet as pq

    from anomalydetection_ray.pipelines.dedup import embedding_dup_pairs

    sf = "/root/testdata/sf0.001"
    t = pq.read_table(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(t.column("vec_id"), dtype=np.int64)
    m = np.stack([np.asarray(e, dtype=np.float64) for e in t.column("embedding").to_pylist()])
    m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
    sims = m @ m.T
    thr = 0.3
    expected = set()
    for i in range(len(ids)):
        for j in range(len(ids)):
            if ids[i] < ids[j] and sims[i, j] >= thr:
                expected.add((int(ids[i]), int(ids[j])))
    # force multiple buckets so cross-bucket blocks are exercised
    rows = embedding_dup_pairs(sf, min_cosine=thr, num_buckets=7).take_all()
    got = {(r["vec_a"], r["vec_b"]) for r in rows}
    assert len(rows) == len(got)
    assert got == expected


def test_embedding_lsh_pairs_parity(ray_session):
    """The banded-LSH scale path equals banding replicated in numpy and is
    a SUBSET of the all-pairs surface (precision 1.0); the surviving pairs
    carry the same cosine decision as the exact path."""
    import pyarrow.parquet as pq

    from anomalydetection_ray.pipelines.dedup import (
        _EMB_Q, _emb_planes, embedding_lsh_pairs)

    sf = "/root/testdata/sf0.001"
    n_bands, band_bits, thr = 8, 8, 0.3
    t = pq.read_table(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(t.column("vec_id"), dtype=np.int64)
    m = np.stack([np.asarray(e, dtype=np.float64)
                  for e in t.column("embedding").to_pylist()])
    planes = _emb_planes(n_bands * band_bits, m.shape[1])
    q = np.floor(m * _EMB_Q + 0.5).astype(np.int64)
    bits = (q @ planes.T) > 0
    w = np.int64(1) << np.arange(band_bits, dtype=np.int64)
    keys = (bits.reshape(len(ids), n_bands, band_bits) * w).sum(axis=2)
    mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
    sims = mn @ mn.T
    expected = set()
    all_pairs = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if sims[i, j] >= thr:
                all_pairs.add((int(ids[i]), int(ids[j])))
                if (keys[i] == keys[j]).any():
                    expected.add((int(ids[i]), int(ids[j])))
    rows = embedding_lsh_pairs(sf, min_cosine=thr, n_bands=n_bands,
                               band_bits=band_bits).take_all()
    got = {(r["vec_a"], r["vec_b"]) for r in rows}
    assert len(rows) == len(got)  # no duplicate pairs
    assert got == expected
    assert got <= all_pairs  # precision 1.0 vs the exact all-pairs surface
    for r in rows:
        assert r["cosine"] >= thr


def test_embedding_lsh_pairs_planted_recall(ray_session, tmp_path):
    """Default (16 bands x 16 bits) banding recovers EVERY planted
    near-identical pair at the real near-dup threshold (0.95) on a
    synthetic corpus — the recall audit the scale path is sized for."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from anomalydetection_ray.pipelines.dedup import embedding_lsh_pairs

    rng = np.random.default_rng(7)
    dim, n_base, n_dups = 64, 60, 12
    base = rng.standard_normal((n_base, dim))
    # planted dups: tiny perturbation of the first n_dups base vectors
    dup = base[:n_dups] + 0.01 * rng.standard_normal((n_dups, dim))
    m = np.vstack([base, dup]).astype(np.float32)
    ids = np.arange(m.shape[0], dtype=np.int64)
    tab = pa.table({
        "vec_id": pa.array(ids, type=pa.int64()),
        "embedding": pa.array([row for row in m],
                              type=pa.list_(pa.float32())),
        "label": pa.array(np.zeros(len(ids), dtype=np.int32), type=pa.int32()),
    })
    pq.write_table(tab, str(tmp_path / "embeddings.parquet"))
    mn = m.astype(np.float64)
    mn /= np.maximum(np.linalg.norm(mn, axis=1, keepdims=True), 1e-30)
    sims = mn @ mn.T
    planted = {(int(i), int(n_base + i)) for i in range(n_dups)
               if sims[i, n_base + i] >= 0.95}
    assert len(planted) == n_dups  # the perturbation keeps cosine >= 0.95
    rows = embedding_lsh_pairs(str(tmp_path), min_cosine=0.95).take_all()
    got = {(r["vec_a"], r["vec_b"]) for r in rows}
    assert planted <= got  # recall 1.0 on planted near-dups
    for r in rows:  # and nothing below the threshold leaks through
        assert sims[r["vec_a"], r["vec_b"]] >= 0.95


def _random_token_batch(rng, nrows, max_len, with_nulls=False, long_row=False):
    import pyarrow as pa

    rows = []
    for i in range(nrows):
        ln = int(rng.integers(0, max_len))
        if long_row and i == 0:
            ln = 9000  # crosses multiple ewma blocks (bmax<=4096)
        toks = rng.integers(0, 50257, ln).astype(np.int32).tolist()
        if with_nulls and ln > 3:
            toks[1] = None
            toks[ln // 2] = None
        rows.append({"doc_id": f"d{i}", "source": "s", "part_id": 0,
                     "n_tok": ln, "tokens": toks})
    return pa.Table.from_pylist(rows)


def test_detector_fast_paths_match_registry():
    """The vectorized flat-buffer threshold/ewma batch kernels must be
    bit-identical to the per-row registry detectors."""
    import pyarrow as pa

    from anomalydetection_ray.stages.detectors import (
        _det_ewma_resid,
        _det_mad,
        _det_threshold,
        detect_batch,
    )

    rng = np.random.default_rng(3)
    for with_nulls in (False, True):
        batch = _random_token_batch(rng, 40, 700, with_nulls=with_nulls, long_row=True)
        toks = batch.column("tokens").combine_chunks()
        for det, fn in (("threshold", _det_threshold), ("ewma", _det_ewma_resid),
                        ("mad", _det_mad)):
            out = detect_batch(batch, detector=det)
            for i in range(batch.num_rows):
                arr = toks[i].values
                vals = np.asarray(arr.fill_null(0) if arr.null_count else arr,
                                  dtype=np.int32) if len(arr) else np.empty(0, np.int32)
                ref = fn(vals)
                p = np.asarray(ref["anomaly_positions"], dtype=np.int64)
                assert out.column("n_anomalies")[i].as_py() == ref["n_anomalies"], (det, i)
                assert out.column("pos_sum")[i].as_py() == int(p.sum()), (det, i)
                assert out.column("pos_sumsq")[i].as_py() == int((p * p).sum()), (det, i)


def test_detector_fast_path_respects_overrides():
    """register_detector('ewma', custom) must win over the vectorized fast
    path, and a typo'd keyword must raise instead of being dropped."""
    import pytest

    from anomalydetection_ray.stages import detectors as D

    rng = np.random.default_rng(7)
    batch = _random_token_batch(rng, 5, 80, with_nulls=False, long_row=False)

    def custom(values, **params):
        return {"n_anomalies": 7, "anomaly_positions": np.array([1, 2])}

    saved = D.get_detector("ewma")
    try:
        D.register_detector("ewma", custom)
        out = D.detect_batch(batch, detector="ewma")
        assert out.column("n_anomalies").to_pylist() == [7] * batch.num_rows
    finally:
        D.register_detector("ewma", saved)

    with pytest.raises(TypeError, match="unexpected params"):
        D.detect_batch(batch, detector="threshold", windw=10)


def test_ewma_flat_matches_scalar():
    from anomalydetection_ray.functions.stats import ewma, ewma_flat

    rng = np.random.default_rng(9)
    for alpha in (0.1, 0.5, 0.9, 1.5, -0.1):
        lens = [0, 1, 2, 5, 300, 9000, 4096, 4097]
        xs = [rng.standard_normal(ln) * 1000 for ln in lens]
        flat = np.concatenate(xs) if xs else np.empty(0)
        offsets = np.concatenate(([0], np.cumsum([ln for ln in lens]))).astype(np.int64)
        got = ewma_flat(flat, offsets, alpha)
        for i, x in enumerate(xs):
            if len(x) == 0:
                continue
            expect = ewma(x, alpha)
            seg = got[offsets[i]:offsets[i + 1]]
            assert np.array_equal(seg, expect), (alpha, lens[i])


def test_media_real_audio_decode_path():
    """The audio decode path is REAL (stdlib wave): a generated WAV payload
    produces the expected bucketed mean-|amplitude| features."""
    import io
    import wave

    from anomalydetection_ray.pipelines.multimodal import FEATURE_DIM, MediaFeatureExtractor

    rng = np.random.default_rng(5)
    samples = (rng.standard_normal(8000) * 3000).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(samples.tobytes())
    payload = buf.getvalue()

    ext = MediaFeatureExtractor(deterministic_fake=False)
    feats = ext._decode(payload, "audio")
    assert feats.shape == (FEATURE_DIM,)
    x = np.abs(samples.astype(np.float64))
    edges = (np.arange(FEATURE_DIM + 1) * x.shape[0]) // FEATURE_DIM
    expected = np.add.reduceat(x, edges[:-1]) / np.diff(edges)
    assert np.allclose(feats, expected)
    # non-WAV payload -> clear NotImplementedError, not garbage
    import pytest

    with pytest.raises(NotImplementedError):
        ext._decode(b"not a wav", "audio")
    with pytest.raises(NotImplementedError):
        ext._decode(b"xx", "video")


def test_media_real_image_decode_path():
    """Contract test for the optional-dependency PIL image path: exercised
    for real wherever PIL is importable (skipped, not faked, elsewhere)."""
    import pytest

    PIL_Image = pytest.importorskip("PIL.Image")

    import io

    from anomalydetection_ray.pipelines.multimodal import FEATURE_DIM, MediaFeatureExtractor

    img = PIL_Image.new("L", (32, 32))
    for x in range(32):
        for y in range(32):
            img.putpixel((x, y), (x * 7 + y * 3) % 256)
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    ext = MediaFeatureExtractor(deterministic_fake=False)
    feats = ext._decode(buf.getvalue(), "image")
    assert feats.shape == (FEATURE_DIM,)
    assert abs(feats.mean()) < 1e-9  # standardized


def test_min_label_components_matches_union_find(ray_session):
    """Distributed min-label propagation == a union-find reference on a
    crafted graph: a 6-chain (forces multiple propagation rounds), a
    4-clique, an isolated pair, plus random extra edges."""
    import pyarrow as pa
    import ray.data

    from anomalydetection_ray.stages.cc import min_label_components

    rng = np.random.default_rng(13)
    chain = [(10, 11), (11, 12), (12, 13), (13, 14), (14, 15)]
    clique = [(20, 21), (20, 22), (20, 23), (21, 22), (21, 23), (22, 23)]
    pair = [(30, 31)]
    extra = [(int(a), int(b)) for a, b in
             zip(rng.integers(40, 55, 8), rng.integers(40, 55, 8)) if a != b]
    edges_list = chain + clique + pair + extra
    a = np.array([e[0] for e in edges_list], dtype=np.int64)
    b = np.array([e[1] for e in edges_list], dtype=np.int64)

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent.setdefault(parent[x], parent[x])
            x = parent[x]
        return x

    for x, y in edges_list:
        parent[find(x)] = find(y)
    verts = sorted(set(a.tolist()) | set(b.tolist()))
    comp_min: dict[int, int] = {}
    for v in verts:
        r = find(v)
        comp_min[r] = min(comp_min.get(r, v), v)
    expected = {v: comp_min[find(v)] for v in verts}

    pairs = ray.data.from_arrow(pa.table({"doc_a": a, "doc_b": b}))
    got_rows = min_label_components(pairs, "doc_a", "doc_b",
                                    num_partitions=4).take_all()
    got = {r["doc_id"]: r["cluster"] for r in got_rows}
    assert len(got_rows) == len(got)
    assert got == expected


def test_min_label_components_raises_on_nonconvergence(ray_session):
    """A chain longer than max_rounds cannot reach the fixpoint; the loop
    must raise rather than silently return partially propagated labels."""
    import pyarrow as pa
    import pytest
    import ray.data

    from anomalydetection_ray.stages.cc import min_label_components

    n = 12  # diameter 11 > max_rounds=3
    a = np.arange(n - 1, dtype=np.int64)
    b = a + 1
    pairs = ray.data.from_arrow(pa.table({"doc_a": a, "doc_b": b}))
    with pytest.raises(RuntimeError, match="fixpoint"):
        min_label_components(pairs, "doc_a", "doc_b",
                             num_partitions=2, max_rounds=3).take_all()


def test_ngram_verify_batch_matches_python_sets():
    """Vectorized gram_sets/ngram_verify_batch == the scalar Python-set
    reference (tuple 3-grams of lowercased \\w+ words) on adversarial
    texts: repeats, short rows, empties, punctuation."""
    import re

    import pyarrow as pa

    from anomalydetection_ray.pipelines.dedup import ngram_verify_batch

    rng = np.random.default_rng(3)
    words = ["alpha", "beta", "Gamma", "delta", "x1", "Y_2", "zz"]
    texts = ["", "one", "two words", "a b", "a a a a a a"]
    for _ in range(30):
        k = int(rng.integers(3, 40))
        texts.append(" ".join(rng.choice(words, k)) + rng.choice([".", "!?", ""]))
    n_t = len(texts)
    pairs_a, pairs_b = [], []
    for i in range(n_t):
        for j in range(n_t):
            if i != j:
                pairs_a.append(i)
                pairs_b.append(j)
    batch = pa.table({
        "doc_a": pa.array(pairs_a, type=pa.int64()),
        "doc_b": pa.array(pairs_b, type=pa.int64()),
        "_text_a": pa.array([texts[i] for i in pairs_a]),
        "_text_b": pa.array([texts[j] for j in pairs_b]),
    })
    out = ngram_verify_batch(batch, n=3, min_jaccard=0.0)
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in out.to_pylist()}

    def grams(t):
        ws = re.findall(r"\w+", t.lower())
        return frozenset(tuple(ws[i:i + 3]) for i in range(max(0, len(ws) - 2)))

    for i, j in zip(pairs_a, pairs_b):
        sa, sb = grams(texts[i]), grams(texts[j])
        union = len(sa | sb)
        ref = (len(sa & sb) / union) if union else 0.0
        assert got[(i, j)] == ref, (i, j, got[(i, j)], ref)


def test_media_real_video_decode_path():
    """Contract test for the optional-PyAV video path (auto-skips without
    the bindings, like the PIL image test): encode a tiny synthetic clip,
    decode through the extractor, check shape + standardization."""
    av = pytest.importorskip("av")

    import io

    from anomalydetection_ray.pipelines.multimodal import FEATURE_DIM, MediaFeatureExtractor

    buf = io.BytesIO()
    with av.open(buf, mode="w", format="mp4") as container:
        stream = container.add_stream("mpeg4", rate=4)
        stream.width, stream.height = 32, 32
        stream.pix_fmt = "yuv420p"
        for t in range(12):
            frame = np.zeros((32, 32, 3), dtype=np.uint8)
            frame[:, : (t * 3) % 32] = 255
            vf = av.VideoFrame.from_ndarray(frame, format="rgb24")
            for pkt in stream.encode(vf):
                container.mux(pkt)
        for pkt in stream.encode():
            container.mux(pkt)
    ext = MediaFeatureExtractor(deterministic_fake=False)
    feats = ext._decode(buf.getvalue(), "video")
    assert feats.shape == (FEATURE_DIM,)
    assert np.isfinite(feats).all()


def test_media_video_without_bindings_raises():
    """Without PyAV the video path must raise NotImplementedError (never
    silently fake)."""
    from anomalydetection_ray.pipelines.multimodal import MediaFeatureExtractor

    ext = MediaFeatureExtractor(deterministic_fake=False)
    if ext._av is not None:
        pytest.skip("PyAV present; the raising contract is moot")
    with pytest.raises(NotImplementedError, match="PyAV"):
        ext._decode(b"\x00\x01", "video")


# ---------------------------------------------------------------- K5 ----
def test_dim_standardize_matches_numpy(ray_session):
    import math

    import numpy as np
    import pyarrow.parquet as pq

    from anomalydetection_ray.pipelines.kmeans import ESCALE, k5_dim_standardize

    SF = "/root/testdata/sf0.001"
    got = k5_dim_standardize(SF).to_pandas().set_index("dim").sort_index()
    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["embedding"])
    emb = t.column("embedding").combine_chunks()
    ef = np.asarray(emb.values, dtype=np.float64).reshape(len(t), -1)
    q = np.floor(ef * ESCALE + 0.5).astype(np.int64)
    assert len(got) == q.shape[1]
    for d in range(q.shape[1]):
        row = got.loc[d]
        n, s, s2 = q.shape[0], int(q[:, d].sum()), int((q[:, d] ** 2).sum())
        assert row["n"] == n and row["sum_q"] == s and row["sumsq_q"] == s2
        ex = float(s) / float(n)
        ex2 = float(s2) / float(n)
        assert row["mean"] == ex / float(ESCALE)
        assert row["std"] == math.sqrt(ex2 - ex * ex) / float(ESCALE)
        # sanity: std close to numpy's
        assert abs(row["std"] - ef[:, d].std()) < 1e-5


# ---------------------------------------------------------------- K6 ----
def test_dim_correlation_matches_numpy(ray_session):
    import math

    import numpy as np
    import pyarrow.parquet as pq

    from anomalydetection_ray.pipelines.kmeans import ESCALE, k6_dim_correlation

    SF = "/root/testdata/sf0.001"
    got = (k6_dim_correlation(SF).to_pandas()
           .set_index(["dim_a", "dim_b"]).sort_index())
    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["embedding"])
    emb = t.column("embedding").combine_chunks()
    ef = np.asarray(emb.values, dtype=np.float64).reshape(len(t), -1)
    q = np.floor(ef[:, :8] * ESCALE + 0.5).astype(np.int64)
    n = q.shape[0]
    assert len(got) == 28
    for i in range(8):
        for j in range(i + 1, 8):
            row = got.loc[(i, j)]
            sx, sy = int(q[:, i].sum()), int(q[:, j].sum())
            sxy = int((q[:, i] * q[:, j]).sum())
            assert row["n"] == n and row["sx"] == sx and row["sy"] == sy
            assert row["sxy"] == sxy
            ex, ey = float(sx) / n, float(sy) / n
            exx = float((q[:, i] ** 2).sum()) / n
            eyy = float((q[:, j] ** 2).sum()) / n
            ref = (float(sxy) / n - ex * ey) / (
                math.sqrt(exx - ex * ex) * math.sqrt(eyy - ey * ey))
            assert row["corr"] == ref
            # near-orthogonal random embeddings: weak correlations
            assert abs(row["corr"]) < 0.5
