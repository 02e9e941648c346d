"""Text-analysis operators for training-data pipelines (driver round-1
extras): language-ID, quality scoring, token counting, document
fingerprinting.  All deterministic, all expressed as stateless or
actor-pool ``map_batches`` stages over the ``documents`` table.
"""

from __future__ import annotations

import re
import zlib

import numpy as np
import pyarrow as pa

_WS_RE = re.compile(r"\s+")
_BPE_RE = re.compile(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]")

# tiny public stopword kernels (language-ID heuristic; not a model)
_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for"},
    "de": {"der", "die", "und", "das", "ist", "nicht", "ein", "mit", "zu", "den"},
    "fr": {"le", "la", "les", "et", "de", "un", "une", "est", "que", "pour"},
    "es": {"el", "la", "los", "y", "de", "un", "una", "es", "que", "por"},
}


def _stopword_hashes() -> dict:
    """Per-language uint64 hash sets under the shared word_hashes family
    (64-bit hashes -> collision odds negligible)."""
    import numpy as _np

    from anomalydetection_ray.pipelines.dedup import word_hashes

    out = {}
    for lang, words in _STOPWORDS.items():
        blob = " ".join(sorted(words)).encode("utf-8")
        flat = _np.frombuffer(blob, dtype=_np.uint8)
        hs, _ = word_hashes(flat, _np.array([0, flat.shape[0]], dtype=_np.int64))
        out[lang] = _np.unique(hs)
    return out


_STOPWORD_HASHES = _stopword_hashes()


def lang_id_batch(batch: pa.Table) -> pa.Table:
    """Stopword-ratio language heuristic -> (doc_id, pred_lang, confidence).
    Vectorized: every word in the batch is hashed once (the shared
    word_hashes tokenizer), stopword membership is an np.isin against
    each language's precomputed hash set, and per-doc hit ratios come
    from reduceat — no per-doc Python.  Only the first 2000 words of a
    doc vote (long-doc cap)."""
    from anomalydetection_ray.pipelines.dedup import word_hashes

    flat, offsets = _flat_utf8(batch)
    nrows = offsets.shape[0] - 1
    hwords, doc_of = word_hashes(flat, offsets)
    langs = sorted(_STOPWORDS)
    best = np.zeros(nrows, dtype=np.float64)
    best_lang = np.zeros(nrows, dtype=np.int64) - 1
    if hwords.shape[0]:
        dseg_all = np.concatenate(
            (np.zeros(1, dtype=np.int64), np.flatnonzero(doc_of[1:] != doc_of[:-1]) + 1)
        )
        docs_present = doc_of[dseg_all]
        # cap: word rank within its doc < 2000
        rank = np.arange(doc_of.shape[0], dtype=np.int64)
        rank -= np.repeat(dseg_all, np.diff(np.concatenate((dseg_all, [doc_of.shape[0]]))))
        keep = rank < 2000
        hw, dk = hwords[keep], doc_of[keep]
        dseg = np.concatenate(
            (np.zeros(1, dtype=np.int64), np.flatnonzero(dk[1:] != dk[:-1]) + 1)
        )
        docs = dk[dseg]
        nw = np.diff(np.concatenate((dseg, [dk.shape[0]])))
        for li, lang in enumerate(langs):
            hits = np.add.reduceat(np.isin(hw, _STOPWORD_HASHES[lang]).astype(np.int64), dseg)
            ratio = hits / nw
            upd = ratio > best[docs]
            bd = docs[upd]
            best[bd] = ratio[upd]
            best_lang[bd] = li
    conf_ok = best >= 0.02
    preds = np.where(
        conf_ok & (best_lang >= 0),
        np.array(langs, dtype=object)[np.maximum(best_lang, 0)],
        "unknown",
    )
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "pred_lang": pa.array(preds.tolist(), type=pa.string()),
            "confidence": pa.array(best, type=pa.float64()),
        }
    )


def _flat_utf8(batch: pa.Table, col: str = "text") -> tuple[np.ndarray, np.ndarray]:
    """(flat uint8 buffer, rebased int64 offsets) of a string column —
    zero-copy view of the Arrow data buffer."""
    text = batch.column(col)
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    text = text.cast(pa.binary())
    offsets = np.frombuffer(text.buffers()[1], dtype=np.int32,
                            count=len(text) + 1, offset=text.offset * 4).astype(np.int64)
    flat = np.frombuffer(text.buffers()[2], dtype=np.uint8, count=int(offsets[-1]))
    base = offsets[0]
    offsets = offsets - base
    return flat[base : base + int(offsets[-1])], offsets


# ASCII byte classes (vectorized lookup tables).  \s here is the ASCII
# whitespace set; multi-byte UTF-8 never collides (those bytes are >= 0x80)
_IS_ALPHA = np.zeros(256, dtype=bool)
_IS_ALPHA[65:91] = _IS_ALPHA[97:123] = True
_IS_WS = np.zeros(256, dtype=bool)
_IS_WS[[9, 10, 11, 12, 13, 32]] = True
_IS_DIGIT = np.zeros(256, dtype=bool)
_IS_DIGIT[48:58] = True
_IS_CONT = np.zeros(256, dtype=bool)
_IS_CONT[0x80:0xC0] = True  # UTF-8 continuation bytes (not characters)


def _runs_per_row(mask: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Per-row count of maximal True-runs in ``mask`` (row-boundary-aware)."""
    n = mask.shape[0]
    if n == 0:
        return np.zeros(offsets.shape[0] - 1, dtype=np.int64)
    start = np.empty(n, dtype=bool)
    start[0] = mask[0]
    start[1:] = mask[1:] & ~mask[:-1]
    start[offsets[:-1][offsets[:-1] < n]] = mask[offsets[:-1][offsets[:-1] < n]]
    counts = np.zeros(offsets.shape[0] - 1, dtype=np.int64)
    lens = np.diff(offsets)
    nz = lens > 0
    counts[nz] = np.add.reduceat(start.astype(np.int64), offsets[:-1][nz])
    return counts


def quality_batch(batch: pa.Table) -> pa.Table:
    """Deterministic quality facets per doc.  Integer counts + single
    divisions so the SQL oracle can reproduce them bit-for-bit:
      n_bytes     = octet_length(text)
      alpha_ratio = alpha_chars / n_bytes        (ASCII [A-Za-z], on bytes)
      ws_tokens   = length(split on \\s+) incl. boundary empties (DuckDB
                    string_split_regex semantics: separator-run count + 1)
    plus a composite quality_score (rows-only facet).  All counts come
    from byte-class masks + reduceat over the flat buffer — no per-doc
    Python."""
    flat, offsets = _flat_utf8(batch)
    nb_arr = np.diff(offsets)
    nrows = nb_arr.shape[0]
    nz = nb_arr > 0
    alpha_m = _IS_ALPHA[flat]
    al_arr = np.zeros(nrows, dtype=np.int64)
    al_arr[nz] = np.add.reduceat(alpha_m.astype(np.int64), offsets[:-1][nz])
    ws_m = _IS_WS[flat]
    ws_runs = _runs_per_row(ws_m, offsets)
    ws_tokens = ws_runs + 1  # split() length == separator runs + 1
    word_runs = _runs_per_row(~ws_m, offsets)
    word_bytes = np.zeros(nrows, dtype=np.int64)
    word_bytes[nz] = np.add.reduceat((~ws_m).astype(np.int64), offsets[:-1][nz])
    with np.errstate(invalid="ignore", divide="ignore"):
        ar_arr = np.where(nb_arr > 0, al_arr / np.maximum(nb_arr, 1), 0.0)
        mean_w = np.where(word_runs > 0, word_bytes / np.maximum(word_runs, 1), 0.0)
    score = np.clip(
        0.5 * ar_arr
        + 0.3 * np.minimum(mean_w / 8.0, 1.0)
        + 0.2 * np.minimum(nb_arr / 2000.0, 1.0),
        0.0,
        1.0,
    )
    score = np.where(nb_arr > 0, score, 0.0)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_bytes": pa.array(nb_arr, type=pa.int64()),
            "alpha_chars": pa.array(al_arr, type=pa.int64()),
            "alpha_ratio": pa.array(ar_arr, type=pa.float64()),
            "ws_tokens": pa.array(ws_tokens, type=pa.int64()),
            "quality_score": pa.array(score, type=pa.float64()),
        }
    )


def token_count_batch(batch: pa.Table) -> pa.Table:
    """Token counting: whitespace words + a BPE-ish segmentation
    ([A-Za-z]+ | digit | single non-alnum-non-ws char), both as
    byte-class run/point counts over the flat buffer (UTF-8 continuation
    bytes excluded so multi-byte chars count once, matching the regex)."""
    flat, offsets = _flat_utf8(batch)
    nrows = offsets.shape[0] - 1
    nz = np.diff(offsets) > 0
    ws_m = _IS_WS[flat]
    words = _runs_per_row(~ws_m, offsets)
    alpha_m = _IS_ALPHA[flat]
    alpha_runs = _runs_per_row(alpha_m, offsets)
    other_m = ~alpha_m & ~ws_m & ~_IS_DIGIT[flat] & ~_IS_CONT[flat]
    pts = (_IS_DIGIT[flat] | other_m).astype(np.int64)
    points = np.zeros(nrows, dtype=np.int64)
    points[nz] = np.add.reduceat(pts, offsets[:-1][nz])
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "word_count": pa.array(words, type=pa.int64()),
            "bpe_count": pa.array(alpha_runs + points, type=pa.int64()),
        }
    )


_FP_WINDOW = 16
_FP_KEEP_MOD = 8
_FP_K = 8


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """Rolling-hash document fingerprint (winnowing-style): crc32 over a
    sliding byte window, keep hashes == 0 mod _FP_KEEP_MOD, fingerprint =
    hex of the _FP_K smallest kept hashes (order-stable, deterministic)."""
    fps = []
    for t in batch.column("text").to_pylist():
        b = t.encode("utf-8")
        if len(b) < _FP_WINDOW:
            fps.append(f"{zlib.crc32(b):08x}")
            continue
        arr = np.frombuffer(b, dtype=np.uint8)
        # vectorized rolling polynomial hash (mod 2^32)
        mult = np.uint32(1103515245)
        h = np.zeros(len(arr) - _FP_WINDOW + 1, dtype=np.uint32)
        acc = np.zeros_like(h)
        for k in range(_FP_WINDOW):
            acc = acc * mult + arr[k : k + len(h)].astype(np.uint32)
        h = acc
        kept = np.unique(h[h % _FP_KEEP_MOD == 0])
        if kept.size == 0:
            kept = np.unique(h)[:1]
        sel = kept[:_FP_K]
        fps.append("".join(f"{int(x):08x}" for x in sel))
    return pa.table({"doc_id": batch.column("doc_id"), "fingerprint": pa.array(fps, type=pa.string())})


def lang_id(sf_dir: str):
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(lang_id_batch, batch_format="pyarrow", zero_copy_batch=True)


def quality(sf_dir: str):
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(quality_batch, batch_format="pyarrow", zero_copy_batch=True)


def token_counts(sf_dir: str):
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(token_count_batch, batch_format="pyarrow", zero_copy_batch=True)


def fingerprints(sf_dir: str):
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(fingerprint_batch, batch_format="pyarrow", zero_copy_batch=True)
