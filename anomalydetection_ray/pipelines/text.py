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


def lang_id_batch(batch: pa.Table) -> pa.Table:
    """Stopword-ratio language heuristic -> (doc_id, pred_lang, confidence)."""
    preds, confs = [], []
    for text in batch.column("text").to_pylist():
        words = [w.lower() for w in _WS_RE.split(text) if w]
        if not words:
            preds.append("unknown")
            confs.append(0.0)
            continue
        wset = words[:2000]
        best_lang, best = "unknown", 0.0
        for lang, sw in _STOPWORDS.items():
            hits = sum(1 for w in wset if w in sw)
            ratio = hits / len(wset)
            if ratio > best:
                best_lang, best = lang, ratio
        if best < 0.02:
            best_lang = "unknown"
        preds.append(best_lang)
        confs.append(best)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "pred_lang": pa.array(preds, type=pa.string()),
            "confidence": pa.array(confs, type=pa.float64()),
        }
    )


def quality_batch(batch: pa.Table) -> pa.Table:
    """Deterministic quality facets per doc.  Integer counts + single
    divisions so the SQL oracle can reproduce them bit-for-bit:
      n_bytes     = octet_length(text)
      alpha_ratio = alpha_chars / n_bytes        (ASCII [A-Za-z], on bytes)
      ws_tokens   = length(split on \\s+) incl. boundary empties (DuckDB
                    string_split_regex semantics)
    plus a composite quality_score (rows-only facet)."""
    texts = batch.column("text").to_pylist()
    n_bytes, alpha, ws_tokens, score = [], [], [], []
    for t in texts:
        b = t.encode("utf-8")
        nb = len(b)
        a = sum(1 for c in b if (65 <= c <= 90) or (97 <= c <= 122))
        toks = _WS_RE.split(t)
        n_bytes.append(nb)
        alpha.append(a)
        ws_tokens.append(len(toks))
        words = [w for w in toks if w]
        mean_w = (sum(len(w) for w in words) / len(words)) if words else 0.0
        ar = a / nb if nb else 0.0
        s = 0.0
        if nb:
            s = max(0.0, min(1.0, 0.5 * ar + 0.3 * min(mean_w / 8.0, 1.0) + 0.2 * min(nb / 2000.0, 1.0)))
        score.append(s)
    nb_arr = np.array(n_bytes, dtype=np.int64)
    al_arr = np.array(alpha, dtype=np.int64)
    with np.errstate(invalid="ignore"):
        ar_arr = np.where(nb_arr > 0, al_arr / np.maximum(nb_arr, 1), 0.0)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_bytes": pa.array(nb_arr, type=pa.int64()),
            "alpha_chars": pa.array(al_arr, type=pa.int64()),
            "alpha_ratio": pa.array(ar_arr, type=pa.float64()),
            "ws_tokens": pa.array(np.array(ws_tokens, dtype=np.int64), type=pa.int64()),
            "quality_score": pa.array(score, type=pa.float64()),
        }
    )


def token_count_batch(batch: pa.Table) -> pa.Table:
    """Token counting: whitespace words + a BPE-ish regex segmentation
    ([A-Za-z]+ | digit | single punct)."""
    words, bpe = [], []
    for t in batch.column("text").to_pylist():
        words.append(sum(1 for w in _WS_RE.split(t) if w))
        bpe.append(len(_BPE_RE.findall(t)))
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "word_count": pa.array(words, type=pa.int64()),
            "bpe_count": pa.array(bpe, type=pa.int64()),
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
