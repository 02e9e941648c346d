"""Deterministic fixture `sequences` table (FIXTURES.md F1).

Seed = 42 throughout; per-row seed = 42 XOR row-index.  The shapes mirror
the classic 1-D anomaly-detection demo series of the reference family
(spike / level-shift / trend / periodic / constant) plus the engine's edge
cases (bucket boundaries, nulls, int32 extremes, giant rows, duplicate
doc_ids, corrupt n_tok).  Pure NumPy + pyarrow — no Ray import — so pytest
and the synthetic source share it.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from anomalydetection_ray.constants import DEFAULT_VOCAB, MAX_TOKENS_PER_PART

SEQUENCES_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("tokens", pa.list_(pa.int32())),
        ("n_tok", pa.int32()),
        ("source", pa.string()),
    ]
)

_SOURCES = ("web", "books", "code", "news")


def _rng(row_idx: int) -> np.random.Generator:
    return np.random.default_rng(42 ^ row_idx)


def _source_for(row_idx: int, rng: np.random.Generator) -> str:
    # "web" hot (~80%) for skew tests
    return "web" if rng.random() < 0.8 else _SOURCES[1 + int(rng.integers(0, 3))]


def fixture_rows(include_giant: bool = True, giant_len: int = 2_500_000) -> list[dict]:
    """The ~124-row inventory of FIXTURES.md F1 as python dicts.

    ``tokens`` entries are lists of int-or-None.  ``n_tok`` is deliberately
    wrong for the last family (validator repair path).
    """
    rows: list[dict] = []
    idx = 0

    def add(tokens, n_tok=None, doc_id=None, source=None):
        nonlocal idx
        rng = _rng(idx)
        rows.append(
            {
                "doc_id": doc_id if doc_id is not None else f"doc-{idx:08d}",
                "tokens": tokens,
                "n_tok": n_tok if n_tok is not None else len(tokens),
                "source": source if source is not None else _source_for(idx, rng),
            }
        )
        idx += 1

    # 50x baseline iid uniform
    for _ in range(50):
        rng = _rng(idx)
        n = int(rng.integers(900, 5101))
        add(rng.integers(0, DEFAULT_VOCAB, n).astype(np.int32).tolist())
    # 10x single huge spike near int32 max
    for _ in range(10):
        rng = _rng(idx)
        n = int(rng.integers(1500, 4000))
        v = rng.integers(0, DEFAULT_VOCAB, n).astype(np.int64)
        v[int(rng.integers(0, n))] = 2**31 - 1 - int(rng.integers(0, 5))
        add(v.astype(np.int32).tolist())
    # 10x level shift at mid-series
    for _ in range(10):
        rng = _rng(idx)
        n = int(rng.integers(2000, 4000))
        v = rng.integers(100, 600, n)
        v[n // 2 :] *= 10
        add(v.astype(np.int32).tolist())
    # 10x linear trend + noise
    for _ in range(10):
        rng = _rng(idx)
        n = int(rng.integers(2000, 4000))
        v = (np.arange(n) * 3 + rng.integers(0, 50, n)).astype(np.int32)
        add(v.tolist())
    # 10x periodic + 3 injected spikes
    for _ in range(10):
        rng = _rng(idx)
        n = int(rng.integers(2000, 4000))
        v = (1000 + 500 * np.sin(2 * np.pi * np.arange(n) / 250.0)).astype(np.int32)
        for p in rng.integers(0, n, 3):
            v[int(p)] += 40_000
        add(v.tolist())
    # 5x constant (MAD = 0)
    for _ in range(5):
        rng = _rng(idx)
        add([int(rng.integers(0, DEFAULT_VOCAB))] * int(rng.integers(1200, 2500)))
    # 5x empty
    for _ in range(5):
        add([])
    # 5x bucket-boundary lengths
    for n in (1, 999, 1000, 1001, 10_000):
        rng = _rng(idx)
        add(rng.integers(0, DEFAULT_VOCAB, n).astype(np.int32).tolist())
    # 5x nulls in list (5-20%)
    for _ in range(5):
        rng = _rng(idx)
        n = int(rng.integers(1500, 3000))
        v: list = rng.integers(0, DEFAULT_VOCAB, n).astype(np.int32).tolist()
        frac = 0.05 + 0.15 * rng.random()
        for p in rng.choice(n, int(frac * n), replace=False):
            v[int(p)] = None
        add(v)
    # 3x int32 min/max alternating sign (codec bit edges)
    for _ in range(3):
        rng = _rng(idx)
        n = int(rng.integers(1100, 1400))
        v = np.where(np.arange(n) % 2 == 0, 2**31 - 1, -(2**31)).astype(np.int32)
        add(v.tolist())
    # 2x giant rows (> MAX_TOKENS_PER_PART)
    if include_giant:
        for _ in range(2):
            rng = _rng(idx)
            assert giant_len > MAX_TOKENS_PER_PART
            add(rng.integers(0, DEFAULT_VOCAB, giant_len).astype(np.int32).tolist())
    # 4x duplicate doc_id pairs across sources
    for k in range(2):
        rng = _rng(idx)
        n = int(rng.integers(1200, 2000))
        v = rng.integers(0, DEFAULT_VOCAB, n).astype(np.int32).tolist()
        add(v, doc_id=f"dup-{k:04d}", source="web")
        rng = _rng(idx)
        n = int(rng.integers(1200, 2000))
        add(rng.integers(0, DEFAULT_VOCAB, n).astype(np.int32).tolist(), doc_id=f"dup-{k:04d}", source="books")
    # 5x corrupt n_tok (validator repair)
    for _ in range(5):
        rng = _rng(idx)
        n = int(rng.integers(1200, 2000))
        v = rng.integers(0, DEFAULT_VOCAB, n).astype(np.int32).tolist()
        add(v, n_tok=n + int(rng.integers(1, 50)))
    return rows


def fixture_table(include_giant: bool = True, giant_len: int = 2_500_000) -> pa.Table:
    rows = fixture_rows(include_giant=include_giant, giant_len=giant_len)
    return pa.Table.from_pylist(rows, schema=SEQUENCES_SCHEMA)
