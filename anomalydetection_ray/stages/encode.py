"""E1/E2 encoder stage + E3 decoder (SURVEY.md §2.2, §3 P2).

``EncodePartition`` is a callable CLASS (actor-pool stage): construction
happens once per actor (reusable scratch state), ``__call__`` encodes one
hash partition's rows.  The Gorilla value stream is per (doc_id, part_id)
row — XOR across doc boundaries would be meaningless — while the
delta-of-delta n_tok stream runs across the partition's rows in
deterministic (doc_id, part_id) order, its state carried by a
``DodState`` created per partition (state strictly partition-local, so a
task/actor retry re-encodes the whole partition idempotently — SURVEY.md
§4).  Each finished partition writes its tier0 parquet atomically and
commits a manifest row; the stage's dataset output is the small summary
stream, so nothing re-materializes the encoded bytes downstream.
"""

from __future__ import annotations

import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from anomalydetection_ray.codecs import (
    DodState,
    checksum64,
    gorilla_decode,
    gorilla_decode_ref,
    gorilla_encode,
    state_hash,
)
from anomalydetection_ray.constants import CODEC_VERSION, ENGINE_VERSION
from anomalydetection_ray.functions.stats import gap_fill
from anomalydetection_ray.oracle import TIER0_SCHEMA
from anomalydetection_ray.state.manifest import write_manifest_row

SUMMARY_SCHEMA = pa.schema(
    [
        ("part_id", pa.int32()),
        ("rows_emitted", pa.int64()),
        ("tokens_processed", pa.int64()),
        ("encoded_bytes", pa.int64()),
        ("encoder_state_hash", pa.string()),
        ("wall_s", pa.float64()),
    ]
)


def assign_partition(batch: pa.Table, num_parts: int) -> pa.Table:
    """Deterministic hash partition id per row, vectorized: the same
    fixed-key siphash `pd.util.hash_array` the rest of the engine's
    exchanges use (stages/runs.py) — stable across processes, never
    python hash() (salted per process), never a per-row crc32 loop."""
    import pandas as pd

    c = batch.column("doc_id")
    if isinstance(c, pa.ChunkedArray):
        c = c.combine_chunks()
    h = pd.util.hash_array(np.asarray(c.to_pandas(), dtype=object), categorize=False)
    pids = (h % np.uint64(num_parts)).astype(np.int32)
    return batch.append_column("pid", pa.array(pids, type=pa.int32()))


def encode_rows(batch: pa.Table) -> pa.Table:
    """Encode validated part rows -> tier0 rows (order = input order; the
    DoD n_tok stream runs across the batch in that order)."""
    from anomalydetection_ray.codecs import dod_encode_values

    tokens = batch.column("tokens")
    if isinstance(tokens, pa.ChunkedArray):
        tokens = tokens.combine_chunks()
    n_rows = batch.num_rows
    dod = DodState()
    # per-row variable-size outputs stay Python lists; everything scalar is
    # a NumPy array (the hot per-token work is all inside gorilla_encode)
    n_toks = np.empty(n_rows, dtype=np.int32)
    first_vals = np.zeros(n_rows, dtype=np.int32)
    checksums = np.empty(n_rows, dtype=np.uint64)
    enc_list: list[bytes] = []
    bitmaps: list[bytes | None] = []
    for i in range(n_rows):
        arr = tokens[i].values
        if arr.null_count:
            valid = np.asarray(arr.is_valid())
            vals = np.asarray(arr.fill_null(0), dtype=np.int32)
        else:
            valid = None
            vals = np.asarray(arr, dtype=np.int32) if len(arr) else np.empty(0, dtype=np.int32)
        n = vals.shape[0]
        dense, _ = gap_fill(vals, valid, "locf")
        bitmaps.append(
            np.packbits(valid).tobytes() if valid is not None and not bool(valid.all()) else None
        )
        n_toks[i] = n
        if n:
            first_vals[i] = dense[0]
        enc_list.append(gorilla_encode(dense))
        checksums[i] = checksum64(np.ascontiguousarray(dense, dtype=np.int32).tobytes())
    dod_chunks = dod_encode_values(dod, n_toks)
    tbl = pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "source": batch.column("source"),
            "part_id": batch.column("part_id"),
            "n_tok": pa.array(n_toks, type=pa.int32()),
            "first_val": pa.array(first_vals, type=pa.int32()),
            "gorilla_xor": pa.array(enc_list, type=pa.binary()),
            "dod_ntok": pa.array(dod_chunks, type=pa.binary()),
            "codec_version": pa.array(np.full(n_rows, CODEC_VERSION, dtype=np.int32)),
            "value_checksum": pa.array(checksums, type=pa.uint64()),
            "null_bitmap": pa.array(bitmaps, type=pa.binary()),
        },
        schema=TIER0_SCHEMA,
    )
    return tbl, dod


class EncodePartition:
    """Actor-pool group encoder: one call = one hash partition."""

    def __init__(self, out_dir: str | None = None):
        self.out_dir = out_dir

    def __call__(self, group: pa.Table) -> pa.Table:
        t0 = time.monotonic()
        pid = int(group.column("pid")[0].as_py())
        # deterministic stream order regardless of shuffle arrival order
        group = group.sort_by([("doc_id", "ascending"), ("part_id", "ascending")])
        tier0, dod = encode_rows(group)
        wall = time.monotonic() - t0
        tokens = int(np.asarray(group.column("n_tok"), dtype=np.int64).sum())
        import pyarrow.compute as pc

        enc_bytes = int(pc.sum(pc.binary_length(tier0.column("gorilla_xor"))).as_py() or 0)
        sh = state_hash(dod)
        if self.out_dir is not None:
            pdir = os.path.join(self.out_dir, "tier0", f"part={pid:06d}")
            os.makedirs(pdir, exist_ok=True)
            tmp = os.path.join(pdir, ".tmp-data.parquet")
            pq.write_table(tier0, tmp)
            os.replace(tmp, os.path.join(pdir, "data.parquet"))
            write_manifest_row(
                self.out_dir,
                {
                    "part_id": pid,
                    "input_fragments": sorted(set(group.column("doc_id").to_pylist()))[:100],
                    "encoder_state_hash": sh,
                    "rows_emitted": tier0.num_rows,
                    "tokens_processed": tokens,
                    "wall_s": wall,
                    "engine_version": ENGINE_VERSION,
                },
            )
        return pa.table(
            {
                "part_id": pa.array([pid], type=pa.int32()),
                "rows_emitted": pa.array([tier0.num_rows], type=pa.int64()),
                "tokens_processed": pa.array([tokens], type=pa.int64()),
                "encoded_bytes": pa.array([enc_bytes], type=pa.int64()),
                "encoder_state_hash": pa.array([sh], type=pa.string()),
                "wall_s": pa.array([wall], type=pa.float64()),
            }
        )


def decode_batch(batch: pa.Table) -> pa.Table:
    """E3 as a stateless stage: tier0 rows -> decoded token parts + a
    checksum verdict (scale-path verification; SURVEY.md §3 P3).  The
    decoded values are assembled into one flat int32 buffer + offsets
    (zero-copy ListArray) instead of per-row Python lists."""
    n_rows = batch.num_rows
    n_tok = np.asarray(batch.column("n_tok"), dtype=np.int64)
    first_vals = np.asarray(batch.column("first_val"), dtype=np.int64)
    checksums = np.asarray(batch.column("value_checksum"), dtype=np.uint64)
    versions = np.asarray(batch.column("codec_version"), dtype=np.int64)
    enc_col = batch.column("gorilla_xor").to_pylist()
    bm_col = batch.column("null_bitmap").to_pylist()
    offsets = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(n_tok, out=offsets[1:])
    flat = np.empty(int(offsets[-1]), dtype=np.int32)
    valid = np.ones(int(offsets[-1]), dtype=bool)
    ok = np.empty(n_rows, dtype=bool)
    for i in range(n_rows):
        n = int(n_tok[i])
        # dispatch on the codec_version column: the fast vectorized decoder
        # assumes the v2 chunked-window layout; v1 greedy blocks (persisted
        # by earlier engine versions) go through the generic grammar follower
        dec_fn = gorilla_decode if versions[i] >= 2 else gorilla_decode_ref
        dec = dec_fn(int(first_vals[i]), enc_col[i], n)
        ok[i] = checksum64(np.ascontiguousarray(dec, dtype=np.int32).tobytes()) == int(checksums[i])
        flat[offsets[i] : offsets[i + 1]] = dec
        if bm_col[i] is not None:
            valid[offsets[i] : offsets[i + 1]] = np.unpackbits(
                np.frombuffer(bm_col[i], dtype=np.uint8), count=n
            ).astype(bool)
    values = pa.array(flat, type=pa.int32(), mask=~valid)
    toks = pa.LargeListArray.from_arrays(pa.array(offsets, type=pa.int64()), values).cast(
        pa.list_(pa.int32())
    )
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "source": batch.column("source"),
            "part_id": batch.column("part_id"),
            "n_tok": batch.column("n_tok"),
            "tokens": toks,
            # passthrough: lets rows-only driver checks pin the decoded
            # content bytes, not just row counts
            "value_checksum": batch.column("value_checksum"),
            "checksum_ok": pa.array(ok, type=pa.bool_()),
        }
    )
