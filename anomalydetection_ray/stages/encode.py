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
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from anomalydetection_ray.codecs import (
    DodState,
    checksum64,
    gorilla_decode,
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
    """Deterministic hash partition id per row: crc32(doc_id) % num_parts.
    (Never python hash() — it is salted per process.)"""
    pids = np.fromiter(
        (zlib.crc32(d.encode()) % num_parts for d in batch.column("doc_id").to_pylist()),
        dtype=np.int32,
        count=batch.num_rows,
    )
    return batch.append_column("pid", pa.array(pids, type=pa.int32()))


def encode_rows(batch: pa.Table) -> pa.Table:
    """Encode validated part rows -> tier0 rows (order = input order; the
    DoD n_tok stream runs across the batch in that order)."""
    tokens = batch.column("tokens")
    if isinstance(tokens, pa.ChunkedArray):
        tokens = tokens.combine_chunks()
    doc_ids = batch.column("doc_id")
    sources = batch.column("source")
    part_ids = batch.column("part_id")
    dod = DodState()
    cols: dict[str, list] = {n: [] for n in TIER0_SCHEMA.names}
    for i in range(batch.num_rows):
        arr = tokens[i].values
        if arr.null_count:
            valid = np.asarray(arr.is_valid())
            vals = np.asarray(arr.fill_null(0), dtype=np.int32)
        else:
            valid = None
            vals = np.asarray(arr, dtype=np.int32) if len(arr) else np.empty(0, dtype=np.int32)
        n = vals.shape[0]
        dense, _ = gap_fill(vals, valid, "locf")
        bitmap = None
        if valid is not None and not bool(valid.all()):
            bitmap = np.packbits(valid).tobytes()
        cols["doc_id"].append(doc_ids[i].as_py())
        cols["source"].append(sources[i].as_py())
        cols["part_id"].append(part_ids[i].as_py())
        cols["n_tok"].append(n)
        cols["first_val"].append(int(dense[0]) if n else 0)
        cols["gorilla_xor"].append(gorilla_encode(dense))
        cols["dod_ntok"].append(None)  # filled below (stream needs order)
        cols["codec_version"].append(CODEC_VERSION)
        cols["value_checksum"].append(checksum64(dense.astype(np.int32).tobytes()))
        cols["null_bitmap"].append(bitmap)
    from anomalydetection_ray.codecs import dod_encode_values

    cols["dod_ntok"] = dod_encode_values(dod, cols["n_tok"])
    tbl = pa.table({n: pa.array(cols[n], type=TIER0_SCHEMA.field(n).type) for n in TIER0_SCHEMA.names})
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
        enc_bytes = sum(len(b) for b in tier0.column("gorilla_xor").to_pylist())
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
    checksum verdict (scale-path verification; SURVEY.md §3 P3)."""
    n_rows = batch.num_rows
    toks_out: list = []
    ok: list = []
    for i in range(n_rows):
        n = batch.column("n_tok")[i].as_py()
        dec = gorilla_decode(
            batch.column("first_val")[i].as_py(),
            batch.column("gorilla_xor")[i].as_py(),
            n,
        )
        ok.append(checksum64(dec.astype(np.int32).tobytes()) == batch.column("value_checksum")[i].as_py())
        bm = batch.column("null_bitmap")[i].as_py()
        if bm is not None:
            validb = np.unpackbits(np.frombuffer(bm, dtype=np.uint8), count=n).astype(bool)
            toks_out.append([int(v) if m else None for v, m in zip(dec.tolist(), validb.tolist())])
        else:
            toks_out.append(dec.tolist())
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "source": batch.column("source"),
            "part_id": batch.column("part_id"),
            "n_tok": batch.column("n_tok"),
            "tokens": pa.array(toks_out, type=pa.list_(pa.int32())),
            "checksum_ok": pa.array(ok, type=pa.bool_()),
        }
    )
