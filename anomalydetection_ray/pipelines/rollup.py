"""P1 — the flagship rollup pipeline (SURVEY.md §3 P1).

read_parquet (Arrow fragments -> blocks) -> S3 validate/split -> M1 bucket
kernel -> [optional Q1 sort] -> S4 partitioned parquet tiers.

Everything is a stateless ``map_batches`` task over zero-copy Arrow
batches; no cross-row state anywhere, so the Ray Data streaming executor
pipelines and backpressures freely (SURVEY.md §4).  No stage materializes
the dataset; consumption happens at the sink (write_parquet) or in the
caller's aggregation.

NOTE per driver contract: nothing in this module calls ray.init() — the
caller (driver / bench.py / test fixture) owns the Ray session.
"""

from __future__ import annotations

import functools

import pyarrow as pa

from anomalydetection_ray.sources.validate import validate_batch
from anomalydetection_ray.stages.rollup import rollup_batch

SEQUENCE_COLUMNS = ["doc_id", "tokens", "n_tok", "source"]

# target bytes of compressed row groups per read task (block ~2-4x this
# in memory; sized so batch x concurrency fits worker heaps)
_READ_TARGET_BYTES = 32 * 1024 * 1024


def read_sequences(path: str, override_num_blocks: int | None = None,
                   columns: list[str] | None = None, fast: bool = True,
                   num_cpus: float = 2):
    """S1: parquet source with explicit column pruning (SURVEY.md §2.2 S1).

    ``fast=True`` uses a row-group-granular direct reader: the driver scans
    only footers (metadata), packs row-group ranges into ~32 MB read units,
    and each task decodes its ranges with pyarrow C++ (`pq.read_table`).
    Measured on this box, Ray 2.49's generic `read_parquet` scan burned
    ~20x the CPU of a direct footer-planned read on list<int32> payloads;
    at 100 TB the same plan (central metadata scan -> distributed range
    reads) is how the read should be laid out anyway.  ``fast=False``
    falls back to `ray.data.read_parquet`.
    """
    import glob as _glob
    import os

    import ray.data

    cols = columns or SEQUENCE_COLUMNS
    if not fast:
        return ray.data.read_parquet(path, columns=cols,
                                     override_num_blocks=override_num_blocks)

    units = plan_read_units(path)
    packed = pack_read_units(units, override_num_blocks)

    def read_unit_rows(batch) -> "pa.Table":
        return read_packed_units(batch, cols)

    # one block per read unit and batch_size=None everywhere downstream, so
    # the streaming executor fuses read -> validate -> rollup into a single
    # task: token blocks never round-trip through the object store.
    ds = ray.data.from_items(packed, override_num_blocks=len(packed))
    return ds.map_batches(read_unit_rows, batch_size=None, batch_format="pandas",
                          num_cpus=num_cpus)


def plan_read_units(path: str, target_bytes: int = _READ_TARGET_BYTES) -> list[dict]:
    """Central (driver-side) read plan: scan parquet footers only, emit
    ~target_bytes row-group ranges.  Deterministic for a given input dir —
    the unit index doubles as the resume partition id of rollup_persist."""
    import glob as _glob
    import os

    import pyarrow.parquet as pq

    if os.path.isdir(path):
        files = sorted(
            f for f in _glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        )
    else:
        files = [path]
    if not files:
        raise FileNotFoundError(f"no parquet files under {path}")
    units: list[dict] = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        nrg = md.num_row_groups
        cur_start, cur_bytes = 0, 0
        for rg in range(nrg):
            cur_bytes += md.row_group(rg).total_byte_size
            if cur_bytes >= target_bytes:
                units.append({"path": f, "rg_start": cur_start, "rg_end": rg + 1})
                cur_start, cur_bytes = rg + 1, 0
        if cur_start < nrg:
            units.append({"path": f, "rg_start": cur_start, "rg_end": nrg})
    return units


def pack_read_units(units: list[dict], override_num_blocks: int | None) -> list[dict]:
    """Pack row-group units into task-sized items, each tagged with a
    deterministic unit_id (the resume key)."""
    if override_num_blocks is not None and override_num_blocks < len(units):
        per = -(-len(units) // override_num_blocks)
        groups = [units[i : i + per] for i in range(0, len(units), per)]
    else:
        groups = [[u] for u in units]
    return [
        {
            "unit_id": k,
            "path": [u["path"] for u in g],
            "rg_start": [u["rg_start"] for u in g],
            "rg_end": [u["rg_end"] for u in g],
        }
        for k, g in enumerate(groups)
    ]


def read_packed_units(batch, cols: list[str]) -> pa.Table:
    import pyarrow.parquet as pq

    tbls = []
    for paths, rga, rgb in zip(batch["path"], batch["rg_start"], batch["rg_end"]):
        for p, a, b in zip(paths, rga, rgb):
            pf = pq.ParquetFile(p)
            tbls.append(pf.read_row_groups(list(range(a, b)), columns=cols))
    return pa.concat_tables(tbls)


def validated(ds, num_cpus: float = 2):
    """S3 as a dataset stage.

    ``num_cpus=2`` (uniform across read/validate/rollup so the executor can
    fuse them into one task): the token kernels are memory-bandwidth-bound,
    and one task per hardware thread oversubscribes the memory system —
    measured on this node class, 2 vCPUs per task is ~1.7x faster than 1
    at the same cluster size.  Stage-level knob, overridable per pipeline."""
    return ds.map_batches(validate_batch, batch_format="pyarrow", zero_copy_batch=True,
                          num_cpus=num_cpus)


def rollup_pipeline(ds, policy: str = "locf", batch_size: int | None = None,
                    num_cpus: float = 2):
    """validate + rollup; returns the tier1+tier2 Dataset (lazy).

    ``batch_size=None`` processes whole blocks (the kernel chunks its own
    median gathers, so memory stays bounded regardless — stages/rollup.py
    MEDIAN_CHUNK)."""
    kernel = functools.partial(rollup_batch, policy=policy)
    return validated(ds, num_cpus=num_cpus).map_batches(
        kernel, batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size,
        num_cpus=num_cpus,
    )


def tiers_checksum(tiers: pa.Table) -> str:
    """Deterministic content hash of one unit's tier rows: the Arrow IPC
    stream bytes of the (chunk-normalized) table.  Stored in the manifest's
    lineage column and surfaced in the persist summary, so rows-only driver
    checks pin the rolled-up CONTENT, not just row counts."""
    import hashlib
    import io

    t = tiers.combine_chunks()
    sink = io.BytesIO()
    with pa.ipc.new_stream(sink, t.schema) as w:
        w.write_table(t)
    return hashlib.md5(sink.getvalue()).hexdigest()[:16]


def write_tiers(tiers_ds, out_dir: str):
    """S4: partitioned parquet tier sink — one directory per tier so a
    resumed/verifying run can address tiers independently."""
    tiers_ds.write_parquet(out_dir, partition_cols=["tier"])


def topk_anomalies(tiers_ds, k: int = 100, tier: int = 1):
    """Q2: the reference family's 'report anomalies' surface.  Map-side
    block prune + tiny final sort (stages/topk.py) instead of a global
    sort shuffle; deterministic tiebreak on (doc_id, bucket)."""
    from anomalydetection_ray.stages.topk import topk

    return topk(
        tiers_ds.filter(expr=f"tier == {tier}"),
        k,
        [("anomaly_score", "descending"), ("doc_id", "ascending"), ("bucket", "ascending")],
    )


def rollup_persist(
    path: str,
    out_dir: str,
    policy: str = "locf",
    resume: bool = True,
    override_num_blocks: int | None = None,
    num_cpus: float = 2,
):
    """Resumable P1: per-read-unit tier output + atomic manifest, NO shuffle.

    Each fused task reads its row-group ranges, validates, rolls up, writes
    ``out_dir/tiers/unit=<k>/data.parquet`` atomically and commits a
    manifest row (unit_id as the partition key; lineage = the input
    row-group ranges).  ``resume=True`` skips committed units before any
    read happens — the deterministic footer plan makes unit ids stable.
    Returns the per-unit summary Dataset (consume to execute)."""
    import os as _os
    import time as _time

    import ray.data

    from anomalydetection_ray.constants import ENGINE_VERSION
    from anomalydetection_ray.state.manifest import finished_part_ids, write_manifest_row

    units = plan_read_units(path)
    packed = pack_read_units(units, override_num_blocks)
    if resume:
        done = finished_part_ids(out_dir)
        packed = [u for u in packed if u["unit_id"] not in done]
    if not packed:
        import pyarrow as _pa

        return ray.data.from_arrow(
            _pa.table({"unit_id": _pa.array([], type=_pa.int32()),
                       "rows_emitted": _pa.array([], type=_pa.int64()),
                       "tokens_processed": _pa.array([], type=_pa.int64()),
                       "tiers_checksum": _pa.array([], type=_pa.string())})
        )

    def process(batch) -> pa.Table:
        import pyarrow.parquet as pq

        out_rows = {"unit_id": [], "rows_emitted": [], "tokens_processed": [],
                    "tiers_checksum": []}
        for uid, paths, rga, rgb in zip(batch["unit_id"], batch["path"],
                                        batch["rg_start"], batch["rg_end"]):
            t0 = _time.monotonic()
            one = {"path": paths, "rg_start": rga, "rg_end": rgb}
            raw = read_packed_units({k: [v] for k, v in one.items()}, SEQUENCE_COLUMNS)
            v = validate_batch(raw)
            tiers = rollup_batch(v, policy=policy)
            udir = _os.path.join(out_dir, "tiers", f"unit={uid:06d}")
            _os.makedirs(udir, exist_ok=True)
            tmp = _os.path.join(udir, ".tmp-data.parquet")
            pq.write_table(tiers, tmp)
            _os.replace(tmp, _os.path.join(udir, "data.parquet"))
            tokens = int(sum(int(x) for x in v.column("n_tok").to_pylist()))
            csum = tiers_checksum(tiers)
            write_manifest_row(
                out_dir,
                {
                    "part_id": int(uid),
                    "input_fragments": [f"{p}:{a}-{b}" for p, a, b in zip(paths, rga, rgb)],
                    "encoder_state_hash": csum,
                    "rows_emitted": tiers.num_rows,
                    "tokens_processed": tokens,
                    "wall_s": _time.monotonic() - t0,
                    "engine_version": ENGINE_VERSION,
                },
            )
            out_rows["unit_id"].append(int(uid))
            out_rows["rows_emitted"].append(tiers.num_rows)
            out_rows["tokens_processed"].append(tokens)
            out_rows["tiers_checksum"].append(csum)
        return pa.table(
            {
                "unit_id": pa.array(out_rows["unit_id"], type=pa.int32()),
                "rows_emitted": pa.array(out_rows["rows_emitted"], type=pa.int64()),
                "tokens_processed": pa.array(out_rows["tokens_processed"], type=pa.int64()),
                "tiers_checksum": pa.array(out_rows["tiers_checksum"], type=pa.string()),
            }
        )

    ds = ray.data.from_items(packed, override_num_blocks=len(packed))
    return ds.map_batches(process, batch_size=None, batch_format="pandas", num_cpus=num_cpus)


def read_tiers(out_dir: str, tier: int | None = None):
    """Read committed rollup tiers back as a Dataset."""
    import ray.data

    ds = ray.data.read_parquet(f"{out_dir}/tiers")
    if tier is not None:
        ds = ds.filter(expr=f"tier == {tier}")
    return ds
