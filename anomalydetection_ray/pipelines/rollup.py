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

    if os.path.isdir(path):
        files = sorted(
            f for f in _glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        )
    else:
        files = [path]
    if not files:
        raise FileNotFoundError(f"no parquet files under {path}")

    import pyarrow.parquet as pq

    units: list[dict] = []  # {path, rg_start, rg_end}
    for f in files:
        md = pq.ParquetFile(f).metadata
        nrg = md.num_row_groups
        cur_start, cur_bytes = 0, 0
        for rg in range(nrg):
            cur_bytes += md.row_group(rg).total_byte_size
            if cur_bytes >= _READ_TARGET_BYTES:
                units.append({"path": f, "rg_start": cur_start, "rg_end": rg + 1})
                cur_start, cur_bytes = rg + 1, 0
        if cur_start < nrg:
            units.append({"path": f, "rg_start": cur_start, "rg_end": nrg})

    if override_num_blocks is not None and override_num_blocks < len(units):
        # pack several row-group units into each read task
        per = -(-len(units) // override_num_blocks)
        units = [
            {
                "path": [u["path"] for u in units[i : i + per]],
                "rg_start": [u["rg_start"] for u in units[i : i + per]],
                "rg_end": [u["rg_end"] for u in units[i : i + per]],
            }
            for i in range(0, len(units), per)
        ]
    else:
        units = [
            {"path": [u["path"]], "rg_start": [u["rg_start"]], "rg_end": [u["rg_end"]]}
            for u in units
        ]

    def read_unit_rows(batch) -> "pa.Table":
        import pyarrow as pa

        tbls = []
        for paths, rga, rgb in zip(batch["path"], batch["rg_start"], batch["rg_end"]):
            for p, a, b in zip(paths, rga, rgb):
                pf = pq.ParquetFile(p)
                tbls.append(pf.read_row_groups(list(range(a, b)), columns=cols))
        return pa.concat_tables(tbls)

    # one block per read unit and batch_size=None everywhere downstream, so
    # the streaming executor fuses read -> validate -> rollup into a single
    # task: token blocks never round-trip through the object store.
    ds = ray.data.from_items(units, override_num_blocks=len(units))
    return ds.map_batches(read_unit_rows, batch_size=None, batch_format="pandas",
                          num_cpus=num_cpus)


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


def write_tiers(tiers_ds, out_dir: str):
    """S4: partitioned parquet tier sink — one directory per tier so a
    resumed/verifying run can address tiers independently."""
    tiers_ds.write_parquet(out_dir, partition_cols=["tier"])


def topk_anomalies(tiers_ds, k: int = 100, tier: int = 1):
    """Q2: the reference family's 'report anomalies' surface."""
    return (
        tiers_ds.filter(expr=f"tier == {tier}")
        .sort("anomaly_score", descending=True)
        .limit(k)
    )
