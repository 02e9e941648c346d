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


def read_sequences(path: str, override_num_blocks: int | None = None):
    """S1: parquet source with explicit column pruning (SURVEY.md §2.2 S1)."""
    import ray.data

    return ray.data.read_parquet(
        path, columns=SEQUENCE_COLUMNS, override_num_blocks=override_num_blocks
    )


def validated(ds):
    """S3 as a dataset stage."""
    return ds.map_batches(validate_batch, batch_format="pyarrow", zero_copy_batch=True)


def rollup_pipeline(ds, policy: str = "locf", batch_size: int | None = None):
    """validate + rollup; returns the tier1+tier2 Dataset (lazy).

    ``batch_size=None`` processes whole blocks (the kernel chunks its own
    median gathers, so memory stays bounded regardless — stages/rollup.py
    MEDIAN_CHUNK)."""
    kernel = functools.partial(rollup_batch, policy=policy)
    return validated(ds).map_batches(
        kernel, batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size
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
