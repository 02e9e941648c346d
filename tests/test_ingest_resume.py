"""P2 ingest + kill/resume property (SURVEY.md §5.3): resume-after-partial
== single-run output, and decode round-trip restores every token array
(BASELINE.json:15 per-row invariant)."""

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from anomalydetection_ray.oracle import TIER0_SCHEMA
from anomalydetection_ray.sources.fixtures import fixture_table


@pytest.fixture(scope="module")
def seq_parquet(tmp_path_factory):
    tbl = fixture_table(include_giant=True, giant_len=1_200_000)
    d = tmp_path_factory.mktemp("seqs_ingest")
    # small row groups so plan_read_units can form multiple resume units
    pq.write_table(tbl, d / "seqs.parquet", row_group_size=30)
    return str(d / "seqs.parquet"), tbl


def _read_tier0_sorted(out_dir):
    t = pq.read_table(os.path.join(out_dir, "tier0"))
    t = t.select(TIER0_SCHEMA.names)
    return t.sort_by([("doc_id", "ascending"), ("source", "ascending"), ("part_id", "ascending")])


def _run_ingest(path, out_dir, resume=True, num_parts=8):
    from anomalydetection_ray.pipelines.ingest import ingest_pipeline
    from anomalydetection_ray.pipelines.rollup import read_sequences

    summary = ingest_pipeline(read_sequences(path), out_dir, num_parts=num_parts, resume=resume)
    return summary.take_all()


def test_ingest_and_roundtrip(ray_session, seq_parquet, tmp_path):
    path, tbl = seq_parquet
    out = str(tmp_path / "out")
    summary = _run_ingest(path, out)
    assert sum(r["rows_emitted"] for r in summary) > 0

    # manifest: one row per partition, all committed
    from anomalydetection_ray.pipelines.ingest import ingest_manifest, verify_tier0

    man = ingest_manifest(out)
    assert man.num_rows == len(summary)
    assert set(np.asarray(man.column("part_id"))) == {r["part_id"] for r in summary}
    assert (np.asarray(man.column("tokens_processed")) >= 0).all()

    # P3: decode + checksum for every row
    verdicts = verify_tier0(out).take_all()
    assert all(r["checksum_ok"] for r in verdicts)

    # per-row token-array equality vs the source (BASELINE.json:15)
    from anomalydetection_ray.sources.validate import validate_batch

    original = validate_batch(tbl)
    orig = {}
    for i in range(original.num_rows):
        key = (original.column("doc_id")[i].as_py(), original.column("part_id")[i].as_py(),
               original.column("source")[i].as_py())
        orig[key] = original.column("tokens")[i].as_py()
    assert len(verdicts) == original.num_rows
    for r in verdicts:
        want = orig[(r["doc_id"], r["part_id"], r["source"])]
        got = list(r["tokens"])
        assert len(got) == len(want)
        for g, w in zip(got, want):
            if w is None:
                assert g is None
            else:
                assert g == w


def test_resume_equals_single_run(ray_session, seq_parquet, tmp_path):
    path, _ = seq_parquet
    full, partial = str(tmp_path / "full"), str(tmp_path / "partial")
    _run_ingest(path, full)

    # simulate a mid-run kill: run fully, then delete ~half the partitions
    _run_ingest(path, partial)
    from anomalydetection_ray.state.manifest import finished_part_ids, manifest_dir

    pids = sorted(finished_part_ids(partial))
    killed = pids[:: 2]
    for pid in killed:
        shutil.rmtree(os.path.join(partial, "tier0", f"part={pid:06d}"))
        os.remove(os.path.join(manifest_dir(partial), f"part={pid:06d}.json"))
    assert finished_part_ids(partial) == set(pids) - set(killed)

    # resume: must recompute exactly the killed partitions
    summary2 = _run_ingest(path, partial, resume=True)
    assert {r["part_id"] for r in summary2} == set(killed)

    a, b = _read_tier0_sorted(full), _read_tier0_sorted(partial)
    assert a.equals(b)


def test_resume_noop_when_complete(ray_session, seq_parquet, tmp_path):
    path, _ = seq_parquet
    out = str(tmp_path / "done")
    _run_ingest(path, out)
    summary2 = _run_ingest(path, out, resume=True)
    assert summary2 == []  # nothing recomputed


def test_ingest_persist_roundtrip_and_resume(ray_session, seq_parquet, tmp_path):
    """Shuffle-free P2 (fragment-aligned partitions): round-trip token
    equality + kill/resume == single run, same contracts as the hash path."""
    from anomalydetection_ray.pipelines.ingest import ingest_persist, verify_tier0
    from anomalydetection_ray.state.manifest import finished_part_ids, manifest_dir

    path, tbl = seq_parquet
    full, partial = str(tmp_path / "pfull"), str(tmp_path / "ppartial")
    rows = ingest_persist(path, full, resume=False, target_unit_bytes=400_000).take_all()
    assert sum(r["rows_emitted"] for r in rows) > 0
    verdicts = verify_tier0(full).take_all()
    assert all(r["checksum_ok"] for r in verdicts)

    # per-row token equality vs source (nulls included)
    from anomalydetection_ray.sources.validate import validate_batch

    original = validate_batch(tbl)
    orig = {
        (
            original.column("doc_id")[i].as_py(),
            original.column("part_id")[i].as_py(),
            original.column("source")[i].as_py(),
        ): original.column("tokens")[i].as_py()
        for i in range(original.num_rows)
    }
    assert len(verdicts) == original.num_rows
    for r in verdicts:
        assert list(r["tokens"]) == orig[(r["doc_id"], r["part_id"], r["source"])]

    # kill/resume: delete some committed units, resume recomputes exactly those
    ingest_persist(path, partial, resume=False, target_unit_bytes=400_000).take_all()
    pids = sorted(finished_part_ids(partial))
    assert len(pids) >= 2
    killed = pids[::2]
    for pid in killed:
        shutil.rmtree(os.path.join(partial, "tier0", f"unit={pid:06d}"))
        os.remove(os.path.join(manifest_dir(partial), f"part={pid:06d}.json"))
    summary2 = ingest_persist(path, partial, resume=True, target_unit_bytes=400_000).take_all()
    assert {r["part_id"] for r in summary2} == set(killed)
    a = pq.read_table(os.path.join(full, "tier0")).select(TIER0_SCHEMA.names).sort_by(
        [("doc_id", "ascending"), ("part_id", "ascending")]
    )
    b = pq.read_table(os.path.join(partial, "tier0")).select(TIER0_SCHEMA.names).sort_by(
        [("doc_id", "ascending"), ("part_id", "ascending")]
    )
    assert a.equals(b)
    # complete run resumes to a no-op
    assert ingest_persist(path, partial, resume=True, target_unit_bytes=400_000).take_all() == []
