"""Resumable P1 (rollup_persist): kill/resume == single run, no shuffle."""

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from anomalydetection_ray.oracle import TIER_SCHEMA, rollup_table
from anomalydetection_ray.sources.fixtures import fixture_table
from tests.test_rollup_engine import assert_tiers_bitequal


@pytest.fixture(scope="module")
def seq_dir(tmp_path_factory):
    tbl = fixture_table(include_giant=False)
    d = tmp_path_factory.mktemp("seqs_persist")
    for i, lo in enumerate(range(0, tbl.num_rows, 20)):
        pq.write_table(tbl.slice(lo, 20), d / f"f{i:03d}.parquet", row_group_size=5)
    return str(d), tbl


def _run(path, out, resume=True):
    from anomalydetection_ray.pipelines.rollup import rollup_persist

    return rollup_persist(path, out, resume=resume, override_num_blocks=8).take_all()


def test_persist_matches_oracle(ray_session, seq_dir, tmp_path):
    path, tbl = seq_dir
    out = str(tmp_path / "o1")
    summary = _run(path, out)
    assert 1 < len(summary) <= 8  # packed into <=8 units (ceil division)
    from anomalydetection_ray.pipelines.rollup import read_tiers

    got = pq.read_table(os.path.join(out, "tiers")).select(TIER_SCHEMA.names).cast(TIER_SCHEMA)
    t1, t2 = rollup_table(tbl)
    assert_tiers_bitequal(got, pa.concat_tables([t1, t2]))
    # read_tiers round trip + tier filter
    n1 = read_tiers(out, tier=1).count()
    assert n1 == t1.num_rows


def test_persist_resume(ray_session, seq_dir, tmp_path):
    path, _ = seq_dir
    full, partial = str(tmp_path / "full"), str(tmp_path / "part")
    _run(path, full)
    _run(path, partial)
    from anomalydetection_ray.state.manifest import finished_part_ids, manifest_dir

    killed = [0, 3, 6]
    for uid in killed:
        shutil.rmtree(os.path.join(partial, "tiers", f"unit={uid:06d}"))
        os.remove(os.path.join(manifest_dir(partial), f"part={uid:06d}.json"))
    s2 = _run(path, partial, resume=True)
    assert sorted(r["unit_id"] for r in s2) == killed
    a = pq.read_table(os.path.join(full, "tiers")).select(TIER_SCHEMA.names)
    b = pq.read_table(os.path.join(partial, "tiers")).select(TIER_SCHEMA.names)
    assert a.sort_by([("doc_id", "ascending"), ("tier", "ascending"), ("bucket", "ascending")]).equals(
        b.sort_by([("doc_id", "ascending"), ("tier", "ascending"), ("bucket", "ascending")])
    )
    # second resume is a no-op
    assert _run(path, partial, resume=True) == []


def test_persist_incremental_append(ray_session, tmp_path):
    """Continuous-aggregate semantics: a delta file appended to the input
    dir (sorting AFTER the existing files, the append-at-end contract that
    keeps footer-plan unit ids stable) is rolled up incrementally — the
    resume run computes ONLY the new units, and the merged layout is
    bit-identical to a from-scratch run over the full input."""
    from anomalydetection_ray.pipelines.rollup import rollup_persist

    tbl = fixture_table(include_giant=False)
    d = tmp_path / "seqs"
    d.mkdir()
    half = tbl.num_rows // 2
    pq.write_table(tbl.slice(0, half), d / "f000.parquet", row_group_size=10)

    out = str(tmp_path / "inc")
    s1 = rollup_persist(str(d), out).take_all()
    assert len(s1) > 0

    pq.write_table(tbl.slice(half), d / "f001.parquet", row_group_size=10)
    s2 = rollup_persist(str(d), out, resume=True).take_all()
    # only the delta's units ran, and their ids extend the old plan
    assert len(s2) > 0
    assert min(r["unit_id"] for r in s2) >= len(s1)

    full = str(tmp_path / "full")
    rollup_persist(str(d), full).take_all()
    key = [("doc_id", "ascending"), ("tier", "ascending"),
           ("bucket", "ascending")]
    a = pq.read_table(os.path.join(out, "tiers")).select(TIER_SCHEMA.names)
    b = pq.read_table(os.path.join(full, "tiers")).select(TIER_SCHEMA.names)
    assert a.sort_by(key).equals(b.sort_by(key))
    # third run over the unchanged input is a no-op
    assert rollup_persist(str(d), out, resume=True).take_all() == []
