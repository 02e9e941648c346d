"""The north-star gate (BASELINE.json:6): every rolled-up point at every
tier from the vectorized engine kernel must match the single-process oracle
bit-for-bit — exact integer equality and exact float64 bit equality."""

import numpy as np
import pyarrow as pa
import pytest

from anomalydetection_ray.oracle import TIER_SCHEMA, rollup_table
from anomalydetection_ray.sources.fixtures import fixture_table
from anomalydetection_ray.sources.validate import validate_batch
from anomalydetection_ray.stages.rollup import rollup_batch


def _sorted_np(tbl: pa.Table) -> dict[str, np.ndarray]:
    tbl = tbl.sort_by([("doc_id", "ascending"), ("source", "ascending"),
                       ("tier", "ascending"), ("bucket", "ascending")])
    out = {}
    for name in tbl.schema.names:
        col = tbl.column(name)
        if name in ("min", "max"):
            out[name] = np.asarray(col.combine_chunks().fill_null(-(2**31)))
        elif name == "doc_id" or name == "source":
            out[name] = np.asarray(col.to_pandas(), dtype=object)
        else:
            out[name] = np.asarray(col)
    return out


def assert_tiers_bitequal(engine: pa.Table, oracle_t: pa.Table):
    assert engine.schema.names == TIER_SCHEMA.names
    assert engine.num_rows == oracle_t.num_rows
    e, o = _sorted_np(engine), _sorted_np(oracle_t)
    for name in TIER_SCHEMA.names:
        if e[name].dtype == np.float64:
            # bit-for-bit: compare the raw bit patterns, not approximate
            assert np.array_equal(e[name].view(np.uint64), o[name].view(np.uint64)), name
        else:
            assert np.array_equal(e[name], o[name]), name


@pytest.fixture(scope="module")
def fixtures():
    return fixture_table(include_giant=True, giant_len=2_500_000)


def _oracle_both(tbl, policy="locf"):
    t1, t2 = rollup_table(tbl, policy=policy)
    return pa.concat_tables([t1, t2])


def test_kernel_matches_oracle_locf(fixtures):
    engine = rollup_batch(validate_batch(fixtures), policy="locf")
    assert_tiers_bitequal(engine, _oracle_both(fixtures, "locf"))


def test_kernel_matches_oracle_linear(fixtures):
    small = fixtures.slice(100, 24)  # null/boundary/codec-edge families
    engine = rollup_batch(validate_batch(small), policy="linear")
    assert_tiers_bitequal(engine, _oracle_both(small, "linear"))


def test_kernel_matches_oracle_drop(fixtures):
    small = fixtures.slice(100, 24)
    engine = rollup_batch(validate_batch(small), policy="drop")
    assert_tiers_bitequal(engine, _oracle_both(small, "drop"))


def test_kernel_empty_batch():
    empty = fixture_table(include_giant=False).slice(0, 0)
    out = rollup_batch(validate_batch(empty))
    assert out.num_rows == 0
    assert out.schema.names == TIER_SCHEMA.names


def test_kernel_batch_splitting_invariance(fixtures):
    """Processing in many small batches == one big batch (no cross-row state)."""
    validated = validate_batch(fixtures.slice(40, 40))
    whole = rollup_batch(validated)
    parts = [rollup_batch(validated.slice(i, 7)) for i in range(0, validated.num_rows, 7)]
    recombined = pa.concat_tables(parts)
    e, o = _sorted_np(whole), _sorted_np(recombined)
    for name in TIER_SCHEMA.names:
        assert np.array_equal(e[name], o[name]), name


def test_validator_recomputes_n_tok(fixtures):
    v = validate_batch(fixtures)
    lens = np.diff(np.asarray(v.column("tokens").combine_chunks().offsets))
    assert np.array_equal(np.asarray(v.column("n_tok")), lens)


def test_validator_splits_giant_rows(fixtures):
    v = validate_batch(fixtures)
    from anomalydetection_ray.constants import MAX_TOKENS_PER_PART

    lens = np.asarray(v.column("n_tok"))
    assert lens.max() <= MAX_TOKENS_PER_PART
    pid = np.asarray(v.column("part_id"))
    assert pid.max() == 2  # 2.5M tokens -> parts 0,1,2
    # split rows reconstruct the original series
    giant_docs = [d for d in set(v.column("doc_id").to_pylist())
                  if sum(1 for x in v.column("doc_id").to_pylist() if x == d) > 2]
    assert len(giant_docs) == 2
