"""B1 — Bloom-filter join pruning (Bloom 1970, CACM 13(7)).

The classic distributed-join optimization: build a tiny bit array over the
join keys of a FILTERED build side, broadcast it (bytes, not rows), and
probe the other table map-side so only keys that MIGHT match pay the
co-partitioned exchange.  No false negatives by construction; the audit
surface reports the false-positive rate the chosen (m, k) actually
delivered.

Scale shape:
- build: per-block partials collapse each block's keys to DISTINCT bit
  indices (at most ``BLOOM_M`` rows per block regardless of block size)
  before ONE tiny exchange on the bit index; the driver then holds only
  the <= ``BLOOM_M``-row result (the index, never the data — same
  bounded-state contract as the V3/V6 vocabulary broadcast).
- probe: map-only; the bit array rides the task closure (~4 KB).
- exact verify: ONLY bloom-passing keys enter the co-partitioned
  ``copartition_attach`` exchange — the pruned volume is the point.

Every bit cell is reproduced exactly in the SQL oracle:
``bit_j(x) = ((x * K_j) % 2**32) % BLOOM_M`` with Knuth/xxhash/Murmur odd
constants — pure BIGINT arithmetic on both sides (keys < 2**31, so the
product stays < 2**63: no mod-2**64 decomposition needed).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

BLOOM_M = 4096
BLOOM_KS = (2654435761, 2246822519, 3266489917)
_M32 = np.uint64(1 << 32)


def bloom_bits_of(keys: np.ndarray) -> np.ndarray:
    """(n, k) int64 bit indices for int64 keys — vectorized, and the
    exact integer expression the SQL oracle evaluates."""
    x = keys.astype(np.uint64)
    cols = [((x * np.uint64(K)) % _M32) % np.uint64(BLOOM_M)
            for K in BLOOM_KS]
    return np.stack(cols, axis=1).astype(np.int64)


def build_bloom(ds, key_col: str) -> np.ndarray:
    """Distributed bloom build: per-block distinct-bit partials -> one
    exchange on the bit index -> <= BLOOM_M rows to the driver -> boolean
    bit array.  The exchange carries at most BLOOM_M rows per block."""

    def partial(batch: pa.Table) -> pa.Table:
        col = batch.column(key_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        keys = np.asarray(col, dtype=np.int64)
        bits = np.unique(bloom_bits_of(keys))
        return pa.table({"bit": pa.array(bits, type=pa.int64())})

    def first(group: pa.Table) -> pa.Table:
        return group.slice(0, 1)

    rows = (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
              .groupby("bit").map_groups(first, batch_format="pyarrow")
              .take_all())
    arr = np.zeros(BLOOM_M, dtype=bool)
    if rows:
        arr[np.array([r["bit"] for r in rows], dtype=np.int64)] = True
    return arr


def b1_bloom_semi_join(sf_dir: str, price_floor: float = 450000.0):
    """B1 — bloom-pruned semi join audit: which customers MIGHT have an
    order above ``price_floor`` (bloom), which actually DO (exact,
    computed only for bloom passers — the prune), and which passers were
    false positives.  m=4096, k=3 over ~1k member keys gives a real
    false-positive band to audit (~7% of non-members at sf0.01)."""
    import ray.data
    import pyarrow.compute as pc
    from ray.data.aggregate import Count

    from anomalydetection_ray.stages.join import copartition_attach

    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_custkey", "o_totalprice"])
    big = orders.filter(expr=f"o_totalprice > {price_floor!r}")
    bloom = build_bloom(big, "o_custkey")

    cust = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                 columns=["c_custkey"])

    def probe(batch: pa.Table) -> pa.Table:
        col = batch.column("c_custkey")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        keys = np.asarray(col, dtype=np.int64)
        passed = bloom[bloom_bits_of(keys)].all(axis=1)
        return pa.table({"c_custkey": col,
                         "bloom_pass": pa.array(passed, type=pa.bool_())})

    probed = cust.map_batches(probe, batch_format="pyarrow",
                              zero_copy_batch=True)

    # exact verify ONLY for passers — the exchange the bloom pruned
    passers = probed.filter(expr="bloom_pass")
    members = big.groupby("o_custkey").aggregate(Count(alias_name="n_big"))
    attached = copartition_attach(passers, members, left_on="c_custkey",
                                  right_on="o_custkey",
                                  payload_cols=["n_big"])

    def classify(batch: pa.Table) -> pa.Table:
        has = pc.is_valid(batch.column("n_big"))
        return pa.table({
            "c_custkey": batch.column("c_custkey"),
            "bloom_pass": batch.column("bloom_pass"),
            "has_big_order": has,
            "is_false_positive": pc.and_(batch.column("bloom_pass"),
                                         pc.invert(has)),
        })

    def rejected(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        f = pa.array(np.zeros(n, dtype=bool), type=pa.bool_())
        return pa.table({"c_custkey": batch.column("c_custkey"),
                         "bloom_pass": batch.column("bloom_pass"),
                         "has_big_order": f, "is_false_positive": f})

    hits = attached.map_batches(classify, batch_format="pyarrow",
                                zero_copy_batch=True)
    misses = (probed.filter(expr="bloom_pass == False")
              .map_batches(rejected, batch_format="pyarrow",
                           zero_copy_batch=True))
    return hits.union(misses)
