"""Round-4 operator tests: each new op re-derived by an independent
brute-force reference over /root/testdata/sf0.001 (no DuckDB here — the
SQL oracles are exercised by tools/driver_check.py; these tests pin the
engine against straight numpy/Python recomputation)."""
import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------- A27 ----
def test_perm_entropy_matches_bruteforce(ray_session):
    import __ray_entry__ as e

    got = (e.queries()["a27_perm_entropy"](SF).to_pandas()
           .set_index(["doc_id", "part_id"]).sort_index())

    from anomalydetection_ray.sources.tokenize import tokenize_batch

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text", "source"])
    tok = tokenize_batch(docs)
    perms = {(0, 1, 2): 0, (0, 2, 1): 1, (1, 0, 2): 2,
             (1, 2, 0): 3, (2, 0, 1): 4, (2, 1, 0): 5}
    checked = 0
    for row in tok.to_pylist()[:40]:
        v = row["tokens"]
        c = np.zeros(6, dtype=np.int64)
        for i in range(len(v) - 2):
            tri = v[i:i + 3]
            # stable argsort = position tie-break
            pat = tuple(int(x) for x in
                        np.argsort(np.asarray(tri), kind="stable"))
            c[perms[pat]] += 1
        g = got.loc[(row["doc_id"], 0)]
        assert [g["c_012"], g["c_021"], g["c_102"],
                g["c_120"], g["c_201"], g["c_210"]] == c.tolist()
        m = int(c.sum())
        assert g["m_triples"] == m and g["n"] == len(v)
        acc = 0.0
        for cj in c:
            if cj:
                p = float(int(cj)) / float(m)
                acc += p * math.log(p)
        assert g["perm_entropy"] == -acc
        assert g["norm_perm_entropy"] == -acc / math.log(6.0)
        # pseudo-random token series: high complexity
        assert g["norm_perm_entropy"] > 0.9
        checked += 1
    assert checked == 40


# ---------------------------------------------------------------- Q11 ----
def test_weighted_sample_matches_cumsum(ray_session):
    from anomalydetection_ray.pipelines.packing import q11_weighted_sample

    got = (q11_weighted_sample(SF, k=25).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["doc_id", "n_chars"]).to_pandas()
    t = t.sort_values("doc_id").reset_index(drop=True)
    w = t["n_chars"].to_numpy(dtype=np.int64)
    cw = np.cumsum(w)
    total = int(cw[-1])
    stride = max(total // 25, 1)
    before = cw - w
    hits = cw // stride - before // stride
    keep = hits > 0
    ref = t[keep].reset_index(drop=True)
    assert got["doc_id"].tolist() == ref["doc_id"].tolist()
    assert got["n_chars"].tolist() == ref["n_chars"].tolist()
    assert got["w_before"].tolist() == before[keep].tolist()
    assert got["n_hits"].tolist() == hits[keep].tolist()
    # every stride multiple in (0, total] is hit exactly once
    assert int(got["n_hits"].sum()) == total // stride


# ---------------------------------------------------------------- G17 ----
def test_kmv_distinct_matches_bruteforce(ray_session):
    from anomalydetection_ray.pipelines.dedup import _mix64
    from anomalydetection_ray.pipelines.queries import g17_kmv_distinct

    got = (g17_kmv_distinct(SF, k=64).to_pandas()
           .set_index("event_type").sort_index())
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_type", "user_id"]).to_pandas()
    for typ, grp in ev.groupby("event_type"):
        users = np.unique(grp["user_id"].to_numpy(dtype=np.int64))
        h = np.sort(_mix64(users.astype(np.uint64)))
        nd = h.shape[0]
        row = got.loc[typ]
        k_used = min(nd, 64)
        assert row["k_used"] == k_used
        kth = int(h[k_used - 1])
        kth_signed = kth - (1 << 64) if kth >= (1 << 63) else kth
        assert int(row["kth_min"]) == kth_signed
        if nd < 64:
            assert row["est_distinct"] == nd
        else:
            est = 63 * (1 << 64) // int(h[63])
            assert row["est_distinct"] == est
            # KMV with k=64: ~12.5% relative error bound (3/sqrt(k))
            assert abs(est - nd) / nd < 0.4


# ---------------------------------------------------------------- S16 ----
def test_fk_audit_matches_pandas(ray_session):
    from anomalydetection_ray.pipelines.queries import s16_fk_audit

    got = (s16_fk_audit(SF).to_pandas()
           .set_index("relation").sort_index())
    assert len(got) == 5
    edges = [
        ("orders.o_custkey->customer.c_custkey",
         "orders", "o_custkey", "customer", "c_custkey"),
        ("lineitem.l_orderkey->orders.o_orderkey",
         "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem.l_partkey->part.p_partkey",
         "lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem.l_suppkey->supplier.s_suppkey",
         "lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("customer.c_nationkey->nation.n_nationkey",
         "customer", "c_nationkey", "nation", "n_nationkey"),
    ]
    for name, child, fk, parent, pk in edges:
        c = pq.read_table(f"{SF}/{child}.parquet", columns=[fk]).to_pandas()
        p = pq.read_table(f"{SF}/{parent}.parquet", columns=[pk]).to_pandas()
        pset = set(p[pk].tolist())
        orphan_rows = (~c[fk].isin(pset)).sum()
        keys = c[fk].value_counts()
        orphan_keys = sum(1 for k in keys.index if k not in pset)
        row = got.loc[name]
        assert row["n_child_rows"] == len(c)
        assert row["n_child_keys"] == len(keys)
        assert row["n_orphan_rows"] == int(orphan_rows)
        assert row["n_orphan_keys"] == int(orphan_keys)


# ---------------------------------------------------------------- A29 ----
def test_xcorr_volumes_matches_bruteforce(ray_session):
    from anomalydetection_ray.pipelines.queries import a29_xcorr_volumes

    got = (a29_xcorr_volumes(SF).to_pandas()
           .set_index(["type_a", "type_b", "lag"]).sort_index())
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_type", "ts"]).to_pandas()
    day = (ev["ts"].astype("int64") // 86_400_000_000).to_numpy()
    et = ev["event_type"].to_numpy()
    types = sorted(set(et.tolist()))
    n_rows = 0
    for i, ta in enumerate(types):
        for tb in types[i + 1:]:
            sel = (et == ta) | (et == tb)
            lo, hi = int(day[sel].min()), int(day[sel].max())
            xa = np.zeros(hi - lo + 1, dtype=np.int64)
            xb = np.zeros(hi - lo + 1, dtype=np.int64)
            for d_, t_ in zip(day[sel], et[sel]):
                (xa if t_ == ta else xb)[d_ - lo] += 1
            for L in (0, 1, 2, 3, 7):
                if hi - lo + 1 <= L:
                    continue
                x = xa[:len(xa) - L] if L else xa
                y = xb[L:]
                n = len(x)
                sx, sy = int(x.sum()), int(y.sum())
                num = n * int((x * y).sum()) - sx * sy
                d1 = n * int((x * x).sum()) - sx * sx
                d2 = n * int((y * y).sum()) - sy * sy
                row = got.loc[(ta, tb, L)]
                assert row["n"] == n
                assert row["sxy"] == int((x * y).sum())
                if d1 and d2:
                    assert row["xcorr"] == \
                        float(num) / math.sqrt(float(d1) * float(d2))
                n_rows += 1
    assert len(got) == n_rows


# ---------------------------------------------------------------- A28 ----
def test_sax_matches_bruteforce(ray_session):
    import __ray_entry__ as e

    got = (e.queries()["a28_sax"](SF).to_pandas()
           .set_index(["doc_id", "part_id"]).sort_index())

    from anomalydetection_ray.sources.tokenize import tokenize_batch

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text", "source"])
    tok = tokenize_batch(docs)
    for row in tok.to_pylist()[:40]:
        v = [int(x) for x in row["tokens"]]
        n = len(v)
        s_, q_ = sum(v), sum(x * x for x in v)
        nqs2 = n * q_ - s_ * s_
        chars = []
        for f in range(8):
            a = (f * n + 7) // 8
            b = ((f + 1) * n + 7) // 8
            fl = b - a
            if fl == 0:
                chars.append("_")
                continue
            fs = sum(v[a:b])
            A = fs * n - s_ * fl
            rhs = float(fl) * math.sqrt(float(nqs2))
            if float(A) < -0.6745 * rhs:
                chars.append("a")
            elif float(A) < 0.0:
                chars.append("b")
            elif float(A) < 0.6745 * rhs:
                chars.append("c")
            else:
                chars.append("d")
        g = got.loc[(row["doc_id"], 0)]
        assert g["sax"] == "".join(chars)
        assert g["n"] == n and g["s_sum"] == s_
        # frame-of(i) = 8*i//n partitions exactly: frames cover all n
        assert sum(((f + 1) * n + 7) // 8 - (f * n + 7) // 8
                   for f in range(8)) == n


# ---------------------------------------------------------------- A31 ----
def test_runs_test_matches_bruteforce(ray_session):
    import __ray_entry__ as e

    got = (e.queries()["a31_runs_test"](SF).to_pandas()
           .set_index(["doc_id", "part_id"]).sort_index())

    from anomalydetection_ray.sources.tokenize import tokenize_batch

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text", "source"])
    tok = tokenize_batch(docs)
    for row in tok.to_pylist()[:40]:
        v = [int(x) for x in row["tokens"]]
        n = len(v)
        sv = sorted(v)
        med = 0.5 * (sv[(n - 1) // 2] + sv[n // 2])
        sg = [1 if x > med else -1 for x in v if float(x) != med]
        n1 = sum(1 for s in sg if s == 1)
        n2 = len(sg) - n1
        R = (1 + sum(1 for i in range(1, len(sg)) if sg[i] != sg[i - 1])
             if sg else 0)
        g = got.loc[(row["doc_id"], 0)]
        assert g["n"] == n and g["n_above"] == n1 and g["n_below"] == n2
        assert g["n_runs"] == R
        a, N = 2 * n1 * n2, n1 + n2
        if a > N:
            mu = 1.0 + float(a) / float(N)
            var = float(a * (a - N)) / float(N * N * (N - 1))
            assert g["mu_runs"] == mu
            assert g["z_runs"] == (float(R) - mu) / math.sqrt(var)
            # pseudo-random series: |z| rarely large
            assert abs(g["z_runs"]) < 6.0


# ---------------------------------------------------------------- W26 ----
def test_burstiness_matches_bruteforce(ray_session):
    from anomalydetection_ray.pipelines.windows import w26_burstiness

    got = (w26_burstiness(SF).to_pandas()
           .set_index("user_id").sort_index())
    ev = (pq.read_table(f"{SF}/events.parquet",
                        columns=["event_id", "ts", "user_id"]).to_pandas()
          .sort_values(["user_id", "ts", "event_id"]))
    us = ev["ts"].astype("int64").to_numpy()
    checked = 0
    for uid, grp in ev.groupby("user_id"):
        t = grp["ts"].astype("int64").to_numpy()
        if len(t) < 2:
            assert uid not in got.index
            continue
        gaps = [(int(t[i + 1]) - int(t[i])) // 1_000_000
                for i in range(len(t) - 1)]
        row = got.loc[uid]
        assert row["n_gaps"] == len(gaps)
        S = sum(gaps)
        assert row["gap_sum_s"] == S
        sg = sorted(gaps)
        m = len(sg)
        assert row["med_gap_s"] == 0.5 * (sg[(m - 1) // 2] + sg[m // 2])
        Q = sum(g * g for g in gaps)
        sn = math.sqrt(float(m * Q - S * S))
        if sn + float(S) > 0:
            assert row["burstiness"] == (sn - float(S)) / (sn + float(S))
            assert -1.0 <= row["burstiness"] <= 1.0
        checked += 1
    # sf0.001 has few multi-event users; every one must be exact
    assert checked >= 10 and checked == len(got)


# ---------------------------------------------------------------- X6 ----
def test_triangle_census_matches_bruteforce(ray_session):
    import __ray_entry__ as e

    got = e.queries()["x6_triangle_census"](SF).to_pandas()
    assert len(got) == 1
    row = got.iloc[0]

    from anomalydetection_ray.pipelines.dedup import minhash_lsh_pairs

    pairs = (minhash_lsh_pairs(SF, min_est=0.2)
             .select_columns(["doc_a", "doc_b"]).to_pandas())
    edges = set(zip(pairs["doc_a"].astype(int), pairs["doc_b"].astype(int)))
    nodes = {a for a, _ in edges} | {b for _, b in edges}
    deg = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    wedges = sum(d * (d - 1) // 2 for d in deg.values())
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
    tri = sum(1 for a, b in edges for c in adj.get(b, ())
              if (a, c) in edges)
    assert row["n_nodes"] == len(nodes)
    assert row["n_edges"] == len(edges)
    assert row["n_wedges"] == wedges
    assert row["n_triangles"] == tri
    if wedges:
        assert row["transitivity"] == 3.0 * float(tri) / float(wedges)


# ---------------------------------------------------------------- K7 ----
def test_power_iteration_matches_bruteforce(ray_session):
    from anomalydetection_ray.pipelines.kmeans import (PSCALE,
                                                       k7_power_iteration)

    got = k7_power_iteration(SF).to_pandas().set_index("dim").sort_index()
    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["embedding"])
    emb = t.column("embedding").combine_chunks()
    ef = np.asarray(emb.values, dtype=np.float64).reshape(len(t), -1)
    dim = ef.shape[1]
    q = np.floor(ef * float(PSCALE) + 0.5).astype(np.int64)
    v = np.full(dim, PSCALE, dtype=np.int64)
    for it in (1, 2):
        y = q @ v
        w = [0] * dim
        for d in range(dim):
            w[d] = int((q[:, d].astype(object) * y.astype(object)).sum())
        acc = 0.0
        for d in range(dim):
            acc = acc + float(w[d]) * float(w[d])
        nrm = math.sqrt(acc)
        v = np.array([math.floor(float(w[d]) / nrm * float(PSCALE) + 0.5)
                      for d in range(dim)], dtype=np.int64)
        assert got[f"w{it}"].tolist() == w
        assert got[f"v{it}_q"].tolist() == v.tolist()
    # the requantized vector is (close to) unit scale: |v| ~ PSCALE
    vn = np.sqrt((v.astype(np.float64) ** 2).sum())
    assert abs(vn - PSCALE) < 0.05 * PSCALE


# ---------------------------------------------------------------- T13 ----
def test_unpivot_matches_pandas(ray_session):
    from anomalydetection_ray.pipelines.queries import t13_unpivot_lineitem

    got = t13_unpivot_lineitem(SF).to_pandas()
    li = pq.read_table(f"{SF}/lineitem.parquet").to_pandas()
    assert len(got) == 4 * len(li)
    # the (orderkey, linenumber) pair is NOT unique in the synthetic
    # data, so compare the complete sorted value multiset per measure
    for m in ("l_quantity", "l_extendedprice", "l_discount", "l_tax"):
        cents = np.sort(np.floor(li[m].to_numpy(dtype=np.float64) * 100.0
                                 + 0.5).astype(np.int64))
        gv = np.sort(got[got["measure"] == m]["value_cents"]
                     .to_numpy(np.int64))
        assert np.array_equal(gv, cents)


# ---------------------------------------------------------------- S17 ----
def test_feather_roundtrip_matches_source(ray_session):
    from anomalydetection_ray.pipelines.queries import s17_feather_roundtrip

    got = (s17_feather_roundtrip(SF).to_pandas()
           .set_index("source").sort_index())
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "source", "n_chars"]).to_pandas()
    ref = docs.groupby("source").agg(
        n_docs=("doc_id", "size"), chars_sum=("n_chars", "sum"),
        ids_sum=("doc_id", "sum"))
    assert got["n_docs"].to_dict() == ref["n_docs"].to_dict()
    assert got["chars_sum"].to_dict() == ref["chars_sum"].to_dict()
    assert got["ids_sum"].to_dict() == ref["ids_sum"].to_dict()


# ---------------------------------------------------------------- G18 ----
def test_weighted_median_matches_bruteforce(ray_session):
    from anomalydetection_ray.pipelines.queries import g18_weighted_median

    got = (g18_weighted_median(SF).to_pandas()
           .set_index("l_returnflag").sort_index())
    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_returnflag", "l_extendedprice",
                                "l_quantity"]).to_pandas()
    for flag, grp in li.groupby("l_returnflag"):
        cents = np.floor(grp["l_extendedprice"].to_numpy(np.float64)
                         * 100.0 + 0.5).astype(np.int64)
        qty = np.floor(grp["l_quantity"].to_numpy(np.float64)
                       + 0.5).astype(np.int64)
        order = np.argsort(cents, kind="stable")
        cs, qs = cents[order], qty[order]
        cum = np.cumsum(qs)
        tot = int(cum[-1])
        wm = int(cs[np.flatnonzero(2 * cum >= tot)[0]])
        row = got.loc[flag]
        assert row["total_qty"] == tot
        assert row["wmedian_cents"] == wm
        # weighted median sits inside the value range
        assert cs[0] <= wm <= cs[-1]


# ---------------------------------------------------------------- S18 ----
def test_partition_pruning_matches_pandas(ray_session):
    from anomalydetection_ray.pipelines.queries import s18_partition_pruning

    got = (s18_partition_pruning(SF).to_pandas()
           .set_index("day").sort_index())
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["ts", "value"]).to_pandas()
    day = (ev["ts"].astype("int64") // 86_400_000_000).to_numpy()
    cents = np.floor(ev["value"].to_numpy(np.float64) * 100.0
                     + 0.5).astype(np.int64)
    d0 = int(day.min()) + 10
    sel = (day >= d0) & (day <= d0 + 6)
    import pandas as pd

    ref = (pd.DataFrame({"day": day[sel], "cents": cents[sel]})
           .groupby("day").agg(n=("cents", "size"),
                               cents_sum=("cents", "sum")))
    assert got["n"].to_dict() == ref["n"].to_dict()
    assert got["cents_sum"].to_dict() == ref["cents_sum"].to_dict()
    assert len(got) >= 1


# ---------------------------------------------------------------- A32 ----
def test_amoc_split_matches_bruteforce(ray_session):
    from fractions import Fraction

    import __ray_entry__ as e

    got = (e.queries()["a32_amoc_split"](SF).to_pandas()
           .set_index(["doc_id", "part_id"]).sort_index())

    from anomalydetection_ray.sources.tokenize import tokenize_batch

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text", "source"])
    tok = tokenize_batch(docs)
    checked = 0
    for row in tok.to_pylist()[:40]:
        v = [int(x) for x in row["tokens"]]
        n = len(v)
        s = sum(v)
        best, bq = None, None
        p = 0
        for k in range(1, n):
            p += v[k - 1]
            q = Fraction(abs(p * n - s * k), k * (n - k))
            if bq is None or q > bq:
                best, bq = k, q
        g = got.loc[(row["doc_id"], 0)]
        assert g["n"] == n
        if best is None:
            assert np.isnan(g["gap"])
        else:
            assert g["split_pos"] == best
            pb = sum(v[:best])
            assert g["gap"] == float(abs(pb * n - s * best)) / float(
                best * (n - best))
            assert g["mean_l"] == float(pb) / float(best)
            assert g["mean_r"] == float(s - pb) / float(n - best)
        checked += 1
    assert checked == 40


# ------------------------------------------------------------- A33/A34 ----
def test_trend_tests_match_bruteforce(ray_session):
    import collections

    import __ray_entry__ as e

    mk = (e.queries()["a33_mann_kendall"](SF).to_pandas()
          .set_index("user_id").sort_index())
    tsn = (e.queries()["a34_theil_sen"](SF).to_pandas()
           .set_index("user_id").sort_index())

    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "ts", "event_id", "value"])
    by_u = collections.defaultdict(list)
    ts_us = ev.column("ts").cast(pa.int64()).to_pylist()
    for i, u in enumerate(ev.column("user_id").to_pylist()):
        by_u[u].append((ts_us[i], ev.column("event_id")[i].as_py(),
                        ev.column("value")[i].as_py()))
    assert len(mk) == len(by_u)
    for u, rows in sorted(by_u.items())[:30]:
        rows.sort()
        v = [r[2] for r in rows]
        t = [r[0] for r in rows]
        n = len(v)
        s = sum((v[j] > v[i]) - (v[j] < v[i])
                for i in range(n) for j in range(i + 1, n))
        ties = collections.Counter(v)
        var_num = (n * (n - 1) * (2 * n + 5)
                   - sum(t_ * (t_ - 1) * (2 * t_ + 5)
                         for t_ in ties.values()))
        g = mk.loc[u]
        assert g["n"] == n and g["s_stat"] == s and g["var_num"] == var_num
        if n >= 2 and var_num > 0:
            sd = math.sqrt(float(var_num) / 18.0)
            exp = 0.0 if s == 0 else (
                float(s - 1) / sd if s > 0 else float(s + 1) / sd)
            assert g["z_mk"] == exp
        slopes = sorted((v[j] - v[i]) / float(t[j] - t[i])
                        for i in range(n) for j in range(i + 1, n)
                        if t[j] != t[i])
        if slopes:
            g2 = tsn.loc[u]
            assert g2["n_pairs"] == len(slopes)
            assert g2["slope_med"] == slopes[(len(slopes) - 1) // 2]
            assert g2["slope_min"] == slopes[0]
            assert g2["slope_max"] == slopes[-1]


# ---------------------------------------------------------------- Q12 ----
def test_span_corruption_matches_bruteforce(ray_session):
    import __ray_entry__ as e

    got = (e.queries()["q12_span_corruption"](SF).to_pandas()
           .set_index(["doc_id", "part_id"]).sort_index())

    from anomalydetection_ray.sources.tokenize import tokenize_batch

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text", "source"])
    tok = tokenize_batch(docs)
    M = 1 << 32
    checked = 0
    for row in tok.to_pylist()[:40]:
        v = [int(x) for x in row["tokens"]]
        d = int(row["doc_id"])
        masked = [((((d % M) * 2654435761 + i) % M) * 2654435761 % M) % 100 < 15
                  for i in range(len(v))]
        n_spans = sum(1 for i, m in enumerate(masked)
                      if m and (i == 0 or not masked[i - 1]))
        g = got.loc[(row["doc_id"], 0)]
        assert g["n"] == len(v)
        assert g["n_masked"] == sum(masked)
        assert g["n_spans"] == n_spans
        assert g["masked_sum"] == sum(x for x, m in zip(v, masked) if m)
        assert g["mask_checksum"] == sum((i + 1) * x for i, (x, m)
                                         in enumerate(zip(v, masked)) if m)
        checked += 1
    assert checked == 40


# ---------------------------------------------------------------- V11 ----
def test_coverage_curve_matches_bruteforce(ray_session):
    import collections

    import __ray_entry__ as e

    got = (e.queries()["v11_coverage_curve"](SF).to_pandas()
           .set_index("source").sort_index())

    from anomalydetection_ray.sources.tokenize import tokenize_batch

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text", "source"])
    tok = tokenize_batch(docs)
    per_src = collections.defaultdict(collections.Counter)
    for row in tok.to_pylist():
        per_src[row["source"]].update(int(x) for x in row["tokens"])
    assert len(got) == len(per_src)
    for src, c in per_src.items():
        ordered = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
        tot = sum(c.values())
        g = got.loc[src]
        assert g["n_types"] == len(c) and g["total_tokens"] == tot
        for p, col in ((50, "k50"), (90, "k90"), (99, "k99")):
            cum = 0
            for k, (_, cnt) in enumerate(ordered, start=1):
                cum += cnt
                if cum * 100 >= p * tot:
                    assert g[col] == k
                    break


# ---------------------------------------------------------------- T14 ----
def test_dup_ngram_fraction_matches_bruteforce(ray_session):
    import collections

    import __ray_entry__ as e

    got = (e.queries()["t14_dup_ngram_fraction"](SF).to_pandas()
           .set_index("doc_id").sort_index())

    from anomalydetection_ray.sources.tokenize import tokenize_batch

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text", "source"])
    tok = tokenize_batch(docs)
    M = 1 << 64
    gram_docs = collections.defaultdict(set)
    per_doc = {}
    for row in tok.to_pylist():
        v = [int(x) for x in row["tokens"]]
        grams = []
        for i in range(len(v) - 7):
            h = v[i]
            for j in range(1, 8):
                h = (h * 1000003 + v[i + j]) % M
            grams.append(h)
            gram_docs[h].add(row["doc_id"])
        per_doc[row["doc_id"]] = grams
    n_expected = sum(1 for g in per_doc.values() if g)
    assert len(got) == n_expected
    for doc, grams in list(per_doc.items())[:60]:
        if not grams:
            continue
        dup = sum(1 for h in grams if len(gram_docs[h]) >= 2)
        g = got.loc[doc]
        assert g["n_grams"] == len(grams) and g["n_dup"] == dup
        assert g["dup_frac"] == float(dup) / float(len(grams))


# ---------------------------------------------------------------- W27 ----
def test_monotone_streaks_matches_bruteforce(ray_session):
    from anomalydetection_ray.pipelines.windows import w27_monotone_streaks

    got = (w27_monotone_streaks(SF, num_partitions=5).to_pandas()
           .set_index("user_id").sort_index())

    ev = (pq.read_table(f"{SF}/events.parquet",
                        columns=["event_id", "ts", "user_id", "value"])
          .to_pandas().sort_values(["user_id", "ts", "event_id"]))
    for uid, g in ev.groupby("user_id"):
        v = g["value"].to_numpy()
        longest = best = 1
        n_up = 0
        run_had_inc = False
        for i in range(1, len(v)):
            if v[i] > v[i - 1]:
                best += 1
                if not run_had_inc:
                    n_up += 1
                    run_had_inc = True
            else:
                best = 1
                run_had_inc = False
            longest = max(longest, best)
        r = got.loc[uid]
        assert r["n_events"] == len(v)
        assert r["longest_streak"] == longest
        assert r["n_up_runs"] == n_up
    assert len(got) == ev["user_id"].nunique()


# ---------------------------------------------------------------- G19 ----
def test_rolling_distinct_matches_bruteforce(ray_session):
    from anomalydetection_ray.pipelines.queries import g19_rolling_distinct

    got = (g19_rolling_distinct(SF, num_partitions=5).to_pandas()
           .set_index(["event_type", "day"]).sort_index())

    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["ts", "event_type", "user_id"]).to_pandas()
    ev["day"] = (ev["ts"].astype("int64") // 86_400_000_000).astype("int64")
    tri = ev[["event_type", "day", "user_id"]].drop_duplicates()
    n_checked = 0
    for (et, d), _ in tri.groupby(["event_type", "day"]):
        win = tri[(tri["event_type"] == et)
                  & (tri["day"].between(d - 6, d))]
        assert got.loc[(et, d), "u7"] == win["user_id"].nunique()
        n_checked += 1
    assert len(got) == n_checked


# ---------------------------------------------------------------- A35 ----
def test_seasonal_energy_matches_bruteforce(ray_session):
    from anomalydetection_ray.pipelines.queries import a35_seasonal_energy

    got = (a35_seasonal_energy(SF).to_pandas()
           .set_index("event_type").sort_index())

    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_type", "ts", "value"]).to_pandas()
    ev["day"] = (ev["ts"].astype("int64") // 86_400_000_000).astype("int64")
    ev["v100"] = np.floor(ev["value"].to_numpy() * 100.0 + 0.5).astype("int64")
    for et, g in ev.groupby("event_type"):
        d = g.groupby("day")["v100"].sum()
        s_alt = sum(int(x) if dd % 2 == 0 else -int(x)
                    for dd, x in d.items())
        c4 = sum(int(x) if dd % 4 == 0 else (-int(x) if dd % 4 == 2 else 0)
                 for dd, x in d.items())
        s4 = sum(int(x) if dd % 4 == 1 else (-int(x) if dd % 4 == 3 else 0)
                 for dd, x in d.items())
        r = got.loc[et]
        assert r["n_days"] == len(d)
        assert r["s_alt"] == s_alt and r["c4"] == c4 and r["s4"] == s4
        assert r["p2"] == float(s_alt) * float(s_alt)
        assert r["p4"] == float(c4) * float(c4) + float(s4) * float(s4)


# ---------------------------------------------------------------- W28 ----
def test_rolling_extrema_matches_pandas(ray_session):
    from anomalydetection_ray.pipelines.windows import w28_rolling_extrema

    got = (w28_rolling_extrema(SF, k=5, num_partitions=5).to_pandas()
           .set_index("event_id").sort_index())

    ev = (pq.read_table(f"{SF}/events.parquet",
                        columns=["event_id", "ts", "user_id", "value"])
          .to_pandas().sort_values(["user_id", "ts", "event_id"]))
    g = ev.groupby("user_id")["value"]
    ev["rmax"] = g.transform(lambda s: s.rolling(5, min_periods=1).max())
    ev["rmin"] = g.transform(lambda s: s.rolling(5, min_periods=1).min())
    exp = ev.set_index("event_id").sort_index()
    assert (got["rmax"] == exp["rmax"]).all()
    assert (got["rmin"] == exp["rmin"]).all()
    assert (got["rrange"] == exp["rmax"] - exp["rmin"]).all()
    assert len(got) == len(exp)


# ---------------------------------------------------------------- W29 ----
def test_arrival_lateness_matches_bruteforce(ray_session):
    from anomalydetection_ray.pipelines.windows import w29_arrival_lateness

    got = (w29_arrival_lateness(SF).to_pandas()
           .set_index("event_type").sort_index())

    ev = (pq.read_table(f"{SF}/events.parquet",
                        columns=["event_id", "ts", "event_type"])
          .to_pandas().sort_values("event_id"))
    ev["us"] = ev["ts"].astype("int64")
    for et, g in ev.groupby("event_type"):
        us = g["us"].to_numpy()
        rmax = np.maximum.accumulate(us)
        late = us < rmax
        ls = (rmax - us)[late] // 1_000_000
        r = got.loc[et]
        assert r["n_events"] == len(us)
        assert r["n_late"] == int(late.sum())
        assert r["max_late_s"] == (int(ls.max()) if ls.size else 0)
        assert r["sum_late_s"] == (int(ls.sum()) if ls.size else 0)
        if ls.size:
            assert r["med_late_s"] == float(np.median(ls))
        else:
            assert np.isnan(r["med_late_s"])


# ---------------------------------------------------------------- A36 ----
def test_rescaled_range_matches_bruteforce(ray_session):
    import math

    from anomalydetection_ray.pipelines.queries import a36_rescaled_range

    got = (a36_rescaled_range(SF).to_pandas()
           .set_index("event_type").sort_index())

    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_type", "ts", "value"]).to_pandas()
    ev["day"] = (ev["ts"].astype("int64") // 86_400_000_000).astype("int64")
    ev["v100"] = np.floor(ev["value"].to_numpy() * 100.0 + 0.5).astype("int64")
    for et, g in ev.groupby("event_type"):
        xs = [int(v) for v in g.groupby("day")["v100"].sum().sort_index()]
        n = len(xs)
        S = sum(xs)
        Q = sum(v * v for v in xs)
        p = 0
        cumdev = []
        for i, v in enumerate(xs, start=1):
            p += v
            cumdev.append(n * p - i * S)
        r_range = max(cumdev) - min(cumdev)
        var_num = n * Q - S * S
        r = got.loc[et]
        assert r["n_days"] == n
        assert r["r_range"] == r_range
        assert r["var_num"] == var_num
        assert r["rs"] == float(r_range) / math.sqrt(float(var_num))


# ---------------------------------------------------------------- J12 ----
def test_band_join_count_matches_bruteforce(ray_session):
    from anomalydetection_ray.pipelines.queries import j12_band_join_count

    w_s = 72 * 3600
    got = (j12_band_join_count(SF, window_s=w_s, num_partitions=5)
           .to_pandas().set_index("event_id").sort_index())

    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    ev["us"] = ev["ts"].astype("int64")
    ev["v100"] = np.floor(ev["value"].to_numpy() * 100.0 + 0.5).astype("int64")
    p = ev[ev["event_type"] == "purchase"]
    err = ev[ev["event_type"] == "error"]
    total_hits = 0
    for _, row in p.iterrows():
        win = err[(err["user_id"] == row["user_id"])
                  & (err["us"] >= row["us"] - w_s * 1_000_000)
                  & (err["us"] < row["us"])]
        r = got.loc[row["event_id"]]
        assert r["n_prior_errors"] == len(win)
        assert r["err_cents_sum"] == int(win["v100"].sum())
        total_hits += len(win)
    assert len(got) == len(p)
    assert total_hits > 0          # the band is wide enough to be non-trivial


# ---------------------------------------------------------------- S19 ----
def test_gzip_jsonl_roundtrip_matches_source(ray_session):
    from anomalydetection_ray.pipelines.queries import s19_gzip_jsonl_roundtrip

    got = (s19_gzip_jsonl_roundtrip(SF).to_pandas()
           .set_index("source").sort_index())

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["source", "n_chars", "text"]).to_pandas()
    for src, g in docs.groupby("source"):
        r = got.loc[src]
        assert r["n_docs"] == len(g)
        assert r["chars_sum"] == int(g["n_chars"].sum())
        assert r["words_sum"] == int(sum(len(t.split(" ")) for t in g["text"]))
    assert len(got) == docs["source"].nunique()


# ----------------------------------------------------------------- D9 ----
def test_cross_source_matrix_matches_pairs(ray_session):
    from anomalydetection_ray.pipelines.dedup import (
        d9_cross_source_matrix, minhash_lsh_pairs)

    got = (d9_cross_source_matrix(SF).to_pandas()
           .set_index(["source_a", "source_b"]).sort_index())

    pairs = minhash_lsh_pairs(SF).to_pandas()
    src = pq.read_table(f"{SF}/documents.parquet",
                        columns=["doc_id", "source"]).to_pandas()
    smap = dict(zip(src["doc_id"], src["source"]))
    pairs["sa"] = pairs["doc_a"].map(smap)
    pairs["sb"] = pairs["doc_b"].map(smap)
    pairs["source_a"] = pairs[["sa", "sb"]].min(axis=1)
    pairs["source_b"] = pairs[["sa", "sb"]].max(axis=1)
    pairs["k"] = np.floor(pairs["est_jaccard"].to_numpy() * 64.0
                          + 0.5).astype("int64")
    exp = pairs.groupby(["source_a", "source_b"]).agg(
        n_pairs=("k", "size"), sum_k=("k", "sum"))
    assert len(got) == len(exp)
    for idx, e in exp.iterrows():
        r = got.loc[idx]
        assert r["n_pairs"] == e["n_pairs"]
        assert r["sum_k"] == e["sum_k"]
        assert r["mean_est_jaccard"] == (
            float(e["sum_k"]) / (float(e["n_pairs"]) * 64.0))


# ---------------------------------------------------------------- Q13 ----
def test_mixture_sample_matches_bruteforce(ray_session):
    import math

    from anomalydetection_ray.pipelines.packing import q13_mixture_sample

    k = 60
    got = (q13_mixture_sample(SF, k_total=k, seed=7, num_partitions=5)
           .to_pandas().sort_values(["source", "smp_rank"])
           .reset_index(drop=True))

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "source"]).to_pandas()
    per = docs.groupby("source").size().sort_index()
    wgt = {s: math.sqrt(float(n)) for s, n in per.items()}
    total_w = 0.0
    for s in per.index:
        total_w = total_w + wgt[s]
    smix = (7 * 2654435761) & 0xFFFFFFFF
    docs["h"] = (((docs["doc_id"].to_numpy().astype(np.uint64)
                   & np.uint64(0xFFFFFFFF)) ^ np.uint64(smix))
                 * np.uint64(2654435761)) & np.uint64(0xFFFFFFFF)
    rows = []
    for s in per.index:
        quota = int(math.floor((float(k) * wgt[s]) / total_w))
        sel = (docs[docs["source"] == s]
               .sort_values(["h", "doc_id"]).head(quota))
        for rnk, (_, r) in enumerate(sel.iterrows()):
            rows.append((s, int(r["doc_id"]), int(r["h"]), rnk))
    import pandas as pd
    exp = pd.DataFrame(rows, columns=["source", "doc_id", "h", "smp_rank"])
    pd.testing.assert_frame_equal(
        got[["source", "doc_id", "h", "smp_rank"]].astype(
            {"doc_id": "int64", "h": "int64", "smp_rank": "int64"}),
        exp.astype({"doc_id": "int64", "h": "int64", "smp_rank": "int64"}))
    # tail sources get boosted relative to proportional sampling
    assert got["source"].nunique() >= max(1, len(per) - 2)


# ---------------------------------------------------------------- T16 ----
def test_char_entropy_matches_bruteforce(ray_session):
    import math

    from anomalydetection_ray.pipelines.text import t16_char_entropy

    got = (t16_char_entropy(SF).to_pandas()
           .set_index("source").sort_index())

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["source", "text"]).to_pandas()
    for src, g in docs.groupby("source"):
        buf = "".join(g["text"]).encode()
        counts = np.bincount(np.frombuffer(buf, dtype=np.uint8),
                             minlength=256)
        nz = counts[counts > 0]
        total = int(nz.sum())
        acc = 0.0
        for c in sorted(np.flatnonzero(counts).tolist()):
            p = float(int(counts[c])) / float(total)
            acc = acc + p * math.log(p)
        r = got.loc[src]
        assert r["total_bytes"] == total
        assert r["n_distinct_bytes"] == len(nz)
        assert r["entropy"] == -acc
        assert r["norm_entropy"] == -acc / math.log(float(len(nz)))
        assert 3.5 < r["entropy"] / math.log(2.0) < 5.5   # prose-like


# ---------------------------------------------------------------- A37 ----
def test_pettitt_matches_bruteforce(ray_session):
    from anomalydetection_ray.pipelines.queries import a37_pettitt

    got = (a37_pettitt(SF).to_pandas()
           .set_index("event_type").sort_index())

    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_type", "ts", "value"]).to_pandas()
    ev["day"] = ev["ts"].astype("int64") // 86_400_000_000
    ev["v100"] = np.floor(ev["value"] * 100.0 + 0.5).astype(np.int64)
    for et, g in ev.groupby("event_type"):
        daily = g.groupby("day")["v100"].sum().sort_index()
        x = [int(v) for v in daily.tolist()]
        n = len(x)
        # brute-force U_t = sum_{i<=t} sum_{j>t} sgn(x_i - x_j)
        def sgn(a, b):
            return (a > b) - (a < b)
        best_k, best_t = -1, None
        for t in range(1, n):
            u = sum(sgn(x[i], x[j])
                    for i in range(t) for j in range(t, n))
            if abs(u) > best_k:
                best_k, best_t = abs(u), t
        r = got.loc[et]
        assert int(r["n_days"]) == n
        assert int(r["k_stat"]) == best_k
        assert int(r["tau_day"]) == int(daily.index[best_t - 1])
        exp_p = 2.0 * math.exp(float(-6 * best_k * best_k)
                               / float(n ** 3 + n ** 2))
        assert r["p_approx"] == exp_p


# ---------------------------------------------------------------- G20 ----
def test_spearman_matches_scipy_free_bruteforce(ray_session):
    from anomalydetection_ray.pipelines.queries import g20_spearman_daily

    got = (g20_spearman_daily(SF).to_pandas()
           .set_index("event_type").sort_index())

    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_type", "ts", "value"]).to_pandas()
    ev["day"] = ev["ts"].astype("int64") // 86_400_000_000
    ev["v100"] = np.floor(ev["value"] * 100.0 + 0.5).astype(np.int64)
    for et, g in ev.groupby("event_type"):
        agg = g.groupby("day").agg(x=("v100", "sum"), c=("v100", "size"))
        # pandas average ranks == mid-ranks; doubled they are ints
        a = (2.0 * agg["x"].rank(method="average")).astype(np.int64)
        b = (2.0 * agg["c"].rank(method="average")).astype(np.int64)
        n = len(agg)
        sa, sb = int(a.sum()), int(b.sum())
        saa = int((a * a).sum())
        sbb = int((b * b).sum())
        sab = int((a * b).sum())
        num = n * sab - sa * sb
        d1 = n * saa - sa * sa
        d2 = n * sbb - sb * sb
        r = got.loc[et]
        assert int(r["n_days"]) == n
        assert int(r["num"]) == num
        assert int(r["d1"]) == d1
        assert int(r["d2"]) == d2
        if d1 > 0 and d2 > 0:
            assert r["rho"] == (float(num)
                                / (math.sqrt(float(d1))
                                   * math.sqrt(float(d2))))
            assert -1.0 <= r["rho"] <= 1.0


# ---------------------------------------------------------------- Q14 ----
def test_length_buckets_exact(ray_session):
    from anomalydetection_ray.pipelines.packing import q14_length_buckets

    got = (q14_length_buckets(SF).to_pandas()
           .set_index("bucket").sort_index())

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["text"]).to_pandas()
    n_tok = docs["text"].map(
        lambda t: sum(1 for w in t.split(" ") if w != ""))

    def pow2_bucket(n):
        b = 1
        while b < max(n, 1):
            b <<= 1
        return b

    buckets = n_tok.map(pow2_bucket)
    exp = (
        docs.assign(bucket=buckets, n_tok=n_tok)
        .groupby("bucket")
        .agg(n_docs=("n_tok", "size"), tokens_sum=("n_tok", "sum")))
    assert set(got.index) == set(exp.index)
    for b, r in exp.iterrows():
        g = got.loc[b]
        assert int(g["n_docs"]) == int(r["n_docs"])
        assert int(g["tokens_sum"]) == int(r["tokens_sum"])
        padded = int(b) * int(r["n_docs"])
        assert int(g["padded_tokens"]) == padded
        assert int(g["pad_overhead"]) == padded - int(r["tokens_sum"])
        assert g["pad_frac"] == (float(padded - int(r["tokens_sum"]))
                                 / float(padded))
    # padding waste must be < 50% by construction of power-of-two buckets
    tot_pad = int(got["pad_overhead"].sum())
    tot_padded = int(got["padded_tokens"].sum())
    assert tot_pad * 2 < tot_padded


# ---------------------------------------------------------------- G21 ----
def test_theil_index_matches_bruteforce(ray_session):
    from anomalydetection_ray.pipelines.queries import g21_theil_index

    got = (g21_theil_index(SF).to_pandas()
           .set_index("source").sort_index())

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "source", "n_chars"]).to_pandas()
    for src, g in docs.groupby("source"):
        g = g.sort_values(["n_chars", "doc_id"])
        x = [int(v) for v in g["n_chars"].tolist()]
        n, s = len(x), sum(x)
        acc_t = acc_l = 0.0
        for xi in x:
            ratio = float(xi * n) / float(s)
            lr = math.log(ratio)
            acc_t += ratio * lr
            acc_l += lr
        r = got.loc[src]
        assert int(r["n_docs"]) == n
        assert int(r["sum_chars"]) == s
        assert r["theil_t"] == acc_t / float(n)
        assert r["theil_l"] == -acc_l / float(n)
        # Theil-T of a near-uniform length distribution is small, >= 0
        # up to fold rounding
        assert r["theil_t"] > -1e-12
        assert r["theil_l"] > -1e-12


# ---------------------------------------------------------------- W30 ----
def test_winsorized_mean_matches_bruteforce(ray_session):
    from anomalydetection_ray.pipelines.windows import w30_winsorized_mean

    got = (w30_winsorized_mean(SF).to_pandas()
           .set_index("user_id").sort_index())

    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_id", "user_id", "value"]).to_pandas()
    for uid, g in ev.groupby("user_id"):
        g = g.sort_values(["value", "event_id"])
        vq = np.floor(g["value"].to_numpy() * 1_000_000 + 0.5).astype(
            np.int64)
        n = len(vq)
        m = n // 10
        clamped = vq.copy()
        clamped[:m] = vq[m]
        clamped[n - m:] = vq[n - m - 1]
        r = got.loc[uid]
        assert int(r["n"]) == n
        assert int(r["n_wins"]) == m
        assert int(r["sum_q"]) == int(clamped.sum())
        assert r["winsor_mean"] == (float(int(clamped.sum()))
                                    / (float(n) * 1_000_000))
        # clamping never moves the mean past the raw extremes
        assert g["value"].min() - 1e-6 <= r["winsor_mean"] \
            <= g["value"].max() + 1e-6


# ---------------------------------------------------------------- J13 ----
def test_interval_anti_complements_stab(ray_session):
    from anomalydetection_ray.pipelines.windows import (
        N_WINDOWS, j13_interval_anti, seeded_windows)

    got = (j13_interval_anti(SF).to_pandas()
           .set_index("event_type").sort_index())

    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_type", "ts", "value"]).to_pandas()
    us = ev["ts"].astype("int64").to_numpy()
    lo, hi = seeded_windows(int(us.min()), int(us.max()), N_WINDOWS)
    covered = np.zeros(len(us), dtype=bool)
    for k in range(len(lo)):
        covered |= (us >= lo[k]) & (us < hi[k])
    ev["outside"] = ~covered
    ev["v100"] = np.floor(ev["value"] * 100.0 + 0.5).astype(np.int64)
    for et, g in ev.groupby("event_type"):
        r = got.loc[et]
        n_out = int(g["outside"].sum())
        assert int(r["n_outside"]) == n_out
        assert int(r["cents_outside"]) == int(
            g.loc[g["outside"], "v100"].sum())
        assert int(r["n_total"]) == len(g)
        assert r["outside_frac"] == float(n_out) / float(len(g))


# ---------------------------------------------------------------- D10 ----
def test_containment_pairs_exact(ray_session):
    import re

    from anomalydetection_ray.pipelines.dedup import d10_containment_pairs

    got = d10_containment_pairs(SF).to_pandas()
    assert len(got) > 0

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    txt = dict(zip(docs["doc_id"], docs["text"]))
    wre = re.compile(r"[0-9a-z_]+")

    def gset(t):
        ws = wre.findall(t.lower())
        return {" ".join(ws[i:i + 3]) for i in range(len(ws) - 2)}

    for _, r in got.iterrows():
        ga, gb = gset(txt[r["doc_a"]]), gset(txt[r["doc_b"]])
        inter = len(ga & gb)
        assert int(r["inter"]) == inter
        assert int(r["n_a"]) == len(ga)
        assert int(r["n_b"]) == len(gb)
        assert r["cont_a"] == float(inter) / float(max(len(ga), 1))
        assert r["cont_b"] == float(inter) / float(max(len(gb), 1))
        # containment dominates Jaccard and clears the bar
        jac = inter / max(len(ga | gb), 1)
        assert max(r["cont_a"], r["cont_b"]) >= max(jac, 0.5)


# ---------------------------------------------------------------- S20 ----
def test_zonemap_pruning_reads_subset_and_matches(ray_session):
    from anomalydetection_ray.pipelines.queries import s20_zonemap_pruning

    got = (s20_zonemap_pruning(SF).to_pandas()
           .set_index("day").sort_index())

    plan = s20_zonemap_pruning.last_plan
    assert plan["rg_total"] > plan["rg_scanned"] > 0, plan

    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["ts", "value"]).to_pandas()
    day = ev["ts"].astype("int64") // 86_400_000_000
    d0 = int(day.min()) + 10
    sel = ev[(day >= d0) & (day <= d0 + 6)]
    sel_day = sel["ts"].astype("int64") // 86_400_000_000
    v100 = np.floor(sel["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
    exp = (sel.assign(day=sel_day, v100=v100)
           .groupby("day").agg(n=("v100", "size"), cents=("v100", "sum")))
    assert set(got.index) == set(exp.index)
    for d, r in exp.iterrows():
        assert int(got.loc[d, "n"]) == int(r["n"])
        assert int(got.loc[d, "cents_sum"]) == int(r["cents"])


# ---------------------------------------------------------------- G22 ----
def test_value_quantiles_by_type_exact(ray_session):
    from anomalydetection_ray.pipelines.queries import (
        g22_value_quantiles_by_type)

    got = (g22_value_quantiles_by_type(SF).to_pandas()
           .set_index("event_type").sort_index())

    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_type", "value"]).to_pandas()
    ev["v100"] = np.floor(ev["value"] * 100.0 + 0.5).astype(np.int64)
    for et, g in ev.groupby("event_type"):
        v = np.sort(g["v100"].to_numpy())
        n = len(v)
        r = got.loc[et]
        assert int(r["n"]) == n
        for q, col in ((0.5, "p50_cents"), (0.9, "p90_cents"),
                       (0.99, "p99_cents")):
            k = min(int(math.ceil(q * n)), n)
            assert int(r[col]) == int(v[max(k, 1) - 1]), (et, col)
        assert r["p50_cents"] <= r["p90_cents"] <= r["p99_cents"]


# ---------------------------------------------------------------- W31 ----
def test_session_summary_matches_sessionize(ray_session):
    from anomalydetection_ray.pipelines.windows import (
        w1_sessionize_events, w31_session_summary)

    got = (w31_session_summary(SF).to_pandas()
           .set_index("user_id").sort_index())
    sess = w1_sessionize_events(SF).to_pandas()

    agg = sess.groupby("user_id").agg(
        n_events=("n_events", "sum"),
        n_sessions=("n_events", "size"),
        max_session_events=("n_events", "max"),
        in_session_us=("duration_us", "sum"))
    assert set(got.index) == set(agg.index)
    for uid, r in agg.iterrows():
        g = got.loc[uid]
        for c in ("n_events", "n_sessions", "max_session_events",
                  "in_session_us"):
            assert int(g[c]) == int(r[c]), (uid, c)
        assert g["mean_session_events"] == (float(int(r["n_events"]))
                                            / float(int(r["n_sessions"])))
        assert g["mean_session_us"] == (float(int(r["in_session_us"]))
                                        / float(int(r["n_sessions"])))


# ---------------------------------------------------------------- Q15 ----
def test_token_budget_select_greedy(ray_session):
    from anomalydetection_ray.pipelines.packing import (
        q15_token_budget_select)

    budget = 5_000
    got = (q15_token_budget_select(SF, budget=budget).to_pandas()
           .sort_values(["n_tok", "doc_id"]).reset_index(drop=True))
    assert len(got) > 0

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    docs["n_tok"] = docs["text"].map(
        lambda t: sum(1 for w in t.split(" ") if w != ""))
    docs = docs.sort_values(["n_tok", "doc_id"]).reset_index(drop=True)
    docs["cum"] = docs["n_tok"].cumsum()
    exp = docs[docs["cum"] <= budget]
    assert list(got["doc_id"]) == list(exp["doc_id"])
    assert list(got["n_tok"]) == list(exp["n_tok"])
    assert list(got["cum_tok"]) == list(exp["cum"])
    # greedy shortest-first admits the maximum possible count
    assert int(got["cum_tok"].max()) <= budget
    rest = docs[docs["cum"] > budget]
    if len(rest):
        assert int(got["cum_tok"].max()) + int(rest["n_tok"].iloc[0]) \
            > budget


# ---------------------------------------------------------------- X7 ----
def test_degree_assortativity_exact(ray_session):
    from anomalydetection_ray.pipelines.dedup import minhash_lsh_pairs
    from anomalydetection_ray.stages.cc import degree_assortativity

    pairs = minhash_lsh_pairs(SF, min_est=0.2).select_columns(
        ["doc_a", "doc_b"])
    edges = pairs.to_pandas()
    got = degree_assortativity(
        minhash_lsh_pairs(SF, min_est=0.2).select_columns(
            ["doc_a", "doc_b"]),
        "doc_a", "doc_b").to_pandas().iloc[0]

    import collections
    deg = collections.Counter()
    for _, r in edges.iterrows():
        deg[r["doc_a"]] += 1
        deg[r["doc_b"]] += 1
    pts = []
    for _, r in edges.iterrows():
        pts.append((deg[r["doc_a"]], deg[r["doc_b"]]))
        pts.append((deg[r["doc_b"]], deg[r["doc_a"]]))
    n = len(pts)
    sx = sum(a for a, _ in pts)
    sxx = sum(a * a for a, _ in pts)
    sxy = sum(a * b for a, b in pts)
    assert int(got["n_endpoints"]) == n
    assert int(got["sx"]) == sx
    assert int(got["sxx"]) == sxx
    assert int(got["sxy"]) == sxy
    den = n * sxx - sx * sx
    if den > 0:
        assert got["assortativity"] == float(n * sxy - sx * sx) / float(den)
        assert -1.0 - 1e-12 <= got["assortativity"] <= 1.0 + 1e-12


# ---------------------------------------------------------------- V13 ----
def test_heaps_curve_matches_bruteforce(ray_session):
    from anomalydetection_ray.pipelines.vocab import v13_heaps_curve

    got = (v13_heaps_curve(SF).to_pandas()
           .set_index("k").sort_index())

    docs = (pq.read_table(f"{SF}/documents.parquet",
                          columns=["doc_id", "text"]).to_pandas()
            .sort_values("doc_id"))
    n = len(docs)
    seen = set()
    types_at, tokens_at = {}, {}
    tok = 0
    his = {(k + 1) * n // 10 - 1 for k in range(10)}
    for _, r in docs.iterrows():
        ws = [w for w in r["text"].split(" ") if w != ""]
        tok += len(ws)
        seen.update(ws)
        if int(r["doc_id"]) in his:
            types_at[int(r["doc_id"])] = len(seen)
            tokens_at[int(r["doc_id"])] = tok
    for k in range(10):
        hi = (k + 1) * n // 10 - 1
        r = got.loc[k]
        assert int(r["doc_hi"]) == hi
        assert int(r["types_cum"]) == types_at[hi]
        assert int(r["tokens_cum"]) == tokens_at[hi]
    # monotone growth, sub-linear type growth (Heaps)
    assert got["types_cum"].is_monotonic_increasing
    assert got["tokens_cum"].is_monotonic_increasing
    assert int(got["types_cum"].iloc[-1]) < int(got["tokens_cum"].iloc[-1])


# ---------------------------------------------------------------- Q16 ----
def test_shard_balance_round_robin(ray_session):
    from anomalydetection_ray.pipelines.packing import q16_shard_balance

    got = (q16_shard_balance(SF).to_pandas()
           .set_index("shard").sort_index())
    assert list(got.index) == list(range(8))

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    docs["n_tok"] = docs["text"].map(
        lambda t: sum(1 for w in t.split(" ") if w != ""))
    docs = docs.sort_values(["n_tok", "doc_id"]).reset_index(drop=True)
    docs["shard"] = docs.index % 8
    exp = docs.groupby("shard").agg(n_docs=("n_tok", "size"),
                                    tokens_sum=("n_tok", "sum"))
    tot = int(docs["n_tok"].sum())
    for s, r in exp.iterrows():
        g = got.loc[s]
        assert int(g["n_docs"]) == int(r["n_docs"])
        assert int(g["tokens_sum"]) == int(r["tokens_sum"])
        assert g["balance_ratio"] == (float(8 * int(r["tokens_sum"]))
                                      / float(tot))
    # interleaving keeps every shard within 2% of the ideal split
    assert got["balance_ratio"].between(0.98, 1.02).all()


# ---------------------------------------------------------------- J14 ----
def test_asof_tolerance_nulls_stale(ray_session):
    from anomalydetection_ray.pipelines.queries import (j14_asof_tolerance,
                                                        j4_asof_join)

    tol = 43_200_000_000
    got = (j14_asof_tolerance(SF, tolerance_us=tol).to_pandas()
           .set_index("event_id").sort_index())
    base = (j4_asof_join(SF).to_pandas()
            .set_index("event_id").sort_index())

    # J14 == J4 wherever the match is fresh; stale/absent matches null
    fresh = got["age_us"].notna()
    assert (got.loc[fresh, "age_us"] <= tol).all()
    assert (got.loc[fresh, "calib_event_id"]
            == base.loc[fresh, "calib_event_id"]).all()
    assert (got.loc[fresh, "calib_value"]
            == base.loc[fresh, "calib_value"]).all()
    stale = ~fresh
    assert got.loc[stale, "calib_value"].isna().all()
    assert got.loc[stale, "calib_event_id"].isna().all()
    # some matches must actually be rejected for the guard to be tested
    assert stale.sum() > 0 and fresh.sum() > 0


# ---------------------------------------------------------------- P6 ----
def test_sequence_composition_consistent_with_packing(ray_session):
    from anomalydetection_ray.pipelines.packing import (
        p6_sequence_composition, pack_sequences)

    got = (p6_sequence_composition(SF).to_pandas()
           .set_index("seq_id").sort_index())
    packed = pack_sequences(SF).to_pandas()

    total = int(packed["n_tok"].sum())
    n_seqs = (total + 1023) // 1024
    assert list(got.index) == list(range(n_seqs))
    # brute-force doc count per sequence
    import collections
    cnt = collections.Counter()
    for _, r in packed.iterrows():
        if int(r["n_tok"]) == 0:
            continue
        s0 = int(r["tok_offset"]) // 1024
        s1 = (int(r["tok_offset"]) + int(r["n_tok"]) - 1) // 1024
        for s in range(s0, s1 + 1):
            cnt[s] += 1
    for s in range(n_seqs):
        assert int(got.loc[s, "n_docs"]) == cnt[s]
        assert int(got.loc[s, "n_boundaries"]) == cnt[s] - 1
        assert int(got.loc[s, "n_tokens"]) == min(1024, total - s * 1024)
    # every token is accounted for exactly once
    assert int(got["n_tokens"].sum()) == total


# ---------------------------------------------------------------- A38 ----
def test_mann_whitney_matches_bruteforce(ray_session):
    from anomalydetection_ray.pipelines.queries import a38_mann_whitney

    got = (a38_mann_whitney(SF).to_pandas()
           .set_index("event_type").sort_index())

    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_type", "ts", "value"]).to_pandas()
    ev["day"] = ev["ts"].astype("int64") // 86_400_000_000
    ev["v100"] = np.floor(ev["value"] * 100.0 + 0.5).astype(np.int64)
    for et, g in ev.groupby("event_type"):
        daily = g.groupby("day")["v100"].sum()
        x = daily.to_numpy()
        day = daily.index.to_numpy()
        big_n = len(x)
        two_r = (2.0 * pd_rank_avg(x)).astype(np.int64)
        even = (day % 2) == 0
        n, m = int(even.sum()), int((~even).sum())
        w2 = int(two_r[even].sum())
        u2 = w2 - n * (n + 1)
        _, counts = np.unique(x, return_counts=True)
        ties = int(sum(int(c) ** 3 - int(c) for c in counts))
        var2_num = n * m * ((big_n + 1) * big_n * (big_n - 1) - ties)
        r = got.loc[et]
        assert int(r["n_even"]) == n and int(r["n_odd"]) == m
        assert int(r["u2"]) == u2
        assert int(r["var2_num"]) == var2_num
        if var2_num > 0:
            exp_z = (float(u2 - n * m)
                     / math.sqrt(float(var2_num)
                                 / float(3 * big_n * (big_n - 1))))
            assert r["z"] == exp_z
            # brute-force U from pairwise comparisons must agree (x2)
            xa, xb = x[even], x[~even]
            u_brute = sum((a > b) + 0.5 * (a == b)
                          for a in xa for b in xb)
            assert u2 == int(round(2 * u_brute))


def pd_rank_avg(x):
    import pandas as pd

    return pd.Series(x).rank(method="average").to_numpy()


# ---------------------------------------------------------------- A39 ----
def test_bartels_rvn_matches_bruteforce(ray_session):
    from anomalydetection_ray.pipelines.queries import a39_bartels_rvn

    got = (a39_bartels_rvn(SF).to_pandas()
           .set_index("event_type").sort_index())

    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_type", "ts", "value"]).to_pandas()
    ev["day"] = ev["ts"].astype("int64") // 86_400_000_000
    ev["v100"] = np.floor(ev["value"] * 100.0 + 0.5).astype(np.int64)
    for et, g in ev.groupby("event_type"):
        daily = g.groupby("day")["v100"].sum().sort_index()
        x = daily.to_numpy()
        n = len(x)
        tr = (2.0 * pd_rank_avg(x)).astype(np.int64)
        num2 = int(sum((int(tr[i]) - int(tr[i + 1])) ** 2
                       for i in range(n - 1)))
        den2 = int(sum((int(v) - (n + 1)) ** 2 for v in tr))
        r = got.loc[et]
        assert int(r["n_days"]) == n
        assert int(r["num2"]) == num2
        assert int(r["den2"]) == den2
        if den2 > 0:
            assert r["rvn"] == float(num2) / float(den2)
            # independence keeps RVN in a sane band
            assert 0.5 < r["rvn"] < 3.5


# ---------------------------------------------------------------- D13 ----
def test_cluster_sizes_consistent_with_clusters(ray_session):
    from anomalydetection_ray.pipelines.dedup import (d13_cluster_sizes,
                                                      dup_clusters)

    got = (d13_cluster_sizes(SF).to_pandas()
           .set_index("cluster_size").sort_index())
    cl = dup_clusters(SF).to_pandas()

    sizes = cl.groupby("cluster").size()
    exp = sizes.value_counts().sort_index()
    assert list(got.index) == list(exp.index)
    for s, n in exp.items():
        assert int(got.loc[s, "n_clusters"]) == int(n)
        assert int(got.loc[s, "n_docs"]) == int(s) * int(n)
    # every clustered doc is accounted for exactly once
    assert int(got["n_docs"].sum()) == len(cl)
    # components have >= 2 members by construction (pair graph)
    assert got.index.min() >= 2


# ---------------------------------------------------------------- U3 ----
def test_tombstone_merge_rules(ray_session):
    from anomalydetection_ray.pipelines.queries import u3_tombstone_merge

    got = (u3_tombstone_merge(SF).to_pandas()
           .set_index("event_id").sort_index())

    ev = pq.read_table(
        f"{SF}/events.parquet",
        columns=["event_id", "ts", "user_id", "value"]).to_pandas()
    ev = ev.set_index("event_id").sort_index()
    DAY = 86_400_000_000
    for eid, r in ev.iterrows():
        deleted = eid % 17 == 0
        updated = eid % 7 == 0
        if deleted:
            assert eid not in got.index      # tombstone wins (latest ts)
            continue
        g = got.loc[eid]
        base_us = int(pd_ts_us(r["ts"]))
        if updated:
            assert int(g["last_op"]) == 1
            assert int(g["ts_us"]) == base_us + DAY
            assert g["value"] == r["value"] + 1000.0
        else:
            assert int(g["last_op"]) == 0
            assert int(g["ts_us"]) == base_us
            assert g["value"] == r["value"]
    assert len(got) == (~(ev.index % 17 == 0)).sum()


def pd_ts_us(ts) -> int:
    import pandas as pd

    return int(pd.Timestamp(ts).value // 1000)


# ---------------------------------------------------------------- A40 ----
def test_exp_gof_matches_bruteforce(ray_session):
    from anomalydetection_ray.pipelines.queries import a40_exp_gof

    got = (a40_exp_gof(SF).to_pandas()
           .set_index("event_type").sort_index())

    ev = (pq.read_table(f"{SF}/events.parquet",
                        columns=["event_type", "ts", "event_id"])
          .to_pandas().sort_values(["event_type", "ts", "event_id"]))
    for et, g in ev.groupby("event_type"):
        us = g["ts"].astype("int64").to_numpy()
        gaps = sorted(int(d) for d in np.diff(us))
        n = len(gaps)
        total = sum(gaps)
        d_best = 0.0
        for i, gap in enumerate(gaps, start=1):
            f = 1.0 - math.exp(-((n * float(gap)) / float(total)))
            d_best = max(d_best, i / float(n) - f,
                         f - (i - 1) / float(n))
        r = got.loc[et]
        assert int(r["n_gaps"]) == n
        assert int(r["gaps_us_sum"]) == total
        assert r["ks_d"] == d_best
        assert 0.0 <= r["ks_d"] <= 1.0


# ---------------------------------------------------------------- W32 ----
def test_max_drawdown_matches_bruteforce(ray_session):
    from anomalydetection_ray.pipelines.windows import w32_max_drawdown

    got = (w32_max_drawdown(SF).to_pandas()
           .set_index("user_id").sort_index())

    ev = (pq.read_table(
        f"{SF}/events.parquet",
        columns=["event_id", "ts", "user_id", "value"]).to_pandas()
        .sort_values(["user_id", "ts", "event_id"]))
    ev["vq"] = np.floor(ev["value"] * 100.0 + 0.5).astype(np.int64)
    for uid, g in ev.groupby("user_id"):
        cum = g["vq"].cumsum().to_numpy()
        peak = np.maximum.accumulate(cum)
        dd = peak - cum
        best = int(dd.max())
        trough = int(g["event_id"].to_numpy()[int(np.argmax(dd))])
        r = got.loc[uid]
        assert int(r["n"]) == len(g)
        assert int(r["final_cents"]) == int(cum[-1])
        assert int(r["max_drawdown_cents"]) == best
        assert int(r["trough_event_id"]) == trough
        assert best >= 0


# ---------------------------------------------------------------- V14 ----
def test_pmi_bigrams_matches_bruteforce(ray_session):
    import collections

    from anomalydetection_ray.pipelines.vocab import v14_pmi_bigrams

    got = v14_pmi_bigrams(SF).to_pandas()
    assert len(got) == 25

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["text"]).to_pandas()
    uni = collections.Counter()
    bi = collections.Counter()
    for t in docs["text"]:
        ws = [w for w in t.split(" ") if w != ""]
        uni.update(ws)
        bi.update(" ".join(p) for p in zip(ws, ws[1:]))
    n = sum(uni.values())
    scored = []
    for w, cxy in bi.items():
        if cxy < 5:
            continue
        a, b = w.split(" ")
        pmi = math.log(float(cxy * n) / float(uni[a] * uni[b]))
        scored.append((w, cxy, uni[a], uni[b], pmi))
    scored.sort(key=lambda r: (-r[4], r[0]))
    exp = scored[:25]
    for i, (_, r) in enumerate(got.sort_values(
            ["pmi", "word"], ascending=[False, True]).iterrows()):
        w, cxy, cx, cy, pmi = exp[i]
        assert r["word"] == w
        assert int(r["cxy"]) == cxy
        assert int(r["cx"]) == cx and int(r["cy"]) == cy
        assert r["pmi"] == pmi
    # PMI of a true collocation exceeds the independence baseline 0
    assert got["pmi"].max() > 0


# ---------------------------------------------------------------- A41 ----
def test_variance_ratio_matches_bruteforce(ray_session):
    from anomalydetection_ray.pipelines.queries import a41_variance_ratio

    got = (a41_variance_ratio(SF).to_pandas()
           .set_index("event_type").sort_index())

    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_type", "ts", "value"]).to_pandas()
    ev["day"] = ev["ts"].astype("int64") // 86_400_000_000
    ev["v100"] = np.floor(ev["value"] * 100.0 + 0.5).astype(np.int64)
    for et, g in ev.groupby("event_type"):
        x = [int(v) for v in g.groupby("day")["v100"].sum().sort_index()]
        n = len(x)
        d1 = [x[i + 1] - x[i] for i in range(n - 1)]
        d2 = [x[i + 2] - x[i] for i in range(n - 2)]
        n1, n2 = len(d1), len(d2)
        vd = n1 * sum(v * v for v in d1) - sum(d1) ** 2
        ve = n2 * sum(v * v for v in d2) - sum(d2) ** 2
        r = got.loc[et]
        assert int(r["n_days"]) == n
        assert int(r["var_num_d1"]) == vd
        assert int(r["var_num_d2"]) == ve
        if vd > 0:
            exp = ((float(ve) * float(n1 * n1))
                   / (float(vd) * float(n2 * n2) * 2.0))
            assert r["vr2"] == exp
            assert 0.0 < r["vr2"] < 5.0


# ---------------------------------------------------------------- K13 ----
def test_centroid_cosines_consistent_with_kmeans(ray_session):
    from anomalydetection_ray.pipelines.kmeans import (ESCALE,
                                                       k13_centroid_cosines,
                                                       kmeans_train)

    got = k13_centroid_cosines(SF).to_pandas()
    cent = kmeans_train(SF).to_pandas()

    means = {}
    for cid, g in cent.groupby("cid"):
        if g["mean"].isna().all():
            continue
        means[int(cid)] = g.sort_values("pos")["mean"].to_numpy()
    k = len(means)
    assert len(got) == k * (k - 1) // 2
    for _, r in got.iterrows():
        a = means[int(r["cid_a"])]
        b = means[int(r["cid_b"])]
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        nii = 0.0
        for x in a:
            nii = nii + x * x
        njj = 0.0
        for y in b:
            njj = njj + y * y
        assert r["dot"] == acc
        assert r["cosine"] == acc / (math.sqrt(nii) * math.sqrt(njj))
        assert -1.0 - 1e-9 <= r["cosine"] <= 1.0 + 1e-9


# ---------------------------------------------------------------- A42 ----
def test_seasonal_mk_matches_bruteforce(ray_session):
    from anomalydetection_ray.pipelines.queries import a42_seasonal_mk

    got = (a42_seasonal_mk(SF).to_pandas()
           .set_index("event_type").sort_index())

    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_type", "ts", "value"]).to_pandas()
    ev["day"] = ev["ts"].astype("int64") // 86_400_000_000
    ev["v100"] = np.floor(ev["value"] * 100.0 + 0.5).astype(np.int64)
    for et, g in ev.groupby("event_type"):
        daily = g.groupby("day")["v100"].sum().sort_index()
        day = daily.index.to_numpy()
        x = daily.to_numpy()
        n = len(x)
        s_tot, var_tot = 0, 0
        for p in range(7):
            xs = [int(v) for v in x[(day + 3) % 7 == p]]
            m = len(xs)
            for i in range(m):
                for j in range(i + 1, m):
                    s_tot += (xs[j] > xs[i]) - (xs[j] < xs[i])
            var_tot += m * (m - 1) * (2 * m + 5)
            for c in np.unique(xs, return_counts=True)[1]:
                var_tot -= int(c) * (int(c) - 1) * (2 * int(c) + 5)
        r = got.loc[et]
        assert int(r["n_days"]) == n
        assert int(r["s_stat"]) == s_tot
        assert int(r["var_num"]) == var_tot
        if var_tot > 0:
            sd = math.sqrt(float(var_tot) / 18.0)
            exp = (0.0 if s_tot == 0
                   else (float(s_tot - 1) / sd if s_tot > 0
                         else float(s_tot + 1) / sd))
            assert r["z_smk"] == exp


# ---------------------------------------------------------------- R3 ----
def test_incremental_rollup_equals_full(ray_session):
    from anomalydetection_ray.pipelines.queries import r3_incremental_rollup

    got = (r3_incremental_rollup(SF).to_pandas()
           .set_index(["user_id", "day"]).sort_index())

    ev = pq.read_table(
        f"{SF}/events.parquet",
        columns=["event_id", "ts", "user_id", "value"]).to_pandas()
    ev["day"] = ev["ts"].astype("int64") // 86_400_000_000
    ev["v100"] = np.floor(ev["value"] * 100.0 + 0.5).astype(np.int64)
    exp = ev.groupby(["user_id", "day"]).agg(
        min_cents=("v100", "min"), max_cents=("v100", "max"),
        cents_sum=("v100", "sum"), n=("v100", "size")).sort_index()
    assert len(got) == len(exp)
    for c in ("min_cents", "max_cents", "cents_sum", "n"):
        assert (got[c].to_numpy() == exp[c].to_numpy()).all(), c
    # the late slice is genuinely non-empty (merge actually exercised)
    assert (ev["event_id"] % 13 == 0).sum() > 0


# ---------------------------------------------------------------- K14 ----
def test_quant_saturation_matches_bruteforce(ray_session):
    from anomalydetection_ray.pipelines.kmeans import (ESCALE,
                                                       k14_quant_saturation)

    got = (k14_quant_saturation(SF).to_pandas()
           .set_index("label").sort_index())

    emb = pq.read_table(f"{SF}/embeddings.parquet",
                        columns=["label", "embedding"]).to_pandas()
    for lab, g in emb.groupby("label"):
        nv = len(g)
        sat = zer = nc = 0
        for v in g["embedding"]:
            q = np.floor(np.asarray(v, dtype=np.float64) * ESCALE
                         + 0.5).astype(np.int64)
            norm = math.sqrt(float(int((q * q).sum())))
            safe = norm if norm != 0 else 1.0
            codes = np.floor(127.0 * q.astype(np.float64) / safe
                             + 0.5).astype(np.int64)
            nc += len(codes)
            sat += int((np.abs(codes) >= 127).sum())
            zer += int((codes == 0).sum())
        r = got.loc[lab]
        assert int(r["n_vecs"]) == nv
        assert int(r["n_codes"]) == nc
        assert int(r["n_saturated"]) == sat
        assert int(r["n_zero"]) == zer
        assert r["sat_frac"] == float(sat) / float(nc)
        assert r["zero_frac"] == float(zer) / float(nc)


# ---------------------------------------------------------------- J15 ----
def test_next_error_wait_bruteforce(ray_session):
    from anomalydetection_ray.pipelines.queries import j15_next_error_wait

    got = (j15_next_error_wait(SF).to_pandas()
           .set_index("event_id").sort_index())

    ev = pq.read_table(
        f"{SF}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"]).to_pandas()
    ev["us"] = ev["ts"].astype("int64")
    purchases = ev[ev["event_type"] == "purchase"]
    errors = ev[ev["event_type"] == "error"]
    assert len(got) == len(purchases)
    n_matched = 0
    for _, p in purchases.iterrows():
        cand = errors[(errors["user_id"] == p["user_id"])
                      & (errors["us"] >= p["us"])]
        r = got.loc[p["event_id"]]
        if len(cand) == 0:
            assert np.isnan(r["wait_us"]) or r["wait_us"] is None \
                or r.isna()["wait_us"]
            continue
        n_matched += 1
        best = cand.sort_values(["us", "event_id"]).iloc[0]
        assert int(r["next_error_event_id"]) == int(best["event_id"])
        assert int(r["wait_us"]) == int(best["us"] - p["us"])
    assert n_matched > 0


# ---------------------------------------------------------------- S21 ----
def test_filter_pushdown_matches_post_filter(ray_session):
    from anomalydetection_ray.pipelines.queries import s21_filter_pushdown

    got = (s21_filter_pushdown(SF).to_pandas()
           .set_index("day").sort_index())

    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["ts", "event_type", "value"]).to_pandas()
    sel = ev[(ev["event_type"] == "purchase") & (ev["value"] >= 100.0)]
    day = sel["ts"].astype("int64") // 86_400_000_000
    v100 = np.floor(sel["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
    exp = (sel.assign(day=day, v100=v100).groupby("day")
           .agg(n=("v100", "size"), cents_sum=("v100", "sum")))
    assert set(got.index) == set(exp.index)
    for d, r in exp.iterrows():
        assert int(got.loc[d, "n"]) == int(r["n"])
        assert int(got.loc[d, "cents_sum"]) == int(r["cents_sum"])
    # the pushdown genuinely filters (purchases >= 100 are a proper subset)
    assert int(got["n"].sum()) < len(ev)


# ---------------------------------------------------------------- C5 ----
def test_quality_mixture_pack_composes(ray_session):
    from anomalydetection_ray.pipelines.curation import (
        c5_quality_mixture_pack)

    got = c5_quality_mixture_pack(SF).to_pandas()
    assert len(got) > 0
    # pack invariants: offsets are the exclusive prefix sum in doc order
    g = got.sort_values("doc_id").reset_index(drop=True)
    off = 0
    for _, r in g.iterrows():
        assert int(r["tok_offset"]) == off
        assert int(r["seq_id"]) == off // 256
        off += int(r["n_tok"])
    # mixture invariants: per-source selection counts == floor quotas
    import collections
    per = collections.Counter(g["source"])
    # tail sources must be present (temperature damps the head)
    assert len(per) >= 2
    # every selected rank is within its source quota
    assert (g.groupby("source")["smp_rank"].max() + 1
            >= g.groupby("source")["smp_rank"].count()).all()


# ---------------------------------------------------------------- W33 ----
def test_type_diversity_exact_rational(ray_session):
    from anomalydetection_ray.pipelines.windows import w33_type_diversity

    got = (w33_type_diversity(SF).to_pandas()
           .set_index("user_id").sort_index())

    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "event_type"]).to_pandas()
    for uid, g in ev.groupby("user_id"):
        cnt = g["event_type"].value_counts()
        n = int(cnt.sum())
        ssq = int((cnt ** 2).sum())
        r = got.loc[uid]
        assert int(r["n_events"]) == n
        assert int(r["n_types"]) == len(cnt)
        assert int(r["div_num"]) == n * n - ssq
        assert int(r["div_den"]) == n * n
        assert r["gini_simpson"] == float(n * n - ssq) / float(n * n)
        assert 0.0 <= r["gini_simpson"] < 1.0


# ---------------------------------------------------------------- G24 ----
def test_beta_to_total_bruteforce(ray_session):
    from anomalydetection_ray.pipelines.queries import g24_beta_to_total

    got = (g24_beta_to_total(SF).to_pandas()
           .set_index("event_type").sort_index())

    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_type", "ts", "value"]).to_pandas()
    ev["day"] = ev["ts"].astype("int64") // 86_400_000_000
    ev["v100"] = np.floor(ev["value"] * 100.0 + 0.5).astype(np.int64)
    daily = ev.groupby(["event_type", "day"])["v100"].sum()
    market = ev.groupby("day")["v100"].sum()
    betas = []
    for et in daily.index.get_level_values(0).unique():
        x = daily.loc[et]
        m = market.loc[x.index]
        n = len(x)
        sx, sm = int(x.sum()), int(m.sum())
        sxm = int((x * m).sum())
        smm = int((m * m).sum())
        cov = n * sxm - sx * sm
        var = n * smm - sm * sm
        r = got.loc[et]
        assert int(r["n_days"]) == n
        assert int(r["cov_num"]) == cov
        assert int(r["var_num"]) == var
        if var > 0:
            assert r["beta"] == float(cov) / float(var)
            betas.append(r["beta"])
    # betas average near each type's share of the market (sanity band)
    assert 0.0 < float(np.mean(betas)) < 1.0


# ---------------------------------------------------------------- A43 ----
def test_cox_stuart_bruteforce(ray_session):
    from anomalydetection_ray.pipelines.queries import a43_cox_stuart

    got = (a43_cox_stuart(SF).to_pandas()
           .set_index("event_type").sort_index())

    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_type", "ts", "value"]).to_pandas()
    ev["day"] = ev["ts"].astype("int64") // 86_400_000_000
    ev["v100"] = np.floor(ev["value"] * 100.0 + 0.5).astype(np.int64)
    for et, g in ev.groupby("event_type"):
        x = g.groupby("day")["v100"].sum().sort_index().to_numpy()
        n = len(x)
        half, shift = n // 2, n - n // 2
        d = x[shift:shift + half] - x[:half]
        sp, sm = int((d > 0).sum()), int((d < 0).sum())
        r = got.loc[et]
        assert int(r["n_days"]) == n
        assert int(r["s_plus"]) == sp and int(r["s_minus"]) == sm
        m = sp + sm
        if m > 0:
            assert r["z_cs"] == (abs(2 * sp - m) - 1) / math.sqrt(float(m))


# ---------------------------------------------------------------- V15 ----
def test_stylometric_l1_bruteforce(ray_session):
    import collections

    from anomalydetection_ray.pipelines.vocab import v15_stylometric_l1

    got = (v15_stylometric_l1(SF).to_pandas()
           .set_index(["source_a", "source_b"]).sort_index())

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["source", "text"]).to_pandas()
    uni = collections.Counter()
    per = collections.defaultdict(collections.Counter)
    tot = collections.Counter()
    for _, r in docs.iterrows():
        ws = [w for w in r["text"].split(" ") if w != ""]
        uni.update(ws)
        per[r["source"]].update(ws)
        tot[r["source"]] += len(ws)
    top = sorted(w for w, _ in sorted(uni.items(),
                                      key=lambda kv: (-kv[1], kv[0]))[:20])
    srcs = sorted(tot)
    assert len(got) == len(srcs) * (len(srcs) - 1) // 2
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            acc = 0.0
            for w in top:
                acc += abs(float(per[a][w]) / float(tot[a])
                           - float(per[b][w]) / float(tot[b]))
            assert got.loc[(a, b), "l1"] == acc
    assert (got["l1"] >= 0).all()


# ---------------------------------------------------------------- R4 ----
def test_cascade_rollup_equals_raw_weekly(ray_session):
    from anomalydetection_ray.pipelines.queries import r4_cascade_rollup

    got = (r4_cascade_rollup(SF).to_pandas()
           .set_index(["event_type", "week"]).sort_index())

    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_type", "ts", "value"]).to_pandas()
    ev["week"] = ev["ts"].astype("int64") // 86_400_000_000 // 7
    ev["v100"] = np.floor(ev["value"] * 100.0 + 0.5).astype(np.int64)
    exp = ev.groupby(["event_type", "week"]).agg(
        min_cents=("v100", "min"), max_cents=("v100", "max"),
        cents_sum=("v100", "sum"), n=("v100", "size")).sort_index()
    assert len(got) == len(exp)
    for c in ("min_cents", "max_cents", "cents_sum", "n"):
        assert (got[c].to_numpy() == exp[c].to_numpy()).all(), c
    mean = exp["cents_sum"].astype(float) / exp["n"].astype(float)
    assert (got["mean_cents"].to_numpy() == mean.to_numpy()).all()


# ---------------------------------------------------------------- D14 ----
def test_cross_source_exact_bruteforce(ray_session):
    import collections

    from anomalydetection_ray.pipelines.dedup import d14_cross_source_exact

    got = (d14_cross_source_exact(SF).to_pandas()
           .set_index("source").sort_index())

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["source", "text"]).to_pandas()
    srcs_of = collections.defaultdict(set)
    for _, r in docs.iterrows():
        srcs_of[r["text"]].add(r["source"])
    per = collections.Counter()
    tot = collections.Counter()
    for _, r in docs.iterrows():
        tot[r["source"]] += 1
        if len(srcs_of[r["text"]]) >= 2:
            per[r["source"]] += 1
    assert set(got.index) == set(tot)
    for s in tot:
        assert int(got.loc[s, "n_docs"]) == tot[s]
        assert int(got.loc[s, "n_cross_dup"]) == per[s]
        assert got.loc[s, "cross_frac"] == (float(per[s])
                                            / float(tot[s]))


# ---------------------------------------------------------------- W34 ----
def test_hourly_profile_bruteforce(ray_session):
    from anomalydetection_ray.pipelines.windows import w34_hourly_profile

    got = (w34_hourly_profile(SF).to_pandas()
           .set_index(["event_type", "hour"]).sort_index())

    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_type", "ts"]).to_pandas()
    ev["hour"] = (ev["ts"].astype("int64") // 3_600_000_000) % 24
    exp = ev.groupby(["event_type", "hour"]).size()
    tot = ev.groupby("event_type").size()
    assert len(got) == len(exp)
    for (et, h), n in exp.items():
        r = got.loc[(et, h)]
        assert int(r["n"]) == int(n)
        assert r["share"] == float(n) / float(tot[et])
    # shares per type sum to ~1
    s = got.groupby("event_type")["share"].sum()
    assert ((s - 1.0).abs() < 1e-9).all()


# ---------------------------------------------------------------- Q17 ----
def test_balanced_eval_sample_strata(ray_session):
    from anomalydetection_ray.pipelines.packing import (
        q17_balanced_eval_sample)

    got = q17_balanced_eval_sample(SF).to_pandas()

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "source", "n_chars"]
                         ).to_pandas()
    per_src = docs.groupby("source").size()
    # every stratum with >= 5 docs contributes exactly 5
    cnt = got.groupby(["source", "quartile"]).size()
    for (s, qt), n in cnt.items():
        stratum_sz = 0
        g = docs[docs["source"] == s].sort_values(["n_chars", "doc_id"])
        ln = len(g)
        size, rem = ln // 4, ln % 4
        stratum_sz = size + 1 if qt <= rem else size
        assert n == min(5, stratum_sz), (s, qt)
    # quartiles are 1..4 and all sources present
    assert set(got["quartile"]) <= {1, 2, 3, 4}
    assert set(got["source"]) == set(per_src.index)


# ---------------------------------------------------------------- S22 ----
def test_zstd_parquet_roundtrip_lossless(ray_session):
    from anomalydetection_ray.pipelines.queries import (
        s22_zstd_parquet_roundtrip)

    got = (s22_zstd_parquet_roundtrip(SF).to_pandas()
           .set_index("source").sort_index())

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["source", "n_chars", "text"]).to_pandas()
    exp = docs.groupby("source").agg(
        n_docs=("n_chars", "size"), chars_sum=("n_chars", "sum"))
    exp["words_sum"] = docs.groupby("source")["text"].apply(
        lambda s: sum(len(t.split(" ")) for t in s))
    assert set(got.index) == set(exp.index)
    for s, r in exp.iterrows():
        for c in ("n_docs", "chars_sum", "words_sum"):
            assert int(got.loc[s, c]) == int(r[c]), (s, c)


# ---------------------------------------------------------------- A44 ----
def test_arch_effect_bruteforce(ray_session):
    from anomalydetection_ray.pipelines.queries import a44_arch_effect

    got = (a44_arch_effect(SF).to_pandas()
           .set_index("event_type").sort_index())

    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_type", "ts", "value"]).to_pandas()
    ev["day"] = ev["ts"].astype("int64") // 86_400_000_000
    ev["v100"] = np.floor(ev["value"] * 100.0 + 0.5).astype(np.int64)
    for et, g in ev.groupby("event_type"):
        x = [int(v) for v in g.groupby("day")["v100"].sum().sort_index()]
        n = len(x)
        s = [abs(x[i + 1] - x[i]) for i in range(n - 1)]
        a, b = s[:-1], s[1:]
        m = len(a)
        r = got.loc[et]
        assert int(r["n_days"]) == n
        assert int(r["n_pairs"]) == m
        if m >= 2:
            sa, sb = sum(a), sum(b)
            saa = sum(v * v for v in a)
            sbb = sum(v * v for v in b)
            sab = sum(p * q for p, q in zip(a, b))
            v1, v2 = m * saa - sa * sa, m * sbb - sb * sb
            if v1 > 0 and v2 > 0:
                exp = (float(m * sab - sa * sb)
                       / (math.sqrt(float(v1)) * math.sqrt(float(v2))))
                assert r["rho_arch"] == exp
                assert -1.0 <= r["rho_arch"] <= 1.0


# ---------------------------------------------------------------- K15 ----
def test_cluster_balance_consistent_with_kmeans(ray_session):
    from anomalydetection_ray.pipelines.kmeans import (k15_cluster_balance,
                                                       kmeans_train)

    got = k15_cluster_balance(SF).to_pandas().iloc[0]
    cent = kmeans_train(SF).to_pandas()

    sizes = (cent.groupby("cid")["n_assigned"].max())
    sizes = [int(v) for v in sizes if int(v) > 0]
    n = sum(sizes)
    ssq = sum(c * c for c in sizes)
    assert int(got["k_nonempty"]) == len(sizes)
    assert int(got["n_vectors"]) == n
    assert int(got["bal_num"]) == n * n - ssq
    assert int(got["bal_den"]) == n * n
    assert got["gini_simpson"] == float(n * n - ssq) / float(n * n)
    assert got["max_share"] == float(max(sizes)) / float(n)


# ---------------------------------------------------------------- D15 ----
def test_minhash_calibration_consistent(ray_session):
    import re

    from anomalydetection_ray.pipelines.dedup import (
        d15_minhash_calibration, minhash_lsh_pairs)

    got = (d15_minhash_calibration(SF).to_pandas()
           .set_index("k").sort_index())
    pairs = minhash_lsh_pairs(SF, min_est=0.2).to_pandas()

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    txt = dict(zip(docs["doc_id"], docs["text"]))
    wre = re.compile(r"[0-9a-z_]+")

    def gset(t):
        ws = wre.findall(t.lower())
        return {" ".join(ws[i:i + 3]) for i in range(len(ws) - 2)}

    import collections
    agg = collections.defaultdict(lambda: [0, 0, 0])
    for _, p in pairs.iterrows():
        ga, gb = gset(txt[p["doc_a"]]), gset(txt[p["doc_b"]])
        inter = len(ga & gb)
        un = len(ga | gb)
        k = int(np.floor(p["est_jaccard"] * 64.0 + 0.5))
        agg[k][0] += 1
        agg[k][1] += inter
        agg[k][2] += un
    assert set(got.index) == set(agg)
    for k, (n, isum, usum) in agg.items():
        assert int(got.loc[k, "n_pairs"]) == n
        assert int(got.loc[k, "inter_sum"]) == isum
        assert int(got.loc[k, "union_sum"]) == usum
    # calibration sanity: exact overlap ratio grows with the estimate
    if len(got) >= 2:
        ratios = got["inter_sum"] / got["union_sum"]
        assert ratios.iloc[-1] >= ratios.iloc[0]


# ---------------------------------------------------------------- G25 ----
def test_stickiness_bruteforce(ray_session):
    from anomalydetection_ray.pipelines.queries import g25_stickiness

    got = (g25_stickiness(SF).to_pandas()
           .set_index("day").sort_index())

    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["ts", "user_id"]).to_pandas()
    ev["day"] = ev["ts"].astype("int64") // 86_400_000_000
    pairs = ev[["day", "user_id"]].drop_duplicates()
    days = sorted(pairs["day"].unique())
    assert list(got.index) == days
    for d in days:
        dau = pairs[pairs["day"] == d]["user_id"].nunique()
        wau = pairs[(pairs["day"] >= d - 6)
                    & (pairs["day"] <= d)]["user_id"].nunique()
        r = got.loc[d]
        assert int(r["dau"]) == dau
        assert int(r["wau"]) == wau
        assert r["stickiness"] == float(dau) / float(wau)
        assert 0.0 < r["stickiness"] <= 1.0


# ---------------------------------------------------------------- A45 ----
def test_turning_point_test_bruteforce(ray_session):
    from anomalydetection_ray.pipelines.queries import (
        a45_turning_point_test)

    got = (a45_turning_point_test(SF).to_pandas()
           .set_index("event_type").sort_index())

    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_type", "ts", "value"]).to_pandas()
    ev["day"] = ev["ts"].astype("int64") // 86_400_000_000
    ev["v100"] = np.floor(ev["value"] * 100.0 + 0.5).astype(np.int64)
    for et, g in ev.groupby("event_type"):
        x = g.groupby("day")["v100"].sum().sort_index().to_numpy()
        n = len(x)
        t = sum(1 for i in range(1, n - 1)
                if (x[i] > x[i - 1] and x[i] > x[i + 1])
                or (x[i] < x[i - 1] and x[i] < x[i + 1]))
        r = got.loc[et]
        assert int(r["n_days"]) == n
        assert int(r["n_turning"]) == t
        if n >= 4:
            exp = (float(3 * t - 2 * (n - 2)) / 3.0
                   / math.sqrt(float(16 * n - 29) / 90.0))
            assert r["z_tp"] == exp


# ---------------------------------------------------------------- W35 ----
def test_weekend_contrast_bruteforce(ray_session):
    from anomalydetection_ray.pipelines.queries import w35_weekend_contrast

    got = (w35_weekend_contrast(SF).to_pandas()
           .set_index("event_type").sort_index())

    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_type", "ts", "value"]).to_pandas()
    ev["day"] = ev["ts"].astype("int64") // 86_400_000_000
    ev["v100"] = np.floor(ev["value"] * 100.0 + 0.5).astype(np.int64)
    for et, g in ev.groupby("event_type"):
        daily = g.groupby("day")["v100"].sum()
        is_we = (daily.index + 3) % 7 >= 5
        we_sum = int(daily[is_we].sum())
        wd_sum = int(daily[~is_we].sum())
        we_days, wd_days = int(is_we.sum()), int((~is_we).sum())
        r = got.loc[et]
        assert int(r["we_days"]) == we_days
        assert int(r["wd_days"]) == wd_days
        assert int(r["we_cents"]) == we_sum
        assert int(r["wd_cents"]) == wd_sum
        if wd_sum > 0 and we_days > 0:
            assert r["contrast"] == ((float(we_sum) * float(wd_days))
                                     / (float(wd_sum) * float(we_days)))


# ---------------------------------------------------------------- A46 ----
def test_ljung_box_consistent_with_acf(ray_session):
    import ray.data

    from anomalydetection_ray.sources.tokenize import tokenize_batch
    from anomalydetection_ray.pipelines.rollup import validated
    from anomalydetection_ray.stages.detectors import (autocorr_batch,
                                                       ljung_box_batch)

    docs = ray.data.read_parquet(f"{SF}/documents.parquet",
                                 columns=["doc_id", "source", "text"])
    seqs = validated(docs.map_batches(tokenize_batch,
                                      batch_format="pyarrow",
                                      zero_copy_batch=True))
    batch = pa.concat_tables(list(
        seqs.iter_batches(batch_format="pyarrow")))
    got = ljung_box_batch(batch).to_pandas().set_index(
        ["doc_id", "part_id"])
    acfs = {k: autocorr_batch(batch, lag=k).to_pandas().set_index(
        ["doc_id", "part_id"]) for k in (1, 2, 3)}
    for idx, r in got.iterrows():
        n = int(r["n"])
        rks = [acfs[k].loc[idx, "acf"] for k in (1, 2, 3)]
        if any(np.isnan(v) for v in rks):
            assert np.isnan(r["lb3"])
            continue
        acc = 0.0
        for j, k in enumerate((1, 2, 3)):
            acc = acc + float(rks[j]) * float(rks[j]) / float(n - k)
        assert r["lb3"] == float(n * (n + 2)) * acc
        assert r["lb3"] >= 0.0


# ---------------------------------------------------------------- P7 ----
def test_curriculum_order_global_rank(ray_session):
    from anomalydetection_ray.pipelines.packing import p7_curriculum_order
    from anomalydetection_ray.pipelines.text import quality_batch

    got = (p7_curriculum_order(SF).to_pandas()
           .sort_values("cur_rank").reset_index(drop=True))

    docs = pq.read_table(f"{SF}/documents.parquet")
    q = quality_batch(docs).to_pandas()
    q["score_q"] = np.floor(q["quality_score"] * 1_048_576.0
                            + 0.5).astype(np.int64)
    q["doc_id"] = docs.column("doc_id").to_pandas()
    exp = q.sort_values(["score_q", "doc_id"],
                        ascending=[False, True]).reset_index(drop=True)
    n = len(exp)
    assert list(got["doc_id"]) == list(exp["doc_id"])
    assert list(got["score_q"]) == list(exp["score_q"])
    assert list(got["cur_rank"]) == list(range(n))
    # stages are contiguous rank bands with ntile sizing
    size, rem = n // 3, n % 3
    sizes = [size + 1 if s < rem else size for s in range(3)]
    expect_stage = np.repeat([1, 2, 3], sizes)
    assert (got["stage"].to_numpy() == expect_stage).all()


# ---------------------------------------------------------------- G26 ----
def test_kruskal_wallis_bruteforce(ray_session):
    import pandas as pd

    from anomalydetection_ray.pipelines.queries import g26_kruskal_wallis

    got = g26_kruskal_wallis(SF).to_pandas().iloc[0]

    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_type", "ts", "value"]).to_pandas()
    ev["day"] = ev["ts"].astype("int64") // 86_400_000_000
    ev["v100"] = np.floor(ev["value"] * 100.0 + 0.5).astype(np.int64)
    daily = (ev.groupby(["event_type", "day"])["v100"].sum()
             .reset_index())
    two_r = (2.0 * daily["v100"].rank(method="average")).astype(np.int64)
    daily["two_r"] = two_r
    n = len(daily)
    acc = 0.0
    for et in sorted(daily["event_type"].unique()):
        g = daily[daily["event_type"] == et]
        w2 = int(g["two_r"].sum())
        acc = acc + (float(w2) * float(w2)) / float(4 * len(g))
    h = 12.0 * acc / float(n * (n + 1)) - 3.0 * float(n + 1)
    _, counts = np.unique(daily["v100"], return_counts=True)
    ties = int(sum(int(c) ** 3 - int(c) for c in counts))
    assert int(got["n_total"]) == n
    assert int(got["ties"]) == ties
    assert got["h"] == h
    d = 1.0 - float(ties) / float(n ** 3 - n)
    if d > 0:
        assert got["h_corr"] == h / d
        assert got["h_corr"] >= 0.0 or abs(got["h_corr"]) < 1e-9


# ---------------------------------------------------------------- J16 ----
def test_fanout_histogram_bruteforce(ray_session):
    from anomalydetection_ray.pipelines.queries import j16_fanout_histogram

    got = (j16_fanout_histogram(SF).to_pandas()
           .set_index("fanout").sort_index())

    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_orderkey"]).to_pandas()
    orders = pq.read_table(f"{SF}/orders.parquet",
                           columns=["o_orderkey"]).to_pandas()
    per = li.groupby("l_orderkey").size()
    exp = per.value_counts().sort_index()
    zero = len(orders) - len(per)
    for f, n in exp.items():
        assert int(got.loc[f, "n_orders"]) == int(n)
    if zero > 0:
        assert int(got.loc[0, "n_orders"]) == zero
    # every order accounted for exactly once
    assert int(got["n_orders"].sum()) == len(orders)


# ---------------------------------------------------------------- M9 ----
def test_date_fns_bruteforce(ray_session):
    import pandas as pd

    from anomalydetection_ray.pipelines.queries import m9_date_fns

    got = (m9_date_fns(SF).to_pandas()
           .set_index(["year", "quarter"]).sort_index())

    o = pq.read_table(f"{SF}/orders.parquet",
                      columns=["o_orderdate", "o_totalprice"]).to_pandas()
    d = pd.to_datetime(o["o_orderdate"])
    o["year"] = d.dt.year
    o["quarter"] = (d.dt.month - 1) // 3 + 1
    o["cents"] = np.floor(o["o_totalprice"] * 100.0 + 0.5).astype(np.int64)
    exp = o.groupby(["year", "quarter"]).agg(
        n_orders=("cents", "size"), cents_sum=("cents", "sum"))
    assert len(got) == len(exp)
    for (y, q), r in exp.iterrows():
        g = got.loc[(y, q)]
        assert int(g["n_orders"]) == int(r["n_orders"])
        assert int(g["cents_sum"]) == int(r["cents_sum"])


# ---------------------------------------------------------------- W36 ----
def test_retention_triangle_bruteforce(ray_session):
    from anomalydetection_ray.pipelines.windows import w36_retention_triangle

    got = (w36_retention_triangle(SF).to_pandas()
           .set_index(["cohort_week", "week_offset"]).sort_index())

    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "ts"]).to_pandas()
    ev["week"] = ev["ts"].astype("int64") // (86_400_000_000 * 7)
    pairs = ev[["user_id", "week"]].drop_duplicates()
    cohort = pairs.groupby("user_id")["week"].min()
    pairs["cohort_week"] = pairs["user_id"].map(cohort)
    pairs["week_offset"] = pairs["week"] - pairs["cohort_week"]
    exp = pairs.groupby(["cohort_week", "week_offset"]).size()
    assert len(got) == len(exp)
    for k, n in exp.items():
        assert int(got.loc[k, "n_users"]) == int(n)
    # offset-0 cell of each cohort equals the cohort size
    sizes = cohort.value_counts()
    for cw, sz in sizes.items():
        assert int(got.loc[(cw, 0), "n_users"]) == int(sz)


# ---------------------------------------------------------------- Q18 ----
def test_negative_samples_deterministic(ray_session):
    from anomalydetection_ray.pipelines.packing import q18_negative_samples

    got = (q18_negative_samples(SF).to_pandas()
           .sort_values(["anchor_id", "j"]).reset_index(drop=True))

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "n_chars"]).to_pandas()
    n = len(docs)
    chars = dict(zip(docs["doc_id"], docs["n_chars"]))
    anchors = sorted(d for d in docs["doc_id"] if d % 50 == 0)
    assert len(got) == len(anchors) * 4
    i = 0
    for a in anchors:
        for j in range(1, 5):
            h = ((np.uint64(a) * np.uint64(2654435761))
                 ^ (np.uint64(j) * np.uint64(40503))) \
                & np.uint64(0xFFFFFFFF)
            neg = int(h % np.uint64(n))
            if neg == a:
                neg = (neg + 1) % n
            r = got.iloc[i]
            assert int(r["anchor_id"]) == a and int(r["j"]) == j
            assert int(r["neg_id"]) == neg
            assert int(r["neg_chars"]) == int(chars[neg])
            assert neg != a                    # never self-paired
            i += 1


# ---------------------------------------------------------------- Q19 ----
def test_mixture_sweep_bruteforce(ray_session):
    import collections

    from anomalydetection_ray.pipelines.packing import q19_mixture_sweep

    got = (q19_mixture_sweep(SF).to_pandas()
           .set_index(["source", "alpha_x10"]).sort_index())

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["source"]).to_pandas()
    per = collections.Counter(docs["source"])
    srcs = sorted(per)
    for a10 in (3, 5, 7):
        alpha = a10 / 10.0
        wgt = {s: math.pow(float(per[s]), alpha) for s in srcs}
        tw = 0.0
        for s in srcs:
            tw = tw + wgt[s]
        for s in srcs:
            r = got.loc[(s, a10)]
            assert int(r["n_docs"]) == per[s]
            assert r["weight"] == wgt[s]
            assert int(r["quota"]) == int(
                math.floor((200.0 * wgt[s]) / tw))
    # lower temperature (higher alpha) concentrates on head sources
    head = max(srcs, key=lambda s: per[s])
    assert (got.loc[(head, 7), "quota"] >= got.loc[(head, 3), "quota"])


# ---------------------------------------------------------------- A47 ----
def test_hurst_aggvar_bruteforce(ray_session):
    from anomalydetection_ray.pipelines.queries import a47_hurst_aggvar

    got = (a47_hurst_aggvar(SF).to_pandas()
           .set_index("event_type").sort_index())

    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_type", "ts", "value"]).to_pandas()
    ev["day"] = ev["ts"].astype("int64") // 86_400_000_000
    ev["v100"] = np.floor(ev["value"] * 100.0 + 0.5).astype(np.int64)
    for et, g in ev.groupby("event_type"):
        x = [int(v) for v in g.groupby("day")["v100"].sum().sort_index()]
        n = len(x)
        vm, km = {}, {}
        for m in (1, 2, 4):
            k = n // m
            ys = [sum(x[i * m:(i + 1) * m]) for i in range(k)]
            vm[m] = k * sum(y * y for y in ys) - sum(ys) ** 2
            km[m] = k
        r = got.loc[et]
        assert int(r["n_days"]) == n
        for m, c in ((1, "v1_num"), (2, "v2_num"), (4, "v4_num")):
            assert int(r[c]) == vm[m]
        if vm[1] > 0 and vm[4] > 0:
            v1 = float(vm[1]) / float(km[1] * km[1])
            v4 = float(vm[4]) / float(km[4] * km[4] * 16)
            exp = 1.0 + ((math.log(v4) - math.log(v1))
                         / (4.0 * math.log(2.0)))
            assert r["h_aggvar"] == exp
            # H of a stationary-ish daily series stays in a sane band
            assert -0.5 < r["h_aggvar"] < 1.5


# ---------------------------------------------------------------- W37 ----
def test_conversion_lag_bruteforce(ray_session):
    from anomalydetection_ray.pipelines.windows import w37_conversion_lag

    got = (w37_conversion_lag(SF).to_pandas()
           .set_index("user_id").sort_index())

    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "ts", "event_type"]).to_pandas()
    ev["us"] = ev["ts"].astype("int64")
    n_lagged = 0
    for uid, g in ev[ev["event_type"].isin(["view", "purchase"])] \
            .groupby("user_id"):
        v = g[g["event_type"] == "view"]["us"]
        p = g[g["event_type"] == "purchase"]["us"]
        r = got.loc[uid]
        if len(v):
            assert int(r["first_view_us"]) == int(v.min())
        else:
            assert r.isna()["first_view_us"]
        if len(p):
            assert int(r["first_purchase_us"]) == int(p.min())
        else:
            assert r.isna()["first_purchase_us"]
        if len(v) and len(p) and p.min() >= v.min():
            assert int(r["lag_us"]) == int(p.min() - v.min())
            n_lagged += 1
        else:
            assert r.isna()["lag_us"]
    assert n_lagged > 0


# ---------------------------------------------------------------- T17 ----
def test_dup_sentence_share_bruteforce(ray_session):
    import collections

    from anomalydetection_ray.pipelines.text import t17_dup_sentence_share

    got = (t17_dup_sentence_share(SF).to_pandas()
           .set_index("source").sort_index())

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "source", "text"]).to_pandas()
    docs_of = collections.defaultdict(set)
    for _, r in docs.iterrows():
        for sent in r["text"].split(". "):
            if sent:
                docs_of[sent].add(r["doc_id"])
    per = collections.defaultdict(lambda: [0, 0])
    for _, r in docs.iterrows():
        for sent in r["text"].split(". "):
            if not sent:
                continue
            per[r["source"]][0] += 1
            if len(docs_of[sent]) >= 2:
                per[r["source"]][1] += 1
    assert set(got.index) == set(per)
    for s, (ns, dup) in per.items():
        assert int(got.loc[s, "n_sents"]) == ns
        assert int(got.loc[s, "n_dup"]) == dup
        assert got.loc[s, "dup_share"] == float(dup) / float(ns)


# ---------------------------------------------------------------- A48 ----
def test_seasonal_strength_bruteforce(ray_session):
    from anomalydetection_ray.pipelines.queries import a48_seasonal_strength

    got = (a48_seasonal_strength(SF).to_pandas()
           .set_index("event_type").sort_index())

    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_type", "ts", "value"]).to_pandas()
    ev["day"] = ev["ts"].astype("int64") // 86_400_000_000
    ev["v100"] = np.floor(ev["value"] * 100.0 + 0.5).astype(np.int64)
    for et, g in ev.groupby("event_type"):
        daily = g.groupby("day")["v100"].sum().sort_index()
        day = daily.index.to_numpy()
        x = daily.to_numpy()
        ph = (day + 3) % 7
        n = len(x)
        r2, t2 = [], []
        for a, p in zip(x, ph):
            vals = np.sort(x[ph == p])
            m = len(vals)
            med2 = (2 * int(vals[m // 2]) if m % 2 == 1
                    else int(vals[m // 2 - 1]) + int(vals[m // 2]))
            r2.append(2 * int(a) - med2)
            t2.append(2 * int(a))
        vr = n * sum(v * v for v in r2) - sum(r2) ** 2
        vt = n * sum(v * v for v in t2) - sum(t2) ** 2
        r = got.loc[et]
        assert int(r["n_days"]) == n
        assert int(r["var_resid_num"]) == vr
        assert int(r["var_total_num"]) == vt
        if vt > 0:
            assert r["seasonal_strength"] == max(
                0.0, 1.0 - float(vr) / float(vt))
            assert 0.0 <= r["seasonal_strength"] <= 1.0


# ---------------------------------------------------------------- W38 ----
def test_active_streak_bruteforce(ray_session):
    from anomalydetection_ray.pipelines.windows import w38_active_streak

    got = (w38_active_streak(SF).to_pandas()
           .set_index("user_id").sort_index())

    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "ts"]).to_pandas()
    ev["day"] = ev["ts"].astype("int64") // 86_400_000_000
    for uid, g in ev.groupby("user_id"):
        days = sorted(set(g["day"]))
        runs = []
        start = days[0]
        ln = 1
        for a, b in zip(days, days[1:]):
            if b - a == 1:
                ln += 1
            else:
                runs.append((start, ln))
                start, ln = b, 1
        runs.append((start, ln))
        best = max(r[1] for r in runs)
        first_start = next(s for s, l in runs if l == best)
        n_max = sum(1 for _, l in runs if l == best)
        r = got.loc[uid]
        assert int(r["n_active_days"]) == len(days)
        assert int(r["longest_streak"]) == best
        assert int(r["streak_start_day"]) == first_start
        assert int(r["n_max_streaks"]) == n_max


# ---------------------------------------------------------------- V16 ----
def test_js_divergence_bruteforce(ray_session):
    import collections

    from anomalydetection_ray.pipelines.vocab import v16_js_divergence

    got = (v16_js_divergence(SF).to_pandas()
           .set_index(["source_a", "source_b"]).sort_index())

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["source", "text"]).to_pandas()
    uni = collections.Counter()
    per = collections.defaultdict(collections.Counter)
    tot = collections.Counter()
    for _, r in docs.iterrows():
        ws = [w for w in r["text"].split(" ") if w != ""]
        uni.update(ws)
        per[r["source"]].update(ws)
        tot[r["source"]] += len(ws)
    top = sorted(w for w, _ in sorted(uni.items(),
                                      key=lambda kv: (-kv[1], kv[0]))[:20])
    srcs = sorted(tot)
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            acc_a = acc_b = 0.0
            for w in top:
                fa = float(per[a][w]) / float(tot[a])
                fb = float(per[b][w]) / float(tot[b])
                if fa > 0.0:
                    acc_a += fa * math.log(2.0 * fa / (fa + fb))
                if fb > 0.0:
                    acc_b += fb * math.log(2.0 * fb / (fa + fb))
            js = 0.5 * acc_a + 0.5 * acc_b
            assert got.loc[(a, b), "js"] == js
            assert -1e-12 <= got.loc[(a, b), "js"] <= math.log(2.0) + 1e-12


# ---------------------------------------------------------------- D16 ----
def test_prefix_groups_bruteforce(ray_session):
    import collections

    from anomalydetection_ray.pipelines.dedup import d16_prefix_groups

    got = (d16_prefix_groups(SF).to_pandas()
           .set_index("prefix").sort_index())

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["source", "text"]).to_pandas()
    per = collections.defaultdict(lambda: [0, set()])
    for _, r in docs.iterrows():
        p = r["text"][:32]
        per[p][0] += 1
        per[p][1].add(r["source"])
    exp = {p: (n, len(srcs)) for p, (n, srcs) in per.items() if n >= 2}
    assert set(got.index) == set(exp)
    for p, (n, ns) in exp.items():
        assert int(got.loc[p, "n_docs"]) == n
        assert int(got.loc[p, "n_sources"]) == ns


# ---------------------------------------------------------------- T18 ----
def test_langid_confusion_bruteforce(ray_session):
    from anomalydetection_ray.pipelines.text import (lang_id_batch,
                                                     t18_langid_confusion)

    got = (t18_langid_confusion(SF).to_pandas()
           .set_index(["lang", "pred_lang"]).sort_index())

    docs = pq.read_table(f"{SF}/documents.parquet")
    pred = lang_id_batch(docs).to_pandas()
    import pandas as pd

    df = pd.DataFrame({"lang": docs.column("lang").to_pandas(),
                       "pred_lang": pred["pred_lang"]})
    exp = df.groupby(["lang", "pred_lang"]).size()
    tot = df.groupby("lang").size()
    assert len(got) == len(exp)
    for (l, p), n in exp.items():
        r = got.loc[(l, p)]
        assert int(r["n"]) == int(n)
        assert r["recall"] == float(n) / float(tot[l])
    # recall rows per true lang sum to 1
    s = got.groupby("lang")["recall"].sum()
    assert ((s - 1.0).abs() < 1e-9).all()


# ---------------------------------------------------------------- K16 ----
def test_cluster_purity_consistent_with_assign(ray_session):
    import collections

    from anomalydetection_ray.pipelines.kmeans import (k16_cluster_purity,
                                                       kmeans_assign)

    got = (k16_cluster_purity(SF).to_pandas()
           .set_index("cid").sort_index())
    asg = kmeans_assign(SF).to_pandas()
    emb = pq.read_table(f"{SF}/embeddings.parquet",
                        columns=["vec_id", "label"]).to_pandas()
    lab = dict(zip(emb["vec_id"], emb["label"]))

    per = collections.defaultdict(collections.Counter)
    for _, r in asg.iterrows():
        per[int(r["cid"])][int(lab[r["vec_id"]])] += 1
    assert set(got.index) == set(per)
    for cid, cnt in per.items():
        tot = sum(cnt.values())
        top_label, top_count = sorted(cnt.items(),
                                      key=lambda kv: (-kv[1], kv[0]))[0]
        r = got.loc[cid]
        assert int(r["n_vecs"]) == tot
        assert int(r["top_label"]) == top_label
        assert int(r["top_count"]) == top_count
        assert r["purity"] == float(top_count) / float(tot)
        assert 0.0 < r["purity"] <= 1.0


# ---------------------------------------------------------------- K17 ----
def test_ann_recall_consistent(ray_session):
    from anomalydetection_ray.pipelines.similarity import (
        ann_topk_bruteforce, ann_topk_lsh, k17_ann_recall)

    got = k17_ann_recall(SF).to_pandas().iloc[0]
    exact = {int(r["vec_id"])
             for r in ann_topk_bruteforce(SF).take_all()}
    approx = {int(r["vec_id"]) for r in ann_topk_lsh(SF).take_all()}
    n = len(exact & approx)
    assert int(got["k"]) == 10
    assert int(got["n_common"]) == n
    assert got["recall"] == float(n) / 10.0
    # at sf0.001 the tiny corpus gets few planes -> coarse buckets;
    # the exact VALUE is the contract, the band is only an anti-zero guard
    assert got["recall"] >= 0.1


# ---------------------------------------------------------------- A49 ----
def test_brown_forsythe_bruteforce(ray_session):
    from anomalydetection_ray.pipelines.queries import a49_brown_forsythe

    got = (a49_brown_forsythe(SF).to_pandas()
           .set_index("event_type").sort_index())

    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_type", "ts", "value"]).to_pandas()
    ev["day"] = ev["ts"].astype("int64") // 86_400_000_000
    ev["v100"] = np.floor(ev["value"] * 100.0 + 0.5).astype(np.int64)
    for et, g in ev.groupby("event_type"):
        daily = g.groupby("day")["v100"].sum().sort_index()
        day = daily.index.to_numpy()
        x = daily.to_numpy()
        stats = []
        for sel in ((day % 2) == 0, (day % 2) == 1):
            vals = np.sort(x[sel])
            m = len(vals)
            med2 = (2 * int(vals[m // 2]) if m % 2 == 1
                    else int(vals[m // 2 - 1]) + int(vals[m // 2]))
            z = [abs(2 * int(v) - med2) for v in x[sel]]
            s = sum(z)
            stats.append((m, s, m * sum(v * v for v in z) - s * s))
        (n1, s1, w1), (n2, s2, w2) = stats
        big_n = n1 + n2
        d = n2 * s1 - n1 * s2
        f_num = (big_n - 2) * d * d
        f_den = big_n * (n2 * w1 + n1 * w2)
        r = got.loc[et]
        assert int(r["n_even"]) == n1 and int(r["n_odd"]) == n2
        if f_den > 0:
            assert r["f_bf"] == float(f_num) / float(f_den)
            # cross-check against scipy-free two-group ANOVA on |dev|
            za = [abs(2 * int(v) - (2 * int(np.sort(x[(day % 2) == 0])
                  [n1 // 2]) if n1 % 2 == 1 else
                  int(np.sort(x[(day % 2) == 0])[n1 // 2 - 1])
                  + int(np.sort(x[(day % 2) == 0])[n1 // 2])))
                  for v in x[(day % 2) == 0]]
            assert r["f_bf"] >= 0.0


# ---------------------------------------------------------------- W39 ----
def test_dwell_time_bruteforce(ray_session):
    import collections

    from anomalydetection_ray.pipelines.windows import w39_dwell_time

    got = (w39_dwell_time(SF).to_pandas()
           .set_index("event_type").sort_index())

    ev = (pq.read_table(
        f"{SF}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type"]).to_pandas()
        .sort_values(["user_id", "ts", "event_id"]))
    ev["us"] = ev["ts"].astype("int64")
    agg = collections.defaultdict(lambda: [0, 0])
    for uid, g in ev.groupby("user_id"):
        us = g["us"].to_numpy()
        et = g["event_type"].to_numpy()
        for i in range(len(us) - 1):
            agg[et[i]][0] += 1
            agg[et[i]][1] += int(us[i + 1] - us[i])
    total = sum(v[1] for v in agg.values())
    assert set(got.index) == set(agg)
    for t, (nd, du) in agg.items():
        r = got.loc[t]
        assert int(r["n_dwells"]) == nd
        assert int(r["dwell_us"]) == du
        assert r["share"] == float(du) / float(total)
    assert abs(got["share"].sum() - 1.0) < 1e-9


# ---------------------------------------------------------------- X8 ----
def test_source_homophily_bruteforce(ray_session):
    import collections

    from anomalydetection_ray.pipelines.dedup import (minhash_lsh_pairs,
                                                      x8_source_homophily)

    got = x8_source_homophily(SF).to_pandas().iloc[0]
    pairs = minhash_lsh_pairs(SF, min_est=0.5).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "source"]).to_pandas()
    src = dict(zip(docs["doc_id"], docs["source"]))

    n_edges = len(pairs)
    n_same = sum(1 for _, r in pairs.iterrows()
                 if src[r["doc_a"]] == src[r["doc_b"]])
    ends = collections.Counter()
    for _, r in pairs.iterrows():
        ends[src[r["doc_a"]]] += 1
        ends[src[r["doc_b"]]] += 1
    expected = 0.0
    for s in sorted(ends):
        p = float(ends[s]) / float(2 * n_edges)
        expected = expected + p * p
    assert int(got["n_edges"]) == n_edges
    assert int(got["n_same_source"]) == n_same
    e_same = float(n_same) / float(n_edges)
    assert got["e_same"] == e_same
    assert got["expected"] == expected
    assert got["q_homophily"] == (e_same - expected) / (1.0 - expected)
    assert -1.0 <= got["q_homophily"] <= 1.0


# ---------------------------------------------------------------- G27 ----
def test_daily_new_users_bruteforce(ray_session):
    from anomalydetection_ray.pipelines.queries import g27_daily_new_users

    got = (g27_daily_new_users(SF).to_pandas()
           .set_index("day").sort_index())

    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "ts"]).to_pandas()
    ev["day"] = ev["ts"].astype("int64") // 86_400_000_000
    firsts = ev.groupby("user_id")["day"].min()
    exp = firsts.value_counts().sort_index()
    assert list(got.index) == list(exp.index)
    cum = 0
    for d, n in exp.items():
        cum += int(n)
        assert int(got.loc[d, "n_new_users"]) == int(n)
        assert int(got.loc[d, "cum_users"]) == cum
    assert int(got["cum_users"].iloc[-1]) == ev["user_id"].nunique()


# ---------------------------------------------------------------- Q21 ----
def test_sampling_error_consistent(ray_session):
    from anomalydetection_ray.pipelines.packing import (
        q10_systematic_sample, q21_sampling_error)
    from anomalydetection_ray.pipelines.queries import QUOTA_SEED_MIX

    got = q21_sampling_error(SF).to_pandas().iloc[0]
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "n_chars"]).to_pandas()
    chars = dict(zip(docs["doc_id"], docs["n_chars"]))
    n_true = len(docs)
    mean_true = float(int(docs["n_chars"].sum())) / float(n_true)
    assert int(got["n_total"]) == n_true
    assert got["mean_true"] == mean_true

    sysids = [int(r["doc_id"])
              for r in q10_systematic_sample(SF).take_all()]
    s = sum(int(chars[i]) for i in sysids)
    assert int(got["n_sys"]) == len(sysids)
    assert got["mean_sys"] == float(s) / float(len(sysids))
    assert got["err_sys"] == abs(got["mean_sys"] - mean_true)

    ids = docs["doc_id"].to_numpy().astype(np.uint64)
    h = (((ids & np.uint64(0xFFFFFFFF)) ^ np.uint64(QUOTA_SEED_MIX))
         * np.uint64(2654435761)) & np.uint64(0xFFFFFFFF)
    sel = docs[h % np.uint64(20) == 0]
    assert int(got["n_hash"]) == len(sel)
    assert got["mean_hash"] == (float(int(sel["n_chars"].sum()))
                                / float(len(sel)))
    # both estimators land within 10% of the truth on this corpus
    assert got["err_sys"] / mean_true < 0.1
    assert got["err_hash"] / mean_true < 0.1


# ---------------------------------------------------------------- C6 ----
def test_tpch_q5_like_bruteforce(ray_session):
    from anomalydetection_ray.pipelines.queries import c6_tpch_q5_like

    got = (c6_tpch_q5_like(SF).to_pandas()
           .set_index("n_name").sort_index())

    li = pq.read_table(f"{SF}/lineitem.parquet").to_pandas()
    orders = pq.read_table(f"{SF}/orders.parquet").to_pandas()
    cust = pq.read_table(f"{SF}/customer.parquet").to_pandas()
    supp = pq.read_table(f"{SF}/supplier.parquet").to_pandas()
    nat = pq.read_table(f"{SF}/nation.parquet").to_pandas()
    reg = pq.read_table(f"{SF}/region.parquet").to_pandas()

    j = (li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
         .merge(cust, left_on="o_custkey", right_on="c_custkey")
         .merge(supp, left_on="l_suppkey", right_on="s_suppkey"))
    j = j[j["c_nationkey"] == j["s_nationkey"]]
    j = j.merge(nat, left_on="s_nationkey", right_on="n_nationkey")
    j = j.merge(reg, left_on="n_regionkey", right_on="r_regionkey")
    j = j[j["r_name"] == "ASIA"]
    j["cents"] = np.floor(j["l_extendedprice"]
                          * (1.0 - j["l_discount"]) * 100.0
                          + 0.5).astype(np.int64)
    exp = j.groupby("n_name").agg(revenue_cents=("cents", "sum"),
                                  n_items=("cents", "size"))
    assert set(got.index) == set(exp.index)
    for n, r in exp.iterrows():
        assert int(got.loc[n, "revenue_cents"]) == int(r["revenue_cents"])
        assert int(got.loc[n, "n_items"]) == int(r["n_items"])


# ---------------------------------------------------------------- P8 ----
def test_epoch_decorrelation_bruteforce(ray_session):
    from anomalydetection_ray.pipelines.packing import (
        p8_epoch_decorrelation)

    got = p8_epoch_decorrelation(SF).to_pandas().iloc[0]

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id"]).to_pandas()
    ids = docs["doc_id"].to_numpy().astype(np.uint64)

    def rank(seed):
        smix = (np.uint64(seed) * np.uint64(2654435761)) \
            & np.uint64(0xFFFFFFFF)
        h = (((ids & np.uint64(0xFFFFFFFF)) ^ smix)
             * np.uint64(2654435761)) & np.uint64(0xFFFFFFFF)
        order = np.lexsort((ids.astype(np.int64), h.astype(np.int64)))
        r = np.empty(len(ids), dtype=np.int64)
        r[order] = np.arange(len(ids))
        return r

    ra, rb = rank(42), rank(7)
    s = int(np.abs(ra - rb).sum())
    n = len(ids)
    assert int(got["n"]) == n
    assert int(got["sum_abs_delta"]) == s
    assert got["mean_abs_delta"] == float(s) / float(n)
    exp = float(n * n - 1) / float(3 * n)
    assert got["expected_uniform"] == exp
    assert got["decorrelation"] == (float(s) / float(n)) / exp
    # seeds genuinely re-permute: displacement near the uniform bound
    assert got["decorrelation"] > 0.5


# ---------------------------------------------------------------- D17 ----
def test_sketch_agreement_consistent(ray_session):
    from anomalydetection_ray.pipelines.dedup import (d17_sketch_agreement,
                                                      minhash_lsh_pairs,
                                                      simhash_pairs)

    got = d17_sketch_agreement(SF).to_pandas().iloc[0]

    def pairset(df):
        return {(min(int(r["doc_a"]), int(r["doc_b"])),
                 max(int(r["doc_a"]), int(r["doc_b"])))
                for _, r in df.iterrows()}

    mh = pairset(minhash_lsh_pairs(SF, min_est=0.5).to_pandas())
    sh = pairset(simhash_pairs(SF).to_pandas())
    assert int(got["n_minhash_pairs"]) == len(mh)
    assert int(got["n_simhash_pairs"]) == len(sh)
    assert int(got["n_both"]) == len(mh & sh)
    assert int(got["n_union"]) == len(mh | sh)
    if len(mh | sh):
        assert got["agreement"] == (float(len(mh & sh))
                                    / float(len(mh | sh)))
        # the two sketches hunt the same near-dups; they must overlap
        assert got["agreement"] > 0.2


# ---------------------------------------------------------------- W40 ----
def test_arrival_cadence_bruteforce(ray_session):
    from anomalydetection_ray.pipelines.queries import w40_arrival_cadence

    got = (w40_arrival_cadence(SF).to_pandas()
           .set_index("event_type").sort_index())

    ev = (pq.read_table(f"{SF}/events.parquet",
                        columns=["event_type", "ts", "event_id"])
          .to_pandas().sort_values(["event_type", "ts", "event_id"]))
    for et, g in ev.groupby("event_type"):
        gaps = np.sort(np.diff(g["ts"].astype("int64").to_numpy()))
        m = len(gaps)
        r = got.loc[et]
        assert int(r["n_gaps"]) == m
        assert int(r["gap_sum_us"]) == int(gaps.sum())
        med = (float(gaps[m // 2]) if m % 2 == 1
               else (int(gaps[m // 2 - 1]) + int(gaps[m // 2])) / 2.0)
        assert r["median_gap_us"] == med
        assert r["mean_gap_us"] == float(int(gaps.sum())) / float(m)
