"""Shuffle-strategy A/B datapoint (round-5 verdict item 7).

Measures one `_pkey`-heavy pipeline (w1_sessionize_events, sf0.1) under
Ray's sort-based pull shuffle vs the hash-shuffle aggregators, fresh
process per repetition (a shuffle strategy is a session-level
DataContext setting).  Prints one JSON line with per-strategy wall
times; record the result + recommendation in BENCH/ and BASELINE.md.

Usage:
    python tools/shuffle_bench.py                 # full A/B, best-of-3
    python tools/shuffle_bench.py --one sort-pull # single child rep

Do NOT run concurrently with any other benchmark on this host (the
co-tenant throttling documented in BASELINE.md poisons comparisons).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def run_one(strategy: str) -> float:
    import ray

    ray.init(address="local", num_cpus=CPUS, include_dashboard=False,
             logging_level="error")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    from anomalydetection_ray.stages.runs import configure_shuffle

    configure_shuffle(strategy)
    from anomalydetection_ray.pipelines.windows import w1_sessionize_events

    t0 = time.monotonic()
    n = w1_sessionize_events(SF_DIR).count()
    dt = time.monotonic() - t0
    print(json.dumps({"strategy": strategy, "wall_s": round(dt, 3),
                      "rows": n}), flush=True)
    ray.shutdown()
    return dt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--one", default=None,
                    help="run a single measurement for this strategy")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    if args.one:
        run_one(args.one)
        return

    results: dict[str, list[float]] = {}
    # interleave strategies so a host-noise window hits both equally
    for rep in range(args.reps):
        for strat in ("sort-pull", "hash"):
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--one", strat],
                capture_output=True, text=True,
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
            for line in proc.stdout.splitlines():
                if line.startswith("{"):
                    rec = json.loads(line)
                    results.setdefault(rec["strategy"], []).append(
                        rec["wall_s"])
    out = {
        "query": "w1_sessionize_events",
        "sf_dir": SF_DIR,
        "num_cpus": CPUS,
        "reps": results,
        "best": {k: min(v) for k, v in results.items() if v},
        "median": {k: sorted(v)[len(v) // 2] for k, v in results.items() if v},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
