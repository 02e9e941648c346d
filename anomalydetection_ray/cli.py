"""CLI entry points (SURVEY.md §3) — `ray job submit`-compatible: plain
argparse script, owns its Ray session, no interactive state.

    python -m anomalydetection_ray.cli rollup  --input DIR --out DIR [--policy locf] [--resume]
    python -m anomalydetection_ray.cli ingest  --input DIR --out DIR [--shuffle] [--num-parts N] [--resume]
    python -m anomalydetection_ray.cli merge   --input TIER1_DIR --out DIR
    python -m anomalydetection_ray.cli verify  --out DIR
    python -m anomalydetection_ray.cli topk    --input DIR [--k K]
    python -m anomalydetection_ray.cli synth   --out DIR --tokens N

e.g.  ray job submit -- python -m anomalydetection_ray.cli rollup \
          --input /data/sequences --out /data/tiers
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _init_ray(num_cpus: int | None) -> None:
    import ray

    if not ray.is_initialized():
        kwargs = {"include_dashboard": False, "logging_level": "error"}
        if num_cpus is not None:
            kwargs["num_cpus"] = num_cpus
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"), **kwargs)
    from anomalydetection_ray.stages.runs import configure_shuffle

    configure_shuffle()  # honors $ANOMRAY_SHUFFLE; no-op when unset


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="anomalydetection_ray")
    ap.add_argument("--num-cpus", type=int, default=None)
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("rollup", help="P1: resumable tier1+tier2 rollup")
    p.add_argument("--input", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--policy", default="locf", choices=["locf", "linear", "drop"])
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--num-blocks", type=int, default=None)

    p = sub.add_parser("ingest", help="P2: resumable tier0 encode")
    p.add_argument("--input", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--num-parts", type=int, default=64)
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--shuffle", action="store_true",
                   help="hash-partition by doc_id (full exchange) instead of "
                        "the default shuffle-free fragment-aligned encode")

    p = sub.add_parser("merge", help="G1: tier2 recomputed from a tier1 dir")
    p.add_argument("--input", required=True, help="tier1 parquet dir")
    p.add_argument("--out", required=True)
    p.add_argument("--num-partitions", type=int, default=64)

    p = sub.add_parser("verify", help="P3: decode + checksum all tier0 parts")
    p.add_argument("--out", required=True)

    p = sub.add_parser("topk", help="Q2: top-k anomaly buckets")
    p.add_argument("--input", required=True)
    p.add_argument("--k", type=int, default=20)

    p = sub.add_parser("synth", help="S2: deterministic synthetic corpus")
    p.add_argument("--out", required=True)
    p.add_argument("--tokens", type=int, required=True)
    p.add_argument("--seed", type=int, default=42)

    args = ap.parse_args(argv)
    t0 = time.monotonic()

    if args.cmd == "synth":
        # single-process deterministic writer; no Ray session needed
        import numpy as np
        import pyarrow.parquet as pq

        from anomalydetection_ray.sources.synth import synth_batch

        os.makedirs(args.out, exist_ok=True)
        total = i = k = 0
        while total < args.tokens:
            tbl = synth_batch(np.arange(i, i + 800), seed=args.seed)
            pq.write_table(tbl, os.path.join(args.out, f"part-{k:05d}.parquet"),
                           row_group_size=200)
            total += int(sum(tbl.column("n_tok").to_pylist()))
            i += 800
            k += 1
        print(json.dumps({"cmd": "synth", "docs": i, "tokens": total,
                          "wall_s": time.monotonic() - t0}))
        return 0

    import ray

    _init_ray(args.num_cpus)
    try:
        if args.cmd == "rollup":
            from anomalydetection_ray.pipelines.rollup import rollup_persist

            rows = rollup_persist(args.input, args.out, policy=args.policy,
                                  resume=not args.no_resume,
                                  override_num_blocks=args.num_blocks).take_all()
            print(json.dumps({"cmd": "rollup", "units": len(rows),
                              "tier_rows": sum(r["rows_emitted"] for r in rows),
                              "tokens": sum(r["tokens_processed"] for r in rows),
                              "wall_s": time.monotonic() - t0}))
        elif args.cmd == "ingest":
            if args.shuffle:
                from anomalydetection_ray.pipelines.ingest import ingest_pipeline
                from anomalydetection_ray.pipelines.rollup import read_sequences

                rows = ingest_pipeline(read_sequences(args.input, num_cpus=1), args.out,
                                       num_parts=args.num_parts,
                                       resume=not args.no_resume).take_all()
            else:
                from anomalydetection_ray.pipelines.ingest import ingest_persist

                rows = ingest_persist(args.input, args.out,
                                      resume=not args.no_resume).take_all()
            print(json.dumps({"cmd": "ingest", "parts": len(rows),
                              "rows": sum(r["rows_emitted"] for r in rows),
                              "tokens": sum(r["tokens_processed"] for r in rows),
                              "wall_s": time.monotonic() - t0}))
        elif args.cmd == "merge":
            import ray.data

            from anomalydetection_ray.stages.merge import tier2_from_tier1_ds

            # accept mixed-tier dirs (rollup_persist output): merge only tier1
            t1 = ray.data.read_parquet(args.input).filter(expr="tier == 1")
            t2 = tier2_from_tier1_ds(t1, num_partitions=args.num_partitions)
            t2.write_parquet(args.out)
            import glob as _glob

            import pyarrow.parquet as _pq

            n_rows = sum(
                _pq.ParquetFile(f).metadata.num_rows
                for f in _glob.glob(os.path.join(args.out, "**", "*.parquet"), recursive=True)
            )
            print(json.dumps({"cmd": "merge", "tier2_rows": n_rows,
                              "wall_s": time.monotonic() - t0}))
        elif args.cmd == "verify":
            from anomalydetection_ray.pipelines.ingest import verify_tier0

            verdicts = verify_tier0(args.out)
            bad = verdicts.filter(expr="checksum_ok == False").count()
            total = verdicts.count()
            print(json.dumps({"cmd": "verify", "parts": total, "failed": bad,
                              "wall_s": time.monotonic() - t0}))
            return 1 if bad else 0
        elif args.cmd == "topk":
            from anomalydetection_ray.pipelines.rollup import (
                read_sequences,
                rollup_pipeline,
                topk_anomalies,
            )

            top = topk_anomalies(rollup_pipeline(read_sequences(args.input)), k=args.k).take_all()
            print(json.dumps({"cmd": "topk", "rows": [
                {"doc_id": r["doc_id"], "bucket": r["bucket"],
                 "anomaly_score": r["anomaly_score"]} for r in top
            ], "wall_s": time.monotonic() - t0}))
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
