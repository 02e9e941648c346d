"""Crash-proof full-battery runner.

Ray 2.49 can die with an internal ``task_manager.cc`` CHECK failure after
~2000 Datasets in ONE process (observed 2026-08-18 at query ~223 of a
225-query battery; a known upstream bug, not a query failure).  This
wrapper runs ``tools/driver_check.py`` in CHUNKS of queries, each chunk a
fresh process with a fresh Ray session, and aggregates the per-line
results — so a full sweep of all registered queries finishes regardless
of how many queries the registry grows to.

Usage:
    python tools/battery.py [--sf /root/testdata/sf0.01] [--chunk 40]

Prints one PASS/FAIL/---- line per query (streamed from the chunks) and
a final summary line; exit code 1 if any FAIL.
"""

from __future__ import annotations

import argparse
import subprocess
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--chunk", type=int, default=40)
    args = ap.parse_args()

    names = subprocess.run(
        [sys.executable, "-c",
         "import __ray_entry__ as e; print('\\n'.join(sorted(e.queries())))"],
        capture_output=True, text=True, check=True,
    ).stdout.split()

    n_pass = n_fail = n_noracle = 0
    failures: list[str] = []
    for lo in range(0, len(names), args.chunk):
        chunk = names[lo:lo + args.chunk]
        proc = subprocess.run(
            [sys.executable, "tools/driver_check.py", "--sf", args.sf,
             *chunk],
            capture_output=True, text=True,
        )
        for line in proc.stdout.splitlines():
            if line.startswith(("PASS ", "FAIL ", "---- ")):
                print(line, flush=True)
                if line.startswith("PASS"):
                    n_pass += 1
                elif line.startswith("FAIL"):
                    n_fail += 1
                    failures.append(line.split()[1].rstrip(":"))
                else:
                    n_noracle += 1
    print(f"BATTERY SUMMARY: {n_pass} PASS, {n_fail} FAIL, "
          f"{n_noracle} no-oracle, {len(names)} registered")
    if failures:
        print("FAILED:", ", ".join(failures))
        sys.exit(1)


if __name__ == "__main__":
    main()
