"""CLI smoke: synth -> rollup -> ingest -> verify -> merge, each a fresh
`ray job submit`-shaped process (plain script, owns its session)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(*args: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-m", "anomalydetection_ray.cli", "--num-cpus", "4", *args],
        capture_output=True, text=True, cwd=REPO, check=True, timeout=600,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_cli_end_to_end(tmp_path):
    seqs = str(tmp_path / "seqs")
    tiers = str(tmp_path / "tiers")
    tier0 = str(tmp_path / "tier0")
    t2 = str(tmp_path / "t2")

    r = _run("synth", "--out", seqs, "--tokens", "300000")
    assert r["tokens"] >= 300000

    r = _run("rollup", "--input", seqs, "--out", tiers)
    assert r["tier_rows"] > 0 and r["tokens"] > 0

    r = _run("ingest", "--input", seqs, "--out", tier0)
    assert r["rows"] > 0

    r = _run("verify", "--out", tier0)
    assert r["failed"] == 0 and r["parts"] > 0

    # tier2 recomputed from the written tier1 matches the written tier2 rows
    r = _run("merge", "--input", os.path.join(tiers, "tiers"), "--out", t2)
    assert r["tier2_rows"] > 0

    # resume no-op: a second rollup run recomputes nothing
    r = _run("rollup", "--input", seqs, "--out", tiers)
    assert r["units"] == 0
