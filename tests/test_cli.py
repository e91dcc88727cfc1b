"""CLI lifecycle smoke (reference main_my.py parity surface): prepare →
evaluate → export, own session in a subprocess (main() stops its session,
so it must not share the test fixture's)."""

from __future__ import annotations

import pytest

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


@pytest.mark.slow
def test_cli_lifecycle(tmp_path):
    run = subprocess.run(
        [
            sys.executable, "-m", "etl_master_spark",
            "--data-dir", "/root/testdata/sf0.001",
            "--model", "popularity",
            "--topk", "5", "10",
            "--log", str(tmp_path),
        ],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert run.returncode == 0, run.stderr[-2000:]
    lines = [json.loads(ln) for ln in run.stdout.splitlines() if ln.startswith("{")]
    stages = [ln["stage"] for ln in lines]
    assert "prepare" in stages and "done" in stages
    evals = [ln for ln in lines if ln["stage"] == "evaluate"]
    # 2 modes × 2 domains × 2 K values
    assert len(evals) == 8
    assert all(0.0 <= e["hr"] <= 1.0 for e in evals)
    # the append-only log mirrors stdout (reference S3 sink)
    logged = (tmp_path / "run_log.jsonl").read_text().splitlines()
    assert len(logged) == len(lines)
    # prepare cache is idempotent: second run skips recompute but still runs
    run2 = subprocess.run(
        [
            sys.executable, "-m", "etl_master_spark",
            "--data-dir", "/root/testdata/sf0.001",
            "--model", "popularity",
            "--skip-prepare",
            "--log", str(tmp_path),
        ],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert run2.returncode == 0, run2.stderr[-2000:]
