"""CLI surface test: `python -m workbook_exporter_fe_ray.run` in a fresh
subprocess (it owns its own Ray session; the in-process fixture session
must not be touched). Covers run → resume (skip done partitions) →
--clean."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_cli(*args: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-m", "workbook_exporter_fe_ray.run", *args],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=600,
        env={**os.environ, "RAY_ADDRESS": ""},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    assert lines, out.stdout[-2000:]
    return json.loads(lines[-1])


def test_cli_run_and_resume(sf_test_dir, tmp_path):
    out_dir = str(tmp_path / "cli_out")
    totals = _run_cli(
        "--input", sf_test_dir, "--out", out_dir,
        "--partitions", "2", "--num-cpus", "2",
    )
    assert totals["partitions_done"] == 2
    assert totals["points"] > 0
    assert set(totals["tier_rows"]) == {"1m", "5m", "1h", "1d"}
    assert os.path.exists(os.path.join(out_dir, "manifest.json"))

    # resume: nothing to recompute, totals identical
    resumed = _run_cli(
        "--input", sf_test_dir, "--out", out_dir,
        "--partitions", "2", "--num-cpus", "2", "--resume",
    )
    assert resumed == totals
