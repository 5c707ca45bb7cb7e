"""Driver-proofing tests for bench.py (VERDICT r4 Next #1).

Round 4's BENCH record was rc=124 with an empty tail: one hung row consumed
the whole driver budget and bench.py printed nothing until all rows finished.
These tests pin the fixes without needing a TPU:

  - a hung row expires against WDT_ROW_TIMEOUT and yields a FAILED row,
  - every completed row is printed (flushed) as its own JSON line, so a
    driver kill mid-run still leaves a parseable tail,
  - a dead backend is detected by the probe and reported as an explicit
    error row instead of hanging,
  - the process exits rc=0 in every case.

Mirrors the driver contract (BENCH_r*.json tail parsing) rather than any
reference file: the reference ships no benchmark harness.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

BENCH = os.path.join(os.path.dirname(__file__), os.pardir, "bench.py")


def _run(env_extra: dict, timeout: float = 300.0):
    env = dict(os.environ, WDT_FORCE_CPU="1", **env_extra)
    env.pop("JAX_PLATFORMS", None)
    return subprocess.run(
        [sys.executable, os.path.abspath(BENCH)],
        capture_output=True, text=True, env=env, timeout=timeout,
    )


def test_hung_rows_yield_failed_rows_and_parseable_tail():
    # both rows "hang" (test hook, after the handshake/go) with a short
    # per-row timeout: the run must finish quickly, mark each row FAILED,
    # and print a cumulative aggregate line per row
    out = _run({
        "WDT_BENCH_ROWS": "1,2",
        "WDT_SIMULATE_HANG_ROW": "1,2",
        "WDT_ROW_TIMEOUT": "6",
    })
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")]
    assert len(lines) == 2  # one cumulative aggregate per completed row
    aggs = [json.loads(ln) for ln in lines]
    # every line parseable on its own with a rows array: a driver kill
    # after line 1 would still have captured a valid record
    assert len(aggs[0]["rows"]) == 1 and len(aggs[1]["rows"]) == 2
    for row in aggs[1]["rows"]:
        assert "FAILED" in row["metric"] and "timeout" in row["metric"]
        assert row["value"] == 0.0 and row["vs_baseline"] == 0.0
    assert "FAILED" in aggs[1]["metric"]  # headline mirrors rows[0]


def test_dead_backend_probe_reports_error_row():
    # the first row's handshake doubles as the probe: a deadline no child
    # can meet must report BACKEND DEAD instead of hanging
    out = _run({
        "WDT_BENCH_ROWS": "1,2",
        "WDT_PROBE_TIMEOUT": "0.02",
    })
    assert out.returncode == 0, out.stderr[-2000:]
    tail = json.loads(out.stdout.strip().splitlines()[-1])
    assert "BACKEND DEAD" in tail["metric"]
    assert tail["rows"][0]["value"] == 0.0


@pytest.mark.slow
def test_row_smoke_cpu_tiny():
    # the single-row child path actually measures something off-TPU
    out = _run({
        "WDT_BENCH_ROWS": "1",
        "WDT_BENCH_MODEL_OVERRIDE": "tiny",
    }, timeout=600.0)
    assert out.returncode == 0, out.stderr[-2000:]
    tail = json.loads(out.stdout.strip().splitlines()[-1])
    assert tail["value"] > 0
    assert tail["rows"][0]["metric"].startswith("xRT tiny")
