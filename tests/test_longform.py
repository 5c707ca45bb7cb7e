"""Long-form scaling guard (VERDICT r4 Next #6).

BASELINE config 4 is a 1-hour single stream; its engine path is the
WindowScheduler's serial seek loop with rolling prompt carry
(`/root/reference/src/transcribe.rs:376-402` — whisper.cpp's serial seek).
This test runs a multi-minute single stream on CPU (tiny model) and asserts
the properties a 1-hour run depends on:

  * the scheduler terminates and covers the stream (>= minutes*2 windows at
    30 s strides),
  * host glue scales linearly: the last windows are not systematically
    slower than the first (no O(n^2) accumulation in scheduler/prompt/
    segment bookkeeping),
  * host memory stays flat (peak RSS bounded).

The TPU ledger number comes from `tools/bench_longform.py` (same code
path, --minutes 60).
"""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

TOOL = os.path.join(os.path.dirname(__file__), os.pardir, "tools",
                    "bench_longform.py")


def test_longform_scaling_cpu():
    env = dict(os.environ, WDT_FORCE_CPU="1")
    env.pop("JAX_PLATFORMS", None)
    out = subprocess.run(
        [sys.executable, os.path.abspath(TOOL), "--minutes", "6",
         "--model", "tiny", "--max-tokens", "8", "--beam", "1"],
        capture_output=True, text=True, env=env, timeout=560,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    report = json.loads(out.stdout.strip().splitlines()[-1])
    assert report["windows"] >= 12, report  # 6 min / 30 s windows
    # cadence guard: the tool itself exits 1 when the last decile runs
    # > 3x the first (which includes compile), so rc==0 already pins the
    # linear-host-glue property; sanity-check the numbers are present
    assert report["first_decile_s_per_window"] is not None
    assert report["last_decile_s_per_window"] is not None
    # flat host memory: a 6-minute tiny run fits comfortably in < 4 GB
    # (catches accidental per-window accumulation of device buffers)
    assert report["peak_rss_mb"] < 4096, report
