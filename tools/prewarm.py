"""Overlapped-handshake subprocess driver for measurement tools.

On the tunneled axon backend every fresh process pays a first-dispatch
handshake (device claim + remote-compile round trip) that runs 20-40 s on
a good day and 300-600 s under congestion (measured round 5), while the
warm dispatch path runs ~20 ms. Tools that isolate each measured part in
its own subprocess (HBM isolation — rows measured back-to-back in one
process read ~20% low) would serialize those handshakes.

This driver spawns every part upfront; each child performs the handshake
concurrently, signals READY via a file, and blocks on a go-file so parts
still *measure* one at a time on an otherwise-idle device. Same protocol
as bench.py's row driver (which keeps its own copy — bench.py must stay
a single self-contained file for the round driver).

Usage (parent):
    from prewarm import run_parts
    for label, out, err in run_parts(cmd_for, parts): print(out)
Usage (child): call `child_handshake()` before any timed work; it no-ops
unless WDT_GO_FILE is set.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import tempfile
import time
from typing import Callable, Iterable, Iterator, List, Sequence, Tuple


def child_handshake() -> None:
    """Pay the per-process backend handshake, signal READY, await go."""
    go = os.environ.get("WDT_GO_FILE")
    if not go:
        return
    import jax.numpy as jnp
    import numpy as np

    np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    with open(os.environ["WDT_READY_FILE"], "w") as f:
        f.write("ok")
    while not os.path.exists(go):
        time.sleep(0.05)


def run_parts(
    cmd_env_for: Callable[[str], Tuple[Sequence[str], dict]],
    parts: Iterable[str],
    *,
    ready_deadline: float = 1200.0,
    part_timeout: float = 900.0,
) -> Iterator[Tuple[str, str, str]]:
    """Yield (part, stdout, stderr) per part, measured serially but with all
    handshakes overlapped. `cmd_env_for(part)` returns (argv, extra_env)."""
    td = tempfile.mkdtemp(prefix="wdt_prewarm_")
    children: List[Tuple[str, subprocess.Popen, dict]] = []
    try:
        for part in parts:
            paths = {k: os.path.join(td, f"{k}_{part}")
                     for k in ("go", "ready", "out", "err")}
            argv, extra = cmd_env_for(part)
            env = dict(os.environ, **extra,
                       WDT_GO_FILE=paths["go"], WDT_READY_FILE=paths["ready"])
            with open(paths["out"], "w") as outf, \
                    open(paths["err"], "w") as errf:
                proc = subprocess.Popen(argv, stdout=outf, stderr=errf,
                                        env=env)
            children.append((part, proc, paths))

        for part, proc, paths in children:
            t0 = time.monotonic()
            while time.monotonic() - t0 < ready_deadline:
                if os.path.exists(paths["ready"]) or proc.poll() is not None:
                    break
                time.sleep(0.1)
            else:
                proc.kill()
                yield part, "", f"handshake timeout {ready_deadline:.0f}s"
                continue
            open(paths["go"], "w").close()
            try:
                proc.wait(timeout=part_timeout)
            except subprocess.TimeoutExpired:
                proc.kill()
                yield part, "", f"timeout {part_timeout:.0f}s"
                continue
            with open(paths["out"]) as f:
                out = f.read()
            with open(paths["err"]) as f:
                err = f.read()
            yield part, out, err
    finally:
        for _, proc, _ in children:
            if proc.poll() is None:
                proc.kill()
        shutil.rmtree(td, ignore_errors=True)
