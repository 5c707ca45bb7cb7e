"""Benchmark: batched transcription throughput on one TPU chip.

Measures the BASELINE.md matrix (the reference publishes no numbers; the
north-star target is >= 100x real-time per v5e chip on large-v3):

  1. large-v3, batch 16, greedy 64 tokens  — the BASELINE headline config
  2. large-v3, batch 16, beam-5            — config 4 shape (long-form beam)
  3. large-v3-turbo, batch 16, greedy 64   — round-1 continuity row
  4. large-v3-turbo + diarization, batch 16 — config 5 compute: greedy +
     DTW alignment pass + CAM++ speaker embeddings in the loop
  5. ENGINE-PATH config 5: Engine.transcribe_audio_batch over 16 WAV
     streams — diarization branch, windows scheduler, pipelined DTW,
     bounded frontend batches, per-stream formatting: what a user of the
     product actually runs (VERDICT r3 Next #5)

Each row reports **xRT**: audio-seconds transcribed per wall-clock second
per chip; `vs_baseline` is the ratio to the 100x target.

Prints ONE JSON line per completed row: the headline row's {"metric",
"value", "unit", "vs_baseline"} plus a "rows" array with every row
measured SO FAR (cumulative) — the final line is the full aggregate, and
a driver kill mid-run still leaves every completed row in the tail.

Row subprocesses are all spawned upfront: on the tunneled axon backend
the per-process first-dispatch handshake (device claim + remote-compile
round trip) can cost minutes, so each child performs it concurrently,
signals READY, and waits for a go-file before measuring — rows still
measure one at a time on an otherwise-idle device, but their handshakes
overlap instead of serializing. The first row's handshake doubles as the
dead-backend probe.

Env: WDT_BENCH_ROWS="1,3" limits to a subset (1-based row ids above);
WDT_PROBE_TIMEOUT bounds the handshake wait, WDT_ROW_TIMEOUT the
measurement (handshake excluded).
"""

from __future__ import annotations

import dataclasses
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

if os.environ.get("WDT_FORCE_CPU") == "1":
    # plumbing/orchestration tests off-TPU: the site hook re-asserts
    # JAX_PLATFORMS=axon, so the env var alone cannot force CPU
    jax.config.update("jax_platforms", "cpu")

from whisper_diarize_tpu.models import whisper as wm
from whisper_diarize_tpu.ops import decode as dec
from whisper_diarize_tpu.ops import dtw as dtw_ops
from whisper_diarize_tpu.ops.mel import N_SAMPLES, log_mel_spectrogram
from whisper_diarize_tpu.tokenizer import DebugTokenizer

BATCH = 16
DECODE_TOKENS = 64  # ~2.1 tok/s of audio — typical speech density
TARGET_XRT = 100.0  # north-star: >= 100x real-time per v5e chip


def _sync(x) -> None:
    # NOTE: on the tunneled axon backend block_until_ready returns before
    # execution completes; a host fetch is the only reliable sync.
    np.asarray(x)


def bench_config(model: str, *, beam: int = 1, diarize: bool = False,
                 dtw: bool = False, iters: int = 3) -> dict:
    cfg = wm.PRESETS[model]
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    params = wm.init_params_fast(cfg, dtype=dtype)
    tk = DebugTokenizer(num_languages=cfg.num_languages)
    sp = tk.specials

    # suppress EOT so every run decodes exactly DECODE_TOKENS steps
    # (random weights would otherwise terminate at arbitrary points and make
    # runs incomparable)
    suppress = jnp.asarray(
        dec.build_suppress_mask(sp, cfg.n_vocab, extra_suppress=[sp.eot])
    )
    dc = dec.DecodeConfig(
        max_tokens=DECODE_TOKENS, with_timestamps=True, beam_size=max(beam, 1),
        # Pallas flash cross-attention (the decode bottleneck) on TPU
        pallas_cross=(
            jax.default_backend() == "tpu"
            and os.environ.get("WDT_DISABLE_PALLAS_ATTN") != "1"
        ),
    )
    # TPU acceptance gate verdict (tools/bench_megakernel.py, large-v3 b16):
    # tail kernel wins greedy steps (9.895 -> 9.723 ms/step, KEEP); the
    # front kernel loses (9.935, DROP — not attached); beam-5 with the
    # ~2 GB tail weight pack resident EXHAUSTS v5e HBM on top of the split
    # beam cache, so the pack is greedy-only.
    if beam > 1:
        dc = dataclasses.replace(dc, pallas_tail=False)
    if dec._resolve_pallas_tail(dc):
        # the tail megakernel needs its weight pack in the params pytree
        # (same attach TranscribeStep does on model load); the probe
        # degrades a Mosaic lowering failure to the un-fused path instead
        # of killing the bench row
        from whisper_diarize_tpu.ops.pallas_tail import (
            megakernels_supported, pack_tail_weights)

        if not megakernels_supported(cfg.n_text_state, cfg.n_text_head):
            dc = dataclasses.replace(dc, pallas_tail=False)
    if dec._resolve_pallas_tail(dc):
        params = {
            **params,
            "decoder": {
                **params["decoder"],
                "tail": pack_tail_weights(params, cfg),
            },
        }

    rng = np.random.default_rng(0)
    audio = jnp.asarray(
        rng.standard_normal((BATCH, N_SAMPLES)).astype(np.float32) * 0.1
    )
    prompt = jnp.asarray(
        np.tile(np.array(tk.sot_sequence(language="en"), np.int32), (BATCH, 1))
    )

    decode_fn = dec.beam_decode if beam > 1 else dec.greedy_decode

    @jax.jit
    def full_step(params, audio, prompt, suppress):
        # ONE dispatch: fused mel -> encoder -> KV-cached decode
        mel = log_mel_spectrogram(audio, n_mels=cfg.n_mels)
        xa = wm.encode(params, mel.astype(dtype), cfg)
        res = decode_fn(
            params, cfg, dc, sp, xa, prompt, prompt.shape[1],
            suppress_mask=suppress,
        )
        return res, xa

    heads = wm.alignment_heads_for(model, cfg)
    # fused alignment pass + on-device DTW cost (only [B, S, Ta] crosses the
    # tunneled host link, not the K-fold attention maps)
    align_cost = jax.jit(
        lambda p, t, xa, nf, nr: dtw_ops.alignment_cost_batch(
            wm.alignment_cross_attn(p, cfg, t, xa, heads), nf, nr
        )
    )
    # default path: cost reduction + DTW DP + backtrack all on device; only
    # [B, N] i32 anchor frames are fetched (WDT_HOST_DTW=1 benches the
    # fetched-cost + host-DP fallback instead)
    align_anchors = jax.jit(
        lambda p, t, xa, nf, nr, nt, sl: dtw_ops.dtw_anchor_frames_batch(
            dtw_ops.alignment_cost_batch(
                wm.alignment_cross_attn(p, cfg, t, xa, heads), nf, nr
            ),
            nt, nf, sl,
        ),
        static_argnums=(6,),
    )
    host_dtw = os.environ.get("WDT_HOST_DTW", "") == "1"

    if diarize:
        from whisper_diarize_tpu.models import campplus

        emb_params = campplus.init_params()
        n_valid = jnp.full((BATCH,), N_SAMPLES, jnp.int32)

    sot = np.tile(np.array(tk.sot_sequence(language="en"), np.int32), (BATCH, 1))
    n_frames = jnp.full((BATCH,), cfg.n_audio_ctx, jnp.int32)

    def run_once():
        res, xa = full_step(params, audio, prompt, suppress)
        if diarize:
            # ON-DEVICE speaker embeddings straight from the decode's audio
            embs = campplus.embed_from_audio(emb_params, audio, n_valid)
        if dtw:
            toks = np.asarray(res.tokens)
            lens = np.asarray(res.lengths)
            seq = jnp.asarray(np.concatenate([sot, toks], axis=1))
            n_rows = jnp.asarray(
                np.minimum(sot.shape[1] + lens + 1, seq.shape[1]), jnp.int32
            )
            if host_dtw:
                cost = np.asarray(
                    align_cost(params, seq, xa, n_frames, n_rows))
                for b in range(BATCH):
                    n_tok = max(int(lens[b]), 1)
                    dtw_ops.anchor_times_from_cost(
                        np.ascontiguousarray(
                            cost[b][sot.shape[1]: sot.shape[1] + n_tok]
                        ),
                        n_tok,
                    )
            else:
                n_tok = jnp.asarray(np.maximum(lens, 1), jnp.int32)
                np.asarray(align_anchors(
                    params, seq, xa, n_frames, n_rows, n_tok, sot.shape[1]
                ))  # [B, N] i32 — the only alignment bytes fetched
        if diarize:
            _sync(embs)
        _sync(res.tokens)

    run_once()  # warmup / compile

    t0 = time.perf_counter()
    for _ in range(iters):
        run_once()
    dt = (time.perf_counter() - t0) / iters

    audio_seconds = BATCH * (N_SAMPLES / 16000.0)
    xrt = audio_seconds / dt
    label = f"xRT {model} b{BATCH} " + (
        f"beam{beam}-{DECODE_TOKENS}" if beam > 1 else f"greedy{DECODE_TOKENS}"
    )
    if dtw:
        label += "+dtw"
    if diarize:
        label += "+diarize"
    return {
        "metric": f"{label} (audio-sec/sec/chip)",
        "value": round(xrt, 2),
        "unit": "x realtime",
        "vs_baseline": round(xrt / TARGET_XRT, 3),
    }


def bench_engine_path(model: str = "large-v3-turbo", streams: int = 16,
                      seconds: int | None = None, iters: int | None = None,
                      ) -> dict:
    """BASELINE config 5 through the PRODUCT path: 16 synthetic WAV streams
    via `Engine.transcribe_audio_batch` — diarization (segmentation net +
    CAM++ embeddings + clustering), the window scheduler, the pipelined-DTW
    engine path and per-stream formatting all inside the measurement.

    Random weights end decode after ~2 tokens (instant EOT), which would
    make the row measure nothing — EOT is suppressed through the same
    build_suppress_mask hook the compute rows use, so every window decodes
    a realistic token budget.

    Mid-range timestamp tokens are suppressed too: random logits otherwise
    sprinkle timestamp pairs through every segment and the seek loop
    faithfully advances to the LAST one — measured ~13 windows per 15 s
    stream (1.5 xRT, pure seek thrash no trained checkpoint exhibits;
    real decodes end a healthy window at its final timestamp and advance
    ~30 s). Keeping only <|0.00|> (the grammar force-samples an initial
    timestamp <= max_initial_timestamp at step 0) and the window-final
    timestamp preserves the timestamp machinery while making every window
    advance fully, so the row measures product glue at a realistic
    windows-per-second rate.

    Two more random-weight artifacts are neutralized the same way
    (round-5 decomposition: stage seconds mel=1.7 encode=4.6 DECODE=82.1
    embed=0.5 over 245 windows/iter where 16 were expected):

    * the untrained segmentation net fragments every 15 s stream into ~15
      speaker chunks, each transcribed separately. The wrapped
      get_segments_batch still RUNS the real net (device cost stays in the
      measurement) but returns the whole stream as one segment — the
      realistic turn rate for a short clip.
    * temperature fallback (EngineConfig default, reference parity): random
      logits give every window avg logprob ~ln(1/V) = -10.8, far below the
      -1.0 threshold, so EVERY window re-decoded at all 5 fallback
      temperatures (plus best_of sampling). Real checkpoints trip the
      ladder on a small minority of windows; the row disables it.

    max_decode_tokens is scaled to the stream length at the compute rows'
    token density (64 tokens / 30 s ~= 2.1 tok/s), so row 5's device work
    per audio-second matches row 4 and the xRT gap between them isolates
    the product glue (scheduler, frontends, clustering, host DTW,
    formatting)."""
    import tempfile

    # Budgeted for the driver (VERDICT r4 Next #1d): row 5 carries a large
    # fresh compile (engine greedy + segmentation + CAM++ + mel), so the
    # measured portion defaults small; WDT_ENGINE_SECONDS/ITERS widen it for
    # manual runs.
    if seconds is None:
        seconds = int(os.environ.get("WDT_ENGINE_SECONDS", "15"))
    if iters is None:
        iters = int(os.environ.get("WDT_ENGINE_ITERS", "2"))

    from whisper_diarize_tpu.audio import write_wav
    from whisper_diarize_tpu.engine import Engine, EngineConfig
    from whisper_diarize_tpu.types import AdvancedTranscribe, TranscribeOptions

    orig_mask = dec.build_suppress_mask

    def patched(sp, n_vocab, extra_suppress=None):
        ts_mid = list(range(sp.timestamp_begin + 1, sp.timestamp_begin + 1500))
        return orig_mask(
            sp, n_vocab,
            list(extra_suppress or []) + [sp.eot] + ts_mid,
        )

    from whisper_diarize_tpu import diarize as diarize_mod
    from whisper_diarize_tpu.types import SpeechSegment

    orig_get = diarize_mod.get_segments_batch

    def patched_get(samples, sr, seg_params):
        orig_get(samples, sr, seg_params)  # real net, device cost measured
        return [
            [SpeechSegment(start=0.0, end=len(s) / sr, samples=s)]
            for s in samples
        ]

    dec.build_suppress_mask = patched
    diarize_mod.get_segments_batch = patched_get
    # compute-row token density (DECODE_TOKENS per 30 s window)
    budget = max(8, int(round(DECODE_TOKENS * seconds / 30.0)))
    try:
        td = tempfile.mkdtemp(prefix="wdt_bench_")
        rng = np.random.default_rng(0)
        wavs = []
        for i in range(streams):
            x = (rng.standard_normal(16000 * seconds) * 6000).astype(np.int16)
            p = os.path.join(td, f"s{i:02d}.wav")
            write_wav(p, x)
            wavs.append(p)

        eng = Engine(EngineConfig(
            cache_dir=os.path.join(td, "cache"),
            whisper_model_path=f"__random__:{model}",
            enable_dtw=True,
            batch_size=streams,
            max_decode_tokens=budget,
            temperature_fallback=False,
            allow_random_weights=True,
            diarize_segment_model_path="__random__",
            diarize_embedding_model_path="__random__",
        ))
        opts = TranscribeOptions(
            model=model, lang="en", enable_vad=False, enable_diarize=True,
            advanced=AdvancedTranscribe(sampling_strategy="greedy"),
        )
        eng.transcribe_audio_batch(wavs, opts)  # warmup / compile
        t0 = time.perf_counter()
        for _ in range(iters):
            eng.transcribe_audio_batch(wavs, opts)
        dt = (time.perf_counter() - t0) / iters
    finally:
        dec.build_suppress_mask = orig_mask
        diarize_mod.get_segments_batch = orig_get

    xrt = streams * float(seconds) / dt
    return {
        "metric": (f"xRT ENGINE {model} {streams}-stream greedy"
                   f"{budget}+dtw+diarize (audio-sec/sec/chip)"),
        "value": round(xrt, 2),
        "unit": "x realtime",
        "vs_baseline": round(xrt / TARGET_XRT, 3),
    }


ROWS = {
    1: dict(model="large-v3"),
    2: dict(model="large-v3", beam=5),
    3: dict(model="large-v3-turbo"),
    4: dict(model="large-v3-turbo", diarize=True, dtw=True),
    5: "engine",
}


def _child_handshake() -> None:
    """Row-child prologue: pay the per-process backend handshake (device
    claim + first remote-compile round trip — minutes on a congested axon
    tunnel, measured 300-600 s while the warm path runs 20 ms), signal
    READY, and block until the parent's go-file appears. Lets the parent
    overlap every row's handshake while still measuring rows one at a time
    on an otherwise-idle device."""
    x = jnp.ones((8, 8))
    np.asarray(x @ x)  # claim + first compile: the slow leg
    with open(os.environ["WDT_READY_FILE"], "w") as f:
        f.write("ok")
    go = os.environ["WDT_GO_FILE"]
    while not os.path.exists(go):
        time.sleep(0.05)


def _failed_row(rid: int, why: str) -> dict:
    return {
        "metric": f"row {rid} FAILED ({why})",
        "value": 0.0, "unit": "x realtime", "vs_baseline": 0.0,
    }


def main() -> None:
    want = os.environ.get("WDT_BENCH_ROWS", "1,2,3,4,5")
    ids = [int(s) for s in want.split(",") if s.strip()]
    if len(ids) == 1:
        rid = ids[0]
        if os.environ.get("WDT_GO_FILE"):
            _child_handshake()
        hang = os.environ.get("WDT_SIMULATE_HANG_ROW", "")
        if str(rid) in [s.strip() for s in hang.split(",") if s.strip()]:
            time.sleep(1e9)  # test hook: a hung row for the timeout path
        spec = ROWS[rid]
        # WDT_BENCH_MODEL_OVERRIDE=tiny: CPU smoke runs of the orchestration
        over = os.environ.get("WDT_BENCH_MODEL_OVERRIDE")
        if spec == "engine":
            row = bench_engine_path(**({"model": over} if over else {}))
        else:
            row = bench_config(**({**spec, "model": over} if over else spec))
        print(json.dumps({**row, "rows": [row]}))
        return

    # Driver-proofing (VERDICT r4 Next #1): the round-4 BENCH record was
    # rc=124/empty because one hung row consumed the whole driver budget and
    # nothing was printed until all rows finished. Now: (a) the first row's
    # handshake is the dead-backend probe; (b) every row has its own timeout
    # (measurement only — the handshake happened concurrently up front) and
    # expiry yields a FAILED row, not a hang; (c) a cumulative aggregate is
    # printed (flushed) the moment each row completes, so a driver kill
    # still leaves a parseable tail with every finished row.
    #
    # One subprocess per row: a fresh backend per config — rows measured
    # back-to-back in one process read ~20% low (HBM fragmentation after
    # the large-v3 rows / leftover executables).
    import shutil
    import subprocess
    import sys
    import tempfile

    # row 5 (engine path) compiles the whole product pipeline — engine
    # greedy + segmentation + CAM++ + mel — and round-5 measurement put it
    # past the uniform 600 s budget (FAILED at timeout while still emitting
    # segments); it gets a larger default. WDT_ROW_TIMEOUT overrides all.
    per_row_default = {5: 1500.0}
    env_rt = os.environ.get("WDT_ROW_TIMEOUT")

    def row_timeout_for(rid: int) -> float:
        return float(env_rt) if env_rt else per_row_default.get(rid, 600.0)

    # no-progress bound, not total-run: today's worst observed first-ready
    # gap under handshake congestion was ~11 min, so 900 s was one bad day
    # from a false BACKEND DEAD
    ready_deadline = float(os.environ.get("WDT_PROBE_TIMEOUT", "1200"))

    td = tempfile.mkdtemp(prefix="wdt_bench_drv_")
    children = []
    for rid in ids:
        paths = {
            "go": os.path.join(td, f"go_{rid}"),
            "ready": os.path.join(td, f"ready_{rid}"),
            "out": os.path.join(td, f"out_{rid}"),
            "err": os.path.join(td, f"err_{rid}"),
        }
        env = dict(
            os.environ, WDT_BENCH_ROWS=str(rid),
            WDT_GO_FILE=paths["go"], WDT_READY_FILE=paths["ready"],
        )
        outf = open(paths["out"], "w")
        errf = open(paths["err"], "w")
        proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)],
            stdout=outf, stderr=errf, env=env,
        )
        outf.close()
        errf.close()
        children.append((rid, proc, paths))

    # Rows are measured in handshake-COMPLETION order, not request order:
    # the axon claim leg serializes server-side, so the fastest-claimed row
    # measures while the others keep queueing. `ready_deadline` bounds
    # NO-PROGRESS time (no pending child going ready while the device is
    # otherwise idle), not total run time. Output rows are re-sorted into
    # request order for the aggregate.
    rows_by_rid: dict = {}

    def emit_cumulative() -> None:
        # the driver parses the LAST stdout line, so a mid-run kill still
        # yields a headline metric plus every row measured so far
        done = [rows_by_rid[r] for r in ids if r in rows_by_rid]
        print(json.dumps({**done[0], "rows": done}), flush=True)

    pending = {rid: (proc, paths) for rid, proc, paths in children}
    any_ready_ever = False
    try:
        while pending:
            chosen = None
            t0 = time.monotonic()
            while time.monotonic() - t0 < ready_deadline:
                for rid, (proc, paths) in pending.items():
                    if os.path.exists(paths["ready"]):
                        chosen = (rid, "ready")
                        break
                    if proc.poll() is not None:
                        chosen = (rid, "crashed")
                        break
                if chosen:
                    break
                time.sleep(0.1)
            if chosen is None:
                if not any_ready_ever:
                    # nothing has ever dispatched: the tunnel is dead, not
                    # slow — kill the fleet and report explicitly
                    err = {
                        "metric": ("BACKEND DEAD (handshake dispatch "
                                   f"timed out after {ready_deadline:.0f}s)"),
                        "value": 0.0, "unit": "x realtime",
                        "vs_baseline": 0.0,
                    }
                    print(json.dumps({**err, "rows": [err]}), flush=True)
                    return
                for rid, (proc, paths) in pending.items():
                    proc.kill()
                    rows_by_rid[rid] = _failed_row(
                        rid, f"handshake timeout {ready_deadline:.0f}s")
                emit_cumulative()
                break
            rid, status = chosen
            proc, paths = pending.pop(rid)
            if status == "crashed":
                with open(paths["err"]) as f:
                    sys.stderr.write(f.read()[-2000:] + "\n")
                row = _failed_row(rid, "crashed during handshake")
            else:
                any_ready_ever = True
                open(paths["go"], "w").close()
                row_timeout = row_timeout_for(rid)
                try:
                    proc.wait(timeout=row_timeout)
                    with open(paths["out"]) as f:
                        text = f.read().strip()
                    line = text.splitlines()[-1] if text else ""
                    row = {k: v for k, v in json.loads(line).items()
                           if k != "rows"}
                except subprocess.TimeoutExpired:
                    proc.kill()
                    row = _failed_row(rid, f"timeout {row_timeout:.0f}s")
                except (ValueError, IndexError):
                    with open(paths["err"]) as f:
                        sys.stderr.write(f.read()[-2000:] + "\n")
                    row = _failed_row(rid, "no parseable output")
            rows_by_rid[rid] = row
            emit_cumulative()
    finally:
        for _, proc, _ in children:
            if proc.poll() is None:
                proc.kill()
        shutil.rmtree(td, ignore_errors=True)


if __name__ == "__main__":
    main()
