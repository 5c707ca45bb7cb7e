"""True long-form BASELINE config-4 measurement (VERDICT r4 Next #6).

One 1-hour synthetic stream through `Engine.transcribe_audio` — the
WindowScheduler's serial seek loop (whisper.cpp semantics,
`/root/reference/src/transcribe.rs:376-402`: each next window start depends
on the previous decode), rolling prompt carry, per-window resume journal,
DTW alignment and formatting all inside the measurement. Reports xRT,
per-window wall time for the first/last deciles (host-glue scaling), and
peak host memory.

Run on the TPU:   python tools/bench_longform.py [--minutes 60] [--beam 5]
CPU smoke:        WDT_FORCE_CPU=1 python tools/bench_longform.py --minutes 4 \
                      --model tiny --max-tokens 8

Random weights would EOT instantly, so EOT is suppressed like bench.py rows.
Mid-range timestamps are suppressed the same way bench.py's engine row does
(random timestamps otherwise drive pathological 1-15 s partial seeks — a
trained checkpoint advances a healthy window fully) and the temperature
fallback ladder is disabled (random avg logprob trips it on EVERY window);
`--random-seek` restores the old behavior to stress the seek guard itself.
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("WDT_FORCE_CPU") == "1":
    jax.config.update("jax_platforms", "cpu")

import numpy as np


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--minutes", type=float, default=60.0)
    p.add_argument("--model", default="large-v3")
    p.add_argument("--beam", type=int, default=5)
    p.add_argument("--max-tokens", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--no-seek", action="store_true",
                   help="fixed 30 s strides instead of decode-driven seek")
    p.add_argument("--random-seek", action="store_true",
                   help="keep random timestamps (pathological partial "
                        "seeks) and the temperature-fallback ladder")
    p.add_argument("--warmup-minutes", type=float, default=2.0,
                   help="transcribe a short throwaway stream first so "
                        "compile time stays out of the measurement "
                        "(0 disables)")
    args = p.parse_args(argv)

    from whisper_diarize_tpu.audio import write_wav
    from whisper_diarize_tpu.engine import Engine, EngineConfig
    from whisper_diarize_tpu.ops import decode as dec
    from whisper_diarize_tpu.types import (AdvancedTranscribe, Callbacks,
                                           TranscribeOptions)

    orig_mask = dec.build_suppress_mask

    def patched(sp, n_vocab, extra_suppress=None):
        extra = list(extra_suppress or []) + [sp.eot]
        if not args.random_seek:
            # keep only <|0.00|> (grammar-forced at step 0) and the
            # window-final timestamp so every full window advances fully
            extra += list(
                range(sp.timestamp_begin + 1, sp.timestamp_begin + 1500))
        return orig_mask(sp, n_vocab, extra)

    dec.build_suppress_mask = patched
    try:
        td = tempfile.mkdtemp(prefix="wdt_longform_")
        n = int(16000 * 60 * args.minutes)
        rng = np.random.default_rng(args.seed)
        wav = os.path.join(td, "long.wav")
        write_wav(wav, (rng.standard_normal(n) * 6000).astype(np.int16))

        eng = Engine(EngineConfig(
            cache_dir=os.path.join(td, "cache"),
            whisper_model_path=f"__random__:{args.model}",
            enable_dtw=True,
            batch_size=8,
            max_decode_tokens=args.max_tokens,
            temperature_fallback=bool(args.random_seek),
            allow_random_weights=True,
            sequential_prompt=True,   # reference-parity rolling prompt
            long_form_seek=not args.no_seek,
            resume_dir=os.path.join(td, "resume"),
        ))
        opts = TranscribeOptions(
            model=args.model, lang="en", enable_vad=False,
            advanced=AdvancedTranscribe(
                sampling_strategy=None if args.beam > 1 else "greedy",
                best_of_or_beam_size=args.beam,
            ),
        )

        # per-segment wall clock: new_segment_callback timestamps give the
        # per-window cadence without touching engine internals
        seg_walls: list = []
        cb = Callbacks(
            new_segment_callback=lambda s: seg_walls.append(
                time.perf_counter()))

        if args.warmup_minutes > 0:
            # compile everything (model load is cached in the Engine, and
            # a short stream hits the same window/prompt buckets) so the
            # measured run is steady-state, like bench.py's rows
            wwav = os.path.join(td, "warm.wav")
            write_wav(wwav, (rng.standard_normal(
                int(16000 * 60 * args.warmup_minutes)) * 6000
            ).astype(np.int16))
            eng.transcribe_audio(wwav, opts)
            seg_walls.clear()

        t0 = time.perf_counter()
        cues = eng.transcribe_audio(wav, opts, callbacks=cb)
        elapsed = time.perf_counter() - t0
    finally:
        dec.build_suppress_mask = orig_mask

    audio_seconds = args.minutes * 60.0
    gaps = np.diff(np.array(seg_walls)) if len(seg_walls) > 2 else np.array([])
    decile = max(len(gaps) // 10, 1)
    first_dec = float(gaps[:decile].mean()) if len(gaps) else None
    last_dec = float(gaps[-decile:].mean()) if len(gaps) else None
    peak_rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0
    report = {
        "metric": (f"xRT longform {args.model} 1-stream "
                   f"{'beam' + str(args.beam) if args.beam > 1 else 'greedy'}"
                   f"{args.max_tokens} {args.minutes:.0f}min"),
        "value": round(audio_seconds / elapsed, 2),
        "unit": "x realtime",
        "vs_baseline": round(audio_seconds / elapsed / 100.0, 3),
        "windows": len(seg_walls),
        "cues": len(cues),
        "wall_s": round(elapsed, 1),
        "first_decile_s_per_window": (
            round(first_dec, 3) if first_dec else None),
        "last_decile_s_per_window": round(last_dec, 3) if last_dec else None,
        "peak_rss_mb": round(peak_rss_mb, 1),
    }
    print(json.dumps(report))
    # host glue must scale linearly in windows: the last decile of windows
    # may not be systematically slower than the first (3x guard: seek sizes
    # vary per window with random timestamps)
    if first_dec and last_dec and last_dec > 3.0 * first_dec:
        print("WARN: per-window time grew superlinearly", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
