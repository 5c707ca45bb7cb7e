"""Shared helpers for the examples.

Mirrors the role of the reference's examples/*.rs binaries (SURVEY.md §4:
"integration testing = runnable examples"). Every example accepts
`--model-dir` pointing at a local snapshot so they run in air-gapped
environments; without it, models are fetched through the ModelManager like
the reference does.

Run `python examples/_common.py make-fixture /tmp/snap` to fabricate a tiny
random-weight snapshot + a test WAV for offline runs.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def base_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("audio", nargs="?", default="example.wav", help="mono 16 kHz WAV")
    p.add_argument("--model", default="base", help="whisper model name")
    p.add_argument("--model-dir", default=None, help="local snapshot dir (offline)")
    p.add_argument("--cache-dir", default="./cache")
    p.add_argument("--lang", default="auto")
    p.add_argument("--no-vad", action="store_true")
    p.add_argument("--diarize", action="store_true")
    p.add_argument("--dtw", action="store_true", default=True)
    p.add_argument("--greedy", action="store_true", help="greedy instead of beam-5")
    p.add_argument("--max-tokens", type=int, default=224)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--cpu", action="store_true", help="force the CPU backend")
    return p


def make_engine(args):
    if getattr(args, "cpu", False):
        import jax

        jax.config.update("jax_platforms", "cpu")
    from whisper_diarize_tpu.engine import Engine, EngineConfig

    cfg = EngineConfig(
        cache_dir=args.cache_dir,
        whisper_model_path=args.model_dir,
        enable_dtw=args.dtw,
        batch_size=getattr(args, "batch", 8),
        max_decode_tokens=getattr(args, "max_tokens", 224),
    )
    # Frontend-net weights: real artifacts by default (the engine downloads
    # and converts them, failing LOUDLY if they can't be loaded — never
    # silent noise). Only an explicitly offline run (--model-dir fixture or
    # WDT_OFFLINE=1) falls back to random weights, and says so.
    offline = args.model_dir is not None or os.environ.get("WDT_OFFLINE") == "1"
    rand_default = "__random__" if offline else None
    if offline:
        print(
            "[examples] offline run: VAD/diarization nets use RANDOM weights "
            "unless WDT_VAD_MODEL / WDT_SEG_MODEL / WDT_EMB_MODEL are set — "
            "segmentation quality will be noise",
            file=sys.stderr,
        )
    if args.diarize:
        cfg.diarize_segment_model_path = os.environ.get(
            "WDT_SEG_MODEL", rand_default)
        cfg.diarize_embedding_model_path = os.environ.get(
            "WDT_EMB_MODEL", rand_default)
    # set WDT_VAD_MODEL to a converted .npz or the reference's silero GGML
    cfg.vad_model_path = os.environ.get("WDT_VAD_MODEL", rand_default)
    return Engine(cfg)


def make_options(args):
    from whisper_diarize_tpu.types import AdvancedTranscribe, TranscribeOptions

    advanced = (
        AdvancedTranscribe(sampling_strategy="greedy")
        if getattr(args, "greedy", False)
        else None
    )
    return TranscribeOptions(
        model=args.model,
        lang=args.lang,
        enable_vad=not args.no_vad and not args.diarize,
        enable_diarize=args.diarize or None,
        advanced=advanced,
    )


def make_fixture(path: str) -> None:
    """Write a tiny random snapshot + 4 s test WAV under `path`."""
    from whisper_diarize_tpu.audio import write_wav
    from whisper_diarize_tpu.models import weights, whisper as wm

    cfg = wm.WhisperConfig(
        n_mels=80, n_vocab=51865,
        n_audio_ctx=1500, n_audio_state=64, n_audio_head=2, n_audio_layer=2,
        n_text_ctx=448, n_text_state=64, n_text_head=2, n_text_layer=2,
    )
    os.makedirs(path, exist_ok=True)
    weights.init_random_snapshot(os.path.join(path, "snap"), cfg=cfg)
    rng = np.random.default_rng(0)
    x = np.zeros(16000 * 4, np.int16)
    x[16000 : 16000 * 3] = (rng.standard_normal(16000 * 2) * 6000).astype(np.int16)
    write_wav(os.path.join(path, "example.wav"), x)
    print(f"fixture written: {path}/snap + {path}/example.wav")


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "make-fixture":
        make_fixture(sys.argv[2])
