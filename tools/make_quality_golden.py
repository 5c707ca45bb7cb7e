"""Regenerate the offline quality-golden fixtures (VERDICT r3 Next #3).

Builds the DETERMINISTIC tiny-but-real-topology checkpoint (seeded random
weights through the real Whisper architecture — the offline stand-in for a
trained checkpoint, since this box has no network) and the deterministic
fixture WAV, runs the full Engine pipeline in the BASELINE config-2 shape
(DTW word timestamps + subtitle formatting, CPU f32), and writes:

  tests/fixtures/quality/expected.txt         the transcription text
  tests/fixtures/quality/expected_words.json  [[text, start, end], ...]

`tests/test_quality_fixture.py` replays the identical pipeline and scores
WER against expected.txt and word-timestamp MAE against
expected_words.json through `evals/run_config.py` — the first actual
quality numbers the harness emits with zero network. Regenerate ONLY when
the decode/alignment semantics intentionally change:

  python tools/make_quality_golden.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

FIXTURE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures", "quality")

TINY_CFG_KW = dict(
    n_mels=80, n_vocab=51865,
    n_audio_ctx=1500, n_audio_state=64, n_audio_head=2, n_audio_layer=2,
    n_text_ctx=448, n_text_state=64, n_text_head=2, n_text_layer=2,
)
SEED = 0
MAX_TOKENS = 12


def build_fixture_inputs(tmpdir: str):
    """(snapshot_dir, wav_path) — deterministic; shared with the test."""
    from whisper_diarize_tpu.audio import write_wav
    from whisper_diarize_tpu.models import weights as weights_mod
    from whisper_diarize_tpu.models import whisper as wm

    snap = os.path.join(tmpdir, "snap")
    weights_mod.init_random_snapshot(
        snap, cfg=wm.WhisperConfig(**TINY_CFG_KW), seed=SEED)
    rng = np.random.default_rng(SEED)
    x = np.zeros(16000 * 4, np.int16)
    x[16000: 16000 * 3] = (
        rng.standard_normal(16000 * 2) * 6000).astype(np.int16)
    wav = os.path.join(tmpdir, "quality.wav")
    write_wav(wav, x)
    return snap, wav


def apply_printable_suppression():
    """Patch `ops.decode.build_suppress_mask` to additionally suppress all
    non-printable-ASCII text tokens (ids < eot outside 33..126).

    Random weights decode to control bytes that trim to EMPTY segments (all
    probed seeds: 0 cues), which would make the WER golden vacuous. With
    this patch the DebugTokenizer's byte tokens land in the printable range
    and the pipeline emits real, deterministic text — timestamps / eot /
    grammar behavior untouched (only ids below eot are added). The SAME
    patch is applied by the golden generator and the replaying test, so the
    comparison is apples to apples. Returns an undo callable."""
    from whisper_diarize_tpu.ops import decode as dec

    orig = dec.build_suppress_mask

    def patched(sp, n_vocab, extra_suppress=None):
        extra = list(extra_suppress or [])
        extra += [i for i in range(min(sp.eot, n_vocab))
                  if not 33 <= i < 127]
        return orig(sp, n_vocab, extra)

    dec.build_suppress_mask = patched

    def undo():
        dec.build_suppress_mask = orig

    return undo


def _bandpass(x, lo: float, hi: float):
    from numpy.fft import irfft, rfft

    n = len(x)
    X = rfft(x)
    f = np.fft.rfftfreq(n, 1 / 16000)
    X[(f < lo) | (f > hi)] = 0
    return irfft(X, n)


def make_speaker_block(kind: str, seed: int, secs: int = 10) -> np.ndarray:
    """One 10 s block of a synthetic 'speaker': spectrally distinct signals
    whose random-weight CAM++ embeddings form separable clusters (measured:
    within-speaker chunk cosine >= ~0.97, across <= ~0.956 — threshold 0.96
    splits them; the trained-checkpoint threshold 0.5 of `engine.rs:103`
    doesn't apply to untrained embeddings, which all share cosine ~0.9+)."""
    r = np.random.default_rng(seed)
    n = 16000 * secs
    if kind == "A":  # band-limited rumble
        x = _bandpass(r.standard_normal(n), 60, 300)
    elif kind == "C":  # mid-band click train
        x = np.zeros(n)
        idx = r.random(n) < 0.002
        x[idx] = r.standard_normal(int(idx.sum())) * 3
        x = _bandpass(x, 500, 2000)
    else:
        raise ValueError(kind)
    return x / (np.abs(x).max() + 1e-9) * 0.5


DER_BLOCKS = ["A", "C", "A", "C"]  # 10 s per block, aligned to the 10 s
#              segmentation window so no chunk crosses a speaker turn
DER_THRESHOLD = 0.96
DER_MAX_SPEAKERS = 2


def build_der_fixture_inputs(tmpdir: str):
    """(snapshot_dir, wav_path, rttm_path) for the offline DER golden
    (VERDICT r4 Next #4): a deterministic 2-speaker WAV + its designed
    reference RTTM. Scored semantics: chunking by the segmentation net,
    per-chunk CAM++ embeddings, EmbeddingManager threshold clustering and
    speaker_id propagation onto cues (`/root/reference/src/transcribe.rs:463-496`)."""
    from whisper_diarize_tpu.audio import write_wav
    from whisper_diarize_tpu.models import weights as weights_mod
    from whisper_diarize_tpu.models import whisper as wm

    snap = os.path.join(tmpdir, "snap")
    weights_mod.init_random_snapshot(
        snap, cfg=wm.WhisperConfig(**TINY_CFG_KW), seed=SEED)
    sig = np.concatenate(
        [make_speaker_block(k, 7 * i + 3) for i, k in enumerate(DER_BLOCKS)])
    wav = os.path.join(tmpdir, "der.wav")
    write_wav(wav, (sig * 20000).astype(np.int16))
    rttm = os.path.join(tmpdir, "der.rttm")
    with open(rttm, "w") as f:
        for i, k in enumerate(DER_BLOCKS):
            f.write(f"SPEAKER der 1 {10.0 * i:.2f} 10.00 "
                    f"<NA> <NA> spk_{k} <NA> <NA>\n")
    return snap, wav, rttm


def apply_der_suppression():
    """Printable suppression (see above) PLUS all timestamp tokens: with no
    sampled timestamps, `build_chunk_results` falls back to seg_start=0 /
    seg_end=chunk_dur, so cue spans equal the diarization chunk spans and
    DER scores the chunking+clustering semantics rather than random-weight
    timestamp noise. Returns an undo callable."""
    from whisper_diarize_tpu.ops import decode as dec

    orig = dec.build_suppress_mask

    def patched(sp, n_vocab, extra_suppress=None):
        extra = list(extra_suppress or [])
        extra += [i for i in range(min(sp.eot, n_vocab))
                  if not 33 <= i < 127]
        extra += list(range(sp.timestamp_begin, n_vocab))
        return orig(sp, n_vocab, extra)

    dec.build_suppress_mask = patched

    def undo():
        dec.build_suppress_mask = orig

    return undo


def run_pipeline(snap: str, wav: str):
    """Config-2-shaped Engine run (DTW on, VAD on w/ random weights)."""
    from whisper_diarize_tpu.engine import Engine, EngineConfig
    from whisper_diarize_tpu.types import TranscribeOptions

    eng = Engine(EngineConfig(
        cache_dir=os.path.join(os.path.dirname(wav), "cache"),
        whisper_model_path=snap,
        enable_dtw=True,
        batch_size=8,
        max_decode_tokens=MAX_TOKENS,
        vad_model_path="__random__",
    ))
    return eng.transcribe_audio(
        wav, TranscribeOptions(model="small.en", lang="en", enable_vad=True))


def main() -> None:
    import tempfile

    os.makedirs(FIXTURE_DIR, exist_ok=True)
    undo = apply_printable_suppression()
    try:
        with tempfile.TemporaryDirectory() as td:
            snap, wav = build_fixture_inputs(td)
            cues = run_pipeline(snap, wav)
    finally:
        undo()
    text = " ".join(c.text.replace("\n", " ") for c in cues)
    words = [[w.text, w.start, w.end]
             for c in cues for w in (c.words or [])]
    with open(os.path.join(FIXTURE_DIR, "expected.txt"), "w") as f:
        f.write(text)
    with open(os.path.join(FIXTURE_DIR, "expected_words.json"), "w") as f:
        json.dump(words, f, indent=1)
    print(f"golden: {len(cues)} cues, {len(words)} words, "
          f"text={text[:80]!r}")


if __name__ == "__main__":
    main()
