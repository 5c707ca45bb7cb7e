import numpy as np
import pytest

from whisper_diarize_tpu.models import silero_vad
from whisper_diarize_tpu.types import SpeechSegment
from whisper_diarize_tpu.vad import (
    VadParams,
    get_segments,
    merge_close_segments,
    segments_from_probs,
    slice_segments,
)

SR = 16_000
CHUNK = silero_vad.CHUNK


def test_speech_probs_shapes():
    params = silero_vad.init_params(0)
    audio = np.random.default_rng(0).standard_normal((2, SR)).astype(np.float32) * 0.1
    p = np.asarray(silero_vad.speech_probs(params, audio))
    assert p.shape == (2, -(-SR // CHUNK))
    assert ((p >= 0) & (p <= 1)).all()


def test_speech_probs_pad_mode_toggle(monkeypatch):
    """The Silero STFT pad convention is an explicit A/B toggle (VERDICT r3
    item 9, docs/PARITY.md): both variants run, produce the same shapes,
    genuinely different numbers, and the env override selects the variant."""
    params = silero_vad.init_params(0)
    audio = (np.random.default_rng(1).standard_normal((1, SR)) * 0.1
             ).astype(np.float32)
    p_left = np.asarray(silero_vad.speech_probs(params, audio, pad_mode="left"))
    p_both = np.asarray(silero_vad.speech_probs(params, audio, pad_mode="both"))
    p_zero = np.asarray(silero_vad.speech_probs(params, audio, pad_mode="zero"))
    assert p_left.shape == p_both.shape == p_zero.shape
    # left-vs-both reflect pads are OUTPUT-IDENTICAL at this geometry (the
    # 4 frames never read the right pad) — pinning this documents that a
    # left/both upstream mismatch cannot cause a parity failure
    np.testing.assert_array_equal(p_left, p_both)
    # zero- vs reflect-pad genuinely changes frame 0
    assert not np.allclose(p_left, p_zero)
    # default == "left"; env override picks "zero"
    np.testing.assert_array_equal(
        np.asarray(silero_vad.speech_probs(params, audio)), p_left)
    monkeypatch.setenv("WDT_SILERO_STFT_PAD", "zero")
    np.testing.assert_array_equal(
        np.asarray(silero_vad.speech_probs(params, audio)), p_zero)
    with pytest.raises(ValueError, match="pad_mode"):
        silero_vad.speech_probs(params, audio, pad_mode="center")


def test_speech_probs_stateful():
    """LSTM state carries across chunks: identical chunks early vs late in a
    changing stream should not produce identical probabilities."""
    params = silero_vad.init_params(0)
    rng = np.random.default_rng(1)
    chunk = rng.standard_normal(CHUNK).astype(np.float32)
    audio = np.concatenate([chunk, rng.standard_normal(CHUNK * 4).astype(np.float32), chunk])
    p = np.asarray(silero_vad.speech_probs(params, audio[None]))[0]
    assert p[0] != p[-1]


def _probs(pattern):
    """pattern: list of (prob, n_chunks)"""
    out = []
    for v, n in pattern:
        out += [v] * n
    return np.array(out)


def chunks_for(seconds):
    return int(seconds * SR / CHUNK)


def test_state_machine_basic_segment():
    # 1 s speech in 3 s audio
    probs = _probs([(0.0, chunks_for(1.0)), (0.9, chunks_for(1.0)), (0.0, chunks_for(1.0))])
    n = len(probs) * CHUNK
    segs = segments_from_probs(probs, n)
    assert len(segs) == 1
    s, e = segs[0]
    assert s == pytest.approx(1.0, abs=0.07)  # includes 30 ms pad
    assert e == pytest.approx(2.0, abs=0.15)


def test_state_machine_min_speech_drops_blips():
    # 64 ms blip < 250 ms min speech
    probs = _probs([(0.0, 20), (0.9, 2), (0.0, 20)])
    segs = segments_from_probs(probs, len(probs) * CHUNK)
    assert segs == []


def test_state_machine_min_silence_bridges():
    # 60 ms dip < 100 ms min silence: stays one segment
    probs = _probs([(0.9, 20), (0.0, 2), (0.9, 20)])
    segs = segments_from_probs(probs, len(probs) * CHUNK)
    assert len(segs) == 1


def test_state_machine_long_silence_splits():
    # 500 ms dip >= 100 ms min silence: splits
    probs = _probs([(0.9, 20), (0.0, chunks_for(0.5)), (0.9, 20)])
    segs = segments_from_probs(probs, len(probs) * CHUNK)
    assert len(segs) == 2


def test_state_machine_hysteresis():
    # prob between neg_threshold (0.35) and threshold (0.5) keeps a running
    # segment alive but cannot start one
    probs = _probs([(0.4, 20)])
    assert segments_from_probs(probs, len(probs) * CHUNK) == []
    probs = _probs([(0.9, 10), (0.4, 10), (0.9, 10), (0.0, 10)])
    segs = segments_from_probs(probs, len(probs) * CHUNK)
    assert len(segs) == 1


def test_merge_close_segments_rule():
    # < 200 ms gaps merge, including the bridged silence (`vad.rs:49-63`)
    mask = [(0.0, 1.0), (1.1, 2.0), (2.5, 3.0)]
    merged = merge_close_segments(mask)
    assert merged == [(0.0, 2.0), (2.5, 3.0)]
    # nested range: end extends by max()
    mask = [(0.0, 2.0), (2.1, 2.15)]
    assert merge_close_segments(mask) == [(0.0, 2.15)]
    # >= 200 ms does NOT merge (strict <); note an exactly-0.2 gap is
    # float-sensitive identically to the reference's f64 arithmetic
    mask = [(0.0, 1.0), (1.25, 2.0)]
    assert merge_close_segments(mask) == [(0.0, 1.0), (1.25, 2.0)]


def test_slice_segments_clamped():
    x = np.arange(SR, dtype=np.int16)  # 1 s
    segs = slice_segments([(0.5, 2.0)], x)  # end beyond buffer -> clamped
    assert len(segs) == 1
    assert segs[0].samples.shape[0] == SR // 2
    assert segs[0].start == 0.5 and segs[0].end == 2.0
    # inverted/empty dropped
    assert slice_segments([(2.0, 1.0)], x) == []


def test_get_segments_end_to_end():
    """Random-weight NN + full policy: returns (mask, segments) with
    consistent structure."""
    rng = np.random.default_rng(2)
    x = (rng.standard_normal(SR * 2) * 3000).astype(np.int16)
    mask, segs = get_segments(None, x)
    assert isinstance(mask, list)
    for s, e in mask:
        assert e > s
    assert mask == sorted(mask)
    for seg in segs:
        assert isinstance(seg, SpeechSegment)
        assert seg.samples.dtype == np.int16
        assert seg.end > seg.start


def test_get_segments_batch_matches_serial():
    """Cross-stream batched VAD (one [S, T] device pass) must reproduce the
    per-stream results exactly — rows are independent and padding sits
    after each row's valid chunks."""
    from whisper_diarize_tpu.models import silero_vad
    from whisper_diarize_tpu.vad import get_segments_batch

    params = silero_vad.init_params(0)
    rng = np.random.default_rng(3)
    streams = [
        (rng.standard_normal(n) * 8000).astype(np.int16)
        for n in (16000, 9000, 25000, 512)
    ]
    serial = [get_segments(params, x) for x in streams]
    batched = get_segments_batch(params, streams)
    assert len(batched) == len(serial)
    for (m_ref, s_ref), (m_out, s_out) in zip(serial, batched):
        assert m_out == m_ref
        assert [(s.start, s.end) for s in s_out] == [
            (s.start, s.end) for s in s_ref
        ]
        for a, b in zip(s_out, s_ref):
            np.testing.assert_array_equal(a.samples, b.samples)


def test_get_segments_batch_grouping_bound(monkeypatch):
    """With the device-batch bound forcing several sub-batches (and one
    over-budget stream running alone), results must still match the
    unbounded single-batch pass row for row."""
    import whisper_diarize_tpu.vad as vad_mod
    from whisper_diarize_tpu.models import silero_vad

    params = silero_vad.init_params(0)
    rng = np.random.default_rng(7)
    streams = [
        (rng.standard_normal(n) * 8000).astype(np.int16)
        for n in (30000, 4000, 16000, 0, 8000)
    ]
    unbounded = vad_mod.get_segments_batch(params, streams)
    monkeypatch.setattr(vad_mod, "MAX_BATCH_SAMPLES", 20000)
    grouped = vad_mod.get_segments_batch(params, streams)
    assert len(grouped) == len(unbounded)
    for (m_ref, s_ref), (m_out, s_out) in zip(unbounded, grouped):
        assert m_out == m_ref
        for a, b in zip(s_out, s_ref):
            np.testing.assert_array_equal(a.samples, b.samples)
