import numpy as np
import pytest

from whisper_diarize_tpu.ops.mel import (
    HOP_LENGTH,
    N_FFT,
    N_FRAMES,
    N_SAMPLES,
    kaldi_fbank,
    log_mel_spectrogram,
    mel_filterbank,
)


def _numpy_log_mel(audio, n_mels=80):
    """Straight-line numpy re-derivation of whisper's mel (for cross-check)."""
    pad = N_FFT // 2
    x = np.pad(audio, (pad, pad), mode="reflect")
    n_frames = audio.shape[-1] // HOP_LENGTH
    win = 0.5 * (1 - np.cos(2 * np.pi * np.arange(N_FFT) / N_FFT))
    frames = np.stack(
        [x[i * HOP_LENGTH : i * HOP_LENGTH + N_FFT] * win for i in range(n_frames)]
    )
    spec = np.fft.rfft(frames, axis=-1)
    power = np.abs(spec) ** 2
    mel = power @ mel_filterbank(n_mels).T
    log_spec = np.log10(np.maximum(mel, 1e-10))
    log_spec = np.maximum(log_spec, log_spec.max() - 8.0)
    return ((log_spec + 4.0) / 4.0).T


@pytest.fixture
def tone():
    rng = np.random.default_rng(7)
    t = np.arange(16000 * 2) / 16000
    return (
        0.5 * np.sin(2 * np.pi * 440 * t) + 0.05 * rng.standard_normal(t.shape)
    ).astype(np.float32)


def test_log_mel_matches_numpy_fft(tone):
    ours = np.asarray(log_mel_spectrogram(tone))
    ref = _numpy_log_mel(tone)
    assert ours.shape == ref.shape == (80, 200)
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_log_mel_30s_shape():
    x = np.zeros(N_SAMPLES, dtype=np.float32)
    m = log_mel_spectrogram(x)
    assert m.shape == (80, N_FRAMES)
    m128 = log_mel_spectrogram(x, n_mels=128)
    assert m128.shape == (128, N_FRAMES)


def test_log_mel_padding_arg(tone):
    m = log_mel_spectrogram(tone, padding=N_SAMPLES - tone.shape[-1])
    assert m.shape == (80, N_FRAMES)


def test_log_mel_batched(tone):
    batch = np.stack([tone, tone * 0.5])
    m = np.asarray(log_mel_spectrogram(batch))
    assert m.shape == (2, 80, 200)
    single = np.asarray(log_mel_spectrogram(tone))
    np.testing.assert_allclose(m[0], single, atol=1e-5)


def test_log_mel_energy_at_440hz(tone):
    """Peak mel bin should correspond to ~440 Hz."""
    m = np.asarray(log_mel_spectrogram(tone))
    mean_energy = m.mean(axis=1)
    peak_bin = int(mean_energy.argmax())
    # locate mel bin center frequencies
    fb = mel_filterbank(80)
    freqs = np.linspace(0, 8000, fb.shape[1])
    centers = (fb * freqs).sum(1) / np.maximum(fb.sum(1), 1e-9)
    assert abs(centers[peak_bin] - 440.0) < 120.0


def test_mel_filterbank_properties():
    fb = mel_filterbank(80)
    assert fb.shape == (80, 201)
    assert (fb >= 0).all()
    # every filter has some support
    assert (fb.sum(axis=1) > 0).all()
    # slaney normalization: filters roughly equal-area (not equal-peak)
    peak = fb.max(axis=1)
    assert peak[0] > peak[-1]  # narrow low-freq filters have taller peaks


def test_kaldi_fbank_shapes(tone):
    # kaldi convention: int16-scale input
    f = np.asarray(kaldi_fbank(tone * 32768.0))
    expected_frames = 1 + (tone.shape[-1] - 400) // 160
    assert f.shape == (expected_frames, 80)
    assert np.isfinite(f).all()


def test_kaldi_fbank_dc_removed():
    # constant signal: DC removal + preemphasis should leave ~log(eps) energy
    x = np.full(16000, 1000.0, dtype=np.float32)
    f = np.asarray(kaldi_fbank(x))
    assert f.max() < 0.0  # essentially floor


def test_kaldi_fbank_too_short_raises():
    with pytest.raises(ValueError):
        kaldi_fbank(np.zeros(100, dtype=np.float32))
