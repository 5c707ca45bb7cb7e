import numpy as np
import pytest

from whisper_diarize_tpu.audio import (
    AudioFormatError,
    float32_to_int16,
    int16_to_float32,
    read_wav,
    write_wav,
)
from whisper_diarize_tpu.utils import (
    calculate_dtw_mem_size,
    cs_to_s,
    get_translate_languages,
    get_whisper_languages,
    round_to_places,
)


def test_wav_roundtrip(tmp_path):
    x = (np.random.default_rng(1).integers(-3000, 3000, 16000)).astype(np.int16)
    p = str(tmp_path / "a.wav")
    write_wav(p, x)
    y = read_wav(p)
    assert y.dtype == np.int16
    np.testing.assert_array_equal(x, y)


def test_read_wav_rejects_stereo(tmp_path):
    import wave

    p = str(tmp_path / "stereo.wav")
    with wave.open(p, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(b"\x00\x00" * 64)
    with pytest.raises(AudioFormatError, match="mono"):
        read_wav(p)


def test_read_wav_rejects_wrong_rate(tmp_path):
    import wave

    p = str(tmp_path / "44k.wav")
    with wave.open(p, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(44100)
        w.writeframes(b"\x00\x00" * 64)
    with pytest.raises(AudioFormatError, match="16KHz"):
        read_wav(p)


def test_read_wav_rejects_8bit(tmp_path):
    import wave

    p = str(tmp_path / "8bit.wav")
    with wave.open(p, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(16000)
        w.writeframes(b"\x00" * 64)
    with pytest.raises(AudioFormatError, match="16 bits"):
        read_wav(p)


def test_int16_float_conversion():
    x = np.array([-32768, 0, 16384, 32767], dtype=np.int16)
    f = int16_to_float32(x)
    assert f.dtype == np.float32
    np.testing.assert_allclose(f, [-1.0, 0.0, 0.5, 32767 / 32768], rtol=1e-6)
    back = float32_to_int16(f)
    np.testing.assert_array_equal(back, x)


def test_cs_to_s():
    assert cs_to_s(150) == pytest.approx(1.5)
    assert cs_to_s(0) == 0.0


def test_round_to_places():
    assert round_to_places(1.23456, 3) == pytest.approx(1.235)
    # half-away-from-zero, like Rust f64::round
    assert round_to_places(0.5, 0) == 1.0
    assert round_to_places(-0.5, 0) == -1.0
    assert round_to_places(2.5, 0) == 3.0


def test_dtw_mem_size_model():
    # Reference model (`src/utils.rs:3-49`): 24 MB floor, 8 MB alignment.
    MB = 1024 * 1024
    assert calculate_dtw_mem_size(0) == 24 * MB
    v = calculate_dtw_mem_size(16000 * 60)  # 1 minute => 6000 frames, band 96
    expected_raw = 24 * MB + 6000 * 96 * 4 * 4 + 6000 * 4
    expected = (expected_raw + 8 * MB - 1) & ~(8 * MB - 1)
    assert v == expected
    # band switches at >15000 frames (150 s)
    v_long = calculate_dtw_mem_size(16000 * 200)  # 20000 frames -> band 128
    expected_raw = 24 * MB + 20000 * 128 * 4 * 4 + 20000 * 4
    expected = (expected_raw + 8 * MB - 1) & ~(8 * MB - 1)
    assert v_long == expected
    # ceiling
    assert calculate_dtw_mem_size(10**12) == 768 * MB


def test_language_lists():
    tl = get_translate_languages()
    wl = get_whisper_languages()
    # counts verified against the reference lists (`src/utils.rs:62-87`)
    assert len(tl) == 107
    assert len(wl) == 101
    assert wl[0] == "auto"
    assert "yue" in wl and "jw" in wl
    assert "zh-TW" in tl
    assert len(set(tl)) == len(tl)
    assert len(set(wl)) == len(wl)
