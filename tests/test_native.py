import numpy as np
import pytest

from whisper_diarize_tpu import native

pytestmark = pytest.mark.skipif(
    not native.is_available(), reason="native library not built"
)


def test_wav_roundtrip_native(tmp_path):
    from whisper_diarize_tpu.audio import AudioFormatError, write_wav

    x = (np.random.default_rng(0).integers(-3000, 3000, 16000)).astype(np.int16)
    p = str(tmp_path / "n.wav")
    assert native.write_wav(p, x)
    y = native.read_wav(p)
    np.testing.assert_array_equal(x, y)


def test_wav_native_validation(tmp_path):
    import wave

    from whisper_diarize_tpu.audio import AudioFormatError

    p = str(tmp_path / "stereo.wav")
    with wave.open(p, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(b"\x00\x00" * 32)
    with pytest.raises(AudioFormatError, match="mono"):
        native.read_wav(p)

    p2 = str(tmp_path / "rate.wav")
    with wave.open(p2, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(44100)
        w.writeframes(b"\x00\x00" * 32)
    with pytest.raises(AudioFormatError, match="16KHz"):
        native.read_wav(p2)


def test_audio_read_uses_native(tmp_path):
    """audio.read_wav routes through the native reader when built."""
    from whisper_diarize_tpu.audio import read_wav, write_wav

    x = (np.random.default_rng(1).integers(-100, 100, 1600)).astype(np.int16)
    p = str(tmp_path / "a.wav")
    write_wav(p, x)
    np.testing.assert_array_equal(read_wav(p), x)


def test_native_dtw_matches_python():
    from whisper_diarize_tpu.ops.dtw import dtw_backtrack, dtw_cost_matrix
    import jax.numpy as jnp

    x = np.random.default_rng(2).random((15, 40)).astype(np.float32)
    ti_n, tj_n = native.dtw_path(x)
    cost = np.asarray(dtw_cost_matrix(jnp.asarray(x)))
    ti_p, tj_p = dtw_backtrack(cost)
    np.testing.assert_array_equal(ti_n, ti_p)
    np.testing.assert_array_equal(tj_n, tj_p)


def test_native_banded_dtw_reaches_corner():
    x = np.random.default_rng(3).random((30, 100)).astype(np.float32)
    ti, tj = native.dtw_path(x, band=8)
    assert (ti[0], tj[0]) == (0, 0)
    assert (ti[-1], tj[-1]) == (29, 99)
    assert (np.diff(ti) >= 0).all() and (np.diff(tj) >= 0).all()


def test_native_pcm_conversion():
    x = np.array([-32768, -1, 0, 1, 32767], np.int16)
    f = native.pcm_i16_to_f32(x)
    np.testing.assert_allclose(f, x.astype(np.float32) / 32768.0)
