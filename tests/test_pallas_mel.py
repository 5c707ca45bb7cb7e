import numpy as np
import jax.numpy as jnp
import pytest

from whisper_diarize_tpu.ops.mel import log_mel_spectrogram
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from pallas_mel import TILE_F, frontend, log_mel_pallas  # noqa: E402 (quarantined kernel, tools/)


@pytest.mark.parametrize("n_mels", [80, 128])
def test_pallas_mel_matches_reference(n_mels):
    """Interpret-mode kernel equals the jnp MXU path bit-for-bit-ish."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 16000 * 5)).astype(np.float32) * 0.3
    ref = np.asarray(log_mel_spectrogram(jnp.asarray(x), n_mels=n_mels))
    ours = np.asarray(log_mel_pallas(jnp.asarray(x), n_mels=n_mels, interpret=True))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=5e-5)


def test_pallas_mel_non_tile_multiple():
    """Frame counts that don't divide TILE_F are padded then trimmed."""
    rng = np.random.default_rng(1)
    T = 16000 * 3 + 4800  # 337.5 -> 337 frames, not a multiple of TILE_F
    x = rng.standard_normal((1, T)).astype(np.float32) * 0.2
    ref = np.asarray(log_mel_spectrogram(jnp.asarray(x)))
    ours = np.asarray(log_mel_pallas(jnp.asarray(x), interpret=True))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=5e-5)
    assert ref.shape[-1] % TILE_F != 0  # the test actually exercises padding


def test_frontend_dispatch_cpu():
    """On CPU the frontend uses the jnp path."""
    x = np.zeros((1, 16000), np.float32)
    out = np.asarray(frontend(jnp.asarray(x)))
    assert out.shape == (1, 80, 100)
