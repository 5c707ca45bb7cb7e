"""Numeric parity against HuggingFace transformers' Whisper (the upstream
architecture the checkpoints are published in).

`transformers` is the trusted implementation here: a random-initialized
`WhisperForConditionalGeneration` is saved as a normal HF snapshot, loaded
through `models/weights.load_model` (the exact path real checkpoints take),
and the JAX forward must reproduce the torch forward — encoder states,
teacher-forced decoder logits, and the mel frontend vs
`WhisperFeatureExtractor`. This pins the compute path the accuracy targets
(BASELINE.md WER/MAE) depend on without network access (VERDICT r1 item 1).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from whisper_diarize_tpu.models import weights as wmod  # noqa: E402
from whisper_diarize_tpu.models import whisper as wm  # noqa: E402
from whisper_diarize_tpu.ops.mel import N_SAMPLES, log_mel_spectrogram  # noqa: E402

pytestmark = pytest.mark.slow  # HF transformers cross-validation (`pytest -m slow`)


@pytest.fixture(scope="module")
def hf_snapshot(tmp_path_factory):
    """A tiny random HF Whisper snapshot + the torch model itself."""
    cfg = transformers.WhisperConfig(
        vocab_size=51865,
        num_mel_bins=80,
        encoder_layers=2, encoder_attention_heads=4,
        decoder_layers=2, decoder_attention_heads=4,
        d_model=64, encoder_ffn_dim=256, decoder_ffn_dim=256,
        max_source_positions=1500, max_target_positions=448,
    )
    torch.manual_seed(0)
    model = transformers.WhisperForConditionalGeneration(cfg).eval()
    d = tmp_path_factory.mktemp("hfsnap")
    model.save_pretrained(d, safe_serialization=True)
    return str(d), model


def test_encoder_matches_transformers(hf_snapshot):
    snap, hf = hf_snapshot
    params, cfg = wmod.load_model(snap)
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((2, 80, 3000)).astype(np.float32) * 0.5

    with torch.no_grad():
        ref = hf.model.encoder(torch.tensor(mel)).last_hidden_state.numpy()

    out = np.asarray(wm.encode(params, jnp.asarray(mel), cfg))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)


def test_decoder_logits_match_transformers(hf_snapshot):
    snap, hf = hf_snapshot
    params, cfg = wmod.load_model(snap)
    rng = np.random.default_rng(1)
    mel = rng.standard_normal((1, 80, 3000)).astype(np.float32) * 0.5
    tokens = np.array([[50258, 50259, 50359, 50363, 1000, 2000, 3000]], np.int64)

    with torch.no_grad():
        ref = hf(
            input_features=torch.tensor(mel),
            decoder_input_ids=torch.tensor(tokens),
        ).logits.numpy()

    xa = wm.encode(params, jnp.asarray(mel), cfg)
    out = np.asarray(
        wm.decoder_forward_nocache(params, cfg, jnp.asarray(tokens, jnp.int32), xa)
    )
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-3, rtol=1e-2)


def test_kv_cached_decode_matches_teacher_forced(hf_snapshot):
    """The incremental KV-cache path must agree with the no-cache pass AND
    therefore with transformers."""
    snap, hf = hf_snapshot
    params, cfg = wmod.load_model(snap)
    rng = np.random.default_rng(2)
    mel = rng.standard_normal((1, 80, 3000)).astype(np.float32) * 0.5
    tokens = np.array([[50258, 50259, 50359, 50363, 123, 456]], np.int64)

    xa = wm.encode(params, jnp.asarray(mel), cfg)
    ref = np.asarray(
        wm.decoder_forward_nocache(params, cfg, jnp.asarray(tokens, jnp.int32), xa)
    )

    cache = wm.init_self_cache(cfg, 1, xa.dtype)
    cc = wm.cross_kv(params, xa, cfg)
    prefill = tokens[:, :4]
    logits1, cache = wm.decode_step(
        params, cfg, jnp.asarray(prefill, jnp.int32), jnp.int32(0), cache, cc
    )
    np.testing.assert_allclose(np.asarray(logits1), ref[:, :4], atol=1e-4, rtol=1e-4)
    for i in range(4, tokens.shape[1]):
        step_logits, cache = wm.decode_step(
            params, cfg, jnp.asarray(tokens[:, i: i + 1], jnp.int32),
            jnp.int32(i), cache, cc,
        )
        np.testing.assert_allclose(
            np.asarray(step_logits)[:, 0], ref[:, i], atol=1e-4, rtol=1e-4
        )


def test_mel_matches_whisper_feature_extractor():
    """Our fused log-mel vs transformers' WhisperFeatureExtractor (the
    openai-whisper mel definition used to train the checkpoints)."""
    fe = transformers.WhisperFeatureExtractor(feature_size=80)
    rng = np.random.default_rng(3)
    audio = (rng.standard_normal(16000 * 3) * 0.1).astype(np.float32)

    ref = fe(
        audio, sampling_rate=16000, return_tensors="np", padding="max_length"
    ).input_features[0]  # [80, 3000]

    padded = np.zeros(N_SAMPLES, np.float32)
    padded[: audio.shape[0]] = audio
    out = np.asarray(log_mel_spectrogram(jnp.asarray(padded), n_mels=80))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-4)


def test_mel_matches_whisper_feature_extractor_128():
    """large-v3 geometry (128 mel bins)."""
    fe = transformers.WhisperFeatureExtractor(feature_size=128)
    rng = np.random.default_rng(4)
    audio = (rng.standard_normal(16000 * 2) * 0.2).astype(np.float32)
    ref = fe(
        audio, sampling_rate=16000, return_tensors="np", padding="max_length"
    ).input_features[0]
    padded = np.zeros(N_SAMPLES, np.float32)
    padded[: audio.shape[0]] = audio
    out = np.asarray(log_mel_spectrogram(jnp.asarray(padded), n_mels=128))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-4)
