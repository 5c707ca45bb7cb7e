"""GGML checkpoint support: the reference's native `ggml-{model}.bin` format
(`/root/reference/src/model_manager.rs:162`) loads directly, including the
embedded vocabulary (decode-capable tokenizer with no HF files)."""

import numpy as np
import pytest

from whisper_diarize_tpu.models import ggml, weights as wmod, whisper as wm
from whisper_diarize_tpu.tokenizer import VocabTokenizer

TINY = wm.WhisperConfig(
    n_mels=80, n_vocab=51865,
    n_audio_ctx=1500, n_audio_state=64, n_audio_head=2, n_audio_layer=2,
    n_text_ctx=448, n_text_state=64, n_text_head=2, n_text_layer=2,
)


def _openai_tensors(cfg, seed=0):
    """Random tensors under the OpenAI names (what ggml files contain)."""
    rng = np.random.default_rng(seed)
    d = cfg.n_audio_state
    t = {}

    def lin(pre, n_in, n_out, bias=True):
        t[pre + ".weight"] = rng.standard_normal((n_out, n_in)).astype(np.float32) * 0.02
        if bias:
            t[pre + ".bias"] = rng.standard_normal(n_out).astype(np.float32) * 0.02

    t["encoder.conv1.weight"] = rng.standard_normal((d, cfg.n_mels, 3)).astype(np.float32) * 0.02
    t["encoder.conv1.bias"] = rng.standard_normal(d).astype(np.float32) * 0.02
    t["encoder.conv2.weight"] = rng.standard_normal((d, d, 3)).astype(np.float32) * 0.02
    t["encoder.conv2.bias"] = rng.standard_normal(d).astype(np.float32) * 0.02
    t["encoder.positional_embedding"] = wm.sinusoids(cfg.n_audio_ctx, d)
    for i in range(cfg.n_audio_layer):
        e = f"encoder.blocks.{i}"
        for ln in ("attn_ln", "mlp_ln"):
            t[f"{e}.{ln}.weight"] = np.ones(d, np.float32)
            t[f"{e}.{ln}.bias"] = np.zeros(d, np.float32)
        lin(f"{e}.attn.query", d, d)
        lin(f"{e}.attn.key", d, d, bias=False)
        lin(f"{e}.attn.value", d, d)
        lin(f"{e}.attn.out", d, d)
        lin(f"{e}.mlp.0", d, 4 * d)
        lin(f"{e}.mlp.2", 4 * d, d)
    t["encoder.ln_post.weight"] = np.ones(d, np.float32)
    t["encoder.ln_post.bias"] = np.zeros(d, np.float32)
    t["decoder.token_embedding.weight"] = rng.standard_normal(
        (cfg.n_vocab, d)).astype(np.float32) * 0.02
    t["decoder.positional_embedding"] = rng.standard_normal(
        (cfg.n_text_ctx, d)).astype(np.float32) * 0.01
    for i in range(cfg.n_text_layer):
        de = f"decoder.blocks.{i}"
        for ln in ("attn_ln", "cross_attn_ln", "mlp_ln"):
            t[f"{de}.{ln}.weight"] = np.ones(d, np.float32)
            t[f"{de}.{ln}.bias"] = np.zeros(d, np.float32)
        lin(f"{de}.attn.query", d, d)
        lin(f"{de}.attn.key", d, d, bias=False)
        lin(f"{de}.attn.value", d, d)
        lin(f"{de}.attn.out", d, d)
        lin(f"{de}.cross_attn.query", d, d)
        lin(f"{de}.cross_attn.key", d, d, bias=False)
        lin(f"{de}.cross_attn.value", d, d)
        lin(f"{de}.cross_attn.out", d, d)
        lin(f"{de}.mlp.0", d, 4 * d)
        lin(f"{de}.mlp.2", 4 * d, d)
    t["decoder.ln.weight"] = np.ones(d, np.float32)
    t["decoder.ln.bias"] = np.zeros(d, np.float32)
    return t


def _hparams(cfg):
    return dict(
        n_vocab=cfg.n_vocab, n_audio_ctx=cfg.n_audio_ctx,
        n_audio_state=cfg.n_audio_state, n_audio_head=cfg.n_audio_head,
        n_audio_layer=cfg.n_audio_layer, n_text_ctx=cfg.n_text_ctx,
        n_text_state=cfg.n_text_state, n_text_head=cfg.n_text_head,
        n_text_layer=cfg.n_text_layer, n_mels=cfg.n_mels,
    )


@pytest.fixture(scope="module")
def ggml_file(tmp_path_factory):
    tensors = _openai_tensors(TINY)
    vocab = [b"hello", b" world", b"!", b" ", b"he"]
    filters = np.zeros((TINY.n_mels, 201), np.float32)
    path = tmp_path_factory.mktemp("ggml") / "ggml-tiny-test.bin"
    ggml.write_ggml(path, tensors, _hparams(TINY), filters, vocab,
                    use_f16=False)
    return str(path), tensors, vocab


def test_ggml_roundtrip_tensors(ggml_file):
    path, tensors, vocab = ggml_file
    got, hp, filters, voc = ggml.read_ggml(path)
    assert hp["n_vocab"] == TINY.n_vocab and hp["n_mels"] == 80
    assert voc == vocab
    assert filters.shape == (80, 201)
    assert set(got) == set(tensors)
    for name in tensors:
        want = tensors[name]
        if name in ("encoder.conv1.bias", "encoder.conv2.bias"):
            want = want.reshape(-1, 1)  # upstream stores conv biases [n, 1]
        np.testing.assert_array_equal(got[name], want)


def test_ggml_loads_into_params(ggml_file):
    path, tensors, _ = ggml_file
    params, cfg, vocab = ggml.load_ggml(path)
    assert cfg.n_audio_state == 64 and cfg.n_text_layer == 2
    # same mapping as the OpenAI .pt path
    ref = wmod.convert_openai_params(tensors, cfg)
    for (ka, a), (kb, b) in zip(
        sorted(wmod._flatten(params).items()),
        sorted(wmod._flatten(ref).items()),
    ):
        assert ka == kb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the net runs
    import jax.numpy as jnp

    mel = jnp.zeros((1, 80, 3000), jnp.float32)
    xa = wm.encode(params, mel, cfg)
    assert xa.shape == (1, 1500, 64)


def test_ggml_f16_payload(tmp_path):
    tensors = _openai_tensors(TINY, seed=1)
    path = tmp_path / "f16.bin"
    ggml.write_ggml(path, tensors, _hparams(TINY),
                    np.zeros((80, 201), np.float32), [b"a"], use_f16=True)
    got, _, _, _ = ggml.read_ggml(path)
    np.testing.assert_allclose(
        got["decoder.token_embedding.weight"],
        tensors["decoder.token_embedding.weight"].astype(np.float16),
        rtol=0, atol=0,
    )


def test_vocab_tokenizer_decode_and_greedy_encode():
    tk = VocabTokenizer([b"hello", b" world", b"!", b" ", b"he", b"llo"])
    assert tk.decode([0, 1, 2]) == "hello world!"
    # greedy longest-match: "hello" resolves to the single longest token
    assert tk.encode("hello world!") == [0, 1, 2]
    assert tk.decode(tk.encode("hello world!")) == "hello world!"
    # specials layout intact
    assert tk.sot_sequence(language="en")[0] == tk.specials.sot
    assert tk.decode([tk.specials.eot, 0]) == "hello"


def test_engine_accepts_ggml_file(ggml_file, tmp_path):
    """End-to-end: EngineConfig.whisper_model_path pointing at a ggml FILE
    transcribes (random weights) with the embedded-vocab tokenizer."""
    from whisper_diarize_tpu.audio import write_wav
    from whisper_diarize_tpu.engine import Engine, EngineConfig
    from whisper_diarize_tpu.types import TranscribeOptions

    path, _, _ = ggml_file
    wav = str(tmp_path / "a.wav")
    rng = np.random.default_rng(0)
    write_wav(wav, (rng.standard_normal(16000 * 2) * 6000).astype(np.int16))
    eng = Engine(EngineConfig(
        cache_dir=str(tmp_path / "cache"), whisper_model_path=path,
        enable_dtw=False, batch_size=2, max_decode_tokens=8,
        temperature_fallback=False,
    ))
    cues = eng.transcribe_audio(
        wav, TranscribeOptions(enable_vad=False, lang="en")
    )
    assert isinstance(cues, list)
