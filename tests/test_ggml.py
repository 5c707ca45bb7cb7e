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


# ---------------------------------------------------------------------------
# Quantized checkpoints (ggerganov/whisper.cpp also ships q5_0/q5_1/q8_0
# files; whisper.cpp additionally accepts q4_0/q4_1)
# ---------------------------------------------------------------------------

QTYPES = {
    "q4_0": ggml.GGML_TYPE_Q4_0, "q4_1": ggml.GGML_TYPE_Q4_1,
    "q5_0": ggml.GGML_TYPE_Q5_0, "q5_1": ggml.GGML_TYPE_Q5_1,
    "q8_0": ggml.GGML_TYPE_Q8_0,
}


@pytest.mark.parametrize("name", sorted(QTYPES))
def test_quant_blocks_exact_on_grid(name):
    """Data constructed exactly on the type's quantization grid survives a
    quantize -> dequantize round trip bit-exactly (pins the block layout,
    nibble packing, q5 high bits, and the scale storage)."""
    qt = QTYPES[name]
    rng = np.random.default_rng(3)
    nb = 7
    if name in ("q4_0", "q5_0", "q8_0"):
        # x = d * (q - bias), d fp16-exact, extreme q present in every block
        levels, bias = {"q4_0": (16, 8), "q5_0": (32, 16),
                        "q8_0": (255, 127)}[name]
        q = rng.integers(0, levels, (nb, 32))
        q[:, 0] = 0  # q - bias = -bias is the max-|x| element, negative
        x = 0.5 * (q - bias)
    else:
        levels = 16 if name == "q4_1" else 32
        q = rng.integers(0, levels, (nb, 32))
        q[:, 0] = 0
        q[:, 1] = levels - 1  # pin min and max on the grid
        x = 0.5 * q + (-3.5)
    x = x.astype(np.float32)
    raw = ggml.quantize_blocks(x, qt)
    bs = {"q4_0": 18, "q4_1": 20, "q5_0": 22, "q5_1": 24, "q8_0": 34}[name]
    assert raw.shape == (nb, bs)
    got = ggml.dequantize_blocks(raw, qt, x.size).reshape(nb, 32)
    np.testing.assert_array_equal(got, x)


def _fp16_bytes(v):
    return np.float16(v).tobytes()


def test_dequant_pins_external_byte_layout():
    """Hand-constructed raw blocks against the documented ggml layout
    (dequantize_row_* in ggml-quants.c). A self-consistent-but-swapped
    nibble/high-bit layout would pass the round-trip tests yet misread
    real whisper.cpp files — this pins the actual bytes."""
    # q4_0: [fp16 d][16 bytes]; byte j: low nibble -> elem j, high -> j+16
    raw = _fp16_bytes(0.5) + bytes([0xF1]) + bytes(15)
    got = ggml.dequantize_blocks(
        np.frombuffer(raw, np.uint8), ggml.GGML_TYPE_Q4_0, 32)
    want = np.full(32, -4.0, np.float32)
    want[0] = (0x1 - 8) * 0.5   # -3.5
    want[16] = (0xF - 8) * 0.5  # 3.5
    np.testing.assert_array_equal(got, want)

    # q4_1: [fp16 d][fp16 m][16 bytes]; x = d*q + m (unsigned q)
    raw = _fp16_bytes(0.5) + _fp16_bytes(-2.0) + bytes([0xF1]) + bytes(15)
    got = ggml.dequantize_blocks(
        np.frombuffer(raw, np.uint8), ggml.GGML_TYPE_Q4_1, 32)
    want = np.full(32, -2.0, np.float32)
    want[0] = 1 * 0.5 - 2.0     # -1.5
    want[16] = 15 * 0.5 - 2.0   # 5.5
    np.testing.assert_array_equal(got, want)

    # q5_0: [fp16 d][u32 qh][16 bytes]; qh bit j -> 5th bit of elem j,
    # bit j+16 -> 5th bit of elem j+16; x = (q - 16) * d
    qh = (1 << 0) | (1 << 16)
    raw = (_fp16_bytes(0.5) + np.uint32(qh).tobytes()
           + bytes([0x01]) + bytes(15))
    got = ggml.dequantize_blocks(
        np.frombuffer(raw, np.uint8), ggml.GGML_TYPE_Q5_0, 32)
    want = np.full(32, -8.0, np.float32)
    want[0] = ((0x1 | 0x10) - 16) * 0.5   # q=17 -> 0.5
    want[16] = ((0x0 | 0x10) - 16) * 0.5  # q=16 -> 0.0
    np.testing.assert_array_equal(got, want)

    # q5_1: [fp16 d][fp16 m][u32 qh][16 bytes]; x = d*q + m
    raw = (_fp16_bytes(0.5) + _fp16_bytes(-2.0) + np.uint32(qh).tobytes()
           + bytes([0x01]) + bytes(15))
    got = ggml.dequantize_blocks(
        np.frombuffer(raw, np.uint8), ggml.GGML_TYPE_Q5_1, 32)
    want = np.full(32, -2.0, np.float32)
    want[0] = 17 * 0.5 - 2.0   # 6.5
    want[16] = 16 * 0.5 - 2.0  # 6.0
    np.testing.assert_array_equal(got, want)

    # q8_0: [fp16 d][32 x int8]; x = d * q
    qs = np.zeros(32, np.int8)
    qs[0], qs[31] = -100, 127
    raw = _fp16_bytes(0.25) + qs.tobytes()
    got = ggml.dequantize_blocks(
        np.frombuffer(raw, np.uint8), ggml.GGML_TYPE_Q8_0, 32)
    want = qs.astype(np.float32) * 0.25
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("name", sorted(QTYPES))
def test_quant_blocks_error_bound(name):
    """Random data round-trips within one quantization step per block."""
    qt = QTYPES[name]
    rng = np.random.default_rng(4)
    x = rng.standard_normal((11, 32)).astype(np.float32)
    got = ggml.dequantize_blocks(
        ggml.quantize_blocks(x, qt), qt, x.size).reshape(11, 32)
    amax = np.abs(x).max(axis=1, keepdims=True)
    span = x.max(axis=1, keepdims=True) - x.min(axis=1, keepdims=True)
    step = {
        "q4_0": amax / 8, "q5_0": amax / 16, "q8_0": amax / 127,
        "q4_1": span / 15, "q5_1": span / 31,
    }[name]
    # one step + fp16 scale rounding headroom
    assert np.max(np.abs(got - x) / step) <= 1.02


def test_ggml_quantized_file_roundtrip(tmp_path):
    tensors = _openai_tensors(TINY, seed=2)
    path = tmp_path / "ggml-tiny-q5_0.bin"
    ggml.write_ggml(path, tensors, _hparams(TINY),
                    np.zeros((80, 201), np.float32), [b"a", b"b"],
                    quantize="q5_0")
    got, hp, _, _ = ggml.read_ggml(path)
    assert hp["qnt_version"] == ggml.GGML_QNT_VERSION
    assert hp["ftype"] == 8  # GGML_FTYPE_MOSTLY_Q5_0
    assert set(got) == set(tensors)
    # the quantize skip list stays exact fp
    np.testing.assert_array_equal(
        got["decoder.positional_embedding"],
        tensors["decoder.positional_embedding"].astype(np.float16))
    np.testing.assert_array_equal(
        got["encoder.conv1.bias"],
        tensors["encoder.conv1.bias"].reshape(-1, 1).astype(np.float16))
    # 2-D weights round-trip within a q5_0 step of the original
    w = tensors["decoder.token_embedding.weight"]
    g = got["decoder.token_embedding.weight"]
    step = np.abs(w).reshape(-1, 32).max(axis=1) / 16
    assert np.max(np.abs((g - w).reshape(-1, 32)) / step[:, None]) <= 1.02
    # and the checkpoint still loads + runs through the real model path
    params, cfg, _ = ggml.load_ggml(path)
    import jax.numpy as jnp

    xa = wm.encode(params, jnp.zeros((1, 80, 3000), jnp.float32), cfg)
    assert xa.shape == (1, 1500, 64)


def test_ggml_q8_0_near_lossless(tmp_path):
    tensors = _openai_tensors(TINY, seed=5)
    path = tmp_path / "ggml-tiny-q8_0.bin"
    ggml.write_ggml(path, tensors, _hparams(TINY),
                    np.zeros((80, 201), np.float32), [b"a"],
                    quantize="q8_0")
    got, hp, _, _ = ggml.read_ggml(path)
    assert hp["ftype"] == 7  # GGML_FTYPE_MOSTLY_Q8_0
    w = tensors["encoder.blocks.0.mlp.0.weight"]
    np.testing.assert_allclose(
        got["encoder.blocks.0.mlp.0.weight"], w, atol=float(
            np.abs(w).max() / 127))


def test_ggml_unsupported_tensor_type(tmp_path):
    """K-quant (and any other unknown) tensor types fail loudly, naming the
    type and the supported set — never silently skipping weights."""
    import struct

    tensors = {"decoder.ln.weight": np.ones(64, np.float32)}
    path = tmp_path / "bad.bin"
    ggml.write_ggml(path, tensors, _hparams(TINY),
                    np.zeros((80, 201), np.float32), [b"a"], use_f16=False)
    blob = bytearray(path.read_bytes())
    # tensor header starts right after vocab: locate by the known layout
    off = len(blob) - (12 + 4 + len(b"decoder.ln.weight") + 64 * 4)
    n_dims, name_len, ttype = struct.unpack_from("<3i", blob, off)
    assert (n_dims, name_len, ttype) == (1, len(b"decoder.ln.weight"), 0)
    struct.pack_into("<i", blob, off + 8, 12)  # GGML_TYPE_Q4_K
    path.write_bytes(bytes(blob))
    with pytest.raises(ggml.GGMLFormatError, match="type 12"):
        ggml.read_ggml(path)


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
