import numpy as np
import pytest

from whisper_diarize_tpu.engine import Engine, EngineConfig
from whisper_diarize_tpu.formatting import FormattingOverrides
from whisper_diarize_tpu.models import whisper as wm
from whisper_diarize_tpu.models import weights as weights_mod
from whisper_diarize_tpu.types import Callbacks, ProgressType, Segment, TranscribeOptions

pytestmark = pytest.mark.slow  # Engine end-to-end runs (tiny model, still seconds each) (`pytest -m slow`)

TINY_TEST_CFG = wm.WhisperConfig(
    n_mels=80, n_vocab=51865,
    n_audio_ctx=1500, n_audio_state=64, n_audio_head=2, n_audio_layer=2,
    n_text_ctx=448, n_text_state=64, n_text_head=2, n_text_layer=2,
)


@pytest.fixture(scope="module")
def snapshot_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("model")
    weights_mod.init_random_snapshot(d, cfg=TINY_TEST_CFG, seed=0)
    return str(d)


@pytest.fixture(scope="module")
def wav_path(tmp_path_factory):
    from whisper_diarize_tpu.audio import write_wav

    rng = np.random.default_rng(0)
    x = np.zeros(16000 * 4, np.int16)
    x[16000 : 16000 * 3] = (rng.standard_normal(16000 * 2) * 6000).astype(np.int16)
    p = tmp_path_factory.mktemp("audio") / "in.wav"
    write_wav(str(p), x)
    return str(p)


def make_engine(snapshot_dir, tmp_path, **kw):
    cfg = EngineConfig(
        cache_dir=str(tmp_path / "cache"),
        whisper_model_path=snapshot_dir,
        enable_dtw=kw.pop("enable_dtw", False),
        batch_size=kw.pop("batch_size", 4),
        max_decode_tokens=kw.pop("max_decode_tokens", 12),
        # offline tests: explicit random VAD weights (downloads would raise)
        vad_model_path=kw.pop("vad_model_path", "__random__"),
        **kw,
    )
    return Engine(cfg)


def test_missing_audio_raises(snapshot_dir, tmp_path):
    eng = make_engine(snapshot_dir, tmp_path)
    with pytest.raises(FileNotFoundError, match="audio file doesn't exist"):
        eng.transcribe_audio("/nope/missing.wav", TranscribeOptions())


def test_whole_file_branch(snapshot_dir, tmp_path, wav_path):
    """Branch C: no VAD, no diarize (`engine.rs:141-147`)."""
    eng = make_engine(snapshot_dir, tmp_path)
    opts = TranscribeOptions(enable_vad=False, lang="en")
    cues = eng.transcribe_audio(wav_path, opts)
    assert isinstance(cues, list)
    for c in cues:
        assert isinstance(c, Segment)
        assert c.end >= c.start >= 0


def test_vad_branch_with_callbacks(snapshot_dir, tmp_path, wav_path):
    eng = make_engine(snapshot_dir, tmp_path)
    progress_events = []
    new_segments = []
    cb = Callbacks(
        progress=lambda pct, kind, label: progress_events.append((pct, kind)),
        new_segment_callback=lambda seg: new_segments.append(seg),
    )
    opts = TranscribeOptions(enable_vad=True, lang="en")
    eng.transcribe_audio(wav_path, opts, callbacks=cb)
    kinds = {k for _, k in progress_events}
    assert ProgressType.TRANSCRIBE in kinds
    transcribe_pcts = [p for p, k in progress_events if k == ProgressType.TRANSCRIBE]
    assert transcribe_pcts[-1] == 100
    assert transcribe_pcts == sorted(transcribe_pcts)
    # every raw segment was streamed before formatting
    assert len(new_segments) == len(transcribe_pcts)


def test_language_latching_auto(snapshot_dir, tmp_path, wav_path):
    eng = make_engine(snapshot_dir, tmp_path)
    opts = TranscribeOptions(enable_vad=False, lang="auto")
    cues = eng.transcribe_audio(wav_path, opts)  # must not raise
    assert isinstance(cues, list)


def test_diarize_branch(snapshot_dir, tmp_path, wav_path):
    eng = make_engine(
        snapshot_dir,
        tmp_path,
        diarize_segment_model_path="__random__",
        diarize_embedding_model_path="__random__",
    )
    opts = TranscribeOptions(enable_diarize=True, lang="en", max_speakers=2)
    cues = eng.transcribe_audio(wav_path, opts)
    for c in cues:
        assert c.speaker_id is None or isinstance(c.speaker_id, str)


def test_offset_applied(snapshot_dir, tmp_path, wav_path):
    eng = make_engine(snapshot_dir, tmp_path)
    opts = TranscribeOptions(enable_vad=False, lang="en", offset=100.0)
    cues = eng.transcribe_audio(wav_path, opts)
    for c in cues:
        assert c.start >= 99.0  # all timestamps pushed by the user offset


def test_dtw_enabled_path(snapshot_dir, tmp_path, wav_path):
    """DTW word timestamps must satisfy span invariants, not just exist:
    every word is within the audio bounds, spans are well-formed and
    monotone non-decreasing, probabilities are populated."""
    eng = make_engine(snapshot_dir, tmp_path, enable_dtw=True)
    opts = TranscribeOptions(enable_vad=False, lang="en")
    cues = eng.transcribe_audio(wav_path, opts)
    assert isinstance(cues, list)
    import wave

    with wave.open(wav_path) as f:
        audio_dur = f.getnframes() / f.getframerate()
    # random weights may legitimately decode an empty window; any words that
    # DO exist must satisfy the invariants (the deterministic word-span test
    # lives at the step level: test_dtw_word_span_invariants)
    words = [w for c in cues for w in (c.words or [])]
    prev_start = -1.0
    for w in words:
        assert w.end >= w.start >= 0.0
        assert w.start <= audio_dur + 1e-6
        assert w.end <= audio_dur + 30.0  # padded-window upper bound
        assert w.start >= prev_start - 1e-6  # monotone across the stream
        prev_start = w.start
        assert w.probability is None or 0.0 <= w.probability <= 1.0


def test_dtw_pipelined_matches_serial(snapshot_dir, tmp_path, monkeypatch):
    """The one-deep DTW software pipeline (anchors of batch i computed on a
    worker thread while batch i+1 decodes) must be output-identical to the
    serial path (WDT_SERIAL_DTW=1). Multi-window audio + batch_size=1 forces
    several flush_pending cycles."""
    from whisper_diarize_tpu.audio import write_wav

    rng = np.random.default_rng(3)
    x = (rng.standard_normal(16000 * 65) * 5000).astype(np.int16)
    p = tmp_path / "long.wav"
    write_wav(str(p), x)
    opts = TranscribeOptions(enable_vad=False, lang="en")

    def run():
        eng = make_engine(snapshot_dir, tmp_path, enable_dtw=True,
                          batch_size=1)
        return eng.transcribe_audio(str(p), opts)

    monkeypatch.setenv("WDT_SERIAL_DTW", "1")
    serial = run()
    monkeypatch.delenv("WDT_SERIAL_DTW")
    pipelined = run()
    assert len(serial) == len(pipelined)
    for a, b in zip(serial, pipelined):
        assert (a.start, a.end, a.text) == (b.start, b.end, b.text)
        aw, bw = a.words or [], b.words or []
        assert [(w.text, w.start, w.end) for w in aw] == [
            (w.text, w.start, w.end) for w in bw]


def test_dtw_word_span_invariants(snapshot_dir):
    """Step-level DTW invariants, deterministic: decode a window, build chunk
    results with DTW enabled, and check every token span is inside the chunk,
    well-formed, monotone, and carries a probability (VERDICT r1 item 9)."""
    from whisper_diarize_tpu.models import weights as wmod
    from whisper_diarize_tpu.ops import decode as dec
    from whisper_diarize_tpu.tokenizer import DebugTokenizer
    from whisper_diarize_tpu.transcribe import TranscribeStep

    params, cfg = wmod.load_model(snapshot_dir)
    tk = DebugTokenizer()
    step = TranscribeStep(
        params, cfg, tk, enable_dtw=True,
        # timestamps off + EOT suppressed -> every sampled token is text, so
        # the span list is deterministically non-empty under random weights
        decode_config=dec.DecodeConfig(
            max_tokens=16, blank_id=32, with_timestamps=False
        ),
        strategy="greedy",
    )
    import jax.numpy as jnp

    # DebugTokenizer decodes only byte ids < 256 to text; restrict sampling
    # to printable ASCII so every sampled token is a visible text span
    printable = set(range(33, 127))
    extra = [i for i in range(cfg.n_vocab) if i not in printable]
    step._suppress = jnp.asarray(
        dec.build_suppress_mask(tk.specials, cfg.n_vocab, extra)
    )
    rng = np.random.default_rng(0)
    n = 16000 * 3
    audio = np.zeros((1, 480000), np.float32)
    audio[0, :n] = rng.standard_normal(n).astype(np.float32) * 0.1
    xa = step.encode(step.mel(audio))
    res = step.decode(xa, "en", "transcribe")
    crs = step.build_chunk_results(res, xa, [n], translated=False)
    words = crs[0].words
    assert words, "decode produced no token spans"
    chunk_dur = n / 16000.0
    prev = 0.0
    for w in words:
        assert 0.0 <= w.start <= w.end <= chunk_dur + 1e-6
        assert w.start >= prev - 1e-6
        prev = w.start
        assert w.probability is not None and 0.0 <= w.probability <= 1.0


def test_formatting_overrides_respected(snapshot_dir, tmp_path, wav_path):
    eng = make_engine(snapshot_dir, tmp_path)
    opts = TranscribeOptions(enable_vad=False, lang="en")
    ov = FormattingOverrides(max_chars_per_line=10, max_lines=2)
    cues = eng.transcribe_audio(wav_path, opts, formatting_overrides=ov)
    assert isinstance(cues, list)


def test_cancellation_stops_early(snapshot_dir, tmp_path, wav_path):
    eng = make_engine(snapshot_dir, tmp_path)
    cb = Callbacks(is_cancelled=lambda: True)
    opts = TranscribeOptions(enable_vad=False, lang="en")
    cues = eng.transcribe_audio(wav_path, opts, callbacks=cb)
    assert cues == []


def test_mid_decode_cancellation(snapshot_dir):
    """A cancel raised DURING decode must stop the token loop within one
    poll window — the loop may not run out the full token budget
    (VERDICT r1 item 8; reference aborts whisper.cpp via its abort
    callback at `transcribe.rs:348-350`)."""
    from whisper_diarize_tpu.models import weights as wmod
    from whisper_diarize_tpu.ops import decode as dec
    from whisper_diarize_tpu.tokenizer import DebugTokenizer
    from whisper_diarize_tpu.transcribe import TranscribeStep

    params, cfg = wmod.load_model(snapshot_dir)
    import jax.numpy as jnp

    tk = DebugTokenizer()
    step = TranscribeStep(
        params, cfg, tk, enable_dtw=False,
        decode_config=dec.DecodeConfig(max_tokens=96, blank_id=32),
        strategy="greedy",
    )
    # suppress EOT so the loop would otherwise run all 96 steps
    step._suppress = jnp.asarray(dec.build_suppress_mask(
        tk.specials, cfg.n_vocab, [tk.specials.eot]
    ))
    mel = step.mel(np.zeros((2, 480000), np.float32))
    xa = step.encode(mel)

    calls = []

    def cancel_on_second_poll():
        calls.append(1)
        return len(calls) >= 2

    res = step.decode(xa, "en", "transcribe",
                      is_cancelled=cancel_on_second_poll)
    lengths = np.asarray(res.lengths)
    # cancel landed after the second 32-step window: the third never ran
    assert len(calls) == 2
    assert (lengths <= 64).all()
    assert (lengths < 96).all()


def test_long_form_seek_monotone(snapshot_dir, tmp_path):
    """A >30 s file decodes through seek-advanced windows: cue times must be
    monotone non-decreasing and within the audio bounds, and consecutive
    cues may not overlap after clamping (VERDICT r1 item 4)."""
    from whisper_diarize_tpu.audio import write_wav

    rng = np.random.default_rng(3)
    dur = 70
    wav = str(tmp_path / "long.wav")
    write_wav(wav, (rng.standard_normal(16000 * dur) * 6000).astype(np.int16))

    eng = make_engine(snapshot_dir, tmp_path, max_decode_tokens=16)
    opts = TranscribeOptions(enable_vad=False, lang="en")
    cues = eng.transcribe_audio(wav, opts)
    prev_end = 0.0
    for c in cues:
        assert c.start >= prev_end - 1e-6, (c.start, prev_end)
        assert 0.0 <= c.start <= c.end <= dur + 30.0
        prev_end = c.end


def test_long_form_seek_off_hard_cuts(snapshot_dir, tmp_path):
    """long_form_seek=False restores fixed 30 s cuts (windows independent,
    all batched at once)."""
    from whisper_diarize_tpu.audio import write_wav

    rng = np.random.default_rng(4)
    wav = str(tmp_path / "long2.wav")
    write_wav(wav, (rng.standard_normal(16000 * 64) * 6000).astype(np.int16))
    eng = make_engine(snapshot_dir, tmp_path, long_form_seek=False)
    cues = eng.transcribe_audio(wav, TranscribeOptions(enable_vad=False, lang="en"))
    assert isinstance(cues, list)


def test_sequential_prompt_mode(snapshot_dir, tmp_path, wav_path):
    eng = make_engine(snapshot_dir, tmp_path, sequential_prompt=True)
    opts = TranscribeOptions(enable_vad=True, lang="en")
    cues = eng.transcribe_audio(wav_path, opts)
    assert isinstance(cues, list)


def test_async_wrapper(snapshot_dir, tmp_path, wav_path):
    import asyncio

    eng = make_engine(snapshot_dir, tmp_path)
    opts = TranscribeOptions(enable_vad=False, lang="en")
    cues = asyncio.run(eng.transcribe_audio_async(wav_path, opts))
    assert isinstance(cues, list)


def test_weights_roundtrip(tmp_path):
    """save_params -> load_model reproduces the exact pytree."""
    import jax

    params = wm.init_params(TINY_TEST_CFG, seed=1)
    weights_mod.save_params(params, TINY_TEST_CFG, tmp_path / "snap")
    loaded, cfg = weights_mod.load_model(tmp_path / "snap")
    assert cfg == TINY_TEST_CFG
    flat_a = jax.tree.leaves(params)
    flat_b = jax.tree.leaves(loaded)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_hf_conversion(tmp_path):
    """A fabricated HF-layout checkpoint converts into a working pytree."""
    import json

    rng = np.random.default_rng(0)
    d, L, H, V = 64, 2, 2, 51865
    flat = {}

    def add_lin(prefix, n_in, n_out, bias=True):
        flat[prefix + ".weight"] = rng.standard_normal((n_out, n_in)).astype(np.float32)
        if bias:
            flat[prefix + ".bias"] = np.zeros(n_out, np.float32)

    def add_ln(prefix, n):
        flat[prefix + ".weight"] = np.ones(n, np.float32)
        flat[prefix + ".bias"] = np.zeros(n, np.float32)

    flat["model.encoder.conv1.weight"] = rng.standard_normal((d, 80, 3)).astype(np.float32)
    flat["model.encoder.conv1.bias"] = np.zeros(d, np.float32)
    flat["model.encoder.conv2.weight"] = rng.standard_normal((d, d, 3)).astype(np.float32)
    flat["model.encoder.conv2.bias"] = np.zeros(d, np.float32)
    flat["model.encoder.embed_positions.weight"] = np.zeros((1500, d), np.float32)
    add_ln("model.encoder.layer_norm", d)
    for i in range(L):
        e = f"model.encoder.layers.{i}."
        add_ln(e + "self_attn_layer_norm", d)
        add_lin(e + "self_attn.q_proj", d, d)
        add_lin(e + "self_attn.k_proj", d, d, bias=False)
        add_lin(e + "self_attn.v_proj", d, d)
        add_lin(e + "self_attn.out_proj", d, d)
        add_ln(e + "final_layer_norm", d)
        add_lin(e + "fc1", d, 4 * d)
        add_lin(e + "fc2", 4 * d, d)
    flat["model.decoder.embed_tokens.weight"] = (
        rng.standard_normal((V, d)).astype(np.float32) * 0.02
    )
    flat["model.decoder.embed_positions.weight"] = np.zeros((448, d), np.float32)
    add_ln("model.decoder.layer_norm", d)
    for i in range(L):
        dd = f"model.decoder.layers.{i}."
        add_ln(dd + "self_attn_layer_norm", d)
        add_lin(dd + "self_attn.q_proj", d, d)
        add_lin(dd + "self_attn.k_proj", d, d, bias=False)
        add_lin(dd + "self_attn.v_proj", d, d)
        add_lin(dd + "self_attn.out_proj", d, d)
        add_ln(dd + "encoder_attn_layer_norm", d)
        add_lin(dd + "encoder_attn.q_proj", d, d)
        add_lin(dd + "encoder_attn.k_proj", d, d, bias=False)
        add_lin(dd + "encoder_attn.v_proj", d, d)
        add_lin(dd + "encoder_attn.out_proj", d, d)
        add_ln(dd + "final_layer_norm", d)
        add_lin(dd + "fc1", d, 4 * d)
        add_lin(dd + "fc2", 4 * d, d)

    from safetensors.numpy import save_file

    snap = tmp_path / "hf"
    snap.mkdir()
    save_file(flat, str(snap / "model.safetensors"))
    (snap / "config.json").write_text(
        json.dumps(
            dict(
                vocab_size=V, num_mel_bins=80, d_model=d,
                encoder_layers=L, decoder_layers=L,
                encoder_attention_heads=H, decoder_attention_heads=H,
                max_source_positions=1500, max_target_positions=448,
            )
        )
    )
    params, cfg = weights_mod.load_model(snap)
    assert cfg.n_audio_state == d and cfg.n_text_layer == L
    # converted params drive the model
    import jax.numpy as jnp

    mel = jnp.zeros((1, 80, 3000), jnp.float32)
    xa = wm.encode(params, mel, cfg)
    assert xa.shape == (1, 1500, d)
    # linears were transposed correctly: q_w is [L, in, out]
    assert params["decoder"]["blocks"]["q_w"].shape == (L, d, d)


def test_temperature_fallback_merges_failed_rows(snapshot_dir, tmp_path, wav_path):
    """With the random model every window fails the logprob threshold, so the
    fallback path must run retries and still return valid structure."""
    eng = make_engine(snapshot_dir, tmp_path, temperature_fallback=True)
    opts = TranscribeOptions(enable_vad=False, lang="en")
    cues = eng.transcribe_audio(wav_path, opts)
    assert isinstance(cues, list)


def test_decode_with_fallback_unit(snapshot_dir):
    import jax.numpy as jnp
    import numpy as np

    from whisper_diarize_tpu.models import weights as wmod
    from whisper_diarize_tpu.ops import decode as dec
    from whisper_diarize_tpu.tokenizer import DebugTokenizer
    from whisper_diarize_tpu.transcribe import TranscribeStep

    params, cfg = wmod.load_model(snapshot_dir)
    step = TranscribeStep(
        params, cfg, DebugTokenizer(), enable_dtw=False,
        decode_config=dec.DecodeConfig(max_tokens=8, blank_id=32),
        strategy="greedy",
    )
    mel = step.mel(np.zeros((2, 480000), np.float32))
    xa = step.encode(mel)
    res, temps = step.decode_with_fallback(xa, "en", "transcribe",
                                           temperatures=(0.0, 0.5, 1.0))
    assert np.asarray(res.tokens).shape[0] == 2
    assert np.isfinite(np.asarray(res.avg_logprob)).all()
    assert temps.shape == (2,)


def test_decode_with_fallback_skips_padding_rows(snapshot_dir):
    """Silent zero-padding rows of a partial batch must never trigger the
    retry ladder (ADVICE r1): with n_valid_rows=1 the pad row is exempt."""
    import numpy as np

    from whisper_diarize_tpu.models import weights as wmod
    from whisper_diarize_tpu.ops import decode as dec
    from whisper_diarize_tpu.tokenizer import DebugTokenizer
    from whisper_diarize_tpu.transcribe import TranscribeStep

    params, cfg = wmod.load_model(snapshot_dir)
    step = TranscribeStep(
        params, cfg, DebugTokenizer(), enable_dtw=False,
        decode_config=dec.DecodeConfig(max_tokens=8, blank_id=32),
        strategy="greedy",
    )
    mel = step.mel(np.zeros((2, 480000), np.float32))
    xa = step.encode(mel)
    # logprob_threshold=+inf marks every judged row bad; the pad row must
    # stay at temperature 0 while the valid row climbs the ladder
    res, temps = step.decode_with_fallback(
        xa, "en", "transcribe", temperatures=(0.0, 0.7),
        logprob_threshold=float("inf"), n_valid_rows=1,
    )
    assert temps[0] == np.float32(0.7)
    assert temps[1] == 0.0


def test_transcribe_audio_batch(snapshot_dir, tmp_path, wav_path):
    """Multi-stream batch: two files through shared decode batches."""
    from whisper_diarize_tpu.audio import write_wav

    rng = np.random.default_rng(7)
    wav2 = str(tmp_path / "second.wav")
    x = (rng.standard_normal(16000 * 2) * 5000).astype(np.int16)
    write_wav(wav2, x)

    eng = make_engine(snapshot_dir, tmp_path)
    opts = TranscribeOptions(enable_vad=False, lang="en")
    results = eng.transcribe_audio_batch([wav_path, wav2], opts)
    assert len(results) == 2
    for cues in results:
        assert isinstance(cues, list)
    # single-stream result matches the batched result for the same file
    single = eng.transcribe_audio(wav_path, opts)
    assert [c.text for c in single] == [c.text for c in results[0]]


def test_transcribe_audio_batch_sequential_supported(snapshot_dir, tmp_path, wav_path):
    """sequential_prompt batches across streams via per-row rolling prompts
    (used to be rejected; VERDICT r1 item 5)."""
    eng = make_engine(snapshot_dir, tmp_path, sequential_prompt=True)
    out = eng.transcribe_audio_batch(
        [wav_path], TranscribeOptions(enable_vad=False, lang="en")
    )
    assert len(out) == 1 and isinstance(out[0], list)


def test_transcribe_audio_batch_missing_file(snapshot_dir, tmp_path, wav_path):
    eng = make_engine(snapshot_dir, tmp_path)
    with pytest.raises(FileNotFoundError):
        eng.transcribe_audio_batch([wav_path, "/nope.wav"], TranscribeOptions())


def test_openai_pt_loader(tmp_path):
    """Fabricated OpenAI-layout .pt checkpoint loads and drives encode;
    numerically identical to the same weights loaded from native format."""
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp

    # build native params first, then express them in OpenAI layout
    cfg = TINY_TEST_CFG
    params = wm.init_params(cfg, seed=5)

    import jax
    import numpy as _np

    def t(x):
        return torch.tensor(_np.asarray(x))

    sd = {}
    enc = jax.tree.map(_np.asarray, params["encoder"])
    dec = jax.tree.map(_np.asarray, params["decoder"])
    sd["encoder.conv1.weight"] = t(enc["conv1_w"].transpose(2, 1, 0))
    sd["encoder.conv1.bias"] = t(enc["conv1_b"])
    sd["encoder.conv2.weight"] = t(enc["conv2_w"].transpose(2, 1, 0))
    sd["encoder.conv2.bias"] = t(enc["conv2_b"])
    sd["encoder.positional_embedding"] = t(enc["pos"])
    sd["encoder.ln_post.weight"] = t(enc["ln_post_s"])
    sd["encoder.ln_post.bias"] = t(enc["ln_post_b"])
    eb = enc["blocks"]
    for i in range(cfg.n_audio_layer):
        p = f"encoder.blocks.{i}."
        sd[p + "attn_ln.weight"] = t(eb["ln1_s"][i]); sd[p + "attn_ln.bias"] = t(eb["ln1_b"][i])
        sd[p + "attn.query.weight"] = t(eb["q_w"][i].T); sd[p + "attn.query.bias"] = t(eb["q_b"][i])
        sd[p + "attn.key.weight"] = t(eb["k_w"][i].T)
        sd[p + "attn.value.weight"] = t(eb["v_w"][i].T); sd[p + "attn.value.bias"] = t(eb["v_b"][i])
        sd[p + "attn.out.weight"] = t(eb["o_w"][i].T); sd[p + "attn.out.bias"] = t(eb["o_b"][i])
        sd[p + "mlp_ln.weight"] = t(eb["ln2_s"][i]); sd[p + "mlp_ln.bias"] = t(eb["ln2_b"][i])
        sd[p + "mlp.0.weight"] = t(eb["fc1_w"][i].T); sd[p + "mlp.0.bias"] = t(eb["fc1_b"][i])
        sd[p + "mlp.2.weight"] = t(eb["fc2_w"][i].T); sd[p + "mlp.2.bias"] = t(eb["fc2_b"][i])
    db = dec["blocks"]
    sd["decoder.token_embedding.weight"] = t(dec["tok_emb"])
    sd["decoder.positional_embedding"] = t(dec["pos_emb"])
    sd["decoder.ln.weight"] = t(dec["ln_s"]); sd["decoder.ln.bias"] = t(dec["ln_b"])
    for i in range(cfg.n_text_layer):
        p = f"decoder.blocks.{i}."
        sd[p + "attn_ln.weight"] = t(db["ln1_s"][i]); sd[p + "attn_ln.bias"] = t(db["ln1_b"][i])
        sd[p + "attn.query.weight"] = t(db["q_w"][i].T); sd[p + "attn.query.bias"] = t(db["q_b"][i])
        sd[p + "attn.key.weight"] = t(db["k_w"][i].T)
        sd[p + "attn.value.weight"] = t(db["v_w"][i].T); sd[p + "attn.value.bias"] = t(db["v_b"][i])
        sd[p + "attn.out.weight"] = t(db["o_w"][i].T); sd[p + "attn.out.bias"] = t(db["o_b"][i])
        sd[p + "cross_attn_ln.weight"] = t(db["ln2_s"][i]); sd[p + "cross_attn_ln.bias"] = t(db["ln2_b"][i])
        sd[p + "cross_attn.query.weight"] = t(db["cq_w"][i].T); sd[p + "cross_attn.query.bias"] = t(db["cq_b"][i])
        sd[p + "cross_attn.key.weight"] = t(db["ck_w"][i].T)
        sd[p + "cross_attn.value.weight"] = t(db["cv_w"][i].T); sd[p + "cross_attn.value.bias"] = t(db["cv_b"][i])
        sd[p + "cross_attn.out.weight"] = t(db["co_w"][i].T); sd[p + "cross_attn.out.bias"] = t(db["co_b"][i])
        sd[p + "mlp_ln.weight"] = t(db["ln3_s"][i]); sd[p + "mlp_ln.bias"] = t(db["ln3_b"][i])
        sd[p + "mlp.0.weight"] = t(db["fc1_w"][i].T); sd[p + "mlp.0.bias"] = t(db["fc1_b"][i])
        sd[p + "mlp.2.weight"] = t(db["fc2_w"][i].T); sd[p + "mlp.2.bias"] = t(db["fc2_b"][i])

    dims = dict(
        n_mels=cfg.n_mels, n_vocab=cfg.n_vocab,
        n_audio_ctx=cfg.n_audio_ctx, n_audio_state=cfg.n_audio_state,
        n_audio_head=cfg.n_audio_head, n_audio_layer=cfg.n_audio_layer,
        n_text_ctx=cfg.n_text_ctx, n_text_state=cfg.n_text_state,
        n_text_head=cfg.n_text_head, n_text_layer=cfg.n_text_layer,
    )
    pt_path = tmp_path / "tiny_openai.pt"
    torch.save({"dims": dims, "model_state_dict": sd}, pt_path)

    loaded, cfg2 = weights_mod.load_openai_pt(str(pt_path))
    assert cfg2 == cfg
    mel = jnp.asarray(np.random.default_rng(0).standard_normal((1, 80, 3000)), jnp.float32)
    a = wm.encode(params, mel, cfg)
    b = wm.encode(loaded, mel, cfg2)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_speculative_draft_matches_plain(snapshot_dir, tmp_path, wav_path,
                                         monkeypatch):
    """EngineConfig(draft_model_path=...) must not change a single cue —
    speculative decoding only ever emits the target's own choices."""
    import whisper_diarize_tpu.ops.speculative as spec_mod
    from whisper_diarize_tpu.types import AdvancedTranscribe

    adv = AdvancedTranscribe(sampling_strategy="greedy")
    opts = TranscribeOptions(enable_vad=False, lang="en", advanced=adv)
    eng_plain = make_engine(snapshot_dir, tmp_path / "p")
    cues_plain = eng_plain.transcribe_audio(wav_path, opts)

    calls = {"n": 0}
    orig = spec_mod.speculative_greedy_decode

    def spy(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(spec_mod, "speculative_greedy_decode", spy)
    # the snapshot drafts for itself: vocabularies trivially match
    eng_spec = make_engine(
        snapshot_dir, tmp_path / "s", draft_model_path=snapshot_dir)
    cues_spec = eng_spec.transcribe_audio(wav_path, opts)
    assert calls["n"] > 0, "speculative path never engaged"
    assert [c.to_dict() for c in cues_spec] == [c.to_dict() for c in cues_plain]


def test_dtw_device_backtrack_matches_host(snapshot_dir, tmp_path, monkeypatch):
    """The fully on-device DTW path (DP + backtrack on chip, anchors-only
    fetch) must produce the same cues and word spans as the fetched-cost +
    host-DP path (WDT_HOST_DTW=1). Device scan-DP and host sequential DP
    group f32 sums differently, so near-tied accumulated costs can flip a
    backtrack tie-break and shift an anchor by ONE frame (20 ms) — the
    comparison allows exactly that (`ops/dtw.py::dtw_anchor_frames_batch`
    ULP-divergence caveat); text must still match exactly."""
    from whisper_diarize_tpu.audio import write_wav

    rng = np.random.default_rng(5)
    x = (rng.standard_normal(16000 * 40) * 5000).astype(np.int16)
    p = tmp_path / "dev_vs_host.wav"
    write_wav(str(p), x)
    opts = TranscribeOptions(enable_vad=False, lang="en")

    def run():
        eng = make_engine(snapshot_dir, tmp_path, enable_dtw=True,
                          batch_size=1)
        return eng.transcribe_audio(str(p), opts)

    monkeypatch.setenv("WDT_HOST_DTW", "1")
    host = run()
    monkeypatch.delenv("WDT_HOST_DTW")
    device = run()
    FRAME = 0.02  # one DTW frame; + rounding slack for the 3-dp cue times
    assert len(host) == len(device)
    for a, b in zip(host, device):
        assert a.text == b.text
        assert abs(a.start - b.start) <= FRAME + 1e-3
        assert abs(a.end - b.end) <= FRAME + 1e-3
        aw, bw = a.words or [], b.words or []
        assert [w.text for w in aw] == [w.text for w in bw]
        for wa, wb in zip(aw, bw):
            assert abs(wa.start - wb.start) <= FRAME + 1e-3
            assert abs(wa.end - wb.end) <= FRAME + 1e-3

    # random weights may decode empty windows above; guarantee the anchor
    # comparison really runs by repeating it at the step level with
    # non-text tokens suppressed (deterministically non-empty spans)
    from whisper_diarize_tpu.models import weights as wmod
    from whisper_diarize_tpu.ops import decode as dec
    from whisper_diarize_tpu.tokenizer import DebugTokenizer
    from whisper_diarize_tpu.transcribe import TranscribeStep
    import jax.numpy as jnp

    params, cfg = wmod.load_model(snapshot_dir)
    tk = DebugTokenizer()
    step = TranscribeStep(
        params, cfg, tk, enable_dtw=True,
        decode_config=dec.DecodeConfig(
            max_tokens=16, blank_id=32, with_timestamps=False
        ),
        strategy="greedy",
    )
    printable = set(range(33, 127))
    extra = [i for i in range(cfg.n_vocab) if i not in printable]
    step._suppress = jnp.asarray(
        dec.build_suppress_mask(tk.specials, cfg.n_vocab, extra)
    )
    rng = np.random.default_rng(0)
    n = 16000 * 3
    audio = np.zeros((2, 480000), np.float32)
    audio[:, :n] = rng.standard_normal((2, n)).astype(np.float32) * 0.1
    xa = step.encode(step.mel(audio))
    res = step.decode(xa, "en", "transcribe")
    assert (np.asarray(res.lengths) > 0).all()
    anchors_dev = step.start_alignment(res, xa, [n, n], translated=False)()
    monkeypatch.setenv("WDT_HOST_DTW", "1")
    anchors_host = step.start_alignment(res, xa, [n, n], translated=False)()
    monkeypatch.delenv("WDT_HOST_DTW")
    for dv, hs in zip(anchors_dev, anchors_host):
        assert (dv is None) == (hs is None)
        if dv is not None:
            np.testing.assert_allclose(dv, hs, rtol=0, atol=FRAME + 1e-9)


def test_engine_caches_model_and_step_across_calls(
    snapshot_dir, tmp_path, wav_path, monkeypatch
):
    """The Engine must keep one loaded model + compiled TranscribeStep
    alive across transcribe calls (the reference holds one whisper.cpp
    context, `engine.rs:65`): round-5 profiling of the engine-path bench
    showed every 'steady-state' call re-initializing and re-uploading the
    full checkpoint (63 s/call) and re-jitting the step."""
    from whisper_diarize_tpu.models import weights as wmod

    loads = {"n": 0}
    orig = wmod.load_model

    def counting_load(*a, **k):
        loads["n"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(wmod, "load_model", counting_load)
    eng = make_engine(snapshot_dir, tmp_path)
    opts = TranscribeOptions(enable_vad=False, lang="en")
    eng.transcribe_audio(wav_path, opts)
    steps1 = dict(eng._step_cache)
    eng.transcribe_audio(wav_path, opts)
    assert loads["n"] == 1  # second call reused the cached model
    assert len(steps1) == 1
    # same TranscribeStep object (same jit caches) on the second call
    assert list(eng._step_cache.values())[0] is list(steps1.values())[0]
    # a different model path would miss — key includes the resolved path
    assert list(eng._whisper_cache.keys())[0][0] == snapshot_dir
