import json

import pytest

from whisper_diarize_tpu.tokenizer import (
    LANGUAGES,
    DebugTokenizer,
    SpecialTokens,
    WhisperTokenizer,
    specials_for,
)


def test_special_token_layout_multilingual_v2():
    sp = specials_for(multilingual=True, num_languages=99)
    # Canonical openai/whisper multilingual ids
    assert sp.eot == 50257
    assert sp.sot == 50258
    assert sp.language_token("en") == 50259
    assert sp.language_token("su") == 50357  # 99th language
    assert sp.translate == 50358
    assert sp.transcribe == 50359
    assert sp.sot_lm == 50360
    assert sp.sot_prev == 50361
    assert sp.no_speech == 50362
    assert sp.no_timestamps == 50363
    assert sp.timestamp_begin == 50364
    assert sp.n_vocab == 51865


def test_special_token_layout_large_v3():
    sp = specials_for(multilingual=True, num_languages=100)
    assert sp.language_token("yue") == 50358
    assert sp.translate == 50359
    assert sp.transcribe == 50360
    assert sp.timestamp_begin == 50365
    assert sp.n_vocab == 51866


def test_special_token_layout_english():
    sp = specials_for(multilingual=False)
    assert sp.eot == 50256
    assert sp.sot == 50257
    assert sp.timestamp_begin == 50363
    assert sp.n_vocab == 51864


def test_timestamp_tokens():
    sp = specials_for()
    assert sp.timestamp_token(0.0) == sp.timestamp_begin
    assert sp.timestamp_token(30.0) == sp.timestamp_begin + 1500
    assert sp.timestamp_value(sp.timestamp_token(1.5)) == pytest.approx(1.5)
    assert sp.is_timestamp(sp.timestamp_begin)
    assert not sp.is_timestamp(sp.no_timestamps)
    # quantized to 20 ms grid
    assert sp.timestamp_value(sp.timestamp_token(1.513)) == pytest.approx(1.52)


def test_language_order_matches_reference():
    # first 10 languages in whisper's canonical order
    assert LANGUAGES[:10] == ("en", "zh", "de", "es", "ru", "ko", "fr", "ja", "pt", "tr")
    assert LANGUAGES[99] == "yue"
    sp = specials_for()
    assert sp.language_of_token(50259) == "en"
    assert sp.language_of_token(50260) == "zh"
    assert sp.language_of_token(50259 + 99) is None  # translate token, not a lang


def test_debug_tokenizer_roundtrip():
    tk = DebugTokenizer()
    ids = tk.encode("Hello, würld!")
    assert tk.decode(ids) == "Hello, würld!"
    assert all(0 <= i < 256 for i in ids)
    seq = tk.sot_sequence(task="transcribe", language="de")
    assert seq == [50258, 50261, 50359]
    seq = tk.sot_sequence(task="translate", language="en", no_timestamps=True)
    assert seq == [50258, 50259, 50358, 50363]


def test_debug_tokenizer_skips_specials_in_decode():
    tk = DebugTokenizer()
    sp = tk.specials
    ids = tk.encode("hi") + [sp.eot, sp.timestamp_begin]
    assert tk.decode(ids) == "hi"


def _toy_bpe(tmp_path):
    """Build a tiny GPT-2-style vocab/merges pair for 'low'-ish text."""
    from whisper_diarize_tpu.tokenizer import _bytes_to_unicode

    b2u = _bytes_to_unicode()
    # base: all 256 byte symbols
    vocab = {b2u[i]: i for i in range(256)}
    # add merges: 'l'+'o' -> 'lo', 'lo'+'w' -> 'low'
    merges = [("l", "o"), ("lo", "w")]
    next_id = 256
    for a, b in merges:
        vocab[a + b] = next_id
        next_id += 1
    vpath = tmp_path / "vocab.json"
    mpath = tmp_path / "merges.txt"
    vpath.write_text(json.dumps(vocab), encoding="utf-8")
    mpath.write_text("#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in merges), encoding="utf-8")
    return str(vpath), str(mpath)


def test_bpe_merging(tmp_path):
    vpath, mpath = _toy_bpe(tmp_path)
    tk = WhisperTokenizer.from_files(vpath, mpath)
    ids = tk.encode("low")
    assert ids == [tk.encoder["low"]]
    ids2 = tk.encode("lol")
    # 'lo' merged, trailing 'l' separate
    assert ids2 == [tk.encoder["lo"], tk.encoder["l"]]
    assert tk.decode(tk.encode("low lol")) == "low lol"


def test_bpe_space_prefix_tokens(tmp_path):
    vpath, mpath = _toy_bpe(tmp_path)
    tk = WhisperTokenizer.from_files(vpath, mpath)
    # GPT-2 pattern keeps the leading space attached to the word
    ids = tk.encode("a b")
    text = tk.decode(ids)
    assert text == "a b"
    # single-token decode preserves leading space marker
    space_a = tk.encode(" a")
    joined = "".join(tk.decode_token(i) for i in space_a)
    assert joined == " a"


def test_unknown_language_raises():
    sp = specials_for(num_languages=99)
    with pytest.raises(KeyError):
        sp.language_token("yue")  # only in the 100-language vocab
    with pytest.raises(KeyError):
        sp.language_token("not-a-lang")
