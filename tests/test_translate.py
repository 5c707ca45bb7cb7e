import json

import pytest

from whisper_diarize_tpu.translate import (
    TranslateError,
    normalize_google_lang,
    regenerate_words_uniform,
    translate_segments,
    translate_text,
)
from whisper_diarize_tpu.types import ProgressType, Segment


def ok_response(text):
    return 200, json.dumps([[[text, "src", None, None]]])


def test_normalize_google_lang():
    assert normalize_google_lang("auto", False) == "auto"
    assert normalize_google_lang("AUTO", False) == "auto"
    assert normalize_google_lang("jw", False) == "jv"
    assert normalize_google_lang("yue", True) == "zh-TW"
    assert normalize_google_lang("nn", True) == "no"
    assert normalize_google_lang("nn", False) == "nn"  # source keeps nn
    assert normalize_google_lang("he", True) == "he"


def test_translate_text_success():
    calls = []

    def fake(url, params):
        calls.append(params)
        return ok_response("hallo")

    out = translate_text("hello", "en", "de", http_get=fake)
    assert out == "hallo"
    assert calls[0]["client"] == "gtx"
    assert calls[0]["sl"] == "en" and calls[0]["tl"] == "de"
    assert calls[0]["dt"] == "t"


def test_translate_text_retries_on_429():
    attempts = {"n": 0}

    def fake(url, params):
        attempts["n"] += 1
        if attempts["n"] < 3:
            return 429, "slow down"
        return ok_response("ok")

    assert translate_text("x", "en", "fr", http_get=fake) == "ok"
    assert attempts["n"] == 3


def test_translate_text_gives_up_after_retries():
    def fake(url, params):
        return 500, "boom"

    with pytest.raises(TranslateError):
        translate_text("x", "en", "fr", http_get=fake)


def test_translate_text_non_retryable():
    def fake(url, params):
        return 403, "forbidden"

    with pytest.raises(TranslateError, match="403"):
        translate_text("x", "en", "fr", http_get=fake)


def test_translate_segments_inplace_and_progress():
    segs = [
        Segment(0.0, 1.0, "hello"),
        Segment(1.0, 2.0, "   "),  # skipped: empty
        Segment(2.0, 4.0, "big world"),
    ]
    events = []

    def fake(url, params):
        return ok_response(params["q"].upper())

    translate_segments(
        segs, "en", "de",
        progress=lambda p, k, label: events.append((p, k)),
        http_get=fake,
    )
    assert segs[0].text == "HELLO"
    assert segs[1].text == "   "  # untouched
    assert segs[2].text == "BIG WORLD"
    # uniform word regeneration with leading-space convention
    assert [w.text for w in segs[2].words] == ["BIG", " WORLD"]
    assert segs[2].words[0].start == 2.0
    assert segs[2].words[1].end == 4.0
    assert segs[2].words[0].end == pytest.approx(3.0)
    # progress: 0 first, capped 99 mid, 100 last
    pcts = [p for p, k in events if k == ProgressType.TRANSLATE]
    assert pcts[0] == 0
    assert pcts[-1] == 100
    assert all(p <= 99 for p in pcts[1:-1])


def test_translate_segments_failure_keeps_original():
    segs = [Segment(0.0, 1.0, "keep me")]

    def fake(url, params):
        return 403, "no"

    translate_segments(segs, "en", "de", http_get=fake)
    assert segs[0].text == "keep me"
    assert segs[0].words is None  # untouched


def test_regenerate_words_uniform_empty():
    s = Segment(0.0, 1.0, "   ")
    regenerate_words_uniform(s)
    assert s.words == []


def test_regenerate_words_inverted_times_guard():
    s = Segment(5.0, 3.0, "a b")
    regenerate_words_uniform(s)
    assert all(w.start >= 5.0 and w.end >= 5.0 for w in s.words)
