import pytest

from whisper_diarize_tpu.evals import (
    Turn,
    cer,
    der,
    normalize_text,
    wer,
    word_timestamp_mae,
)


def test_normalize_text():
    assert normalize_text("Hello, World!  ") == "hello world"
    assert normalize_text("don't stop") == "don't stop"
    assert normalize_text("a—b") == "a b"


def test_wer_basics():
    assert wer("the cat sat", "the cat sat") == 0.0
    assert wer("the cat sat", "the cat") == pytest.approx(1 / 3)
    assert wer("the cat sat", "the dog sat") == pytest.approx(1 / 3)
    assert wer("the cat sat", "the big cat sat") == pytest.approx(1 / 3)
    assert wer("", "") == 0.0
    assert wer("", "word") == 1.0
    # normalization: punctuation/case ignored
    assert wer("Hello, world!", "hello world") == 0.0


def test_cer():
    assert cer("abc", "abc") == 0.0
    assert cer("abc", "axc") == pytest.approx(1 / 3)


def test_word_timestamp_mae():
    ref = [("hello", 0.0, 0.5), ("world", 0.6, 1.0)]
    hyp = [("hello", 0.1, 0.5), ("world", 0.6, 1.1)]
    mae = word_timestamp_mae(ref, hyp)
    assert mae == pytest.approx((0.1 + 0 + 0 + 0.1) / 4)
    # insertion in hyp doesn't break alignment
    hyp2 = [("uh", 0.0, 0.05)] + hyp
    assert word_timestamp_mae(ref, hyp2) == pytest.approx(mae)
    assert word_timestamp_mae(ref, []) is None


def test_der_perfect():
    ref = [Turn("A", 0.0, 10.0), Turn("B", 10.0, 20.0)]
    hyp = [Turn("1", 0.0, 10.0), Turn("2", 10.0, 20.0)]
    m = der(ref, hyp, collar=0.0)
    assert m["der"] == pytest.approx(0.0, abs=1e-9)


def test_der_missed_speech():
    ref = [Turn("A", 0.0, 10.0)]
    hyp = [Turn("1", 0.0, 5.0)]
    m = der(ref, hyp, collar=0.0)
    assert m["missed"] == pytest.approx(0.5)
    assert m["false_alarm"] == 0.0
    assert m["der"] == pytest.approx(0.5)


def test_der_false_alarm():
    ref = [Turn("A", 0.0, 10.0)]
    hyp = [Turn("1", 0.0, 10.0), Turn("1", 12.0, 17.0)]
    m = der(ref, hyp, collar=0.0)
    assert m["false_alarm"] == pytest.approx(0.5)


def test_der_confusion_with_mapping():
    # hyp swaps speakers in the second half of B's turn
    ref = [Turn("A", 0.0, 10.0), Turn("B", 10.0, 20.0)]
    hyp = [Turn("x", 0.0, 10.0), Turn("y", 10.0, 15.0), Turn("x", 15.0, 20.0)]
    m = der(ref, hyp, collar=0.0)
    # optimal mapping A->x, B->y; confusion on [15, 20] = 5 s of 20 s
    assert m["confusion"] == pytest.approx(0.25)
    assert m["der"] == pytest.approx(0.25)


def test_der_collar_forgives_boundaries():
    ref = [Turn("A", 0.0, 10.0)]
    hyp = [Turn("1", 0.2, 10.0)]  # 0.2 s late start within 0.25 collar
    m = der(ref, hyp, collar=0.25)
    assert m["der"] == pytest.approx(0.0, abs=1e-9)
    m0 = der(ref, hyp, collar=0.0)
    assert m0["missed"] > 0
