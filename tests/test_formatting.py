import math

import pytest

from whisper_diarize_tpu.formatting import (
    FormattingOverrides,
    NoSilence,
    PostProcessConfig,
    ScriptProfile,
    VadMaskOracle,
    apply_overrides,
    process_segments,
    profile_for_lang,
    _split_trailing_punct,
    _split_into_lines,
    _Tok,
)
from whisper_diarize_tpu.types import Segment, WordTimestamp


def W(text, start, end, p=None):
    return WordTimestamp(text=text, start=start, end=end, probability=p)


def seg(words, start=None, end=None, text="", speaker=None):
    start = words[0].start if start is None else start
    end = words[-1].end if end is None else end
    return Segment(start=start, end=end, text=text, words=words, speaker_id=speaker)


def test_basic_split_reference_case():
    """Port of the reference's only unit test (`formatting.rs:650-670`),
    with the missing leading_space fields fixed (the Rust test does not
    compile as committed; see SURVEY.md §4)."""
    cfg = PostProcessConfig()
    # The committed Rust test is stale: with current defaults (max_lines=1,
    # CPL=38) the text fits one line and never splits. Exercise the splitter
    # with a 2-line, 20-CPL config instead.
    cfg.max_lines = 2
    cfg.max_chars_per_line = 20
    words = [
        W("I", 0.00, 0.10),
        W(" think", 0.10, 0.38),
        W(" I", 0.50, 0.60),
        W(" would", 0.60, 0.80),
        W(" like", 0.80, 0.95),
        W(" to.", 0.95, 1.10),
    ]
    cues = process_segments([seg(words)], cfg, None)
    assert cues
    text = cues[0].text
    assert "\n" in text
    assert text.startswith("I think")


def test_profiles():
    # constants from `formatting.rs:139-182`
    latin = PostProcessConfig.latin()
    assert (latin.max_chars_per_line, latin.cps_cap) == (38, 17.0)
    cjk = PostProcessConfig.cjk()
    assert (cjk.max_chars_per_line, cjk.cps_cap) == (20, 11.5)
    assert not cjk.insert_interword_space and cjk.enforce_kinsoku
    sea = PostProcessConfig.se_asian_no_space()
    assert (sea.max_chars_per_line, sea.cps_cap) == (22, 13.0)
    assert not sea.allow_comma_split
    rtl = PostProcessConfig.rtl()
    assert (rtl.max_chars_per_line, rtl.cps_cap) == (28, 14.0)
    indic = PostProcessConfig.indic()
    assert (indic.max_chars_per_line, indic.cps_cap) == (30, 15.0)


def test_profile_for_lang():
    assert profile_for_lang("ja") == ScriptProfile.CJK
    assert profile_for_lang("zh-TW") == ScriptProfile.CJK
    assert profile_for_lang("th") == ScriptProfile.SE_ASIAN_NO_SPACE
    assert profile_for_lang("ar") == ScriptProfile.RTL
    assert profile_for_lang("hi") == ScriptProfile.INDIC
    assert profile_for_lang("en") == ScriptProfile.LATIN
    assert profile_for_lang("xx") == ScriptProfile.LATIN


def test_apply_overrides():
    cfg = PostProcessConfig()
    ov = FormattingOverrides(max_chars_per_line=42, cps_cap=20.0, max_lines=2)
    apply_overrides(cfg, ov)
    assert cfg.max_chars_per_line == 42
    assert cfg.cps_cap == 20.0
    assert cfg.max_lines == 2
    # untouched field keeps default
    assert cfg.split_gap_sec == 0.5


def test_split_trailing_punct_ascii_only():
    # ASCII punct splits; CJK punct does NOT (byte-wise scan in the
    # reference, `formatting.rs:359-372`).
    assert _split_trailing_punct("hello!") == ("hello", "!")
    assert _split_trailing_punct("hello!?") == ("hello", "!?")
    assert _split_trailing_punct("don't") == ("don't", "")
    assert _split_trailing_punct("word。") == ("word。", "")


def test_split_trailing_punct_interior_untouched():
    assert _split_trailing_punct("a,b") == ("a,b", "")
    assert _split_trailing_punct("end.") == ("end", ".")
    assert _split_trailing_punct('quote"') == ("quote", '"')


def test_continuation_merge_transhumanism():
    """BPE pieces with no leading space merge into one word
    (`formatting.rs:325-357`): trans|human|ism -> transhumanism."""
    cfg = PostProcessConfig()
    words = [
        W(" of", 0.75, 0.91),
        W(" trans", 0.91, 1.10),
        W("human", 1.10, 1.40),
        W("ism?", 1.40, 1.78),
    ]
    cues = process_segments([seg(words)], cfg, None)
    joined = " ".join(c.text for c in cues)
    assert "transhumanism?" in joined
    assert "trans human" not in joined


def test_punct_only_token_merges_into_previous():
    cfg = PostProcessConfig()
    words = [W("wait", 0.0, 0.5), W("!", 0.5, 0.55), W(" ok", 1.5, 2.0)]
    cues = process_segments([seg(words)], cfg, None)
    assert cues[0].text.startswith("wait!")


def test_tiny_word_merge():
    cfg = PostProcessConfig()
    # middle word is 20 ms, below min_word_dur=0.10 -> merged
    words = [W("a", 0.0, 0.3), W(" b", 0.3, 0.32), W(" c", 0.32, 0.7)]
    cues = process_segments([seg(words)], cfg, None)
    all_words = [w.text for c in cues for w in (c.words or [])]
    assert len(all_words) < 3


def test_grouping_on_terminal_punct_and_gap():
    cfg = PostProcessConfig()
    words = [
        W("one.", 0.0, 0.5),
        W(" two", 0.6, 1.0),
        W(" three", 2.0, 2.5),  # gap 1.0 >= 0.5 triggers a new group
    ]
    cues = process_segments([seg(words)], cfg, None)
    texts = [c.text for c in cues]
    assert texts[0] == "one."
    assert any(t.startswith("two") for t in texts)
    assert any(t.startswith("three") for t in texts)


def test_cue_times_rounded_3dp():
    cfg = PostProcessConfig()
    words = [W("hello", 0.123456, 1.98765)]
    cues = process_segments([seg(words)], cfg, None)
    assert cues[0].start == pytest.approx(0.123, abs=1e-9)
    assert cues[0].end == pytest.approx(1.988, abs=1e-9)


def test_vad_mask_oracle():
    o = VadMaskOracle([(1.0, 2.0), (3.0, 4.0), (0.0, 0.0)])
    assert o.mask == [(1.0, 2.0), (3.0, 4.0)]
    assert o.is_silence(2.0, 3.0)  # pure gap
    assert not o.is_silence(1.5, 1.6)
    assert not o.is_silence(2.5, 3.5)  # overlaps second interval
    assert o.is_silence(5.0, 6.0)
    assert o.is_silence(2.0, 1.0)  # inverted => silence


def test_oracle_edge_snapping():
    """20 ms pad snapping against a silence oracle (`formatting.rs:404-410`)."""
    cfg = PostProcessConfig()
    # word inside speech [1.0, 2.0]; edges beyond are silence
    o = VadMaskOracle([(1.0, 2.0)])
    words = [W("hello", 1.0, 2.0)]
    cues = process_segments([seg(words)], cfg, o)
    w = cues[0].words[0]
    # start snapped inward by pad, end snapped inward by pad
    assert w.start == pytest.approx(1.02, abs=1e-6)
    assert w.end == pytest.approx(1.98, abs=1e-6)


def test_segment_without_words_falls_back_to_text():
    cfg = PostProcessConfig()
    s = Segment(start=0.0, end=2.0, text="whole segment text", words=None)
    cues = process_segments([s], cfg, None)
    assert cues and "whole segment" in cues[0].text


def test_empty_input():
    assert process_segments([], PostProcessConfig(), None) == []
    s = Segment(start=0.0, end=1.0, text="   ", words=None)
    assert process_segments([s], PostProcessConfig(), None) == []


def test_speaker_id_carried_to_cue():
    cfg = PostProcessConfig()
    words = [W("hi", 0.0, 0.5)]
    cues = process_segments([seg(words, speaker="1")], cfg, None)
    assert cues[0].speaker_id == "1"


def test_line_split_scoring_prefers_terminal_punct():
    cfg = PostProcessConfig()
    cfg.max_lines = 2
    cfg.max_chars_per_line = 20
    toks = [
        _Tok("Hello", ".", 0.0, 0.5, None, None, False),
        _Tok("world", "", 0.6, 1.0, None, None, True),
        _Tok("again", "", 1.0, 1.4, None, None, True),
        _Tok("and", "", 1.4, 1.8, None, None, True),
        _Tok("more", "", 1.8, 2.2, None, None, True),
    ]
    # k=1 gets the -0.6 terminal-punct bonus and zero length penalty, beating
    # the even-k fallbacks (`formatting.rs:577-589`).
    lines = _split_into_lines(toks, cfg)
    assert len(lines) == 2
    assert lines[0] == "Hello."


def test_continuation_penalty_blocks_mid_word_split():
    cfg = PostProcessConfig()
    cfg.max_lines = 2
    cfg.max_chars_per_line = 8
    toks = [
        _Tok("aaaa", "", 0.0, 0.5, None, None, False),
        _Tok("bbbb", "", 0.5, 1.0, None, None, True),
        _Tok("cccc", "", 1.0, 1.4, None, None, False),  # continuation of bbbb
        _Tok("dddd", "", 2.0, 2.4, None, None, True),   # long gap before
    ]
    lines = _split_into_lines(toks, cfg)
    assert len(lines) == 2
    # k=2 (before "cccc") carries the +5.0 continuation penalty
    # (`formatting.rs:584-586`); the long-gap candidate k=3 wins instead.
    assert lines[1] == "dddd"


def test_cjk_no_interword_space():
    cfg = PostProcessConfig.cjk()
    words = [W("你好", 0.0, 0.5), W(" 世界", 0.5, 1.0)]
    cues = process_segments([seg(words)], cfg, None)
    assert cues[0].text == "你好世界"


def test_grapheme_length_counting():
    from whisper_diarize_tpu.formatting import _slice_chars

    cfg = PostProcessConfig()
    # family emoji = 1 grapheme cluster but many codepoints
    t = _Tok("👨‍👩‍👧‍👦", "", 0.0, 1.0, None, None, False)
    assert _slice_chars([t], cfg) == 1
    cfg.use_grapheme_len = False
    assert _slice_chars([t], cfg) == len("👨‍👩‍👧‍👦".encode("utf-8"))


def test_build_cue_respects_max_duration():
    """Greedy window growth stops at max_sub_dur (`formatting.rs:475-485`)."""
    cfg = PostProcessConfig()
    cfg.max_sub_dur = 2.0
    # 10 words, 0.5 s each, no punctuation, no gaps: one group
    words = [W(f" w{i}", i * 0.5, (i + 1) * 0.5) for i in range(10)]
    cues = process_segments([seg(words)], cfg, None)
    assert len(cues) > 1
    for c in cues:
        assert c.end - c.start <= 2.0 + 0.5  # grows until dur < cap, so +1 word


def test_build_cue_cps_cap_splits():
    """Dense text beyond the CPS cap and CPL budget splits into cues."""
    cfg = PostProcessConfig()
    cfg.cps_cap = 5.0
    cfg.max_chars_per_line = 10
    cfg.max_lines = 1
    words = [W(" abcdefghij", i * 0.2, (i + 1) * 0.2) for i in range(6)]
    cues = process_segments([seg(words)], cfg, None)
    assert len(cues) >= 3


def test_comma_split_gated_by_line_length():
    """Comma candidates only count when the slice is long enough
    (`formatting.rs:544-545`); note commas carry a +0.15 score penalty
    (`formatting.rs:582`), so they win only when the alternative overflows."""
    cfg = PostProcessConfig()
    cfg.max_lines = 2
    cfg.max_chars_per_line = 10
    # 5 tokens so k=1 is NOT the midpoint fallback (len//2 == 2)
    toks = [
        _Tok("aaaaaaaaaa", ",", 0.0, 0.4, None, None, False),
        _Tok("bb", "", 0.4, 0.8, None, None, True),
        _Tok("cc", "", 0.8, 1.2, None, None, True),
        _Tok("dd", "", 1.2, 1.6, None, None, True),
        _Tok("ee", "", 1.6, 2.0, None, None, True),
    ]
    # gated off: k=1 (after the comma) is not a candidate; even k=2 wins
    cfg.comma_min_chars_before_allow = 1000
    assert _split_into_lines(toks, cfg) == ["aaaaaaaaaa, bb", "cc dd ee"]
    # gated on: comma split (0.02 + 0.15) beats the k=2 overflow (0.02*16)
    cfg.comma_min_chars_before_allow = 5
    assert _split_into_lines(toks, cfg) == ["aaaaaaaaaa,", "bb cc dd ee"]


def test_soft_max_words_per_line_penalty():
    cfg = PostProcessConfig()
    cfg.max_lines = 2
    cfg.max_chars_per_line = 8
    cfg.soft_max_words_per_line = 1
    toks = [
        _Tok("aa", "", 0.0, 0.2, None, None, False),
        _Tok("bb", "", 0.2, 0.4, None, None, True),
        _Tok("cc", "", 0.4, 0.6, None, None, True),
        _Tok("dd", "", 0.6, 0.8, None, None, True),
    ]
    lines = _split_into_lines(toks, cfg)
    # with the soft cap, the balanced even split wins
    assert lines == ["aa bb", "cc dd"]
