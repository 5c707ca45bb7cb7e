"""Golden-file parity: the reference repo ships `segments.json`, the
committed output of its examples/test.rs run (Latin profile + overrides
{max_chars_per_line: 20, max_lines: 2} — `examples/test.rs:36-40`).

Feeding the golden cues' word lists back through OUR formatter must
reproduce the golden cue texts and 3-dp bounds. The reconstruction
re-attaches the leading spaces that the reference's renderer strips; a few
cues are unrecoverable in principle:

* hyphen/comma-joined continuations ("long-" + "term", "1," + "000") — the
  original spacing is destroyed in the rendered words,
* two cues contain a literal "<|endoftext|>" word with *inverted*
  timestamps in the golden file itself (whisper.cpp artifacts), whose
  clamping cascades differently on re-processing.

Those account for <= 6 of the 51 cues; everything else must match exactly.
"""

import json
import os

import pytest

import whisper_diarize_tpu as wdt

GOLDEN = "/root/reference/segments.json"


@pytest.mark.skipif(not os.path.exists(GOLDEN), reason="reference not mounted")
def test_golden_segments_roundtrip():
    golden = json.load(open(GOLDEN))
    segs = []
    for g in golden:
        words = []
        for w in g["words"]:
            t = w["text"]
            prefix = "" if t[:1] in "-'’" else " "
            words.append(
                wdt.WordTimestamp(prefix + t, w["start"], w["end"], w.get("probability"))
            )
        segs.append(
            wdt.Segment(g["start"], g["end"], g["text"].replace("\n", " "), words)
        )

    cfg = wdt.PostProcessConfig.for_language("en")
    wdt.apply_overrides(
        cfg, wdt.FormattingOverrides(max_chars_per_line=20, max_lines=2)
    )
    cues = wdt.process_segments(segs, cfg, None)

    assert len(cues) == len(golden) == 51

    exact = 0
    for g, c in zip(golden, cues):
        if (
            g["text"] == c.text
            and abs(g["start"] - c.start) < 0.0011
            and abs(g["end"] - c.end) < 0.0011
        ):
            exact += 1
    assert exact >= 45, f"only {exact}/51 cues matched the golden output"
