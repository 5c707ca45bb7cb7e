from whisper_diarize_tpu.subtitles import to_srt, to_txt, to_vtt
from whisper_diarize_tpu.types import Segment


CUES = [
    Segment(0.0, 1.5, "Hello\nworld"),
    Segment(2.25, 3.0, "Bye", speaker_id="2"),
    Segment(3661.5, 3662.0, "late"),
]


def test_srt():
    srt = to_srt(CUES)
    blocks = srt.strip().split("\n\n")
    assert blocks[0] == "1\n00:00:00,000 --> 00:00:01,500\nHello\nworld"
    assert blocks[1] == "2\n00:00:02,250 --> 00:00:03,000\n[2] Bye"
    assert blocks[2].startswith("3\n01:01:01,500 --> 01:01:02,000")


def test_srt_without_speakers():
    srt = to_srt(CUES, with_speakers=False)
    assert "[2]" not in srt


def test_vtt():
    vtt = to_vtt(CUES)
    assert vtt.startswith("WEBVTT\n")
    assert "00:00:00.000 --> 00:00:01.500" in vtt
    assert "<v Speaker 2>Bye" in vtt


def test_txt():
    txt = to_txt(CUES, with_speakers=True)
    lines = txt.splitlines()
    assert lines[0] == "Hello world"  # newline flattened
    assert lines[1] == "[2] Bye"
