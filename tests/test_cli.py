import json

import numpy as np
import pytest

from whisper_diarize_tpu.__main__ import _format_srt, main
from whisper_diarize_tpu.types import Segment

from tests.test_engine import TINY_TEST_CFG, snapshot_dir, wav_path  # noqa: F401

pytestmark = pytest.mark.slow  # CLI end-to-end transcribe runs (`pytest -m slow`)


def test_format_srt():
    cues = [
        Segment(0.0, 1.5, "Hello\nworld"),
        Segment(2.25, 3.0, "Bye", speaker_id="2"),
    ]
    srt = _format_srt(cues)
    blocks = srt.strip().split("\n\n")
    assert blocks[0] == "1\n00:00:00,000 --> 00:00:01,500\nHello\nworld"
    assert blocks[1] == "2\n00:00:02,250 --> 00:00:03,000\n[2] Bye"


def test_cli_transcribe_json(snapshot_dir, tmp_path, wav_path, capsys):
    rc = main([
        "transcribe", wav_path, "--model-dir", snapshot_dir,
        "--cache-dir", str(tmp_path / "cache"),
        "--greedy", "--max-tokens", "8", "--no-dtw", "--quiet",
        "--vad-model", "__random__",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert json.loads(out) == json.loads(out)  # valid JSON


def test_cli_transcribe_to_file(snapshot_dir, tmp_path, wav_path):
    out = tmp_path / "cues.json"
    rc = main([
        "transcribe", wav_path, "--model-dir", snapshot_dir,
        "--cache-dir", str(tmp_path / "cache"),
        "--greedy", "--max-tokens", "8", "--no-dtw", "--quiet",
        "--vad-model", "__random__",
        "-o", str(out),
    ])
    assert rc == 0
    assert isinstance(json.loads(out.read_text()), list)


def test_cli_models(tmp_path, capsys):
    rc = main(["models", "list", "--cache-dir", str(tmp_path)])
    assert rc == 0
    rc = main(["models", "delete", "nope", "--cache-dir", str(tmp_path)])
    assert rc == 1  # nothing to delete
