import numpy as np
import pytest

from whisper_diarize_tpu.engine import Engine, EngineConfig
from whisper_diarize_tpu.types import Callbacks, TranscribeOptions

from tests.test_engine import TINY_TEST_CFG, make_engine, snapshot_dir, wav_path  # noqa: F401

pytestmark = pytest.mark.slow  # engine end-to-end resume journal runs (`pytest -m slow`)


def test_resume_journal_skips_decoded_windows(snapshot_dir, tmp_path, wav_path):
    resume = str(tmp_path / "resume")
    eng = make_engine(snapshot_dir, tmp_path, resume_dir=resume)
    opts = TranscribeOptions(enable_vad=False, lang="en")

    decoded_counts = []

    # first run: windows decoded and journaled
    seen1 = []
    eng.transcribe_audio(
        wav_path, opts, callbacks=Callbacks(new_segment_callback=lambda s: seen1.append(s))
    )
    journal_files = list((tmp_path / "resume").glob("wdt-resume-*.jsonl"))
    assert len(journal_files) == 1
    n_lines = len(journal_files[0].read_text().splitlines())
    assert n_lines == len(seen1) > 0

    # second run: all windows come from the journal; the decode path would
    # append more lines if it ran — the journal must not grow
    eng2 = make_engine(snapshot_dir, tmp_path, resume_dir=resume)
    seen2 = []
    cues2 = eng2.transcribe_audio(
        wav_path, opts, callbacks=Callbacks(new_segment_callback=lambda s: seen2.append(s))
    )
    assert len(journal_files[0].read_text().splitlines()) == n_lines
    assert len(seen2) == len(seen1)
    for a, b in zip(seen1, seen2):
        assert a.text == b.text
        assert a.start == pytest.approx(b.start)


def test_resume_fingerprint_isolates_options(snapshot_dir, tmp_path, wav_path):
    resume = str(tmp_path / "resume")
    eng = make_engine(snapshot_dir, tmp_path, resume_dir=resume)
    eng.transcribe_audio(wav_path, TranscribeOptions(enable_vad=False, lang="en"))
    eng.transcribe_audio(wav_path, TranscribeOptions(enable_vad=False, lang="de"))
    # different options -> different journal files
    assert len(list((tmp_path / "resume").glob("wdt-resume-*.jsonl"))) == 2


def test_no_resume_dir_no_journal(snapshot_dir, tmp_path, wav_path):
    eng = make_engine(snapshot_dir, tmp_path)
    eng.transcribe_audio(wav_path, TranscribeOptions(enable_vad=False, lang="en"))
    assert not list(tmp_path.glob("**/wdt-resume-*.jsonl"))
