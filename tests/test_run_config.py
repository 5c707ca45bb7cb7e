"""End-to-end exercise of the eval harness (`evals/run_config.py`).

VERDICT r2 Weak #5: the WER/MAE/DER machinery had no CI coverage and would
bit-rot until real checkpoints appear. This drives config 3 (VAD off,
diarization on, DTW on — the full measurement plumbing) over synthetic
labeled audio: two alternating tone "speakers" with silences, a reference
transcript, and an RTTM file, asserting the report computes xRT, WER and
DER and that the RTTM parser round-trips.
"""

import json
import sys

import numpy as np
import pytest

sys.path.insert(0, "evals")

pytestmark = pytest.mark.slow  # engine end-to-end run (`pytest -m slow`)


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    from whisper_diarize_tpu.audio import write_wav
    from whisper_diarize_tpu.models import weights as weights_mod
    from whisper_diarize_tpu.models import whisper as wm

    d = tmp_path_factory.mktemp("evalfx")
    weights_mod.init_random_snapshot(str(d / "snap"), cfg=wm.WhisperConfig(
        n_mels=80, n_vocab=51865,
        n_audio_ctx=1500, n_audio_state=64, n_audio_head=2, n_audio_layer=2,
        n_text_ctx=448, n_text_state=64, n_text_head=2, n_text_layer=2,
    ), seed=0)

    # two alternating "speakers": 440 Hz and 880 Hz tone bursts + silences
    sr = 16000
    rng = np.random.default_rng(0)
    pieces = []
    rttm_lines = []
    t = 0.0
    for i, (freq, dur) in enumerate([(440, 1.0), (0, 0.4), (880, 1.2),
                                     (0, 0.4), (440, 0.8)]):
        n = int(dur * sr)
        tt = np.arange(n) / sr
        if freq:
            x = 0.4 * np.sin(2 * np.pi * freq * tt)
            x += rng.standard_normal(n) * 0.01
            rttm_lines.append(
                f"SPEAKER synth 1 {t:.2f} {dur:.2f} <NA> <NA> "
                f"spk{1 if freq == 440 else 2} <NA> <NA>"
            )
        else:
            x = np.zeros(n)
        pieces.append((x * 32767).astype(np.int16))
        t += dur
    write_wav(str(d / "synth.wav"), np.concatenate(pieces))
    (d / "ref.txt").write_text("hello world this is a test")
    (d / "ref.rttm").write_text("\n".join(rttm_lines) + "\n")
    return d


def test_rttm_parser(fixture_dir):
    from run_config import read_rttm

    turns = read_rttm(str(fixture_dir / "ref.rttm"))
    assert [t.speaker for t in turns] == ["spk1", "spk2", "spk1"]
    assert turns[1].start == pytest.approx(1.4)
    assert turns[1].end == pytest.approx(2.6)


def test_config3_machinery_end_to_end(fixture_dir, capsys, monkeypatch):
    """Config 3 (diarize + DTW) over the synthetic fixture produces a full
    report: xRT, WER vs the reference transcript, DER vs the RTTM — the
    exact plumbing a real-checkpoint measurement run will use."""
    import run_config

    monkeypatch.setenv("WDT_SEG_MODEL", "__random__")
    monkeypatch.setenv("WDT_EMB_MODEL", "__random__")
    rc = run_config.main([
        "3", str(fixture_dir / "synth.wav"),
        "--model-dir", str(fixture_dir / "snap"),
        "--cache-dir", str(fixture_dir / "cache"),
        "--ref-text", str(fixture_dir / "ref.txt"),
        "--ref-rttm", str(fixture_dir / "ref.rttm"),
        "--max-tokens", "8",
    ])
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["config"] == 3
    assert report["xRT"] > 0
    assert 0.0 <= report["wer"]  # random weights: any finite WER
    assert set(report["der"]) >= {"der", "confusion", "total_speech"}
    for v in report["der"].values():
        assert np.isfinite(v)
