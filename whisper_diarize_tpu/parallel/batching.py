"""Chunk scheduler: speech segments -> padded 30 s windows -> device batches.

The reference decodes VAD chunks serially through one whisper.cpp state
(`/root/reference/src/transcribe.rs:376-389`). Here chunks become a batch
axis: every chunk is split into <= 30 s windows, windows are packed into
fixed-size batches (compiled once per batch size), padded to the whisper
window, and decoded together — the throughput story from SURVEY.md §5
("long-context": time-domain chunking becomes a batch axis, not a serial
loop).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, List, Sequence, Tuple

import numpy as np

from ..ops.mel import N_SAMPLES, SAMPLE_RATE
from ..types import SpeechSegment


@dataclass
class ChunkWindow:
    """One <= 30 s decode window cut from a speech segment."""

    chunk_idx: int  # index into the original SpeechSegment list
    window_idx: int  # position of this window within its chunk
    start: float  # absolute start time (seconds) in the full audio
    samples: np.ndarray  # int16, <= N_SAMPLES
    stream_idx: int = 0  # which audio stream this window belongs to


def plan_windows(
    segments: Sequence[SpeechSegment],
    max_window_samples: int = N_SAMPLES,
    stream_idx: int = 0,
) -> List[ChunkWindow]:
    """Cut each speech segment into fixed-size windows.

    whisper.cpp internally seeks through > 30 s inputs; here the cut is
    explicit so every window is an independent batch element.
    """
    windows: List[ChunkWindow] = []
    for ci, seg in enumerate(segments):
        samples = np.asarray(seg.samples, np.int16)
        n = len(samples)
        if n == 0:
            continue
        w = 0
        for off in range(0, n, max_window_samples):
            part = samples[off : off + max_window_samples]
            windows.append(
                ChunkWindow(
                    chunk_idx=ci,
                    window_idx=w,
                    start=seg.start + off / SAMPLE_RATE,
                    samples=part,
                    stream_idx=stream_idx,
                )
            )
            w += 1
    return windows


def plan_windows_multi(
    per_stream_segments: Sequence[Sequence[SpeechSegment]],
    max_window_samples: int = N_SAMPLES,
) -> List[ChunkWindow]:
    """Windows for many audio streams, interleaved round-robin so every
    batch mixes streams (keeps per-stream latency roughly uniform)."""
    per_stream = [
        plan_windows(segs, max_window_samples, stream_idx=i)
        for i, segs in enumerate(per_stream_segments)
    ]
    out: List[ChunkWindow] = []
    max_len = max((len(lst) for lst in per_stream), default=0)
    for k in range(max_len):
        for lst in per_stream:
            if k < len(lst):
                out.append(lst[k])
    return out


def iter_batches(
    windows: Sequence[ChunkWindow], batch_size: int
) -> Iterator[Tuple[List[ChunkWindow], np.ndarray, List[int]]]:
    """Yield (windows, padded_audio [batch_size, N_SAMPLES] f32, n_valid).

    The last batch is padded with silent rows up to `batch_size` so the jit
    cache sees exactly one batch shape; `n_valid` lists real sample counts
    (padding rows get 0).
    """
    for i in range(0, len(windows), batch_size):
        group = list(windows[i : i + batch_size])
        audio = np.zeros((batch_size, N_SAMPLES), np.float32)
        n_valid: List[int] = []
        for j, w in enumerate(group):
            audio[j, : len(w.samples)] = w.samples.astype(np.float32) / 32768.0
            n_valid.append(len(w.samples))
        n_valid += [0] * (batch_size - len(group))
        yield group, audio, n_valid
