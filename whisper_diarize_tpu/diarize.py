"""Speaker diarization: segmentation windows, online speaker assignment,
and batch spectral clustering.

Replaces pyannote-rs (external Rust crate, SURVEY.md §2.4):

* `get_segments`: sliding 10 s windows through the segmentation net
  (`models/segmentation.py`), powerset -> per-frame speaker activity,
  contiguous runs -> `SpeechSegment`s — the stream consumed at
  `/root/reference/src/engine.rs:117-122`,
* `EmbeddingManager`: incremental cosine clustering with the exact
  assignment policy the reference drives at `transcribe.rs:480-495`:
  `search_speaker(embedding, threshold)` while under `max_speakers`, then
  `get_best_speaker_match(embedding)` once the cap is reached; speaker ids
  are 1-based ints, stringified by the caller ("?" on failure),
* `spectral_cluster`: offline batch mode (eigengap spectral clustering over
  the cosine affinity) — the higher-accuracy path the TPU build adds for
  multi-stream batch jobs (BASELINE.json north star).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from .audio import int16_to_float32
from .models import segmentation
from .types import SpeechSegment

SAMPLE_RATE = 16_000
MAX_WINDOWS_PER_BATCH = 128  # 10 s windows per device dispatch (HBM bound)


def get_segments(
    int_samples: np.ndarray,
    sample_rate: int = SAMPLE_RATE,
    seg_params: Optional[Dict[str, Any]] = None,
    min_duration_s: float = 0.2,
) -> List[SpeechSegment]:
    """Speaker-segmentation pass: audio -> list of SpeechSegment.

    Windows of 10 s are batched through the segmentation net; per frame the
    powerset argmax gives active local speakers; a segment boundary is drawn
    whenever the active-speaker set changes (so speaker turns split even
    without intervening silence — the property diarization-based chunking
    adds over VAD). Mirrors pyannote-rs `get_segments` consumed at
    `engine.rs:117-122`.
    """
    return get_segments_batch(
        [int_samples], sample_rate, seg_params, min_duration_s
    )[0]


def get_segments_batch(
    streams: List[np.ndarray],
    sample_rate: int = SAMPLE_RATE,
    seg_params: Optional[Dict[str, Any]] = None,
    min_duration_s: float = 0.2,
) -> List[List[SpeechSegment]]:
    """Multi-stream segmentation: ALL streams' 10 s windows run as ONE
    device batch ([sum NW, W] through the net), so the frontend keeps the
    chip saturated at config-5 stream counts instead of dispatching one
    file at a time (VERDICT r2 Missing #5). Per-stream results are
    identical to `get_segments` — windows are independent."""
    if sample_rate != SAMPLE_RATE:
        raise ValueError("expected 16 kHz input")
    params = seg_params if seg_params is not None else segmentation.init_params()
    W = segmentation.WINDOW_SAMPLES

    arrays = [np.asarray(x) for x in streams]
    spans: List[Tuple[int, int]] = []  # per stream: (first window idx, count)
    all_windows: List[np.ndarray] = []
    for x in arrays:
        n = len(x)
        n_windows = -(-n // W) if n else 0
        spans.append((len(all_windows), n_windows))
        if n_windows:
            padded = np.zeros((n_windows * W,), np.float32)
            padded[:n] = int16_to_float32(x)
            all_windows.append(padded.reshape(n_windows, W))
    if not all_windows:
        return [[] for _ in arrays]

    batch = np.concatenate(all_windows, axis=0)  # [sum NW, W]
    # Bound the per-dispatch window count: the SincNet stem's activations
    # run ~3-4 MB per 10 s window, so an unbounded [sum NW, W] forward at
    # config-5 scale (16 x 1 h ≈ 5760 windows) would need >15 GB of HBM.
    # Chunks are padded up to power-of-two buckets (<= 8 compiles ever,
    # <= 2x padded-row waste); windows are independent, results identical.
    acts: List[np.ndarray] = []
    for c0 in range(0, batch.shape[0], MAX_WINDOWS_PER_BATCH):
        chunk = batch[c0:c0 + MAX_WINDOWS_PER_BATCH]
        nw = chunk.shape[0]
        bucket = 1
        while bucket < nw:
            bucket *= 2
        if bucket > nw:
            chunk = np.concatenate(
                [chunk, np.zeros((bucket - nw, W), np.float32)], axis=0)
        log_probs = np.asarray(segmentation.forward(params, chunk))
        acts.append(segmentation.powerset_to_activity(log_probs)[:nw])
    activity = np.concatenate(acts, axis=0)  # [sum NW, F, 3]

    return [
        _activity_to_segments(
            x, activity[w0:w0 + nw], min_duration_s
        ) if nw else []
        for x, (w0, nw) in zip(arrays, spans)
    ]


def _activity_to_segments(
    x: np.ndarray, activity: np.ndarray, min_duration_s: float
) -> List[SpeechSegment]:
    """[NW, F, 3] speaker activity -> SpeechSegments of one stream (host
    policy: contiguous same-speaker-set frame runs become segments)."""
    n = len(x)
    W = segmentation.WINDOW_SAMPLES
    frame_step = segmentation.FRAME_STEP_SAMPLES
    segments: List[SpeechSegment] = []
    for w in range(activity.shape[0]):
        act = activity[w]  # [F, 3]
        n_frames = act.shape[0]
        # active-speaker-set id per frame (0 = silence)
        set_id = act[:, 0] * 1 + act[:, 1] * 2 + act[:, 2] * 4
        start_f = 0
        for f in range(1, n_frames + 1):
            if f == n_frames or set_id[f] != set_id[start_f]:
                if set_id[start_f] != 0:
                    s0 = w * W + start_f * frame_step
                    s1 = w * W + f * frame_step
                    s0, s1 = min(s0, n), min(s1, n)
                    start_sec = s0 / SAMPLE_RATE
                    end_sec = s1 / SAMPLE_RATE
                    if end_sec - start_sec >= min_duration_s and s1 > s0:
                        segments.append(
                            SpeechSegment(
                                start=start_sec,
                                end=end_sec,
                                samples=x[s0:s1],
                            )
                        )
                start_f = f
    return segments


def cosine_similarity(a: np.ndarray, b: np.ndarray) -> float:
    na = np.linalg.norm(a)
    nb = np.linalg.norm(b)
    if na == 0 or nb == 0:
        return 0.0
    return float(np.dot(a, b) / (na * nb))


@dataclass
class Speaker:
    id: int
    centroid: np.ndarray
    count: int = 1


class EmbeddingManager:
    """Incremental cosine speaker clustering (pyannote-rs semantics).

    The reference's hot loop (`transcribe.rs:480-495`) calls
    `search_speaker(embedding, threshold)` until `max_speakers` is reached,
    then `get_best_speaker_match(embedding)`. Ids are 1-based.
    """

    def __init__(self, max_speakers: int):
        self.max_speakers = max_speakers
        self.speakers: Dict[int, Speaker] = {}

    def get_all_speakers(self) -> Dict[int, Speaker]:
        return self.speakers

    def _best(self, embedding: np.ndarray) -> Tuple[Optional[int], float]:
        best_id, best_sim = None, -1.0
        for sid, sp in self.speakers.items():
            sim = cosine_similarity(embedding, sp.centroid)
            if sim > best_sim:
                best_id, best_sim = sid, sim
        return best_id, best_sim

    def search_speaker(
        self, embedding: np.ndarray, threshold: float
    ) -> Optional[int]:
        """Assign to the best speaker above `threshold`, else create a new
        speaker when under the cap. Returns the speaker id or None."""
        embedding = np.asarray(embedding, np.float64)
        best_id, best_sim = self._best(embedding)
        if best_id is not None and best_sim >= threshold:
            sp = self.speakers[best_id]
            sp.centroid = (sp.centroid * sp.count + embedding) / (sp.count + 1)
            sp.count += 1
            return best_id
        if len(self.speakers) < self.max_speakers:
            new_id = len(self.speakers) + 1
            self.speakers[new_id] = Speaker(id=new_id, centroid=embedding.copy())
            return new_id
        return None

    def get_best_speaker_match(self, embedding: np.ndarray) -> Optional[int]:
        """Best existing speaker regardless of threshold (used at the
        max_speakers cap, `transcribe.rs:482-486`)."""
        best_id, _ = self._best(np.asarray(embedding, np.float64))
        return best_id


def spectral_cluster(
    embeddings: np.ndarray,  # [N, D]
    max_speakers: int = 8,
    min_speakers: int = 1,
) -> np.ndarray:
    """Offline spectral clustering with eigengap model selection.

    Cosine affinity -> row-normalized Laplacian -> k from the largest
    eigengap (capped to [min_speakers, max_speakers]) -> k-means on the
    spectral embedding. Returns labels [N] (0-based).
    """
    n = embeddings.shape[0]
    if n == 0:
        return np.zeros((0,), np.int64)
    if n == 1:
        return np.zeros((1,), np.int64)

    X = embeddings / np.maximum(np.linalg.norm(embeddings, axis=1, keepdims=True), 1e-9)
    A = np.clip(X @ X.T, 0.0, 1.0)
    np.fill_diagonal(A, 0.0)

    d = A.sum(1)
    d_inv = 1.0 / np.sqrt(np.maximum(d, 1e-9))
    L = np.eye(n) - d_inv[:, None] * A * d_inv[None, :]

    from scipy.linalg import eigh

    vals, vecs = eigh(L)
    kmax = min(max_speakers, n)
    gaps = np.diff(vals[: kmax + 1])
    k = int(np.argmax(gaps[min_speakers - 1 : kmax]) + min_speakers) if kmax > min_speakers else min_speakers
    k = max(min(k, kmax), min_speakers)

    V = vecs[:, :k]
    V = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-9)

    # lightweight k-means (k is small)
    rng = np.random.default_rng(0)
    centers = V[rng.choice(n, size=k, replace=False)]
    labels = np.zeros(n, np.int64)
    for _ in range(50):
        dist = ((V[:, None, :] - centers[None]) ** 2).sum(-1)
        new_labels = dist.argmin(1)
        if (new_labels == labels).all() and _ > 0:
            break
        labels = new_labels
        for c in range(k):
            sel = labels == c
            if sel.any():
                centers[c] = V[sel].mean(0)
    return labels
