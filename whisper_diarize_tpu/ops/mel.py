"""Audio feature frontends: Whisper log-mel spectrogram and Kaldi-style fbank.

Replaces two native components of the reference (SURVEY.md §2.4):

* whisper.cpp's C++ log-mel frontend (consumed via `state.full`,
  `/root/reference/src/transcribe.rs:389`) — here `log_mel_spectrogram`,
  matching openai-whisper's geometry: n_fft=400, hop=160, periodic Hann,
  center reflect padding, drop-last-frame, power mel, log10, dynamic-range
  clamp to (max - 8), then (x + 4) / 4.
* kaldi-native-fbank (knf-rs, feeding the CAM++ speaker-embedding net) —
  here `kaldi_fbank`: 25 ms/10 ms frames, snip-edges, DC removal,
  preemphasis 0.97, Povey window, 512-point FFT, HTK-mel filterbank, log.

TPU-first design: the rFFT is expressed as two real matmuls against
precomputed DFT bases so the whole frontend — framing, window, DFT, power,
mel projection — runs on the MXU as a chain of GEMMs that XLA fuses, instead
of scalar FFT butterflies. A fused Pallas kernel for the same computation is quarantined in
`tools/pallas_mel.py` (mel is ~1.4 ms of a ~640 ms window — no product
value); this module is the product path on every backend.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 16_000
N_FFT = 400
HOP_LENGTH = 160
CHUNK_LENGTH = 30  # seconds per whisper window
N_SAMPLES = CHUNK_LENGTH * SAMPLE_RATE  # 480_000
N_FRAMES = N_SAMPLES // HOP_LENGTH  # 3000


# --------------------------------------------------------------------------
# Filterbank construction (host-side numpy, cached)
# --------------------------------------------------------------------------

def _hz_to_mel_slaney(f: np.ndarray) -> np.ndarray:
    """Slaney mel scale (librosa default): linear below 1 kHz, log above."""
    f = np.asarray(f, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (f - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    above = f >= min_log_hz
    mels = np.where(above, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mels)
    return mels


def _mel_to_hz_slaney(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * m
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    above = m >= min_log_mel
    freqs = np.where(above, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)
    return freqs


@functools.lru_cache(maxsize=8)
def mel_filterbank(
    n_mels: int = 80,
    n_fft: int = N_FFT,
    sr: int = SAMPLE_RATE,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
    htk: bool = False,
    norm_slaney: bool = True,
) -> np.ndarray:
    """Triangular mel filterbank [n_mels, n_fft//2 + 1].

    Defaults reproduce librosa's `filters.mel` with slaney scale + slaney
    area normalization — the filters baked into openai-whisper's
    mel_filters.npz asset.
    """
    fmax = fmax if fmax is not None else sr / 2.0
    n_bins = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sr / 2.0, n_bins)

    if htk:
        def to_mel(f):
            return 2595.0 * np.log10(1.0 + np.asarray(f, np.float64) / 700.0)

        def to_hz(m):
            return 700.0 * (10.0 ** (np.asarray(m, np.float64) / 2595.0) - 1.0)
    else:
        to_mel, to_hz = _hz_to_mel_slaney, _mel_to_hz_slaney

    mel_pts = np.linspace(to_mel(fmin), to_mel(fmax), n_mels + 2)
    hz_pts = to_hz(mel_pts)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]

    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    if norm_slaney:
        enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
        weights *= enorm[:, None]
    return weights.astype(np.float32)


@functools.lru_cache(maxsize=8)
def _dft_bases(n_fft: int, window: str) -> tuple:
    """Real-DFT bases, window already folded in: returns (C, S) each
    [n_fft, n_fft//2+1] such that for a frame x, Re = x @ C, Im = x @ S."""
    n_bins = n_fft // 2 + 1
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_bins)[None, :]
    ang = -2.0 * np.pi * n * k / n_fft
    if window == "hann":
        win = 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n_fft) / n_fft))  # periodic
    elif window == "povey":
        w = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n_fft) / (n_fft - 1))  # symmetric hann
        win = w ** 0.85
    elif window == "ones":
        win = np.ones(n_fft)
    else:
        raise ValueError(window)
    C = (np.cos(ang) * win[:, None]).astype(np.float32)
    S = (np.sin(ang) * win[:, None]).astype(np.float32)
    return C, S


def frame_signal(x: jnp.ndarray, frame_len: int, hop: int, n_frames: int) -> jnp.ndarray:
    """[..., T] -> [..., n_frames, frame_len] via strided gather."""
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(frame_len)[None, :]
    return x[..., idx]


# --------------------------------------------------------------------------
# Whisper log-mel
# --------------------------------------------------------------------------

@functools.lru_cache(maxsize=4)
def _split_hann_bases():
    """Hann DFT bases split by window thirds (160/160/80->160 rows): the
    hop-160 framing then needs no gather — frame i is row i ‖ row i+1 ‖ the
    first half of row i+2 of the [rows, 160] audio view, so the windowed DFT
    is three accumulated GEMMs on contiguous reshapes (same trick as the
    quarantined Pallas kernel in tools/pallas_mel.py)."""
    C, S = _dft_bases(N_FFT, "hann")

    def third(M, j):
        part = M[j * HOP_LENGTH : (j + 1) * HOP_LENGTH]
        if part.shape[0] < HOP_LENGTH:
            part = np.concatenate(
                [part, np.zeros((HOP_LENGTH - part.shape[0], M.shape[1]), M.dtype)]
            )
        return np.ascontiguousarray(part)

    return tuple(third(C, j) for j in range(3)) + tuple(third(S, j) for j in range(3))


@functools.partial(jax.jit, static_argnames=("n_mels", "n_frames"))
def _log_mel_impl(audio: jnp.ndarray, mel_fb_t: jnp.ndarray, n_mels: int, n_frames: int) -> jnp.ndarray:
    # center=True reflect padding by n_fft//2 on both sides, then zero-pad so
    # the row view covers the last frame's 400-sample window
    pad = N_FFT // 2
    x = jnp.pad(audio, [(0, 0)] * (audio.ndim - 1) + [(pad, pad)], mode="reflect")
    squeeze = x.ndim == 1
    if squeeze:
        x = x[None]
    B = x.shape[0]
    total_rows = n_frames + 2
    need = total_rows * HOP_LENGTH
    x = jnp.pad(x, ((0, 0), (0, max(0, need - x.shape[-1]))))[:, :need]
    rows = x.reshape(B, total_rows, HOP_LENGTH)
    a = rows[:, 0:n_frames]            # frame samples +0..160
    b = rows[:, 1 : n_frames + 1]      # +160..320
    c = rows[:, 2 : n_frames + 2]      # +320..480 (basis rows 400+ are zero)

    c0, c1, c2, s0, s1, s2 = (jnp.asarray(m) for m in _split_hann_bases())
    # full f32 MXU passes: the log10 + dynamic-range clamp amplify bf16 error
    hi = jax.lax.Precision.HIGHEST
    re = (
        jnp.matmul(a, c0, precision=hi)
        + jnp.matmul(b, c1, precision=hi)
        + jnp.matmul(c, c2, precision=hi)
    )  # [B, F, 201]
    im = (
        jnp.matmul(a, s0, precision=hi)
        + jnp.matmul(b, s1, precision=hi)
        + jnp.matmul(c, s2, precision=hi)
    )
    power = re * re + im * im
    mel = jnp.matmul(power, mel_fb_t, precision=hi)  # [B, F, n_mels]
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    maxv = jnp.max(log_spec, axis=(-2, -1), keepdims=True)
    log_spec = jnp.maximum(log_spec, maxv - 8.0)
    log_spec = (log_spec + 4.0) / 4.0
    out = jnp.swapaxes(log_spec, -1, -2)  # [B, n_mels, F]
    return out[0] if squeeze else out


def log_mel_spectrogram(
    audio: jnp.ndarray,
    n_mels: int = 80,
    padding: int = 0,
) -> jnp.ndarray:
    """Whisper-geometry log-mel. audio: float32 [-1,1], shape [T] or [B, T].

    Returns [n_mels, T//160] (or batched). With `padding=N_SAMPLES - T` this
    produces the standard 30 s / 3000-frame encoder input.
    """
    audio = jnp.asarray(audio, dtype=jnp.float32)
    if padding > 0:
        audio = jnp.pad(audio, [(0, 0)] * (audio.ndim - 1) + [(0, padding)])
    n_frames = audio.shape[-1] // HOP_LENGTH  # whisper drops the last frame
    fb = jnp.asarray(mel_filterbank(n_mels).T)  # [201, n_mels]
    return _log_mel_impl(audio, fb, n_mels, n_frames)


# --------------------------------------------------------------------------
# Kaldi-style fbank (feeds the CAM++ speaker-embedding net; replaces knf-rs)
# --------------------------------------------------------------------------

KALDI_FRAME_LEN = 400  # 25 ms
KALDI_FRAME_SHIFT = 160  # 10 ms
KALDI_N_FFT = 512


@functools.partial(jax.jit, static_argnames=("n_mels", "n_frames"))
def _fbank_impl(audio: jnp.ndarray, fb_t: jnp.ndarray, n_mels: int, n_frames: int) -> jnp.ndarray:
    frames = frame_signal(audio, KALDI_FRAME_LEN, KALDI_FRAME_SHIFT, n_frames)
    # remove DC offset per frame
    frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    # preemphasis 0.97 (kaldi: first sample subtracts itself * coeff)
    prev = jnp.concatenate([frames[..., :1], frames[..., :-1]], axis=-1)
    frames = frames - 0.97 * prev
    C, S = _dft_bases(KALDI_N_FFT, "povey")
    # zero-pad each 400-sample frame to 512 implicitly by truncating bases
    hi = jax.lax.Precision.HIGHEST
    re = jnp.matmul(frames, jnp.asarray(C[:KALDI_FRAME_LEN]), precision=hi)
    im = jnp.matmul(frames, jnp.asarray(S[:KALDI_FRAME_LEN]), precision=hi)
    power = re * re + im * im
    mel = jnp.matmul(power, fb_t, precision=hi)
    return jnp.log(jnp.maximum(mel, 1.1920928955078125e-07))  # kaldi epsilon


def kaldi_fbank(audio: jnp.ndarray, n_mels: int = 80) -> jnp.ndarray:
    """Kaldi-compatible log-mel fbank (snip_edges=True, no dither).

    audio: int16-scale float (kaldi convention multiplies [-1,1] by 32768) or
    [-1,1] floats — CAM++ embeddings are scale-sensitive, so pass int16-scale
    values (i.e. raw PCM cast to float) for parity with knf-rs defaults.
    Returns [..., n_frames, n_mels].
    """
    audio = jnp.asarray(audio, dtype=jnp.float32)
    n = audio.shape[-1]
    if n < KALDI_FRAME_LEN:
        raise ValueError(f"audio too short for fbank: {n} < {KALDI_FRAME_LEN}")
    n_frames = 1 + (n - KALDI_FRAME_LEN) // KALDI_FRAME_SHIFT
    # kaldi MelBanksOptions defaults: low_freq=20, high_freq=0 meaning
    # "Nyquist + 0" — knf-rs / the wespeaker CAM++ pipeline use these
    # defaults, so fmax is the full Nyquist (ADVICE r1)
    fb = mel_filterbank(
        n_mels, n_fft=KALDI_N_FFT, htk=True, norm_slaney=False, fmin=20.0,
        fmax=SAMPLE_RATE / 2.0,
    )
    return _fbank_impl(audio, jnp.asarray(fb.T), n_mels, n_frames)
