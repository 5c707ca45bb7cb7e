"""Fused Pallas log-mel frontend (framing + window + DFT + mel + log10).

The jnp reference path (`ops/mel.py`) gathers the framed signal
[B, 3000, 400] f32 (~7.7 GB at batch 16) before its DFT matmuls. This kernel
avoids that blow-up with a layout trick: at hop 160, one 160-sample row per
frame — viewing padded audio as [B, rows, 160], frame i is row i ‖ row i+1 ‖
the first half of row i+2. XLA materializes three row-shifted views (3x the
audio, ~2 MB per 30 s window instead of ~480 MB of frames), and the kernel
processes [TILE_F, 160] blocks of each view per grid step:

  windowed DFT = three accumulated MXU matmuls against the row-split DFT
  bases (window rows 0-160 / 160-320 / 320-400 zero-padded to 480), then
  |.|^2 -> mel filterbank matmul -> log10, writing one [TILE_F, n_mels] tile.

Everything is standard BlockSpec pipelining (no manual DMA), so Mosaic
double-buffers the audio blocks while the MXU works.

Whisper's dynamic-range normalization (clamp to global max - 8, then
(x+4)/4) needs a global max, so it stays in XLA where it fuses into the
consumer; the kernel emits raw log10 mel energies.

`log_mel_pallas` matches `ops/mel.py::log_mel_spectrogram` (see
tests/test_pallas_mel.py, interpret mode).

QUARANTINED to tools/ (VERDICT r3 Next #7): mel costs ~1.4 ms of a ~640 ms
large-v3 window, so the kernel has no product value, and its default MXU
f32 precision drifts from the XLA path on real TPUs — the product path is
always `ops/mel.py::log_mel_spectrogram` now. The kernel stays here (with
its parity test) as the reference fused-frontend design should mel ever
become a bottleneck (e.g. much shorter windows).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from whisper_diarize_tpu.ops.mel import (
    HOP_LENGTH, N_FFT, _dft_bases, mel_filterbank)

TILE_F = 200  # frames per grid step (3000 % 200 == 0; % 8 == 0 for tiling)
ROW = HOP_LENGTH  # 160 samples per row; window 400 = 2.5 rows


@functools.lru_cache(maxsize=4)
def _split_bases():
    """DFT bases split by window thirds: six [160, 201] f32 matrices
    (cos/sin x three spans; the last span zero-padded from 80 rows)."""
    C, S = _dft_bases(N_FFT, "hann")

    def third(M, j):
        part = M[j * ROW : (j + 1) * ROW]
        if part.shape[0] < ROW:
            part = np.concatenate(
                [part, np.zeros((ROW - part.shape[0], M.shape[1]), M.dtype)]
            )
        return np.ascontiguousarray(part)

    return tuple(third(C, j) for j in range(3)) + tuple(third(S, j) for j in range(3))


def _mel_kernel(a_ref, b_ref, c_ref, c0, c1, c2, s0, s1, s2, fb_ref, out_ref):
    f32 = jnp.float32
    a, b, c = a_ref[0], b_ref[0], c_ref[0]  # [TILE_F, 160] each
    re = (
        jnp.dot(a, c0[:], preferred_element_type=f32)
        + jnp.dot(b, c1[:], preferred_element_type=f32)
        + jnp.dot(c, c2[:], preferred_element_type=f32)
    )
    im = (
        jnp.dot(a, s0[:], preferred_element_type=f32)
        + jnp.dot(b, s1[:], preferred_element_type=f32)
        + jnp.dot(c, s2[:], preferred_element_type=f32)
    )
    power = re * re + im * im  # [TILE_F, 201]
    mel = jnp.dot(power, fb_ref[:], preferred_element_type=f32)
    out_ref[0] = jnp.log10(jnp.maximum(mel, 1e-10))


@functools.partial(jax.jit, static_argnames=("n_mels", "interpret"))
def log_mel_pallas(
    audio: jnp.ndarray, n_mels: int = 80, interpret: bool = False
) -> jnp.ndarray:
    """audio [B, T] f32 -> whisper log-mel [B, n_mels, T//160]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if audio.ndim == 1:
        audio = audio[None]
    B, T = audio.shape
    n_frames = T // HOP_LENGTH
    n_tiles = -(-n_frames // TILE_F)
    grid_frames = n_tiles * TILE_F

    # center reflect padding (200 each side), then zero-pad to the row grid
    pad_l = N_FFT // 2
    x = jnp.pad(audio, ((0, 0), (pad_l, pad_l)), mode="reflect")
    total_rows = grid_frames + 2
    need = total_rows * ROW
    x = jnp.pad(x, ((0, 0), (0, max(0, need - x.shape[1]))))
    x = x[:, :need].reshape(B, total_rows, ROW)

    # three row-shifted views: frame i = av[i] ‖ bv[i] ‖ cv[i][:80]
    av = x[:, 0:grid_frames]
    bv = x[:, 1 : grid_frames + 1]
    cv = x[:, 2 : grid_frames + 2]

    bases = _split_bases()  # c0 c1 c2 s0 s1 s2, each [160, 201]
    fb = mel_filterbank(n_mels).T  # [201, n_mels]

    audio_spec = pl.BlockSpec(
        (1, TILE_F, ROW), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        _mel_kernel,
        grid=(B, n_tiles),
        in_specs=[audio_spec] * 3 + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=pl.BlockSpec(
            (1, TILE_F, n_mels), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, grid_frames, n_mels), jnp.float32),
        interpret=interpret,
    )(av, bv, cv, *(jnp.asarray(m) for m in bases), jnp.asarray(fb))

    log_spec = out[:, :n_frames, :]
    maxv = jnp.max(log_spec, axis=(-2, -1), keepdims=True)
    log_spec = jnp.maximum(log_spec, maxv - 8.0)
    log_spec = (log_spec + 4.0) / 4.0
    return jnp.swapaxes(log_spec, -1, -2)  # [B, n_mels, n_frames]


def frontend(audio: jnp.ndarray, n_mels: int = 80) -> jnp.ndarray:
    """Backend-dispatching log-mel (kept for the parity test's API): the
    Pallas kernel on TPU with WDT_ENABLE_PALLAS=1, else the product XLA
    path (`ops/mel.py`)."""
    import os

    from whisper_diarize_tpu.ops.mel import log_mel_spectrogram

    if jax.default_backend() == "tpu" and os.environ.get("WDT_ENABLE_PALLAS") == "1":
        return log_mel_pallas(audio, n_mels=n_mels)
    return log_mel_spectrogram(audio, n_mels=n_mels)
