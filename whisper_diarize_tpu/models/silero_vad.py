"""Silero-VAD v5 voice activity detection network in JAX.

Replaces the whisper.cpp Silero v5.1.2 runner the reference drives through
FFI (`/root/reference/src/vad.rs:15-31`, model `ggml-silero-v5.1.2.bin` from
`model_manager.rs:303-319`).

Op graph matches the upstream v5 checkpoint (the same tensors whisper.cpp's
GGML converter maps — `_model.stft.forward_basis_buffer`,
`_model.encoder.{0..3}.reparam_conv`, `_model.decoder.rnn`,
`_model.decoder.decoder.2`), per 512-sample (32 ms at 16 kHz) chunk with 64
samples of carried left context:

  [context(64) ‖ chunk(512)] -> reflect-pad 64 on the left (640 samples)
  -> STFT basis conv (256-tap filters from the checkpoint, hop 128):
     4 frames x 258 channels; rows 0..128 real, 129..257 imag -> magnitude
  -> encoder: 4x (Conv1d k3 pad 1 + ReLU) with strides (1, 2, 2, 1) and
     channels 129 -> 128 -> 64 -> 64 -> 128; time 4 -> 4 -> 2 -> 1 -> 1
  -> LSTM cell (128 -> 128), state carried across chunks
  -> head: ReLU -> Conv1d(128 -> 1, k1) -> sigmoid speech probability.

TPU-first: the whole file is processed in ONE `lax.scan` over chunks
carrying (h, c); each scan step is a small batch of MXU matmuls, and a batch
axis [B, T] runs multiple streams at once. Weights load from a converted
.npz via `load_params` (`tools/convert_models.py::convert_silero` maps every
upstream tensor); random init (for tests and architecture validation) via
`init_params`.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 16_000
CHUNK = 512  # samples per VAD frame (32 ms)
CONTEXT = 64  # left context samples carried from the previous chunk
N_FFT = 256
HOP = 128
N_BINS = N_FFT // 2 + 1  # 129
STFT_PAD = 64  # reflect pad applied left of [context ‖ chunk]
N_FRAMES = (CONTEXT + CHUNK + STFT_PAD - N_FFT) // HOP + 1  # 4
HIDDEN = 128
_ENC_CHANNELS = [(N_BINS, 128), (128, 64), (64, 64), (64, 128)]
_ENC_STRIDES = (1, 2, 2, 1)
_KERNEL = 3


@functools.lru_cache(maxsize=1)
def _default_stft_basis() -> np.ndarray:
    """Hann-windowed DFT basis [N_FFT, 2*N_BINS] (random-init stand-in for
    the checkpoint's forward_basis_buffer)."""
    n = np.arange(N_FFT)[:, None]
    k = np.arange(N_BINS)[None, :]
    ang = -2.0 * np.pi * n * k / N_FFT
    win = np.hanning(N_FFT)[:, None]
    return np.concatenate(
        [np.cos(ang) * win, np.sin(ang) * win], axis=1
    ).astype(np.float32)


def init_params(seed: int = 0) -> Dict[str, Any]:
    rng = np.random.default_rng(seed)

    def conv(cin, cout, k):
        return {
            "w": (rng.standard_normal((k, cin, cout)) * (k * cin) ** -0.5).astype(np.float32),
            "b": np.zeros((cout,), np.float32),
        }

    params = {
        "stft": _default_stft_basis(),  # [256, 258]
        "enc": [conv(cin, cout, _KERNEL) for cin, cout in _ENC_CHANNELS],
        "lstm": {
            # fused gates [input+hidden, 4*hidden] (torch order: i, f, g, o)
            "w": (rng.standard_normal((HIDDEN + HIDDEN, 4 * HIDDEN)) * HIDDEN ** -0.5).astype(np.float32),
            "b": np.zeros((4 * HIDDEN,), np.float32),
        },
        "head": {
            "w": (rng.standard_normal((HIDDEN, 1)) * HIDDEN ** -0.5).astype(np.float32),
            "b": np.zeros((1,), np.float32),
        },
    }
    return jax.tree.map(jnp.asarray, params)


def load_params(path: str) -> Dict[str, Any]:
    """Load converted Silero weights from an .npz with keys stft_basis,
    enc{i}_w/enc{i}_b, lstm_w/lstm_b, head_w/head_b."""
    z = np.load(path)
    params = {
        "stft": (
            z["stft_basis"] if "stft_basis" in z.files else _default_stft_basis()
        ),
        "enc": [
            {"w": z[f"enc{i}_w"], "b": z[f"enc{i}_b"]} for i in range(len(_ENC_CHANNELS))
        ],
        "lstm": {"w": z["lstm_w"], "b": z["lstm_b"]},
        "head": {"w": z["head_w"], "b": z["head_b"]},
    }
    return jax.tree.map(jnp.asarray, params)


def _chunk_features(
    basis: jnp.ndarray, chunk_with_ctx: jnp.ndarray, pad_mode: str = "left"
) -> jnp.ndarray:
    """[B, CONTEXT+CHUNK] -> [B, N_FRAMES, N_BINS] magnitude STFT.

    Reflect-pads 64 samples (the upstream STFT module), frames with hop 128
    and applies the checkpoint's basis conv; rows split into real/imag
    halves -> magnitude.

    RESIDUAL-RISK TOGGLE (VERDICT r3 item 9 / docs/PARITY.md): the upstream
    v5 TorchScript binary has never been executed here, and the pad
    convention comes from documented reimplementations. `pad_mode` selects
    it explicitly so `evals/parity.py silero` can A/B every candidate
    against the real checkpoint in one command:
      "left" (default) — ReflectionPad 64 on the left of [context ‖ chunk];
      "both" — ReflectionPad1d(64) on BOTH sides. NOTE: proven output-
               identical to "left" at this geometry (the 4 frames read
               padded offsets 0/128/256/384, never the right pad —
               `tests/test_vad.py::test_speech_probs_pad_mode_toggle`), so
               a left-vs-both upstream mismatch CANNOT be the source of a
               parity failure; kept so the A/B documents that.
      "zero" — zero-pad 64 on the left (the other plausible mode).
    WDT_SILERO_STFT_PAD overrides the default process-wide.
    """
    if pad_mode == "both":
        x = jnp.pad(chunk_with_ctx, ((0, 0), (STFT_PAD, STFT_PAD)),
                    mode="reflect")
    elif pad_mode == "left":
        x = jnp.pad(chunk_with_ctx, ((0, 0), (STFT_PAD, 0)), mode="reflect")
    elif pad_mode == "zero":
        x = jnp.pad(chunk_with_ctx, ((0, 0), (STFT_PAD, 0)))
    else:
        raise ValueError(f"unknown silero STFT pad_mode: {pad_mode!r}")
    idx = jnp.arange(N_FRAMES)[:, None] * HOP + jnp.arange(N_FFT)[None, :]
    frames = x[:, idx]  # [B, F, N_FFT]
    spec = frames @ basis  # [B, F, 258]
    re = spec[..., :N_BINS]
    im = spec[..., N_BINS:]
    return jnp.sqrt(re * re + im * im + 1e-12)


def _encoder(params, feats: jnp.ndarray) -> jnp.ndarray:
    """[B, N_FRAMES, N_BINS] -> [B, HIDDEN]: 4 convs over the frame axis with
    strides (1, 2, 2, 1) collapse time 4 -> 1 (no pooling)."""
    x = feats
    for blk, stride in zip(params["enc"], _ENC_STRIDES):
        x = jax.lax.conv_general_dilated(
            x, blk["w"], window_strides=(stride,), padding=((1, 1),),
            dimension_numbers=("NWC", "WIO", "NWC"),
        ) + blk["b"]
        x = jax.nn.relu(x)
    return x[:, 0, :]  # time axis is length 1 after the strided convs


def _lstm_cell(params, x, h, c):
    z = jnp.concatenate([x, h], axis=-1) @ params["w"] + params["b"]
    i, f, g, o = jnp.split(z, 4, axis=-1)
    c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h = jax.nn.sigmoid(o) * jnp.tanh(c)
    return h, c


def speech_probs(
    params: Dict[str, Any], audio: jnp.ndarray, pad_mode: str | None = None
) -> jnp.ndarray:
    """audio [B, T] float32 in [-1, 1] -> per-chunk speech probability
    [B, ceil(T/512)] (the tail chunk is zero-padded).

    `pad_mode` selects the STFT pad convention (`_chunk_features`); None
    reads WDT_SILERO_STFT_PAD (default "left")."""
    if pad_mode is None:
        import os

        pad_mode = os.environ.get("WDT_SILERO_STFT_PAD", "left")
    return _speech_probs(params, audio, pad_mode)


@functools.partial(jax.jit, static_argnames=("pad_mode",))
def _speech_probs(
    params: Dict[str, Any], audio: jnp.ndarray, pad_mode: str = "left"
) -> jnp.ndarray:
    if audio.ndim == 1:
        audio = audio[None]
    B, T = audio.shape
    n_chunks = -(-T // CHUNK)
    pad = n_chunks * CHUNK - T
    x = jnp.pad(audio, ((0, 0), (CONTEXT, pad)))
    chunks = x[:, CONTEXT:].reshape(B, n_chunks, CHUNK)
    # left context for chunk i = last CONTEXT samples before it
    ctx_idx = jnp.arange(n_chunks)[:, None] * CHUNK + jnp.arange(CONTEXT)[None, :]
    contexts = x[:, ctx_idx]  # [B, n_chunks, CONTEXT]
    stacked = jnp.concatenate([contexts, chunks], axis=-1)  # [B, N, CONTEXT+CHUNK]

    basis = params["stft"]

    def step(carry, xt):
        h, c = carry
        feats = _chunk_features(basis, xt, pad_mode)  # xt [B, CONTEXT+CHUNK]
        e = _encoder(params, feats)
        h, c = _lstm_cell(params["lstm"], e, h, c)
        # decoder head: Dropout(eval no-op) -> ReLU -> Conv1d(128->1) -> sigmoid
        p = jax.nn.sigmoid(
            jax.nn.relu(h) @ params["head"]["w"] + params["head"]["b"]
        )[:, 0]
        return (h, c), p

    h0 = jnp.zeros((B, HIDDEN), jnp.float32)
    c0 = jnp.zeros((B, HIDDEN), jnp.float32)
    _, probs = jax.lax.scan(step, (h0, c0), jnp.swapaxes(stacked, 0, 1))
    return jnp.swapaxes(probs, 0, 1)  # [B, N]
