"""Silero-VAD-style voice activity detection network in JAX.

Replaces the whisper.cpp Silero v5.1.2 runner the reference drives through
FFI (`/root/reference/src/vad.rs:15-31`, model `ggml-silero-v5.1.2.bin` from
`model_manager.rs:303-319`). Architecture follows the public Silero v5
design: per 512-sample (32 ms at 16 kHz) chunk with 64 samples of left
context — magnitude STFT (256-point, hop 128) → 4-block Conv1d encoder →
LSTM cell → linear head → sigmoid speech probability.

TPU-first: the whole file is processed in ONE `lax.scan` over chunks
carrying (h, c, context); each scan step is a small batch of MXU matmuls,
and a batch axis [B, T] runs multiple streams at once. Weights load from an
.npz/.safetensors file via `load_params`; random init (for tests and
architecture validation) via `init_params`.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 16_000
CHUNK = 512  # samples per VAD frame (32 ms)
CONTEXT = 64  # left context samples
N_FFT = 256
HOP = 128
N_BINS = N_FFT // 2 + 1  # 129
HIDDEN = 128
_ENC_CHANNELS = [(N_BINS, 128), (128, 64), (64, 64), (64, 128)]
_KERNEL = 3


@functools.lru_cache(maxsize=1)
def _stft_bases() -> Tuple[np.ndarray, np.ndarray]:
    n = np.arange(N_FFT)[:, None]
    k = np.arange(N_BINS)[None, :]
    ang = -2.0 * np.pi * n * k / N_FFT
    win = np.hanning(N_FFT)
    return (
        (np.cos(ang) * win[:, None]).astype(np.float32),
        (np.sin(ang) * win[:, None]).astype(np.float32),
    )


def init_params(seed: int = 0) -> Dict[str, Any]:
    rng = np.random.default_rng(seed)

    def conv(cin, cout, k):
        return {
            "w": (rng.standard_normal((k, cin, cout)) * (k * cin) ** -0.5).astype(np.float32),
            "b": np.zeros((cout,), np.float32),
        }

    params = {
        "enc": [conv(cin, cout, _KERNEL) for cin, cout in _ENC_CHANNELS],
        "lstm": {
            # fused gates [input+hidden, 4*hidden] (i, f, g, o)
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
    """Load converted Silero weights from an .npz with keys
    enc{i}_w/enc{i}_b, lstm_w/lstm_b, head_w/head_b."""
    z = np.load(path)
    params = {
        "enc": [
            {"w": z[f"enc{i}_w"], "b": z[f"enc{i}_b"]} for i in range(len(_ENC_CHANNELS))
        ],
        "lstm": {"w": z["lstm_w"], "b": z["lstm_b"]},
        "head": {"w": z["head_w"], "b": z["head_b"]},
    }
    return jax.tree.map(jnp.asarray, params)


def _chunk_features(chunk_with_ctx: jnp.ndarray) -> jnp.ndarray:
    """[B, CONTEXT+CHUNK] -> [B, frames, N_BINS] magnitude STFT."""
    C, S = _stft_bases()
    n_frames = (CONTEXT + CHUNK - N_FFT) // HOP + 1  # 3
    idx = jnp.arange(n_frames)[:, None] * HOP + jnp.arange(N_FFT)[None, :]
    frames = chunk_with_ctx[:, idx]  # [B, F, N_FFT]
    re = frames @ jnp.asarray(C)
    im = frames @ jnp.asarray(S)
    return jnp.sqrt(re * re + im * im + 1e-12)


def _encoder(params, feats: jnp.ndarray) -> jnp.ndarray:
    """[B, F, N_BINS] -> [B, HIDDEN] (convs over the frame axis + mean pool)."""
    x = feats
    for blk in params["enc"]:
        x = jax.lax.conv_general_dilated(
            x, blk["w"], window_strides=(1,), padding=((1, 1),),
            dimension_numbers=("NWC", "WIO", "NWC"),
        ) + blk["b"]
        x = jax.nn.relu(x)
    return jnp.mean(x, axis=1)


def _lstm_cell(params, x, h, c):
    z = jnp.concatenate([x, h], axis=-1) @ params["w"] + params["b"]
    i, f, g, o = jnp.split(z, 4, axis=-1)
    c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h = jax.nn.sigmoid(o) * jnp.tanh(c)
    return h, c


@jax.jit
def speech_probs(params: Dict[str, Any], audio: jnp.ndarray) -> jnp.ndarray:
    """audio [B, T] float32 in [-1, 1] -> per-chunk speech probability
    [B, ceil(T/512)] (the tail chunk is zero-padded)."""
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

    def step(carry, xt):
        h, c = carry
        feats = _chunk_features(xt)  # xt [B, CONTEXT+CHUNK]
        e = _encoder(params, feats)
        h, c = _lstm_cell(params["lstm"], e, h, c)
        p = jax.nn.sigmoid(h @ params["head"]["w"] + params["head"]["b"])[:, 0]
        return (h, c), p

    h0 = jnp.zeros((B, HIDDEN), jnp.float32)
    c0 = jnp.zeros((B, HIDDEN), jnp.float32)
    _, probs = jax.lax.scan(step, (h0, c0), jnp.swapaxes(stacked, 0, 1))
    return jnp.swapaxes(probs, 0, 1)  # [B, N]
