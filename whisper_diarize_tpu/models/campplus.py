"""CAM++ speaker-embedding network in JAX.

Replaces the ONNX `wespeaker_en_voxceleb_CAM++.onnx` model the reference
runs through pyannote-rs/ONNX Runtime (`EmbeddingExtractor::compute`,
`/root/reference/src/transcribe.rs:343,466`; model URL `engine.rs:91`).

Architecture follows the public CAM++ design (D-TDNN with context-aware
masking):

  80-dim kaldi fbank (mean-normalized over time; `ops/mel.py::kaldi_fbank`
  replaces kaldi-native-fbank, SURVEY.md §2.4)
  → FCM: 2D conv stack over (time, freq) compressing the freq axis
  → 3 D-TDNN blocks (dense dilated conv1d layers with a CAM attention mask:
    sigmoid(MLP(global pooling + local segment pooling)) gating the features)
    with transition convs between blocks
  → global statistics pooling (mean ‖ std)
  → linear → 192-dim embedding.

Numeric parity with wespeaker requires converted weights (`load_params`);
random init validates shapes and exercises the full pipeline offline.
All convs map to MXU matmuls; a batch of variable-length segments is run
padded with a frame mask.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.mel import kaldi_fbank

N_MELS = 80
EMB_DIM = 192
FCM_CHANNELS = 32
INIT_CHANNELS = 128
GROWTH = 32  # dense-layer growth rate
BLOCK_LAYERS = (4, 6, 8)  # layers per D-TDNN block (compact config)
DILATIONS = (1, 2, 3)
SEG_POOL = 100  # frames per CAM local-context segment


def _conv2d(rng, cin, cout, k):
    return {
        "w": (rng.standard_normal((k, k, cin, cout)) * (k * k * cin) ** -0.5).astype(np.float32),
        "b": np.zeros((cout,), np.float32),
    }


def _conv1d(rng, cin, cout, k):
    return {
        "w": (rng.standard_normal((k, cin, cout)) * (k * cin) ** -0.5).astype(np.float32),
        "b": np.zeros((cout,), np.float32),
    }


def _lin(rng, n_in, n_out):
    return {
        "w": (rng.standard_normal((n_in, n_out)) * n_in ** -0.5).astype(np.float32),
        "b": np.zeros((n_out,), np.float32),
    }


def init_params(seed: int = 0) -> Dict[str, Any]:
    rng = np.random.default_rng(seed)
    params: Dict[str, Any] = {
        "fcm1": _conv2d(rng, 1, FCM_CHANNELS, 3),
        "fcm2": _conv2d(rng, FCM_CHANNELS, FCM_CHANNELS, 3),
    }
    fcm_out = FCM_CHANNELS * (N_MELS // 4)
    params["stem"] = _conv1d(rng, fcm_out, INIT_CHANNELS, 5)

    ch = INIT_CHANNELS
    blocks = []
    for bi, (n_layers, dil) in enumerate(zip(BLOCK_LAYERS, DILATIONS)):
        layers = []
        for li in range(n_layers):
            layers.append(
                {
                    "bottleneck": _conv1d(rng, ch, GROWTH * 2, 1),
                    "conv": _conv1d(rng, GROWTH * 2, GROWTH, 3),
                    # CAM: global + segment context -> sigmoid gate
                    "cam_g": _lin(rng, ch, GROWTH),
                    "cam_s": _lin(rng, ch, GROWTH),
                }
            )
            ch += GROWTH
        transition = _conv1d(rng, ch, ch // 2, 1)
        ch = ch // 2
        # dilation stays static (module constant DILATIONS), not in the pytree
        blocks.append({"layers": layers, "transition": transition})
    params["blocks"] = blocks
    params["proj"] = _lin(rng, ch * 2, EMB_DIM)  # mean||std stats pooling
    return jax.tree.map(
        lambda a: jnp.asarray(a) if isinstance(a, np.ndarray) else a, params
    )


def load_params(path: str) -> Dict[str, Any]:
    """Load converted wespeaker CAM++ weights (flat .npz with dotted keys)."""
    z = np.load(path, allow_pickle=True)
    out: Dict[str, Any] = {}
    for k in z.files:
        cur = out
        parts = k.split(".")
        for p in parts[:-1]:
            cur = cur.setdefault(p, {})
        cur[parts[-1]] = jnp.asarray(z[k])

    def listify(d):
        if isinstance(d, dict) and d and all(s.isdigit() for s in d):
            return [listify(d[str(i)]) for i in range(len(d))]
        if isinstance(d, dict):
            return {k: listify(v) for k, v in d.items()}
        return d

    return listify(out)


def _cam_gate(layer, x, mask):
    """Context-aware mask: sigmoid(global-context MLP + segment-context MLP).

    x [B, T, C]; mask [B, T, 1] — returns gate [B, T, GROWTH].
    """
    denom = jnp.maximum(mask.sum(axis=1, keepdims=True), 1.0)
    g = (x * mask).sum(axis=1, keepdims=True) / denom  # [B, 1, C]
    # segment pooling: average within fixed SEG_POOL-frame blocks
    B, T, C = x.shape
    n_seg = -(-T // SEG_POOL)
    pad = n_seg * SEG_POOL - T
    xp = jnp.pad(x * mask, ((0, 0), (0, pad), (0, 0)))
    mp = jnp.pad(mask, ((0, 0), (0, pad), (0, 0)))
    seg = xp.reshape(B, n_seg, SEG_POOL, C).sum(2) / jnp.maximum(
        mp.reshape(B, n_seg, SEG_POOL, 1).sum(2), 1.0
    )  # [B, n_seg, C]
    seg = jnp.repeat(seg, SEG_POOL, axis=1)[:, :T]  # [B, T, C]
    gate = jax.nn.sigmoid(
        (g @ layer["cam_g"]["w"] + layer["cam_g"]["b"])
        + (seg @ layer["cam_s"]["w"] + layer["cam_s"]["b"])
    )
    return gate


def _conv1d_apply(p, x, dilation=1):
    k = p["w"].shape[0]
    pad = (k - 1) * dilation // 2
    return jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(1,), padding=((pad, pad),),
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    ) + p["b"]


@jax.jit
def embed_from_fbank(params: Dict[str, Any], feats: jnp.ndarray,
                     mask: jnp.ndarray) -> jnp.ndarray:
    """feats [B, T, 80] mean-normalized fbank; mask [B, T] (1 = valid frame)
    -> embeddings [B, 192]."""
    B, T, _ = feats.shape
    m = mask[:, :, None].astype(feats.dtype)

    # FCM: 2D convs over (time, freq), stride 2 on freq
    x = feats[:, :, :, None]  # [B, T, F, 1]
    for name in ("fcm1", "fcm2"):
        x = jax.lax.conv_general_dilated(
            x, params[name]["w"], window_strides=(1, 2), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + params[name]["b"]
        x = jax.nn.relu(x)
    x = x.reshape(B, T, -1)  # [B, T, 32 * F/4]

    x = jax.nn.relu(_conv1d_apply(params["stem"], x))

    for block, dil in zip(params["blocks"], DILATIONS):
        for layer in block["layers"]:
            h = jax.nn.relu(_conv1d_apply(layer["bottleneck"], x))
            h = jax.nn.relu(_conv1d_apply(layer["conv"], h, dilation=dil))
            h = h * _cam_gate(layer, x, m)
            x = jnp.concatenate([x, h], axis=-1)  # dense connectivity
        x = _conv1d_apply(block["transition"], x)
        x = jax.nn.relu(x)

    # masked statistics pooling
    denom = jnp.maximum(m.sum(axis=1), 1.0)
    mean = (x * m).sum(axis=1) / denom
    var = (jnp.square(x - mean[:, None, :]) * m).sum(axis=1) / denom
    std = jnp.sqrt(var + 1e-7)
    stats = jnp.concatenate([mean, std], axis=-1)
    return stats @ params["proj"]["w"] + params["proj"]["b"]


def compute_embedding(params: Dict[str, Any], int_samples: np.ndarray) -> np.ndarray:
    """i16 samples (one segment) -> [192] embedding.

    Front-end parity with knf-rs: kaldi fbank on int16-scale floats, then
    per-utterance mean subtraction (wespeaker convention).
    """
    x = np.asarray(int_samples, np.float32)
    if x.shape[0] < 400:  # too short for one fbank frame: zero-pad
        x = np.pad(x, (0, 400 - x.shape[0]))
    feats = np.asarray(kaldi_fbank(x))  # [T, 80]
    feats = feats - feats.mean(axis=0, keepdims=True)
    f = jnp.asarray(feats)[None]
    mask = jnp.ones((1, feats.shape[0]), jnp.float32)
    return np.asarray(embed_from_fbank(params, f, mask))[0]


def compute_embeddings_batch(
    params: Dict[str, Any], segments: List[np.ndarray], max_frames: int = 1998
) -> np.ndarray:
    """Batched embedding over variable-length segments (padded + masked).

    This is the TPU path the Engine uses: one call per chunk batch instead of
    the reference's per-segment ONNX invocation (`transcribe.rs:466`).
    """
    feats_list = []
    lens = []
    for seg in segments:
        x = np.asarray(seg, np.float32)
        if x.shape[0] < 400:  # too short for one fbank frame: pad with zeros
            x = np.pad(x, (0, 400 - x.shape[0]))
        f = np.asarray(kaldi_fbank(x))
        f = f - f.mean(axis=0, keepdims=True)
        f = f[:max_frames]
        feats_list.append(f)
        lens.append(f.shape[0])
    T = max(lens)
    B = len(segments)
    batch = np.zeros((B, T, N_MELS), np.float32)
    mask = np.zeros((B, T), np.float32)
    for i, f in enumerate(feats_list):
        batch[i, : f.shape[0]] = f
        mask[i, : f.shape[0]] = 1.0
    return np.asarray(embed_from_fbank(params, jnp.asarray(batch), jnp.asarray(mask)))
