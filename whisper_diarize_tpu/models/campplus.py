"""CAM++ speaker-embedding network in JAX — the real wespeaker topology.

Replaces the ONNX `wespeaker_en_voxceleb_CAM++.onnx` model the reference
runs through pyannote-rs/ONNX Runtime (`EmbeddingExtractor::compute`,
`/root/reference/src/transcribe.rs:343,466`; model URL `engine.rs:91`).

Architecture matches the public CAM++ implementation (modelscope
3D-Speaker `speakerlab/models/campplus/DTDNN.py`, vendored unchanged by
wespeaker, which is what the upstream ONNX was exported from):

  80-dim kaldi fbank, per-utterance mean-normalized (`ops/mel.py::kaldi_fbank`
  replaces kaldi-native-fbank, SURVEY.md §2.4)
  -> FCM head: Conv2d(1->32, 3x3) + BN + ReLU, two residual stages of two
     BasicResBlocks each (stride 2 on the freq axis), Conv2d stride (2,1)
     + BN + ReLU; freq 80 -> 10, reshape to 320 channels over time
  -> TDNN stem: Conv1d(320->128, k5, stride 2) + BN + ReLU
  -> 3 CAM-Dense-TDNN blocks of (12, 24, 16) layers, kernel 3, dilations
     (1, 2, 2), growth 32, bottleneck 128. Each layer:
       BN+ReLU -> 1x1 conv (in->128, no bias) -> BN+ReLU -> CAM layer:
       local = Conv1d(128->32, k3, dilated);
       context = mean_t(x) + seg_avg_pool_100(x);
       gate = sigmoid(W2 relu(W1 context)); out = local * gate
     outputs concatenate densely; after each block a transit layer
     (BN+ReLU + 1x1 conv, no bias) halves channels: 512->256, 1024->512,
     1024->512
  -> BN+ReLU -> statistics pooling (mean ‖ std over time) -> 1024
  -> dense: 1x1 conv (no bias) + BatchNorm(affine=False) -> 192-dim embedding
     (wespeaker voxceleb config; modelscope ships 512).

All BatchNorms run in eval mode (eps 1e-5) with explicit
gamma/beta/mean/var parameters so converted upstream weights load 1:1
(`tools/convert_models.py::convert_campplus` maps every tensor).

TPU notes: convs are NWC/NHWC lax convs (MXU matmuls); a batch of
variable-length segments runs padded with a frame mask — the mask gates the
CAM global context, the segment pooling and the final stats pool. Conv
receptive fields near the pad boundary see zeros (the upstream runs each
segment alone); the effect is limited to the last ~30 frames of a segment
and does not move cosine similarities materially.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.mel import kaldi_fbank

N_MELS = 80
EMB_DIM = 192  # wespeaker voxceleb CAM++ embedding size
M_CHANNELS = 32  # FCM channel width
INIT_CHANNELS = 128  # TDNN stem output channels
GROWTH = 32  # dense-layer growth rate
BN_CHANNELS = 128  # bottleneck width (bn_size 4 * growth 32)
BLOCK_LAYERS = (12, 24, 16)  # layers per CAM-Dense-TDNN block
DILATIONS = (1, 2, 2)
SEG_POOL = 100  # frames per CAM segment pooling window
BN_EPS = 1e-5


# --------------------------------------------------------------------------
# init
# --------------------------------------------------------------------------

def _bn(rng, c):
    return {
        "g": np.ones((c,), np.float32),
        "b": np.zeros((c,), np.float32),
        "m": np.zeros((c,), np.float32),
        "v": np.ones((c,), np.float32),
    }


def _conv2d_w(rng, cin, cout, k):
    return (rng.standard_normal((k, k, cin, cout)) * (k * k * cin) ** -0.5).astype(np.float32)


def _conv1d_w(rng, cin, cout, k):
    return (rng.standard_normal((k, cin, cout)) * (k * cin) ** -0.5).astype(np.float32)


def _res_block(rng, cin, cout, stride):
    blk = {
        "conv1_w": _conv2d_w(rng, cin, cout, 3),
        "bn1": _bn(rng, cout),
        "conv2_w": _conv2d_w(rng, cout, cout, 3),
        "bn2": _bn(rng, cout),
    }
    if stride != 1 or cin != cout:
        blk["sc_w"] = (rng.standard_normal((1, 1, cin, cout)) * cin ** -0.5).astype(np.float32)
        blk["sc_bn"] = _bn(rng, cout)
    return blk


def init_params(seed: int = 0, embed_dim: int = EMB_DIM) -> Dict[str, Any]:
    rng = np.random.default_rng(seed)
    fcm = {
        "conv1_w": _conv2d_w(rng, 1, M_CHANNELS, 3),
        "bn1": _bn(rng, M_CHANNELS),
        "layer1": [
            _res_block(rng, M_CHANNELS, M_CHANNELS, 2),
            _res_block(rng, M_CHANNELS, M_CHANNELS, 1),
        ],
        "layer2": [
            _res_block(rng, M_CHANNELS, M_CHANNELS, 2),
            _res_block(rng, M_CHANNELS, M_CHANNELS, 1),
        ],
        "conv2_w": _conv2d_w(rng, M_CHANNELS, M_CHANNELS, 3),
        "bn2": _bn(rng, M_CHANNELS),
    }
    fcm_out = M_CHANNELS * (N_MELS // 8)  # 320
    params: Dict[str, Any] = {
        "fcm": fcm,
        "tdnn": {"w": _conv1d_w(rng, fcm_out, INIT_CHANNELS, 5),
                 "bn": _bn(rng, INIT_CHANNELS)},
    }
    ch = INIT_CHANNELS
    blocks = []
    for n_layers in BLOCK_LAYERS:
        layers = []
        for _ in range(n_layers):
            layers.append({
                "bn1": _bn(rng, ch),
                "lin1_w": _conv1d_w(rng, ch, BN_CHANNELS, 1),
                "bn2": _bn(rng, BN_CHANNELS),
                "local_w": _conv1d_w(rng, BN_CHANNELS, GROWTH, 3),
                "cam1_w": _conv1d_w(rng, BN_CHANNELS, BN_CHANNELS // 2, 1),
                "cam1_b": np.zeros((BN_CHANNELS // 2,), np.float32),
                "cam2_w": _conv1d_w(rng, BN_CHANNELS // 2, GROWTH, 1),
                "cam2_b": np.zeros((GROWTH,), np.float32),
            })
            ch += GROWTH
        transit = {"bn": _bn(rng, ch), "w": _conv1d_w(rng, ch, ch // 2, 1)}
        ch //= 2
        blocks.append({"layers": layers, "transit": transit})
    params["blocks"] = blocks
    params["out_bn"] = _bn(rng, ch)
    params["dense"] = {
        "w": _conv1d_w(rng, ch * 2, embed_dim, 1),
        # BatchNorm1d(affine=False): running stats only
        "bn_m": np.zeros((embed_dim,), np.float32),
        "bn_v": np.ones((embed_dim,), np.float32),
    }
    return jax.tree.map(
        lambda a: jnp.asarray(a) if isinstance(a, np.ndarray) else a, params
    )


def load_params(path: str) -> Dict[str, Any]:
    """Load converted wespeaker CAM++ weights (flat .npz with dotted keys,
    written by `tools/convert_models.py::convert_campplus`)."""
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


# --------------------------------------------------------------------------
# forward
# --------------------------------------------------------------------------

def _apply_bn(bn, x):
    """Eval-mode BatchNorm over the channel (last) axis."""
    inv = jax.lax.rsqrt(bn["v"] + BN_EPS)
    return (x - bn["m"]) * inv * bn["g"] + bn["b"]


def _conv2d(x, w, strides):
    """x [B, F, T, C], w [kh, kw, in, out]; stride applies to (F, T)."""
    return jax.lax.conv_general_dilated(
        x, w, window_strides=strides, padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _conv1d(x, w, stride=1, dilation=1):
    k = w.shape[0]
    pad = (k - 1) * dilation // 2
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding=((pad, pad),),
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )


def _res_block_apply(blk, x, stride):
    out = jax.nn.relu(_apply_bn(blk["bn1"], _conv2d(x, blk["conv1_w"], (stride, 1))))
    out = _apply_bn(blk["bn2"], _conv2d(out, blk["conv2_w"], (1, 1)))
    if "sc_w" in blk:
        sc = jax.lax.conv_general_dilated(
            x, blk["sc_w"], window_strides=(stride, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        sc = _apply_bn(blk["sc_bn"], sc)
    else:
        sc = x
    return jax.nn.relu(out + sc)


def _fcm(params, feats):
    """feats [B, T, 80] -> [B, ceil stays T, 320] (freq 80 -> 10, x32 ch)."""
    x = jnp.transpose(feats, (0, 2, 1))[..., None]  # [B, F, T, 1]
    x = jax.nn.relu(_apply_bn(params["bn1"], _conv2d(x, params["conv1_w"], (1, 1))))
    for i, blk in enumerate(params["layer1"]):
        x = _res_block_apply(blk, x, 2 if i == 0 else 1)
    for i, blk in enumerate(params["layer2"]):
        x = _res_block_apply(blk, x, 2 if i == 0 else 1)
    x = jax.nn.relu(_apply_bn(params["bn2"], _conv2d(x, params["conv2_w"], (2, 1))))
    B, F, T, C = x.shape
    # torch reshapes (B, C, F', T) -> (B, C*F', T); channel-major ordering
    x = jnp.transpose(x, (0, 3, 1, 2)).reshape(B, C * F, T)
    return jnp.transpose(x, (0, 2, 1))  # [B, T, C*F]


def _seg_pool(x, mask):
    """Masked segment average pooling (torch avg_pool1d k=100 s=100 ceil),
    broadcast back over time. x [B, T, C]; mask [B, T, 1]."""
    B, T, C = x.shape
    n_seg = -(-T // SEG_POOL)
    pad = n_seg * SEG_POOL - T
    xp = jnp.pad(x * mask, ((0, 0), (0, pad), (0, 0)))
    mp = jnp.pad(mask, ((0, 0), (0, pad), (0, 0)))
    seg = xp.reshape(B, n_seg, SEG_POOL, C).sum(2) / jnp.maximum(
        mp.reshape(B, n_seg, SEG_POOL, 1).sum(2), 1.0
    )
    return jnp.repeat(seg, SEG_POOL, axis=1)[:, :T]


def _cam_layer(layer, x, mask, dilation):
    """CAM: local conv gated by sigmoid(MLP(global + segment context)).

    x [B, T, 128] (bottleneck features), mask [B, T, 1]."""
    local = _conv1d(x, layer["local_w"], dilation=dilation)  # [B, T, 32]
    denom = jnp.maximum(mask.sum(axis=1, keepdims=True), 1.0)
    g = (x * mask).sum(axis=1, keepdims=True) / denom  # [B, 1, 128]
    context = g + _seg_pool(x, mask)  # [B, T, 128]
    h = jax.nn.relu(context @ layer["cam1_w"][0] + layer["cam1_b"])
    gate = jax.nn.sigmoid(h @ layer["cam2_w"][0] + layer["cam2_b"])
    return local * gate


@jax.jit
def embed_from_fbank(params: Dict[str, Any], feats: jnp.ndarray,
                     mask: jnp.ndarray) -> jnp.ndarray:
    """feats [B, T, 80] mean-normalized fbank; mask [B, T] (1 = valid frame)
    -> embeddings [B, EMB_DIM]."""
    x = _fcm(params["fcm"], feats)  # [B, T, 320]

    # TDNN stem: k5 stride 2
    x = jax.nn.relu(_apply_bn(params["tdnn"]["bn"],
                              _conv1d(x, params["tdnn"]["w"], stride=2)))
    m = mask[:, ::2][:, : x.shape[1], None].astype(x.dtype)

    for block, dil in zip(params["blocks"], DILATIONS):
        for layer in block["layers"]:
            h = jax.nn.relu(_apply_bn(layer["bn1"], x))
            h = _conv1d(h, layer["lin1_w"])  # 1x1 bottleneck
            h = jax.nn.relu(_apply_bn(layer["bn2"], h))
            h = _cam_layer(layer, h, m, dil)
            x = jnp.concatenate([x, h], axis=-1)  # dense connectivity
        t = block["transit"]
        x = _conv1d(jax.nn.relu(_apply_bn(t["bn"], x)), t["w"])

    x = jax.nn.relu(_apply_bn(params["out_bn"], x))

    # masked statistics pooling (mean ‖ std); std is UNBIASED (n-1) like the
    # upstream StatsPool (torch.std default)
    denom = jnp.maximum(m.sum(axis=1), 1.0)
    mean = (x * m).sum(axis=1) / denom
    var = (jnp.square((x - mean[:, None, :]) * m)).sum(axis=1) / jnp.maximum(
        denom - 1.0, 1.0
    )
    std = jnp.sqrt(jnp.maximum(var, 1e-10))
    stats = jnp.concatenate([mean, std], axis=-1)  # [B, 1024]

    d = params["dense"]
    emb = stats @ d["w"][0]
    return (emb - d["bn_m"]) * jax.lax.rsqrt(d["bn_v"] + BN_EPS)


MAX_EMBED_FRAMES = 1998  # ~20 s of fbank context per embedding


@jax.jit
def embed_from_audio(params: Dict[str, Any], audio: jnp.ndarray,
                     n_valid: jnp.ndarray) -> jnp.ndarray:
    """FULLY ON-DEVICE embedding: audio [B, T] float32 in [-1, 1] (the same
    device array the decode path consumes — zero extra host↔device traffic)
    + n_valid [B] real sample counts -> [B, EMB_DIM].

    Front-end parity with knf-rs: kaldi fbank on int16-scale values, then
    per-utterance mean subtraction over the VALID frames only (wespeaker
    CMN), capped at MAX_EMBED_FRAMES like the host path."""
    feats = kaldi_fbank(audio * 32768.0)  # [B, T', 80]
    feats = feats[:, :MAX_EMBED_FRAMES]
    Tf = feats.shape[1]
    # frame i covers samples [i*160, i*160+400): valid iff fully inside
    frame_ok = (
        jnp.arange(Tf)[None, :] * 160 + 400 <= n_valid[:, None]
    )
    # rows with <1 valid frame (tiny windows) fall back to frame 0
    frame_ok = frame_ok.at[:, 0].set(True)
    m = frame_ok[:, :, None].astype(feats.dtype)
    cnt = jnp.maximum(m.sum(axis=1, keepdims=True), 1.0)
    mean = (feats * m).sum(axis=1, keepdims=True) / cnt
    feats = (feats - mean) * m
    return embed_from_fbank(params, feats, frame_ok.astype(jnp.float32))


def compute_embedding(params: Dict[str, Any], int_samples: np.ndarray) -> np.ndarray:
    """i16 samples (one segment) -> [EMB_DIM] embedding.

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
