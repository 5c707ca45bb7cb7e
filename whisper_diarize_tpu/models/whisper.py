"""Whisper encoder-decoder, built TPU-first in functional JAX.

Replaces whisper.cpp + ggml (the reference consumes them via FFI at
`/root/reference/src/transcribe.rs:389`; capability inventory in SURVEY.md
§2.4): log-mel frontend (in `ops/mel.py`), encoder/decoder inference,
KV-cached greedy/beam decoding (in `ops/decode.py`), DTW word alignment over
cross-attention heads (in `ops/dtw.py`), language identification, the
translate-to-English task and initial-prompt conditioning.

Design notes (why this is not a port):
* Parameters live in a nested pytree with **all transformer layers stacked
  on a leading axis**, so the forward pass is a single `jax.lax.scan` over
  layers — one compiled layer body regardless of depth (32 layers for
  large-v3), fast to compile and trivially shardable with `pjit` (stacked
  weights get a `PartitionSpec(None, ..., "model")` in `parallel/mesh.py`).
* Everything is static-shape: mel is always [B, n_mels, 3000], the decoder
  runs against a fixed-size KV cache [L, B, H, 448, Dh] indexed by a scalar
  position, so the whole decode loop stays on-device under `lax.while_loop`.
* Matmuls run in the params' dtype (bfloat16 on TPU) with f32 accumulation
  (`preferred_element_type`); layer norms compute in f32.
* A separate unrolled teacher-forced pass (`alignment_cross_attn`) captures
  only the checkpoint's DTW alignment heads instead of materializing all
  L×H cross-attention maps (whisper.cpp keeps whole-layer QKs; selecting
  heads statically keeps HBM traffic minimal).
"""

from __future__ import annotations

import dataclasses
import functools
import re
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class WhisperConfig:
    n_mels: int
    n_vocab: int
    n_audio_ctx: int
    n_audio_state: int
    n_audio_head: int
    n_audio_layer: int
    n_text_ctx: int
    n_text_state: int
    n_text_head: int
    n_text_layer: int
    multilingual: bool = True
    num_languages: int = 99

    @property
    def head_dim(self) -> int:
        return self.n_audio_state // self.n_audio_head


def _cfg(state, head, enc_layers, dec_layers, mels=80, vocab=51865,
         multilingual=True, num_languages=99) -> WhisperConfig:
    return WhisperConfig(
        n_mels=mels, n_vocab=vocab,
        n_audio_ctx=1500, n_audio_state=state, n_audio_head=head,
        n_audio_layer=enc_layers,
        n_text_ctx=448, n_text_state=state, n_text_head=head,
        n_text_layer=dec_layers,
        multilingual=multilingual, num_languages=num_languages,
    )


# Checkpoint presets; dims match the ggml models the reference downloads
# (`model_manager.rs:162`: ggml-{tiny..large-v3-turbo}.bin).
PRESETS: Dict[str, WhisperConfig] = {
    "tiny": _cfg(384, 6, 4, 4),
    "tiny.en": _cfg(384, 6, 4, 4, vocab=51864, multilingual=False),
    "base": _cfg(512, 8, 6, 6),
    "base.en": _cfg(512, 8, 6, 6, vocab=51864, multilingual=False),
    "small": _cfg(768, 12, 12, 12),
    "small.en": _cfg(768, 12, 12, 12, vocab=51864, multilingual=False),
    "medium": _cfg(1024, 16, 24, 24),
    "medium.en": _cfg(1024, 16, 24, 24, vocab=51864, multilingual=False),
    "large-v1": _cfg(1280, 20, 32, 32),
    "large-v2": _cfg(1280, 20, 32, 32),
    "large-v3": _cfg(1280, 20, 32, 32, mels=128, vocab=51866, num_languages=100),
    "large-v3-turbo": _cfg(1280, 20, 32, 4, mels=128, vocab=51866, num_languages=100),
}

# DTW alignment heads (layer, head) per checkpoint — the same presets
# whisper.cpp selects at `src/transcribe.rs:117-129` via DtwModelPreset.
# Public constants from whisper.cpp/openai-whisper.
ALIGNMENT_HEADS: Dict[str, List[Tuple[int, int]]] = {
    "tiny.en": [(1, 0), (2, 0), (2, 5), (3, 0), (3, 1), (3, 2), (3, 3), (3, 4)],
    "tiny": [(2, 2), (3, 0), (3, 2), (3, 3), (3, 4), (3, 5)],
    "base.en": [(3, 3), (4, 7), (5, 1), (5, 5), (6, 1), (6, 6), (7, 0), (7, 1)],
    "base": [(3, 1), (4, 2), (4, 3), (4, 7), (5, 1), (5, 2), (5, 4), (5, 6)],
    "small.en": [(6, 6), (7, 0), (7, 3), (7, 8), (8, 2), (8, 5), (8, 7), (9, 0),
                 (9, 4), (9, 8), (9, 10), (10, 0), (10, 1), (10, 2), (10, 3),
                 (10, 6), (10, 11), (11, 2), (11, 4)],
    "small": [(5, 3), (5, 9), (8, 0), (8, 4), (8, 7), (8, 8), (9, 0), (9, 7),
              (9, 9), (10, 5)],
    "medium.en": [(11, 4), (14, 1), (14, 12), (14, 14), (15, 4), (16, 0),
                  (16, 4), (16, 9), (17, 12), (17, 14), (18, 7), (18, 10),
                  (18, 15), (20, 0), (20, 3), (20, 9), (20, 14), (21, 12)],
    "medium": [(13, 15), (15, 4), (15, 15), (16, 1), (20, 0), (23, 4)],
    "large-v1": [(9, 19), (11, 2), (11, 4), (11, 17), (22, 7), (22, 11),
                 (22, 17), (23, 2), (23, 15)],
    "large-v2": [(10, 12), (13, 17), (16, 11), (16, 12), (16, 13), (17, 15),
                 (17, 16), (18, 4), (18, 11), (18, 19), (19, 11), (21, 2),
                 (21, 3), (22, 3), (22, 9), (22, 12), (23, 5), (23, 7),
                 (23, 13), (25, 5), (26, 1), (26, 12), (27, 15)],
    "large-v3": [(7, 0), (10, 17), (12, 18), (13, 12), (16, 1), (17, 14),
                 (19, 11), (21, 4), (24, 1), (25, 6)],
    "large-v3-turbo": [(2, 4), (2, 11), (3, 3), (3, 6), (3, 11), (3, 14)],
}


def alignment_heads_for(model_name: str, cfg: WhisperConfig) -> List[Tuple[int, int]]:
    """Alignment-head preset with the reference's fallback-to-Small behavior
    (`transcribe.rs:128`: unknown model names default to the Small preset) —
    clamped to the actual layer/head counts.

    Deliberate improvement over the reference: a quantization suffix
    (`large-v3-turbo-q5_0`, as the files on ggerganov/whisper.cpp are named)
    is stripped before the lookup — the reference would silently use the
    Small preset's heads for every quantized model, degrading DTW word
    timestamps for no reason."""
    base = re.sub(r"-q\d+_(?:\d+|k(?:_[sml])?)$", "", model_name)
    heads = ALIGNMENT_HEADS.get(model_name, ALIGNMENT_HEADS.get(
        base, ALIGNMENT_HEADS["small"]))
    return [
        (l, h) for (l, h) in heads
        if l < cfg.n_text_layer and h < cfg.n_text_head
    ] or [(cfg.n_text_layer - 1, 0)]


def sinusoids(length: int, channels: int) -> np.ndarray:
    """Encoder positional sinusoids (computed, not learned)."""
    assert channels % 2 == 0
    log_timescale = np.log(10000.0) / (channels // 2 - 1)
    inv = np.exp(-log_timescale * np.arange(channels // 2))
    scaled = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1).astype(np.float32)


# --------------------------------------------------------------------------
# Initialization
# --------------------------------------------------------------------------

def init_params(cfg: WhisperConfig, seed: int = 0, dtype=jnp.float32) -> Params:
    """Random-init parameter pytree with the stacked-layer layout.

    Linear weights are stored [in, out] (x @ w). Real checkpoints are loaded
    into the same layout by `models/weights.py`.
    """
    rng = np.random.default_rng(seed)
    d = cfg.n_audio_state
    dt = cfg.n_text_state

    def lin(n_in, n_out, scale=None):
        scale = scale if scale is not None else (n_in ** -0.5)
        return (rng.standard_normal((n_in, n_out)) * scale).astype(np.float32)

    def enc_blocks(L):
        return {
            "ln1_s": np.ones((L, d), np.float32), "ln1_b": np.zeros((L, d), np.float32),
            "q_w": np.stack([lin(d, d) for _ in range(L)]), "q_b": np.zeros((L, d), np.float32),
            "k_w": np.stack([lin(d, d) for _ in range(L)]),
            "v_w": np.stack([lin(d, d) for _ in range(L)]), "v_b": np.zeros((L, d), np.float32),
            "o_w": np.stack([lin(d, d) for _ in range(L)]), "o_b": np.zeros((L, d), np.float32),
            "ln2_s": np.ones((L, d), np.float32), "ln2_b": np.zeros((L, d), np.float32),
            "fc1_w": np.stack([lin(d, 4 * d) for _ in range(L)]), "fc1_b": np.zeros((L, 4 * d), np.float32),
            "fc2_w": np.stack([lin(4 * d, d) for _ in range(L)]), "fc2_b": np.zeros((L, d), np.float32),
        }

    def dec_blocks(L):
        return {
            "ln1_s": np.ones((L, dt), np.float32), "ln1_b": np.zeros((L, dt), np.float32),
            "q_w": np.stack([lin(dt, dt) for _ in range(L)]), "q_b": np.zeros((L, dt), np.float32),
            "k_w": np.stack([lin(dt, dt) for _ in range(L)]),
            "v_w": np.stack([lin(dt, dt) for _ in range(L)]), "v_b": np.zeros((L, dt), np.float32),
            "o_w": np.stack([lin(dt, dt) for _ in range(L)]), "o_b": np.zeros((L, dt), np.float32),
            "ln2_s": np.ones((L, dt), np.float32), "ln2_b": np.zeros((L, dt), np.float32),
            "cq_w": np.stack([lin(dt, dt) for _ in range(L)]), "cq_b": np.zeros((L, dt), np.float32),
            "ck_w": np.stack([lin(dt, dt) for _ in range(L)]),
            "cv_w": np.stack([lin(dt, dt) for _ in range(L)]), "cv_b": np.zeros((L, dt), np.float32),
            "co_w": np.stack([lin(dt, dt) for _ in range(L)]), "co_b": np.zeros((L, dt), np.float32),
            "ln3_s": np.ones((L, dt), np.float32), "ln3_b": np.zeros((L, dt), np.float32),
            "fc1_w": np.stack([lin(dt, 4 * dt) for _ in range(L)]), "fc1_b": np.zeros((L, 4 * dt), np.float32),
            "fc2_w": np.stack([lin(4 * dt, dt) for _ in range(L)]), "fc2_b": np.zeros((L, dt), np.float32),
        }

    params = {
        "encoder": {
            "conv1_w": (rng.standard_normal((3, cfg.n_mels, d)) * (3 * cfg.n_mels) ** -0.5).astype(np.float32),
            "conv1_b": np.zeros((d,), np.float32),
            "conv2_w": (rng.standard_normal((3, d, d)) * (3 * d) ** -0.5).astype(np.float32),
            "conv2_b": np.zeros((d,), np.float32),
            "pos": sinusoids(cfg.n_audio_ctx, d),
            "blocks": enc_blocks(cfg.n_audio_layer),
            "ln_post_s": np.ones((d,), np.float32),
            "ln_post_b": np.zeros((d,), np.float32),
        },
        "decoder": {
            "tok_emb": (rng.standard_normal((cfg.n_vocab, dt)) * dt ** -0.5).astype(np.float32),
            "pos_emb": (rng.standard_normal((cfg.n_text_ctx, dt)) * 0.01).astype(np.float32),
            "blocks": dec_blocks(cfg.n_text_layer),
            "ln_s": np.ones((dt,), np.float32),
            "ln_b": np.zeros((dt,), np.float32),
        },
    }
    return jax.tree.map(lambda a: jnp.asarray(a, dtype), params)


def cast_params(params: Params, dtype) -> Params:
    return jax.tree.map(lambda a: a.astype(dtype), params)


def init_params_fast(cfg: WhisperConfig, dtype=jnp.bfloat16, scale: float = 0.02) -> Params:
    """Benchmark-grade init: shapes from `init_params` via eval_shape, values
    filled on-device with cheap deterministic patterns (no host RNG over
    hundreds of millions of floats). Throughput benchmarking only — weight
    values don't affect runtime on static-shape decode loops."""
    shapes = jax.eval_shape(lambda: init_params(cfg, seed=0, dtype=dtype))

    def fill(path, s):
        leaf = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if leaf.endswith(("_s",)) or leaf in ("s",):  # layernorm scales
            return jnp.ones(s.shape, dtype)
        # small deterministic non-zero values keep softmax/logits finite
        n = int(np.prod(s.shape)) if s.shape else 1
        base = (jnp.arange(n, dtype=jnp.float32) % 1009 - 504.0) / 504.0
        return (base.reshape(s.shape) * scale).astype(dtype)

    return jax.tree_util.tree_map_with_path(fill, shapes)


# --------------------------------------------------------------------------
# Primitives
# --------------------------------------------------------------------------

def _ln(x: jnp.ndarray, s: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * s.astype(jnp.float32) + b.astype(jnp.float32)).astype(x.dtype)


def _heads(x: jnp.ndarray, n_head: int) -> jnp.ndarray:
    """[B, T, D] -> [B, H, T, Dh]"""
    B, T, D = x.shape
    return x.reshape(B, T, n_head, D // n_head).transpose(0, 2, 1, 3)


def _unheads(x: jnp.ndarray) -> jnp.ndarray:
    B, H, T, Dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B, T, H * Dh)


def _attn(q, k, v, mask=None, compact_probs=False):
    """q,k,v: [B, H, T, Dh] -> [B, H, Tq, Dh].

    Default: f32 logits + f32 softmax (decode path: tiny Tq, full accuracy).
    compact_probs=True keeps the [Tq, Tk] logits/probs buffers in the value
    dtype (bf16 on TPU) with an f32 normalizer — at encoder size
    (B16 x H20 x 1500^2) the f32 buffers alone are ~2.9 GB/layer of HBM
    traffic, the dominant encoder cost. MXU accumulation stays f32 either
    way (preferred_element_type only sets the result buffer type).
    """
    scale = q.shape[-1] ** -0.25
    if not compact_probs:
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q * scale, k * scale,
            preferred_element_type=jnp.float32,
        )
        if mask is not None:
            logits = logits + mask
        w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    else:
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q * scale, k * scale,
            preferred_element_type=v.dtype,
        )
        if mask is not None:
            logits = logits + mask.astype(v.dtype)
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        s = jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)
        w = (e / s.astype(v.dtype)).astype(v.dtype)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", w, v, preferred_element_type=jnp.float32
    ).astype(v.dtype)


# --------------------------------------------------------------------------
# Encoder
# --------------------------------------------------------------------------

def encode(params: Params, mel: jnp.ndarray, cfg: WhisperConfig) -> jnp.ndarray:
    """mel [B, n_mels, 3000] -> audio states [B, 1500, d]."""
    enc = params["encoder"]
    dtype = enc["conv1_w"].dtype
    x = jnp.swapaxes(mel.astype(dtype), -1, -2)  # [B, T, n_mels]

    # conv stem: k=3 s=1 gelu, then k=3 s=2 gelu ("IOW" kernel layout)
    x = jax.lax.conv_general_dilated(
        x, enc["conv1_w"], window_strides=(1,), padding=((1, 1),),
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32,
    ).astype(dtype) + enc["conv1_b"]
    x = jax.nn.gelu(x)
    x = jax.lax.conv_general_dilated(
        x, enc["conv2_w"], window_strides=(2,), padding=((1, 1),),
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32,
    ).astype(dtype) + enc["conv2_b"]
    x = jax.nn.gelu(x)

    x = x + enc["pos"].astype(dtype)

    H = cfg.n_audio_head

    # compact (bf16) attention-prob buffers only when compute is low-precision
    compact = dtype != jnp.float32

    def layer(x, blk):
        h = _ln(x, blk["ln1_s"], blk["ln1_b"])
        q = _heads(h @ blk["q_w"] + blk["q_b"], H)
        k = _heads(h @ blk["k_w"], H)
        v = _heads(h @ blk["v_w"] + blk["v_b"], H)
        x = x + _unheads(_attn(q, k, v, compact_probs=compact)) @ blk["o_w"] + blk["o_b"]
        h = _ln(x, blk["ln2_s"], blk["ln2_b"])
        h = jax.nn.gelu(h @ blk["fc1_w"] + blk["fc1_b"])
        x = x + h @ blk["fc2_w"] + blk["fc2_b"]
        return x, None

    x, _ = jax.lax.scan(layer, x, enc["blocks"])
    return _ln(x, enc["ln_post_s"], enc["ln_post_b"])


# --------------------------------------------------------------------------
# Decoder with KV cache
# --------------------------------------------------------------------------

def init_self_cache(
    cfg: WhisperConfig, batch: int, dtype, max_len: Optional[int] = None
) -> Dict[str, jnp.ndarray]:
    """Fixed-size self-attention KV cache [L, B, H, T, Dh].

    `max_len` trims T below n_text_ctx when the decode budget is known
    (prompt + max_tokens) — every step streams the whole cache, so a 128-slot
    cache costs ~3.5x less HBM traffic than the full 448."""
    L, H, Dh = cfg.n_text_layer, cfg.n_text_head, cfg.head_dim
    T = cfg.n_text_ctx if max_len is None else min(cfg.n_text_ctx, max_len)
    z = jnp.zeros((L, batch, H, T, Dh), dtype)
    return {"k": z, "v": z}


def cross_kv(params: Params, xa: jnp.ndarray, cfg: WhisperConfig) -> Dict[str, jnp.ndarray]:
    """Precompute cross-attention K/V for all layers: [L, B, H, Ta, Dh]."""
    dec = params["decoder"]["blocks"]
    H = cfg.n_text_head

    def one(blk_ck_w, blk_cv_w, blk_cv_b):
        k = _heads(xa @ blk_ck_w, H)
        v = _heads(xa @ blk_cv_w + blk_cv_b, H)
        return k, v

    k, v = jax.vmap(one)(dec["ck_w"], dec["cv_w"], dec["cv_b"])
    return {"k": k, "v": v}


def cross_kv_tiled(
    params: Params, xa: jnp.ndarray, cfg: WhisperConfig,
    use_kernel: Optional[bool] = None,
    mesh=None,  # jax.sharding.Mesh — shard_map the build kernel (rows/heads)
) -> Dict[str, jnp.ndarray]:
    """Compute the cross K/V DIRECTLY in the Pallas flash-kernel layout
    [L, B, NT, H, Dh, T_TILE].

    Equivalent to `tile_cross_cache(cross_kv(...))` but skips materializing
    the intermediate [L, B, H, Ta, Dh] arrays and their ~8 GB transpose
    (108 -> 66 ms for the large-v3 b16 prefill; K bit-identical, V within
    1 bf16 ulp — `tests/test_whisper_model.py::test_cross_kv_tiled_parity`).
    Padded tail positions (Ta..NT*T_TILE) hold K = 0 / V = bias; every
    consumer masks columns >= n_audio_ctx before the softmax, so neither is
    ever read.

    On TPU (`use_kernel` auto) the matmul itself runs as a Pallas kernel
    that transposes each output tile in VMEM before the store
    (`ops/pallas_attn.py::cross_kv_tiled_pallas`) — the XLA einsum pays an
    epilogue transpose it cannot fuse into the GEMM.
    """
    from ..ops.pallas_attn import T_TILE, cdiv

    dec = params["decoder"]["blocks"]
    H, Dh = cfg.n_text_head, cfg.head_dim
    B, Ta, _ = xa.shape
    L = dec["ck_w"].shape[0]
    nt = cdiv(Ta, T_TILE)
    pad = nt * T_TILE - Ta
    xp = xa
    if pad:
        xp = jnp.pad(xa, ((0, 0), (0, pad), (0, 0)))
    xp = xp.reshape(B, nt, T_TILE, -1)
    if use_kernel is None:
        use_kernel = False
        if jax.default_backend() == "tpu":
            # compile-probe the kernel at this geometry first so a Mosaic
            # failure degrades to the einsum below instead of aborting the
            # prefill (megakernels_supported pattern); under a head-sharded
            # mesh each chip runs the kernel on its local head slice
            from ..ops.pallas_attn import _mesh_axes, cross_build_supported

            h_local = H
            if mesh is not None:
                _, model_ax = _mesh_axes(mesh, B, H)
                if model_ax is not None:
                    h_local = H // dict(
                        zip(mesh.axis_names, mesh.devices.shape))[model_ax]
            use_kernel = cross_build_supported(xa.shape[-1], h_local, Dh)
    if use_kernel:
        from ..ops.pallas_attn import cross_kv_tiled_pallas

        k5, v5 = cross_kv_tiled_pallas(
            xp, dec["ck_w"], dec["cv_w"], dec["cv_b"], H, Dh, mesh=mesh)
        return {"k5": k5, "v5": v5}
    kw = dec["ck_w"].reshape(L, -1, H, Dh)
    vw = dec["cv_w"].reshape(L, -1, H, Dh)
    k5 = jnp.einsum(
        "bntd,ldhx->lbnhxt", xp, kw, preferred_element_type=jnp.float32
    ).astype(xa.dtype)
    v5 = jnp.einsum(
        "bntd,ldhx->lbnhxt", xp, vw, preferred_element_type=jnp.float32
    ).astype(xa.dtype)
    v5 = v5 + dec["cv_b"].reshape(L, 1, 1, H, Dh, 1).astype(xa.dtype)
    return {"k5": k5, "v5": v5}


def tile_cross_cache(cc: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """Re-lay the cross K/V for the Pallas flash decode kernel:
    [L, B, H, Ta, Dh] -> pre-tiled contiguous [L, B, NT, H, Dh, T_TILE]
    (`ops/pallas_attn.py`). One-time transpose per window; every decode step
    then streams it ~1.7x faster than the XLA einsum chain (measured)."""
    from ..ops.pallas_attn import tile_cross_kv

    k5, v5 = tile_cross_kv(cc["k"], cc["v"])
    return {"k5": k5, "v5": v5}


def tile_quantize_cross_cache(cc: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """int8 variant of `tile_cross_cache`: per-position symmetric int8
    payloads + f32 scales in the pre-tiled kernel layout. The flash kernel
    dequantizes in VMEM, so the per-step HBM stream drops to ~55% of bf16
    (`ops/pallas_attn.py::cross_attn_layer_q8`)."""
    from ..ops.pallas_attn import tile_quantize_cross_kv

    k8, ks, v8, vs = tile_quantize_cross_kv(cc["k"], cc["v"])
    return {"k8": k8, "ks": ks, "v8": v8, "vs": vs}


def quantize_tiled_cross_cache(
    cc5: Dict[str, jnp.ndarray]
) -> Dict[str, jnp.ndarray]:
    """Quantize an ALREADY-TILED bf16 cross cache ({"k5","v5"}) to the int8
    layout ({"k8","ks","v8","vs"}) — per-position symmetric over Dh (axis
    4), same semantics as `tile_quantize_cross_cache` but fed by
    `cross_kv_tiled`'s direct build: the q8 prefill then skips both the
    plain-layout materialization and its ~8 GB transpose (measured 204 ->
    ~90 ms large-v3 b16 init; the elementwise quantize shards trivially
    under GSPMD on the mesh path)."""
    def q8(x):  # [L, B, NT, H, Dh, TT]
        s = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=4)  # [L,B,NT,H,TT]
        s = jnp.maximum(s, 1e-8) / 127.0
        p = jnp.clip(
            jnp.round(x.astype(jnp.float32) / s[:, :, :, :, None, :]),
            -127, 127,
        ).astype(jnp.int8)
        return p, s

    k8, ks = q8(cc5["k5"])
    v8, vs = q8(cc5["v5"])
    return {"k8": k8, "ks": ks, "v8": v8, "vs": vs}


@functools.lru_cache(maxsize=1)
def _pallas_interpret() -> bool:
    # CPU tests run the kernel in interpreter mode; TPU runs it compiled
    return jax.default_backend() != "tpu"


def quantize_cross_kv(cc: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """Per-position symmetric int8 quantization of the cross K/V cache.

    Halves the cross-cache HBM *footprint* (983 MB -> ~500 MB at batch 16
    on large-v3-turbo) — useful when batch size is capacity-limited. NOTE:
    with plain XLA the per-step dequantize does NOT fuse into the attention
    matmuls (measured slower than bf16 on v5e), so this is a memory knob,
    not a speed knob, until a fused int8-attention Pallas kernel lands
    (`DecodeConfig.quantize_cross_kv`, default off).
    """

    def q(x):
        scale = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
        scale = jnp.maximum(scale, 1e-8) / 127.0
        payload = jnp.clip(
            jnp.round(x.astype(jnp.float32) / scale), -127, 127
        ).astype(jnp.int8)
        return payload, scale.astype(jnp.float32)

    kq, ks = q(cc["k"])
    vq, vs = q(cc["v"])
    return {"k_q": kq, "k_s": ks, "v_q": vq, "v_s": vs}


def _dequant(payload: jnp.ndarray, scale: jnp.ndarray, dtype) -> jnp.ndarray:
    return (payload.astype(dtype) * scale.astype(dtype))



def _cross_attend_factory(cfg: WhisperConfig, cross_cache: Dict[str, jnp.ndarray],
                          beams: int, dtype, S: int, mesh=None):
    """Build the cross-attention dispatch for one decode_step call.

    Returns (cross_fn, select_layer, stacked):
      cross_fn(cq, ck, cv, layer_idx) -> [N, H, S, Dh] for one layer;
      select_layer(l) -> this layer's (ck, cv) operands for the unrolled
        driver (None placeholders when the Pallas kernel indexes the full
        tiled cache itself via its scalar-prefetched layer index);
      stacked(L) -> the (cross_k, cross_v) scan xs for the lax.scan driver.
    Variants: plain [L,B,H,Ta,Dh], int8-quantized, Pallas-tiled bf16/int8
    (kernel for S == 1, tiled einsum for prefill).
    """
    quantized = "k_q" in cross_cache
    tiled = "k5" in cross_cache  # Pallas flash-decode layout (bf16)
    tiled_q8 = "k8" in cross_cache  # Pallas flash-decode layout (int8)
    # the kernel folds beams x positions into its query axis; it serves the
    # hot single-token steps AND short prefills — long prompts (S x beams
    # beyond ~64 queries) would blow the f32 score scratch past VMEM and
    # run as an XLA einsum over the tiled layout instead
    use_kernel = (tiled or tiled_q8) and S * beams <= 64

    def _cross_tiled_einsum(cq: jnp.ndarray, k5l, v5l) -> jnp.ndarray:
        """cq [N, H, S, Dh] vs layer-sliced tiled K/V [B, NT, H, Dh, TT]."""
        Nb, Hh, Sq, Dh = cq.shape
        Bb = Nb // beams
        qf = cq.reshape(Bb, beams, Hh, Sq, Dh).astype(jnp.float32)
        scale = Dh ** -0.5
        logits_c = jnp.einsum(
            "bkhqd,bnhdt->bkhqnt", qf * scale, k5l.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        NT, TT = k5l.shape[1], k5l.shape[-1]
        col = (
            jnp.arange(NT)[:, None] * TT + jnp.arange(TT)[None, :]
        )  # [NT, TT]
        logits_c = jnp.where(
            col[None, None, None, None] < cfg.n_audio_ctx, logits_c, -jnp.inf
        )
        flat = logits_c.reshape(Bb, beams, Hh, Sq, NT * TT)
        wgt = jax.nn.softmax(flat, axis=-1).reshape(logits_c.shape)
        out = jnp.einsum(
            "bkhqnt,bnhdt->bkhqd", wgt.astype(v5l.dtype), v5l,
            preferred_element_type=jnp.float32,
        ).astype(v5l.dtype)
        return out.reshape(Nb, Hh, Sq, Dh)

    def _cross_pallas(cq: jnp.ndarray, layer_idx) -> jnp.ndarray:
        """cq [N, H, S, Dh] -> cross attention via the flash kernel, folding
        beams x positions into the kernel's query axis (cross attention has
        no causal mask)."""
        from ..ops.pallas_attn import cross_attn_layer, cross_attn_layer_q8

        Nb, Hh, Sq, Dh = cq.shape
        Bb = Nb // beams
        qf = cq.reshape(Bb, beams, Hh, Sq, Dh)
        qf = jnp.transpose(qf, (0, 1, 3, 2, 4)).reshape(Bb, beams * Sq, Hh, Dh)
        if tiled_q8:
            out = cross_attn_layer_q8(
                layer_idx, qf,
                cross_cache["k8"], cross_cache["ks"],
                cross_cache["v8"], cross_cache["vs"],
                ta_total=cfg.n_audio_ctx, interpret=_pallas_interpret(),
                mesh=mesh,
            )
        else:
            out = cross_attn_layer(
                layer_idx, qf, cross_cache["k5"], cross_cache["v5"],
                ta_total=cfg.n_audio_ctx, interpret=_pallas_interpret(),
                mesh=mesh,
            )
        out = out.reshape(Bb, beams, Sq, Hh, Dh)
        return jnp.transpose(out, (0, 1, 3, 2, 4)).reshape(Nb, Hh, Sq, Dh)

    def cross_fn(cq, ck, cv, layer_idx):
        if use_kernel:
            return _cross_pallas(cq, layer_idx)
        if quantized:
            ck = _dequant(ck[0], ck[1], dtype)
            cv = _dequant(cv[0], cv[1], dtype)
        if tiled:
            return _cross_tiled_einsum(cq, ck, cv)
        if tiled_q8:  # prefill over the int8 layout: dequant this layer
            k5l = ck[0].astype(dtype) * ck[1][:, :, :, None, :].astype(dtype)
            v5l = cv[0].astype(dtype) * cv[1][:, :, :, None, :].astype(dtype)
            return _cross_tiled_einsum(cq, k5l, v5l)
        if beams == 1:
            return _attn(cq, ck, cv)
        # beam-folded rows share their stream's cross K/V: [N,H,S,Dh] ->
        # [B,K,H,S,Dh] against ck/cv [B,H,Ta,Dh]
        Nb, Hh, Sq, Dh = cq.shape
        Bb = Nb // beams
        cqb = cq.reshape(Bb, beams, Hh, Sq, Dh)
        scale = Dh ** -0.25
        logits_c = jnp.einsum(
            "bkhqd,bhtd->bkhqt", cqb * scale, ck * scale,
            preferred_element_type=jnp.float32,
        )
        wgt = jax.nn.softmax(logits_c, axis=-1).astype(cv.dtype)
        return jnp.einsum(
            "bkhqt,bhtd->bkhqd", wgt, cv, preferred_element_type=jnp.float32
        ).astype(cv.dtype).reshape(Nb, Hh, Sq, Dh)

    def select_layer(l: int):
        if use_kernel:
            return None, None  # kernel reads the full cache itself
        if quantized:
            return ((cross_cache["k_q"][l], cross_cache["k_s"][l]),
                    (cross_cache["v_q"][l], cross_cache["v_s"][l]))
        if tiled:
            return cross_cache["k5"][l], cross_cache["v5"][l]
        if tiled_q8:
            return ((cross_cache["k8"][l], cross_cache["ks"][l]),
                    (cross_cache["v8"][l], cross_cache["vs"][l]))
        return cross_cache["k"][l], cross_cache["v"][l]

    def stacked(L: int):
        if use_kernel:
            # feed tiny placeholders through the scan (an XLA-side layer
            # slice of the tiled cache would copy it every step)
            return jnp.zeros((L,), dtype), jnp.zeros((L,), dtype)
        if quantized:
            return ((cross_cache["k_q"], cross_cache["k_s"]),
                    (cross_cache["v_q"], cross_cache["v_s"]))
        if tiled:
            return cross_cache["k5"], cross_cache["v5"]
        if tiled_q8:
            return ((cross_cache["k8"], cross_cache["ks"]),
                    (cross_cache["v8"], cross_cache["vs"]))
        return cross_cache["k"], cross_cache["v"]

    return cross_fn, select_layer, stacked


def _decoder_qkv(x, blk, H):
    """Self-attention projections for one decoder layer."""
    h = _ln(x, blk["ln1_s"], blk["ln1_b"])
    q = _heads(h @ blk["q_w"] + blk["q_b"], H)
    k_new = _heads(h @ blk["k_w"], H)
    v_new = _heads(h @ blk["v_w"] + blk["v_b"], H)
    return q, k_new, v_new


def _fused_tail_call(dec, cross_cache, l, x, self_out, beams, cfg):
    """Dispatch one decoder-layer tail to the megakernel
    (`ops/pallas_tail.py`), routing whichever pack (bf16 "w" / int8
    "w8"+"ws") and cross-cache layout (bf16 "k5"/"v5" / int8
    "k8"/"ks"/"v8"/"vs") the caller attached."""
    from ..ops.pallas_tail import fused_tail_layer

    pack = dec["tail"]
    kvq = "k8" in cross_cache
    return fused_tail_layer(
        jnp.int32(l), x, self_out,
        pack["w8"] if "w8" in pack else pack["w"], pack["b"],
        cross_cache["k8"] if kvq else cross_cache["k5"],
        cross_cache["v8"] if kvq else cross_cache["v5"],
        tail_ws=pack.get("ws"),
        ks=cross_cache.get("ks") if kvq else None,
        vs=cross_cache.get("vs") if kvq else None,
        beams=beams, ta_total=cfg.n_audio_ctx,
        interpret=_pallas_interpret())


def _decoder_layer_tail(x, blk, self_out, cross_fn, ck, cv, layer_idx, H):
    """Everything after self-attention: output proj, cross-attention, MLP."""
    x = x + _unheads(self_out) @ blk["o_w"] + blk["o_b"]
    h = _ln(x, blk["ln2_s"], blk["ln2_b"])
    cq = _heads(h @ blk["cq_w"] + blk["cq_b"], H)
    x = x + _unheads(cross_fn(cq, ck, cv, layer_idx)) @ blk["co_w"] + blk["co_b"]
    h = _ln(x, blk["ln3_s"], blk["ln3_b"])
    h = jax.nn.gelu(h @ blk["fc1_w"] + blk["fc1_b"])
    x = x + h @ blk["fc2_w"] + blk["fc2_b"]
    return x


# The cached-decoder DRIVER FAMILY — three variants share the layer math
# (_decoder_qkv / _decoder_layer_tail / _cross_attend_factory) and differ
# only in cache access pattern, each chosen for its hot path's performance:
#   decode_step        scalar position, one dynamic_update_slice per layer
#                      (greedy loop, prefill)
#   decode_step_split  beam search: beam-shared prompt cache + per-beam
#                      decode cache with ancestry-pointer reads
#   decode_step_pos    per-row positions with scatter writes (speculative)
# They are pinned together by parity tests (test_decode_step_unroll_parity,
# test_decode_step_split_parity, test_decode_step_pos_parity) — a change to
# shared semantics must keep all three green.
def decode_step(
    params: Params,
    cfg: WhisperConfig,
    tokens: jnp.ndarray,  # [N, S] int32
    pos_offset: jnp.ndarray,  # scalar int32: index of tokens[:, 0]
    self_cache: Dict[str, jnp.ndarray],
    cross_cache: Dict[str, jnp.ndarray],
    beams: int = 1,
    row_pad: Optional[jnp.ndarray] = None,  # [N] int32 left-pad per row
    unroll: bool = False,
    mesh=None,  # jax.sharding.Mesh: shard_map the Pallas cross-attention
    logits_at: Optional[Tuple[int, ...]] = None,  # STATIC positions to project
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Run S tokens through the decoder against a fixed-size KV cache.

    Used both for the prompt prefill (S = prompt length) and the sampling
    loop (S = 1). Returns (logits [N, S, V] f32, updated self_cache);
    with `logits_at` (static position tuple) only those positions are
    projected to the vocabulary — logits come back [N, len(logits_at), V].

    `beams > 1` marks the batch as beam-folded [B*beams]: the cross cache
    then has only B rows and is SHARED across each stream's beams — the
    cross-KV stream (the dominant HBM traffic of the decode loop) is read
    once per stream per step instead of once per beam.

    `row_pad` enables PER-ROW prompts inside one fixed-shape batch (the
    reference's rolling `previous_text` prompt differs per stream,
    `transcribe.rs:384-386`): row b's prompt is left-padded with `row_pad[b]`
    filler tokens. Padded slots are masked out of self-attention and the
    row's position indices shift down by its pad, so each row computes
    exactly what a lone decode with its unpadded prompt would.

    `unroll=True` replaces the `lax.scan` over layers with a Python loop
    indexing the stacked weights with STATIC slices. The scan's dynamic
    per-layer slice forces XLA to materialize every layer's weights into a
    fresh buffer each step (an extra write+read of the full decoder weight
    set, ~1.7 GB/step on large-v3 — measured 13.1 -> 10.5 ms/step unrolled,
    `tools/bench_layer_variants.py`). Unrolling multiplies compile time by
    ~L, so it is reserved for the TPU decode hot path (DecodeConfig resolves
    it per backend); numerics are identical to the scan path
    (`tests/test_whisper_model.py::test_decode_step_unroll_parity`).
    """
    dec = params["decoder"]
    dtype = dec["tok_emb"].dtype
    B, S = tokens.shape
    H = cfg.n_text_head
    Tc = self_cache["k"].shape[-2]  # cache may be shorter than n_text_ctx

    buf_pos = pos_offset + jnp.arange(S)  # buffer slots being written
    if row_pad is None:
        pos = buf_pos
        x = dec["tok_emb"][tokens] + dec["pos_emb"][pos][None, :, :].astype(dtype)
        # mask over cache positions: query i (buffer slot pos_offset+i) may
        # attend to cache slots <= pos_offset+i (new keys are written first).
        kpos = jnp.arange(Tc)[None, :]
        qpos = pos[:, None]
        mask = jnp.where(kpos <= qpos, 0.0, -jnp.inf).astype(jnp.float32)  # [S, Tc]
        mask = mask[None, None]  # [1, 1, S, Tc]
    else:
        # per-row positions: the row's first REAL token sits at position 0
        pos = jnp.maximum(buf_pos[None, :] - row_pad[:, None], 0)  # [N, S]
        x = dec["tok_emb"][tokens] + jnp.take(
            dec["pos_emb"], pos, axis=0
        ).astype(dtype)
        kpos = jnp.arange(Tc)[None, None, :]  # [1, 1, Tc]
        qpos = buf_pos[None, :, None]  # [1, S, 1]
        # pad-filler queries (buffer slot < row_pad) see an empty key set,
        # which would softmax to NaN and poison later cache writes — let
        # every query attend its own slot (a no-op for real queries, whose
        # own slot is >= row_pad already); their outputs are never read
        valid = (kpos <= qpos) & (
            (kpos >= row_pad[:, None, None]) | (kpos == qpos)
        )
        mask = jnp.where(valid, 0.0, -jnp.inf).astype(jnp.float32)  # [N, S, Tc]
        mask = mask[:, None]  # [N, 1, S, Tc] broadcast over heads

    cross_fn, cross_select, cross_stacked = _cross_attend_factory(
        cfg, cross_cache, beams, dtype, S, mesh=mesh
    )

    L = cfg.n_text_layer
    # fused decoder-tail megakernel (ops/pallas_tail.py): one Pallas call
    # absorbs o-proj + ln2 + cross-q + flash cross-attention + co-proj +
    # ln3 + MLP, keeping the HBM DMA queue busy across the whole tail.
    # Engaged when TranscribeStep attached a weight pack to the params
    # (single-device, bf16-tiled cross cache, sampling steps only).
    use_tail = (
        dec.get("tail") is not None and S == 1 and unroll and mesh is None
        and ("k5" in cross_cache or "k8" in cross_cache) and S * beams <= 64
    )
    # companion front kernel (ln1 + qkv + self-attention fused): greedy
    # steps only — beam search fronts go through decode_step_split
    use_front = use_tail and beams == 1 and dec.get("front") is not None
    if unroll:
        # static per-layer weight slices read in place; the tiny new K/V row
        # is written straight into the full stacked cache (40 KB, vs the
        # scan's full-slice ys write)
        kc, vc = self_cache["k"], self_cache["v"]
        rp_arr = row_pad if row_pad is not None else jnp.zeros((B,), jnp.int32)
        for l in range(L):
            if use_front:
                # quarantined kernel (VERDICT r3 #7): only the megakernel
                # gate tool attaches a front pack, and it puts tools/ on
                # sys.path before calling
                from pallas_front import fused_front_layer

                self_out, k_new, v_new = fused_front_layer(
                    jnp.int32(l), pos_offset, rp_arr, x,
                    dec["front"]["w"], dec["front"]["b"], kc, vc,
                    interpret=_pallas_interpret())
                blk = None
            else:
                blk = jax.tree.map(lambda a: a[l], dec["blocks"])
                q, k_new, v_new = _decoder_qkv(x, blk, H)
            kc = jax.lax.dynamic_update_slice(
                kc, k_new[None], (l, 0, 0, pos_offset, 0))
            vc = jax.lax.dynamic_update_slice(
                vc, v_new[None], (l, 0, 0, pos_offset, 0))
            if not use_front:
                self_out = _attn(q, kc[l], vc[l], mask)
            if use_tail:
                x = _fused_tail_call(
                    dec, cross_cache, l, x, self_out, beams, cfg)
            else:
                ck, cv = cross_select(l)
                x = _decoder_layer_tail(
                    x, blk, self_out, cross_fn, ck, cv, jnp.int32(l), H)
        new_cache = {"k": kc, "v": vc}
    else:
        def layer(carry, blk_and_cross):
            x, = carry
            blk, ck, cv, layer_idx = blk_and_cross
            q, k_new, v_new = _decoder_qkv(x, blk, H)
            # write new K/V into this layer's cache slice at pos_offset
            k_cache = jax.lax.dynamic_update_slice(
                blk["k_cache"], k_new, (0, 0, pos_offset, 0)
            )
            v_cache = jax.lax.dynamic_update_slice(
                blk["v_cache"], v_new, (0, 0, pos_offset, 0)
            )
            self_out = _attn(q, k_cache, v_cache, mask)
            x = _decoder_layer_tail(
                x, blk, self_out, cross_fn, ck, cv, layer_idx, H)
            return (x,), (k_cache, v_cache)

        blocks = dict(dec["blocks"])
        blocks["k_cache"] = self_cache["k"]
        blocks["v_cache"] = self_cache["v"]
        cross_k, cross_v = cross_stacked(L)
        (x,), (k_caches, v_caches) = jax.lax.scan(
            layer, (x,), (blocks, cross_k, cross_v, jnp.arange(L))
        )
        new_cache = {"k": k_caches, "v": v_caches}
    if logits_at is not None:
        # the prompt prefill only reads a couple of positions (sot +
        # last): slicing BEFORE the vocab projection skips an [N, S, V]
        # f32 buffer and its matmul (~760 MB + ~480 GFLOP at B=16, S=228
        # rolling prompts on large-v3). Static positions, static slices.
        x = jnp.concatenate([x[:, p:p + 1] for p in logits_at], axis=1)
    x = _ln(x, dec["ln_s"], dec["ln_b"])
    logits = jnp.einsum(
        "bsd,vd->bsv", x, dec["tok_emb"], preferred_element_type=jnp.float32
    )
    return logits, new_cache


def decode_step_pos(
    params: Params,
    cfg: WhisperConfig,
    tokens: jnp.ndarray,  # [B, S] int32
    pos0: jnp.ndarray,  # [B] int32: buffer slot of tokens[:, 0], PER ROW
    self_cache: Dict[str, jnp.ndarray],
    cross_cache: Dict[str, jnp.ndarray],
    unroll: bool = False,
    mesh=None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """decode_step with PER-ROW base positions (speculative decoding).

    Speculative rounds leave each row at a different accepted length, so
    row b's S tokens occupy buffer slots pos0[b]..pos0[b]+S-1 — the K/V
    write is a scatter instead of one dynamic_update_slice, the position
    embeddings and the causal mask are per-row. With a constant pos0 this
    reproduces `decode_step` exactly
    (`tests/test_whisper_model.py::test_decode_step_pos_parity`).

    Rows may carry stale K/V from previously rejected proposals at slots
    > their current position; the causal mask (kpos <= pos0[b]+i) hides
    them and later rounds overwrite them in place.

    Returns (logits [B, S, V] f32, updated self_cache).
    """
    dec = params["decoder"]
    dtype = dec["tok_emb"].dtype
    B, S = tokens.shape
    H = cfg.n_text_head
    Tc = self_cache["k"].shape[-2]

    qpos = pos0[:, None] + jnp.arange(S)[None, :]  # [B, S] buffer slots
    # clamp: finished rows keep being fed in lockstep speculative rounds;
    # their clamped writes land in the last slot, which is never read again
    qpos = jnp.minimum(qpos, Tc - 1)
    x = dec["tok_emb"][tokens] + jnp.take(
        dec["pos_emb"], jnp.minimum(qpos, cfg.n_text_ctx - 1), axis=0
    ).astype(dtype)
    kpos = jnp.arange(Tc)[None, None, :]  # [1, 1, Tc]
    mask = jnp.where(
        kpos <= qpos[:, :, None], 0.0, -jnp.inf
    ).astype(jnp.float32)[:, None]  # [B, 1, S, Tc]

    cross_fn, cross_select, cross_stacked = _cross_attend_factory(
        cfg, cross_cache, 1, dtype, S, mesh=mesh
    )

    b_idx = jnp.arange(B)[:, None]  # [B, 1] broadcast against qpos [B, S]

    def write_kv(cache_l, new):  # [B, H, Tc, Dh] <- [B, H, S, Dh]
        # numpy-style mixed indexing: advanced (b, t) pairs select per-row
        # slots; XLA lowers to an in-place scatter
        return cache_l.at[b_idx, :, qpos, :].set(
            jnp.transpose(new, (0, 2, 1, 3)))

    L = cfg.n_text_layer
    if unroll:
        kc, vc = self_cache["k"], self_cache["v"]
        for l in range(L):
            blk = jax.tree.map(lambda a: a[l], dec["blocks"])
            q, k_new, v_new = _decoder_qkv(x, blk, H)
            kc = kc.at[l].set(write_kv(kc[l], k_new))
            vc = vc.at[l].set(write_kv(vc[l], v_new))
            self_out = _attn(q, kc[l], vc[l], mask)
            ck, cv = cross_select(l)
            x = _decoder_layer_tail(
                x, blk, self_out, cross_fn, ck, cv, jnp.int32(l), H)
        new_cache = {"k": kc, "v": vc}
    else:
        def layer(carry, blk_and_cross):
            x, = carry
            blk, ck, cv, layer_idx = blk_and_cross
            q, k_new, v_new = _decoder_qkv(x, blk, H)
            k_cache = write_kv(blk["k_cache"], k_new)
            v_cache = write_kv(blk["v_cache"], v_new)
            self_out = _attn(q, k_cache, v_cache, mask)
            x = _decoder_layer_tail(
                x, blk, self_out, cross_fn, ck, cv, layer_idx, H)
            return (x,), (k_cache, v_cache)

        blocks = dict(dec["blocks"])
        blocks["k_cache"] = self_cache["k"]
        blocks["v_cache"] = self_cache["v"]
        cross_k, cross_v = cross_stacked(L)
        (x,), (k_caches, v_caches) = jax.lax.scan(
            layer, (x,), (blocks, cross_k, cross_v, jnp.arange(L))
        )
        new_cache = {"k": k_caches, "v": v_caches}
    x = _ln(x, dec["ln_s"], dec["ln_b"])
    logits = jnp.einsum(
        "bsd,vd->bsv", x, dec["tok_emb"], preferred_element_type=jnp.float32
    )
    return logits, new_cache


def init_split_decode_cache(
    cfg: WhisperConfig, batch: int, dtype, max_len: int
) -> Dict[str, jnp.ndarray]:
    """Per-beam DECODE half of a split self-cache: [L, N, H, Td, Dh]."""
    L, H, Dh = cfg.n_text_layer, cfg.n_text_head, cfg.head_dim
    z = jnp.zeros((L, batch, H, max_len, Dh), dtype)
    return {"k": z, "v": z}


def decode_step_split(
    params: Params,
    cfg: WhisperConfig,
    tokens: jnp.ndarray,  # [N, 1] int32 — sampling only (S = 1)
    step: jnp.ndarray,  # scalar int32: decode slot being written (0-based)
    prompt_cache: Dict[str, jnp.ndarray],  # {"k","v": [L, B, H, Tp, Dh]}
    decode_cache: Dict[str, jnp.ndarray],  # {"k","v": [L, N, H, Td, Dh]}
    cross_cache: Dict[str, jnp.ndarray],
    prompt_len: int,  # static: number of prompt buffer slots (= bucket P)
    beams: int = 1,
    row_pad: Optional[jnp.ndarray] = None,  # [N] int32 left-pad per row
    unroll: bool = False,
    anc: Optional[jnp.ndarray] = None,  # [N, Td] int32 ancestry row indices
    mesh=None,
    pallas_split: bool = False,  # fused Pallas self-attn kernel (TPU)
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Sampling step against a SPLIT self-cache.

    Beam search's per-step cache reindex was the dominant beam overhead
    (~10 ms/step on large-v3 b16 over the fused [L,N,H,Tc,Dh] cache). The
    split layout exploits two facts: (1) the prompt K/V of a stream's K
    beams are IDENTICAL (prefilled once per stream, [L,B,H,Tp,Dh], never
    gathered, read beam-shared like the cross cache); (2) only the small
    decode half [L,N,H,Td,Dh] differs per beam — it alone is gathered to
    surviving beams, and self-attention joins the two halves under one
    softmax. Numerics match the fused cache exactly
    (`tests/test_whisper_model.py::test_decode_step_split_parity`).

    `anc` enables GATHER-FREE beam search: the decode cache stays
    unpermuted in the loop carry (each row only ever receives in-place
    single-slot writes), and `anc[n, t]` names the physical row holding
    beam n's slot-t entry. Permuting the carried cache instead would force
    XLA into defensive full copies (~13.8 ms/step on large-v3 b16).
    Callers maintain `anc` as: `anc = anc[new_src].at[:, step].set(arange(N))`
    before each step. Two resolution paths:

    * XLA (`pallas_split=False` or the scan driver): the indirection is a
      read-time `take_along_axis` into per-layer temps — 3x the decode-
      cache volume in HBM traffic (source read + temp write + attention
      read, ~5.5 ms/step on large-v3 b5 b16) but still ~3x cheaper than
      permuting the carry. A pure-XLA one-hot reformulation (einsum
      against all K ancestor rows + tiny-temp select) was measured SLOWER
      (21.5 vs 20.6 ms/step beam_run): XLA lowers the KxK-batched
      contractions to VPU broadcast-reduces.
    * Pallas (`pallas_split=True`, TPU): `ops/pallas_attn.py::
      split_self_attn_layer` fuses both attention halves and the ancestry
      resolution into one kernel that streams dk/dv exactly once — the
      one-hot lives in VMEM where it is free.

    Returns (logits [N, 1, V] f32, updated decode_cache).
    """
    dec = params["decoder"]
    dtype = dec["tok_emb"].dtype
    N = tokens.shape[0]
    B = N // beams
    H = cfg.n_text_head
    Dh_ = cfg.head_dim
    Tp = prompt_cache["k"].shape[-2]
    Td = decode_cache["k"].shape[-2]
    if row_pad is None:
        row_pad = jnp.zeros((N,), jnp.int32)

    buf_pos = prompt_len + step
    emb_pos = jnp.maximum(buf_pos - row_pad, 0)  # [N]
    x = dec["tok_emb"][tokens] + jnp.take(
        dec["pos_emb"], emb_pos, axis=0
    )[:, None, :].astype(dtype)

    # prompt keys: beam-shared; pad filler slots masked off ([B, Tp])
    row_pad_b = row_pad.reshape(B, beams)[:, 0]
    tp = jnp.arange(Tp)[None, :]
    pmask = jnp.where(
        (tp >= row_pad_b[:, None]) & (tp < prompt_len), 0.0, -jnp.inf
    ).astype(jnp.float32)
    # decode keys: slots written so far, this step's included ([Td])
    dmask = jnp.where(jnp.arange(Td) <= step, 0.0, -jnp.inf).astype(jnp.float32)

    cross_fn, cross_select, cross_stacked = _cross_attend_factory(
        cfg, cross_cache, beams, dtype, 1, mesh=mesh
    )

    def split_attn(q, pk, pv, dk, dv):
        # q [N,H,1,Dh]; pk/pv [B,H,Tp,Dh]; dk/dv [N,H,Td,Dh] (ancestry
        # pre-resolved by the caller when anc is set)
        Dh = q.shape[-1]
        scale = Dh ** -0.25
        qb = (q * scale).reshape(B, beams, H, Dh)
        sp = jnp.einsum(
            "bkhd,bhtd->bkht", qb, pk * scale,
            preferred_element_type=jnp.float32,
        ) + pmask[:, None, None, :]
        sd = jnp.einsum(
            "nhqd,nhtd->nhqt", q * scale, dk * scale,
            preferred_element_type=jnp.float32,
        )[:, :, 0].reshape(B, beams, H, Td) + dmask[None, None, None, :]
        w = jax.nn.softmax(jnp.concatenate([sp, sd], axis=-1), axis=-1)
        wp = w[..., :Tp].astype(pv.dtype)
        wd = w[..., Tp:].astype(dv.dtype).reshape(N, H, 1, Td)
        op = jnp.einsum(
            "bkht,bhtd->bkhd", wp, pv, preferred_element_type=jnp.float32)
        od = jnp.einsum(
            "nhqt,nhtd->nhqd", wd, dv, preferred_element_type=jnp.float32)
        return (op.reshape(N, H, 1, Dh) + od).astype(dv.dtype)

    if anc is not None:
        anc_idx = anc[:, None, :, None]  # broadcast over H and Dh

        def _deref(a):  # [N, H, Td, Dh] -> ancestry-resolved temp
            return jnp.take_along_axis(a, anc_idx, axis=0)
    else:
        def _deref(a):
            return a

    # Pallas path: only on the unrolled driver — the scan driver would
    # slice the cache operand per layer before the custom call, which
    # materializes a full per-layer copy (same trap as the cross kernel;
    # here the whole cache is passed and the kernel's index_map selects
    # the layer via scalar prefetch).
    use_split_kernel = pallas_split and unroll and anc is not None
    if use_split_kernel:
        from ..ops.pallas_attn import split_self_attn_layer

        anc_j = (anc % beams).reshape(B, beams, Td).astype(jnp.int32)

    L = cfg.n_text_layer
    # fused tail megakernel: same gate as decode_step (sampling steps are
    # always S == 1 here)
    use_tail = (
        dec.get("tail") is not None and unroll and mesh is None
        and ("k5" in cross_cache or "k8" in cross_cache) and beams <= 64
    )
    if unroll:
        dk, dv = decode_cache["k"], decode_cache["v"]
        pk, pv = prompt_cache["k"], prompt_cache["v"]
        for l in range(L):
            blk = jax.tree.map(lambda a: a[l], dec["blocks"])
            q, k_new, v_new = _decoder_qkv(x, blk, H)
            dk = jax.lax.dynamic_update_slice(
                dk, k_new[None], (l, 0, 0, step, 0))
            dv = jax.lax.dynamic_update_slice(
                dv, v_new[None], (l, 0, 0, step, 0))
            if use_split_kernel:
                self_out = split_self_attn_layer(
                    jnp.int32(l), q.reshape(B, beams, H, Dh_),
                    pk, pv, dk, dv, anc_j, step,
                    row_pad_b.astype(jnp.int32), prompt_len, mesh=mesh,
                ).reshape(N, H, 1, Dh_)
            else:
                self_out = split_attn(
                    q, pk[l], pv[l], _deref(dk[l]), _deref(dv[l]))
            if use_tail:
                x = _fused_tail_call(
                    dec, cross_cache, l, x, self_out, beams, cfg)
            else:
                ck, cv = cross_select(l)
                x = _decoder_layer_tail(
                    x, blk, self_out, cross_fn, ck, cv, jnp.int32(l), H)
        new_decode = {"k": dk, "v": dv}
    else:
        def layer(carry, xs):
            x, = carry
            blk, pk_l, pv_l, dk_l, dv_l, ck, cv, layer_idx = xs
            q, k_new, v_new = _decoder_qkv(x, blk, H)
            dk_l = jax.lax.dynamic_update_slice(dk_l, k_new, (0, 0, step, 0))
            dv_l = jax.lax.dynamic_update_slice(dv_l, v_new, (0, 0, step, 0))
            self_out = split_attn(q, pk_l, pv_l, _deref(dk_l), _deref(dv_l))
            x = _decoder_layer_tail(
                x, blk, self_out, cross_fn, ck, cv, layer_idx, H)
            return (x,), (dk_l, dv_l)

        cross_k, cross_v = cross_stacked(L)
        (x,), (dk, dv) = jax.lax.scan(
            layer, (x,),
            (dec["blocks"], prompt_cache["k"], prompt_cache["v"],
             decode_cache["k"], decode_cache["v"], cross_k, cross_v,
             jnp.arange(L)),
        )
        new_decode = {"k": dk, "v": dv}
    x = _ln(x, dec["ln_s"], dec["ln_b"])
    logits = jnp.einsum(
        "bsd,vd->bsv", x, dec["tok_emb"], preferred_element_type=jnp.float32
    )
    return logits, new_decode






def decoder_forward_nocache(
    params: Params,
    cfg: WhisperConfig,
    tokens: jnp.ndarray,  # [B, S]
    xa: jnp.ndarray,  # [B, Ta, D]
) -> jnp.ndarray:
    """Teacher-forced decoder pass without a cache (training / scoring).

    Returns logits [B, S, V] f32.
    """
    dec = params["decoder"]
    dtype = dec["tok_emb"].dtype
    B, S = tokens.shape
    H = cfg.n_text_head

    x = dec["tok_emb"][tokens] + dec["pos_emb"][:S][None].astype(dtype)
    causal = jnp.where(
        jnp.arange(S)[None, :] <= jnp.arange(S)[:, None], 0.0, -jnp.inf
    ).astype(jnp.float32)

    def layer(x, blk):
        h = _ln(x, blk["ln1_s"], blk["ln1_b"])
        q = _heads(h @ blk["q_w"] + blk["q_b"], H)
        k = _heads(h @ blk["k_w"], H)
        v = _heads(h @ blk["v_w"] + blk["v_b"], H)
        x = x + _unheads(_attn(q, k, v, causal[None, None])) @ blk["o_w"] + blk["o_b"]
        h = _ln(x, blk["ln2_s"], blk["ln2_b"])
        cq = _heads(h @ blk["cq_w"] + blk["cq_b"], H)
        ck = _heads(xa @ blk["ck_w"], H)
        cv = _heads(xa @ blk["cv_w"] + blk["cv_b"], H)
        x = x + _unheads(_attn(cq, ck, cv)) @ blk["co_w"] + blk["co_b"]
        h = _ln(x, blk["ln3_s"], blk["ln3_b"])
        h = jax.nn.gelu(h @ blk["fc1_w"] + blk["fc1_b"])
        x = x + h @ blk["fc2_w"] + blk["fc2_b"]
        return x, None

    x, _ = jax.lax.scan(layer, x, dec["blocks"])
    x = _ln(x, dec["ln_s"], dec["ln_b"])
    return jnp.einsum("bsd,vd->bsv", x, dec["tok_emb"], preferred_element_type=jnp.float32)


def alignment_cross_attn(
    params: Params,
    cfg: WhisperConfig,
    tokens: jnp.ndarray,  # [B, S]
    xa: jnp.ndarray,  # [B, Ta, D]
    heads: List[Tuple[int, int]],
) -> jnp.ndarray:
    """Teacher-forced pass capturing cross-attention of the DTW alignment
    heads only. Returns [B, K, S, Ta] f32 **scaled QK logits** (pre-softmax):
    openai's `find_alignment` slices the logit matrix to the valid audio
    frames BEFORE the softmax, so the normalization must happen on the host
    after slicing (`ops/dtw.py::token_anchor_times`).

    Unrolled over layers (not scanned) so head selection is static — only
    the K needed attention maps are ever materialized.
    """
    dec = params["decoder"]
    dtype = dec["tok_emb"].dtype
    B, S = tokens.shape
    H = cfg.n_text_head
    Dh = cfg.head_dim

    by_layer: Dict[int, List[int]] = {}
    for (l, h) in heads:
        by_layer.setdefault(l, []).append(h)

    x = dec["tok_emb"][tokens] + dec["pos_emb"][:S][None].astype(dtype)
    causal = jnp.where(
        jnp.arange(S)[None, :] <= jnp.arange(S)[:, None], 0.0, -jnp.inf
    ).astype(jnp.float32)

    blocks = dec["blocks"]
    captured: List[Tuple[Tuple[int, int], jnp.ndarray]] = []
    for l in range(cfg.n_text_layer):
        blk = jax.tree.map(lambda a: a[l], blocks)
        h_ = _ln(x, blk["ln1_s"], blk["ln1_b"])
        q = _heads(h_ @ blk["q_w"] + blk["q_b"], H)
        k = _heads(h_ @ blk["k_w"], H)
        v = _heads(h_ @ blk["v_w"] + blk["v_b"], H)
        x = x + _unheads(_attn(q, k, v, causal[None, None])) @ blk["o_w"] + blk["o_b"]

        h_ = _ln(x, blk["ln2_s"], blk["ln2_b"])
        cq = _heads(h_ @ blk["cq_w"] + blk["cq_b"], H)
        ck = _heads(xa @ blk["ck_w"], H)
        cv = _heads(xa @ blk["cv_w"] + blk["cv_b"], H)
        if l in by_layer:
            scale = Dh ** -0.25
            logits = jnp.einsum(
                "bhqd,bhkd->bhqk", cq * scale, ck * scale,
                preferred_element_type=jnp.float32,
            )  # [B, H, S, Ta] f32 scaled QK (softmax deferred to the host)
            for hd in by_layer[l]:
                captured.append(((l, hd), logits[:, hd]))
        x = x + _unheads(_attn(cq, ck, cv)) @ blk["co_w"] + blk["co_b"]

        h_ = _ln(x, blk["ln3_s"], blk["ln3_b"])
        h_ = jax.nn.gelu(h_ @ blk["fc1_w"] + blk["fc1_b"])
        x = x + h_ @ blk["fc2_w"] + blk["fc2_b"]

    # order captured maps to match `heads`
    order = {lh: i for i, (lh, _) in enumerate(captured)}
    maps = [captured[order[lh]][1] for lh in heads]
    return jnp.stack(maps, axis=1)  # [B, K, S, Ta]


def detect_language_logits(
    params: Params, cfg: WhisperConfig, xa: jnp.ndarray, sot_id: int
) -> jnp.ndarray:
    """One decoder step from <|startoftranscript|>; returns [B, V] f32 logits
    (mask language tokens downstream). Mirrors whisper.cpp's
    `full_lang_id_from_state` capability (`transcribe.rs:392-395`)."""
    B = xa.shape[0]
    tokens = jnp.full((B, 1), sot_id, jnp.int32)
    cache = init_self_cache(cfg, B, xa.dtype)
    cc = cross_kv(params, xa, cfg)
    logits, _ = decode_step(params, cfg, tokens, jnp.int32(0), cache, cc)
    return logits[:, 0]
