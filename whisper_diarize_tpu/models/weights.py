"""Checkpoint I/O: HF safetensors <-> the stacked-layer JAX param layout.

The reference consumes single-file GGML checkpoints (`ggml-{model}.bin`,
`/root/reference/src/model_manager.rs:162`) parsed inside whisper.cpp. The
TPU build loads HF `openai/whisper-*` snapshots (config.json +
model.safetensors) directly into the stacked pytree of
`models/whisper.py::init_params` — no GGML. Two on-disk layouts are read:

* **HF transformers layout** (`model.encoder.layers.{i}.self_attn.q_proj...`)
  — converted tensor-by-tensor, layers stacked onto the leading axis,
* **native layout** (flat dotted keys mirroring our pytree, written by
  `save_params`) — used for test fixtures and re-exported checkpoints.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import whisper as wm


def hf_config_to_whisper_config(cfg: Dict[str, Any]) -> wm.WhisperConfig:
    """Map an HF WhisperConfig dict to our WhisperConfig."""
    vocab = int(cfg.get("vocab_size", 51865))
    multilingual = vocab != 51864
    num_languages = 100 if vocab == 51866 else 99
    return wm.WhisperConfig(
        n_mels=int(cfg.get("num_mel_bins", 80)),
        n_vocab=vocab,
        n_audio_ctx=int(cfg.get("max_source_positions", 1500)),
        n_audio_state=int(cfg.get("d_model", 512)),
        n_audio_head=int(cfg.get("encoder_attention_heads", 8)),
        n_audio_layer=int(cfg.get("encoder_layers", 6)),
        n_text_ctx=int(cfg.get("max_target_positions", 448)),
        n_text_state=int(cfg.get("d_model", 512)),
        n_text_head=int(cfg.get("decoder_attention_heads", 8)),
        n_text_layer=int(cfg.get("decoder_layers", 6)),
        multilingual=multilingual,
        num_languages=num_languages,
    )


def whisper_config_to_dict(cfg: wm.WhisperConfig) -> Dict[str, Any]:
    return {
        "num_mel_bins": cfg.n_mels,
        "vocab_size": cfg.n_vocab,
        "max_source_positions": cfg.n_audio_ctx,
        "d_model": cfg.n_audio_state,
        "encoder_attention_heads": cfg.n_audio_head,
        "encoder_layers": cfg.n_audio_layer,
        "max_target_positions": cfg.n_text_ctx,
        "decoder_attention_heads": cfg.n_text_head,
        "decoder_layers": cfg.n_text_layer,
    }


def _flatten(tree: Dict[str, Any], prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for k, v in tree.items():
        key = f"{prefix}{k}" if not prefix else f"{prefix}.{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for k, v in flat.items():
        cur = out
        parts = k.split(".")
        for p in parts[:-1]:
            cur = cur.setdefault(p, {})
        cur[parts[-1]] = v
    return out


def save_params(params: Dict[str, Any], cfg: wm.WhisperConfig, dir_path) -> None:
    """Write a native-layout snapshot dir (config.json + model.safetensors)."""
    from safetensors.numpy import save_file

    d = Path(dir_path)
    d.mkdir(parents=True, exist_ok=True)
    flat = _flatten(jax.tree.map(np.asarray, params))
    save_file(flat, str(d / "model.safetensors"), metadata={"format": "wdt-native"})
    cfg_dict = whisper_config_to_dict(cfg)
    cfg_dict["wdt_native"] = True
    (d / "config.json").write_text(json.dumps(cfg_dict))


def convert_hf_params(
    flat: Dict[str, np.ndarray], cfg: wm.WhisperConfig, dtype=jnp.float32
) -> Dict[str, Any]:
    """HF transformers whisper tensors -> stacked pytree.

    HF linears are [out, in] (transposed to our [in, out]); per-layer tensors
    are stacked on a leading layer axis for the lax.scan forward.
    """

    def g(name):
        return np.asarray(flat[name])

    def lin_w(name):
        return g(name).T  # [in, out]

    def stack(fmt, L, f):
        return np.stack([f(fmt.format(i=i)) for i in range(L)])

    Le, Ld = cfg.n_audio_layer, cfg.n_text_layer
    e = "model.encoder.layers.{i}."
    d = "model.decoder.layers.{i}."

    enc_blocks = {
        "ln1_s": stack(e + "self_attn_layer_norm.weight", Le, g),
        "ln1_b": stack(e + "self_attn_layer_norm.bias", Le, g),
        "q_w": stack(e + "self_attn.q_proj.weight", Le, lin_w),
        "q_b": stack(e + "self_attn.q_proj.bias", Le, g),
        "k_w": stack(e + "self_attn.k_proj.weight", Le, lin_w),
        "v_w": stack(e + "self_attn.v_proj.weight", Le, lin_w),
        "v_b": stack(e + "self_attn.v_proj.bias", Le, g),
        "o_w": stack(e + "self_attn.out_proj.weight", Le, lin_w),
        "o_b": stack(e + "self_attn.out_proj.bias", Le, g),
        "ln2_s": stack(e + "final_layer_norm.weight", Le, g),
        "ln2_b": stack(e + "final_layer_norm.bias", Le, g),
        "fc1_w": stack(e + "fc1.weight", Le, lin_w),
        "fc1_b": stack(e + "fc1.bias", Le, g),
        "fc2_w": stack(e + "fc2.weight", Le, lin_w),
        "fc2_b": stack(e + "fc2.bias", Le, g),
    }
    dec_blocks = {
        "ln1_s": stack(d + "self_attn_layer_norm.weight", Ld, g),
        "ln1_b": stack(d + "self_attn_layer_norm.bias", Ld, g),
        "q_w": stack(d + "self_attn.q_proj.weight", Ld, lin_w),
        "q_b": stack(d + "self_attn.q_proj.bias", Ld, g),
        "k_w": stack(d + "self_attn.k_proj.weight", Ld, lin_w),
        "v_w": stack(d + "self_attn.v_proj.weight", Ld, lin_w),
        "v_b": stack(d + "self_attn.v_proj.bias", Ld, g),
        "o_w": stack(d + "self_attn.out_proj.weight", Ld, lin_w),
        "o_b": stack(d + "self_attn.out_proj.bias", Ld, g),
        "ln2_s": stack(d + "encoder_attn_layer_norm.weight", Ld, g),
        "ln2_b": stack(d + "encoder_attn_layer_norm.bias", Ld, g),
        "cq_w": stack(d + "encoder_attn.q_proj.weight", Ld, lin_w),
        "cq_b": stack(d + "encoder_attn.q_proj.bias", Ld, g),
        "ck_w": stack(d + "encoder_attn.k_proj.weight", Ld, lin_w),
        "cv_w": stack(d + "encoder_attn.v_proj.weight", Ld, lin_w),
        "cv_b": stack(d + "encoder_attn.v_proj.bias", Ld, g),
        "co_w": stack(d + "encoder_attn.out_proj.weight", Ld, lin_w),
        "co_b": stack(d + "encoder_attn.out_proj.bias", Ld, g),
        "ln3_s": stack(d + "final_layer_norm.weight", Ld, g),
        "ln3_b": stack(d + "final_layer_norm.bias", Ld, g),
        "fc1_w": stack(d + "fc1.weight", Ld, lin_w),
        "fc1_b": stack(d + "fc1.bias", Ld, g),
        "fc2_w": stack(d + "fc2.weight", Ld, lin_w),
        "fc2_b": stack(d + "fc2.bias", Ld, g),
    }
    params = {
        "encoder": {
            # HF conv weight [out, in, k] -> our [k, in, out]
            "conv1_w": g("model.encoder.conv1.weight").transpose(2, 1, 0),
            "conv1_b": g("model.encoder.conv1.bias"),
            "conv2_w": g("model.encoder.conv2.weight").transpose(2, 1, 0),
            "conv2_b": g("model.encoder.conv2.bias"),
            "pos": g("model.encoder.embed_positions.weight"),
            "blocks": enc_blocks,
            "ln_post_s": g("model.encoder.layer_norm.weight"),
            "ln_post_b": g("model.encoder.layer_norm.bias"),
        },
        "decoder": {
            "tok_emb": g("model.decoder.embed_tokens.weight"),
            "pos_emb": g("model.decoder.embed_positions.weight"),
            "blocks": dec_blocks,
            "ln_s": g("model.decoder.layer_norm.weight"),
            "ln_b": g("model.decoder.layer_norm.bias"),
        },
    }
    return jax.tree.map(lambda a: jnp.asarray(a, dtype), params)


def load_model(
    model_dir, dtype=jnp.float32
) -> Tuple[Dict[str, Any], wm.WhisperConfig]:
    """Load (params, config) from a snapshot directory (either layout)."""
    from safetensors.numpy import load_file

    d = Path(model_dir)
    with open(d / "config.json") as f:
        cfg_dict = json.load(f)
    cfg = hf_config_to_whisper_config(cfg_dict)
    flat = load_file(str(d / "model.safetensors"))
    if cfg_dict.get("wdt_native") or any(k.startswith("encoder.") for k in flat):
        params = jax.tree.map(
            lambda a: jnp.asarray(a, dtype), _unflatten(dict(flat))
        )
    else:
        params = convert_hf_params(flat, cfg, dtype)
    return params, cfg


def _dims_to_config(dims: Dict[str, Any]) -> wm.WhisperConfig:
    vocab = int(dims["n_vocab"])
    return wm.WhisperConfig(
        n_mels=int(dims["n_mels"]), n_vocab=vocab,
        n_audio_ctx=int(dims["n_audio_ctx"]), n_audio_state=int(dims["n_audio_state"]),
        n_audio_head=int(dims["n_audio_head"]), n_audio_layer=int(dims["n_audio_layer"]),
        n_text_ctx=int(dims["n_text_ctx"]), n_text_state=int(dims["n_text_state"]),
        n_text_head=int(dims["n_text_head"]), n_text_layer=int(dims["n_text_layer"]),
        multilingual=vocab != 51864, num_languages=100 if vocab == 51866 else 99,
    )


def load_openai_pt(path, dtype=jnp.float32) -> Tuple[Dict[str, Any], wm.WhisperConfig]:
    """Load an original OpenAI whisper checkpoint (.pt: {"dims", "model_state_dict"}).

    OpenAI layout: encoder.blocks.{i}.attn.{query,key,value,out},
    mlp.0/mlp.2, attn_ln/mlp_ln; decoder adds cross_attn/cross_attn_ln;
    linear weights are [out, in]. Requires torch (CPU) to deserialize.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    dims = ckpt["dims"]
    if not isinstance(dims, dict):
        dims = dims.__dict__
    sd = {k: v.numpy() for k, v in ckpt["model_state_dict"].items()}
    cfg = _dims_to_config(dims)
    return convert_openai_params(sd, cfg, dtype), cfg


def convert_openai_params(
    sd: Dict[str, np.ndarray], cfg: wm.WhisperConfig, dtype=jnp.float32
) -> Dict[str, Any]:
    """OpenAI-named tensors (also used verbatim inside GGML files) ->
    stacked pytree."""

    def g(name):
        return np.asarray(sd[name])

    def lin_w(name):
        return g(name).T

    def stack(fmt, L, f):
        return np.stack([f(fmt.format(i=i)) for i in range(L)])

    Le, Ld = cfg.n_audio_layer, cfg.n_text_layer
    e = "encoder.blocks.{i}."
    d = "decoder.blocks.{i}."
    enc_blocks = {
        "ln1_s": stack(e + "attn_ln.weight", Le, g),
        "ln1_b": stack(e + "attn_ln.bias", Le, g),
        "q_w": stack(e + "attn.query.weight", Le, lin_w),
        "q_b": stack(e + "attn.query.bias", Le, g),
        "k_w": stack(e + "attn.key.weight", Le, lin_w),
        "v_w": stack(e + "attn.value.weight", Le, lin_w),
        "v_b": stack(e + "attn.value.bias", Le, g),
        "o_w": stack(e + "attn.out.weight", Le, lin_w),
        "o_b": stack(e + "attn.out.bias", Le, g),
        "ln2_s": stack(e + "mlp_ln.weight", Le, g),
        "ln2_b": stack(e + "mlp_ln.bias", Le, g),
        "fc1_w": stack(e + "mlp.0.weight", Le, lin_w),
        "fc1_b": stack(e + "mlp.0.bias", Le, g),
        "fc2_w": stack(e + "mlp.2.weight", Le, lin_w),
        "fc2_b": stack(e + "mlp.2.bias", Le, g),
    }
    dec_blocks = {
        "ln1_s": stack(d + "attn_ln.weight", Ld, g),
        "ln1_b": stack(d + "attn_ln.bias", Ld, g),
        "q_w": stack(d + "attn.query.weight", Ld, lin_w),
        "q_b": stack(d + "attn.query.bias", Ld, g),
        "k_w": stack(d + "attn.key.weight", Ld, lin_w),
        "v_w": stack(d + "attn.value.weight", Ld, lin_w),
        "v_b": stack(d + "attn.value.bias", Ld, g),
        "o_w": stack(d + "attn.out.weight", Ld, lin_w),
        "o_b": stack(d + "attn.out.bias", Ld, g),
        "ln2_s": stack(d + "cross_attn_ln.weight", Ld, g),
        "ln2_b": stack(d + "cross_attn_ln.bias", Ld, g),
        "cq_w": stack(d + "cross_attn.query.weight", Ld, lin_w),
        "cq_b": stack(d + "cross_attn.query.bias", Ld, g),
        "ck_w": stack(d + "cross_attn.key.weight", Ld, lin_w),
        "cv_w": stack(d + "cross_attn.value.weight", Ld, lin_w),
        "cv_b": stack(d + "cross_attn.value.bias", Ld, g),
        "co_w": stack(d + "cross_attn.out.weight", Ld, lin_w),
        "co_b": stack(d + "cross_attn.out.bias", Ld, g),
        "ln3_s": stack(d + "mlp_ln.weight", Ld, g),
        "ln3_b": stack(d + "mlp_ln.bias", Ld, g),
        "fc1_w": stack(d + "mlp.0.weight", Ld, lin_w),
        "fc1_b": stack(d + "mlp.0.bias", Ld, g),
        "fc2_w": stack(d + "mlp.2.weight", Ld, lin_w),
        "fc2_b": stack(d + "mlp.2.bias", Ld, g),
    }
    # encoder positional sinusoids: buffer may be absent from the state
    # dict (whisper.cpp can recompute them) — we recompute identically
    if "encoder.positional_embedding" in sd:
        enc_pos = g("encoder.positional_embedding")
    else:
        enc_pos = wm.sinusoids(cfg.n_audio_ctx, cfg.n_audio_state)
    params = {
        "encoder": {
            # torch conv [out, in, k] -> ours [k, in, out]
            "conv1_w": g("encoder.conv1.weight").transpose(2, 1, 0),
            "conv1_b": g("encoder.conv1.bias").reshape(-1),
            "conv2_w": g("encoder.conv2.weight").transpose(2, 1, 0),
            "conv2_b": g("encoder.conv2.bias").reshape(-1),
            "pos": enc_pos,
            "blocks": enc_blocks,
            "ln_post_s": g("encoder.ln_post.weight"),
            "ln_post_b": g("encoder.ln_post.bias"),
        },
        "decoder": {
            "tok_emb": g("decoder.token_embedding.weight"),
            "pos_emb": g("decoder.positional_embedding"),
            "blocks": dec_blocks,
            "ln_s": g("decoder.ln.weight"),
            "ln_b": g("decoder.ln.bias"),
        },
    }
    return jax.tree.map(lambda a: jnp.asarray(a, dtype), params)


def init_random_snapshot(
    dir_path, model_name: Optional[str] = None,
    cfg: Optional[wm.WhisperConfig] = None, seed: int = 0,
) -> wm.WhisperConfig:
    """Write a random-weight native snapshot (offline test fixture)."""
    if cfg is None:
        cfg = wm.PRESETS[model_name or "tiny"]
    params = wm.init_params(cfg, seed=seed)
    save_params(params, cfg, dir_path)
    return cfg
