"""GGML checkpoint reader: `ggml-{model}.bin`, the reference's native format.

The reference downloads whisper.cpp GGML files (`model_manager.rs:162`:
HF repo `ggerganov/whisper.cpp`, file `ggml-{model}.bin`) and parses them
inside whisper.cpp. Users migrating from the reference have these on disk,
so this module reads them directly into the stacked JAX pytree — weights,
hparams, the embedded mel filterbank and the embedded vocabulary (enough to
build a decode-capable tokenizer without any HF files).

File layout (whisper.cpp `models/convert-pt-to-ggml.py`):

  int32 magic 0x67676d6c ("ggml")
  int32 x11 hparams: n_vocab, n_audio_ctx, n_audio_state, n_audio_head,
        n_audio_layer, n_text_ctx, n_text_state, n_text_head, n_text_layer,
        n_mels, ftype (1 = f16 weights)
  int32 n_mel, int32 n_fft, f32[n_mel*n_fft] mel filters
  int32 n_tokens, then per token: int32 byte_len, raw bytes
  tensors until EOF: int32 n_dims, int32 name_len, int32 ftype
        int32[n_dims] ne (REVERSED numpy shape), name bytes,
        payload (f16 when ftype==1 else f32), no padding

Tensor names are the OpenAI checkpoint names (`encoder.blocks.0.attn...`),
so conversion reuses `weights.convert_openai_params`. GGML stores conv
biases as [n, 1] (the convert script reshapes them); the converter
flattens them back.
"""

from __future__ import annotations

import struct
from typing import Any, BinaryIO, Dict, List, Tuple

import jax.numpy as jnp
import numpy as np

from . import weights as weights_mod
from . import whisper as wm

GGML_MAGIC = 0x67676D6C


class GGMLFormatError(ValueError):
    pass


def _read_i32(f: BinaryIO, n: int = 1):
    data = f.read(4 * n)
    if len(data) < 4 * n:
        raise GGMLFormatError("truncated ggml file")
    vals = struct.unpack(f"<{n}i", data)
    return vals[0] if n == 1 else vals


def read_ggml(path) -> Tuple[Dict[str, np.ndarray], Dict[str, int],
                             np.ndarray, List[bytes]]:
    """Parse a ggml whisper file.

    Returns (tensors by OpenAI name, hparams dict, mel filters [n_mel,
    n_fft//2+1], vocab byte strings by id)."""
    with open(path, "rb") as f:
        magic = _read_i32(f)
        if magic != GGML_MAGIC:
            raise GGMLFormatError(
                f"not a ggml file (magic 0x{magic & 0xFFFFFFFF:08x})"
            )
        names = ("n_vocab", "n_audio_ctx", "n_audio_state", "n_audio_head",
                 "n_audio_layer", "n_text_ctx", "n_text_state", "n_text_head",
                 "n_text_layer", "n_mels", "ftype")
        hparams = dict(zip(names, _read_i32(f, len(names))))

        n_mel, n_fft = _read_i32(f, 2)
        filters = np.frombuffer(
            f.read(4 * n_mel * n_fft), dtype="<f4"
        ).reshape(n_mel, n_fft).copy()

        n_tokens = _read_i32(f)
        vocab: List[bytes] = []
        for _ in range(n_tokens):
            ln = _read_i32(f)
            vocab.append(f.read(ln))

        tensors: Dict[str, np.ndarray] = {}
        while True:
            head = f.read(12)
            if len(head) < 12:
                break
            n_dims, name_len, ftype = struct.unpack("<3i", head)
            if not (0 < n_dims <= 4) or not (0 < name_len < 512):
                raise GGMLFormatError("corrupt tensor header")
            ne = _read_i32(f, n_dims)
            ne = (ne,) if n_dims == 1 else ne
            name = f.read(name_len).decode("utf-8")
            shape = tuple(reversed(ne))  # ggml ne order -> numpy shape
            count = int(np.prod(shape))
            if ftype == 1:
                raw = np.frombuffer(f.read(2 * count), dtype="<f2")
            elif ftype == 0:
                raw = np.frombuffer(f.read(4 * count), dtype="<f4")
            else:
                raise GGMLFormatError(f"unsupported tensor ftype {ftype}")
            if raw.size != count:
                raise GGMLFormatError(f"truncated tensor {name}")
            tensors[name] = raw.reshape(shape).astype(np.float32)
    return tensors, hparams, filters, vocab


def load_ggml(path, dtype=jnp.float32) -> Tuple[
    Dict[str, Any], wm.WhisperConfig, List[bytes]
]:
    """GGML file -> (stacked params pytree, config, vocab byte table)."""
    tensors, hparams, _filters, vocab = read_ggml(path)
    cfg = weights_mod._dims_to_config(hparams)
    params = weights_mod.convert_openai_params(tensors, cfg, dtype)
    return params, cfg, vocab


def write_ggml(path, tensors: Dict[str, np.ndarray], hparams: Dict[str, int],
               filters: np.ndarray, vocab: List[bytes],
               use_f16: bool = True) -> None:
    """Write a ggml whisper file (round-trip tests + re-export)."""
    with open(path, "wb") as f:
        f.write(struct.pack("<i", GGML_MAGIC))
        for k in ("n_vocab", "n_audio_ctx", "n_audio_state", "n_audio_head",
                  "n_audio_layer", "n_text_ctx", "n_text_state", "n_text_head",
                  "n_text_layer", "n_mels"):
            f.write(struct.pack("<i", int(hparams[k])))
        f.write(struct.pack("<i", 1 if use_f16 else 0))
        filters = np.asarray(filters, "<f4")
        f.write(struct.pack("<ii", filters.shape[0], filters.shape[1]))
        f.write(filters.tobytes())
        f.write(struct.pack("<i", len(vocab)))
        for tok in vocab:
            f.write(struct.pack("<i", len(tok)))
            f.write(tok)
        for name, data in tensors.items():
            data = np.asarray(data, np.float32)
            # mirror the upstream convert script: conv biases become [n, 1]
            if name in ("encoder.conv1.bias", "encoder.conv2.bias"):
                data = data.reshape(-1, 1)
            # 1-D tensors and layernorms stay f32 upstream; f16 elsewhere
            f16 = use_f16 and data.ndim >= 2 and "ln" not in name
            nb = name.encode("utf-8")
            f.write(struct.pack("<3i", data.ndim, len(nb), 1 if f16 else 0))
            for d in reversed(data.shape):
                f.write(struct.pack("<i", d))
            f.write(nb)
            f.write(data.astype("<f2" if f16 else "<f4").tobytes())
