"""Encoder attention cost attribution + stock flash-attention trial.

encode() on large-v3 b16 runs at ~101 TF/s (355 ms) vs ~141 peak. The
suspect is the materialized [B,H,1500,1500] attention prob buffers
(~1.44 GB bf16 per layer). Variants:

  full        encode() as-is (compact bf16 probs)
  no-attn     attention output replaced by v (skips scores/softmax/pv)
  flash       jax stock Pallas flash_attention (padded 1500->1536 with
              segment-id masking), if it accepts head_dim=64

Run: python tools/bench_encoder_attn.py [model]
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from whisper_diarize_tpu.models import whisper as wm
from whisper_diarize_tpu.models.whisper import _attn, _heads, _ln, _unheads

B = 16


def best_of(f, n=5):
    np.asarray(f())
    best = np.inf
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(f())
        best = min(best, time.perf_counter() - t0)
    return best


def make_encode(cfg, mode):
    H = cfg.n_audio_head

    if mode == "flash":
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            BlockSizes, SegmentIds, flash_attention,
        )
        T = cfg.n_audio_ctx
        TP = -(-T // 512) * 512
        scale = (cfg.n_audio_state // H) ** -0.5

        def attn(q, k, v):
            pad = [(0, 0), (0, 0), (0, TP - T), (0, 0)]
            qp, kp, vp = (jnp.pad(t, pad) for t in (q, k, v))
            seg = (jnp.arange(TP) >= T).astype(jnp.int32)[None, :]
            seg = jnp.broadcast_to(seg, (q.shape[0], TP))
            o = flash_attention(
                qp, kp, vp, segment_ids=SegmentIds(q=seg, kv=seg),
                causal=False, sm_scale=scale,
            )
            return o[:, :, :T]
    elif mode == "no-attn":
        def attn(q, k, v):
            return v + q * 1e-9
    else:
        def attn(q, k, v):
            return _attn(q, k, v, compact_probs=True)

    @jax.jit
    def encode(params, mel):
        enc = params["encoder"]
        dtype = enc["conv1_w"].dtype
        x = jnp.swapaxes(mel.astype(dtype), -1, -2)
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

        def layer(x, blk):
            h = _ln(x, blk["ln1_s"], blk["ln1_b"])
            q = _heads(h @ blk["q_w"] + blk["q_b"], H)
            k = _heads(h @ blk["k_w"], H)
            v = _heads(h @ blk["v_w"] + blk["v_b"], H)
            x = x + _unheads(attn(q, k, v)) @ blk["o_w"] + blk["o_b"]
            h = _ln(x, blk["ln2_s"], blk["ln2_b"])
            h = jax.nn.gelu(h @ blk["fc1_w"] + blk["fc1_b"])
            x = x + h @ blk["fc2_w"] + blk["fc2_b"]
            return x, None

        x, _ = jax.lax.scan(layer, x, enc["blocks"])
        return _ln(x, enc["ln_post_s"], enc["ln_post_b"])

    return encode


def main() -> None:
    model = sys.argv[1] if len(sys.argv) > 1 else "large-v3"
    cfg = wm.PRESETS[model]
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    params = wm.init_params_fast(cfg, dtype=dtype)
    mel = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (B, cfg.n_mels, 3000)).astype(np.float32) * 0.3)

    outs = {}
    for mode in ("full", "no-attn", "flash"):
        try:
            enc = make_encode(cfg, mode)
            t = best_of(lambda: enc(params, mel)[0, 0, :1])
            outs[mode] = enc(params, mel)
            print(f"{mode:8s} {t*1e3:8.1f} ms")
        except Exception as e:  # noqa: BLE001
            print(f"{mode:8s} FAILED: {type(e).__name__}: {str(e)[:140]}")
    if "full" in outs and "flash" in outs:
        a = np.asarray(outs["full"], np.float32)
        b = np.asarray(outs["flash"], np.float32)
        rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
        print(f"flash vs full: max rel diff {rel:.2e}")


if __name__ == "__main__":
    main()
