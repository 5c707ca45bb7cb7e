"""Encoder attention cost attribution + flash-attention trials.

NEGATIVE RESULT (round-2 cont., v5e): encoder self-attention is VPU/compute
bound, not HBM bound — flash kernels do NOT beat XLA's fused softmax here.
Measured on large-v3 b16 (all end-to-end encode):
  full (XLA, compact bf16 probs)            357 ms
  no-attn (attention skipped, upper bound)  188 ms
  custom online-softmax flash (512x512)     455 ms
  custom single-pass flash (512 x full-row) 370 ms
  jax stock TPU flash_attention (Dh=64)    1032 ms
The custom kernels are numerically correct (5e-7 vs f32 reference in
interpret mode); they lose on the serialized matmul->softmax->matmul
dependency per block and the f32 exp passes that XLA's bf16 fused softmax
pipelines better. Kept HERE (not in the package) as the record.

Variants: full | no-attn | flash-custom (single_pass=True default)

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

    if mode == "flash-custom":
        def attn(q, k, v):
            return encoder_self_attention(
                q, k, v, interpret=jax.default_backend() != "tpu")
    elif mode == "flash":
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
    for mode in ("full", "no-attn", "flash-custom"):
        try:
            enc = make_encode(cfg, mode)
            t = best_of(lambda: enc(params, mel)[0, 0, :1])
            outs[mode] = enc(params, mel)
            print(f"{mode:8s} {t*1e3:8.1f} ms")
        except Exception as e:  # noqa: BLE001
            print(f"{mode:8s} FAILED: {type(e).__name__}: {str(e)[:140]}")
    if "full" in outs and "flash-custom" in outs:
        a = np.asarray(outs["full"], np.float32)
        b = np.asarray(outs["flash-custom"], np.float32)
        rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
        print(f"flash-custom vs full: max rel diff {rel:.2e}")


# --- experimental flash kernels (see NEGATIVE RESULT in the docstring) ---
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402


def cdiv(a: int, b: int) -> int:
    return -(-a // b)



from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _enc_flash_kernel(ta_total: int, scale: float, t_blk: int,
                      q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref):
    ik = pl.program_id(3)
    n_k = pl.num_programs(3)

    @pl.when(ik == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0, 0]  # [TQ, Dh]
    k = k_ref[0, 0]  # [TK, Dh]
    v = v_ref[0, 0]  # [TK, Dh]

    # scores [TQ, TK]; scale split across q and k like models.whisper._attn
    s = jax.lax.dot_general(
        (q.astype(jnp.float32) * scale).astype(q.dtype),
        (k.astype(jnp.float32) * scale).astype(k.dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=1)
    s = jnp.where((ik * t_blk + col) < ta_total, s, -jnp.inf)

    m_prev = m_ref[:, 0]  # [TQ]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new[:, None])  # [TQ, TK] f32
    l_ref[:, 0] = l_ref[:, 0] * alpha + jnp.sum(p, axis=-1)
    pv = jax.lax.dot_general(
        p.astype(v.dtype), v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [TQ, Dh]
    acc_ref[:] = acc_ref[:] * alpha[:, None] + pv
    m_ref[:, 0] = m_new

    @pl.when(ik == n_k - 1)
    def _():
        o_ref[0, 0] = (acc_ref[:] / l_ref[:, 0][:, None]).astype(o_ref.dtype)


def _enc_flash_kernel_1pass(ta_total: int, scale: float,
                            q_ref, k_ref, v_ref, o_ref):
    """Single-pass variant: each query block sees the ENTIRE key row, so the
    softmax is one plain (not online) normalization — fewer VPU passes and
    no cross-block scratch dependency. Scores block [TQ, TP] f32 stays in
    VMEM (3 MB at 512 x 1536)."""
    q = q_ref[0, 0]  # [TQ, Dh]
    k = k_ref[0, 0]  # [TP, Dh]
    v = v_ref[0, 0]  # [TP, Dh]
    s = jax.lax.dot_general(
        (q.astype(jnp.float32) * scale).astype(q.dtype),
        (k.astype(jnp.float32) * scale).astype(k.dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=1)
    s = jnp.where(col < ta_total, s, -jnp.inf)
    m = jnp.max(s, axis=-1)
    p = jnp.exp(s - m[:, None]).astype(v.dtype)  # bf16 probs (XLA-compact-like)
    l = jnp.sum(p.astype(jnp.float32), axis=-1)
    o = jax.lax.dot_general(
        p, v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0, 0] = (o / l[:, None]).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("ta_total", "interpret", "single_pass"))
def encoder_self_attention(
    q: jnp.ndarray,  # [B, H, T, Dh]
    k: jnp.ndarray,
    v: jnp.ndarray,
    ta_total: int | None = None,  # valid key positions (defaults to T)
    interpret: bool = False,
    single_pass: bool = True,
) -> jnp.ndarray:
    """Full (non-causal) self-attention without materializing [T, T] probs.

    Pads T up to a block multiple; padded KEY columns are masked to -inf,
    padded QUERY rows compute garbage that is sliced off before returning.
    """
    B, H, T, Dh = q.shape
    if ta_total is None:
        ta_total = T
    blk = 512 if T >= 512 else cdiv(T, 128) * 128
    TP = cdiv(T, blk) * blk
    if TP != T:
        pad = ((0, 0), (0, 0), (0, TP - T), (0, 0))
        q, k, v = (jnp.pad(t, pad) for t in (q, k, v))
    n_blk = TP // blk
    scale = float(Dh) ** -0.25

    if single_pass:
        out = pl.pallas_call(
            functools.partial(_enc_flash_kernel_1pass, int(ta_total), scale),
            grid=(B, H, n_blk),
            in_specs=[
                pl.BlockSpec((1, 1, blk, Dh), lambda b, h, iq: (b, h, iq, 0)),
                pl.BlockSpec((1, 1, TP, Dh), lambda b, h, iq: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, TP, Dh), lambda b, h, iq: (b, h, 0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, blk, Dh), lambda b, h, iq: (b, h, iq, 0)),
            out_shape=jax.ShapeDtypeStruct((B, H, TP, Dh), q.dtype),
            interpret=interpret,
        )(q, k, v)
        return out[:, :, :T]

    out = pl.pallas_call(
        functools.partial(_enc_flash_kernel, int(ta_total), scale, blk),
        grid=(B, H, n_blk, n_blk),
        in_specs=[
            pl.BlockSpec((1, 1, blk, Dh), lambda b, h, iq, ik: (b, h, iq, 0)),
            pl.BlockSpec((1, 1, blk, Dh), lambda b, h, iq, ik: (b, h, ik, 0)),
            pl.BlockSpec((1, 1, blk, Dh), lambda b, h, iq, ik: (b, h, ik, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, blk, Dh), lambda b, h, iq, ik: (b, h, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, TP, Dh), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((blk, 1), jnp.float32),   # running max
            pltpu.VMEM((blk, 1), jnp.float32),   # normalizer
            pltpu.VMEM((blk, Dh), jnp.float32),  # output accumulator
        ],
        interpret=interpret,
    )(q, k, v)
    return out[:, :, :T]


if __name__ == "__main__":
    main()
