"""Attribute the decode layer's ~0.16 ms/layer overhead (vs HBM floor).

Fits from tools/bench_decode_breakdown.py: decode_step costs ~0.415
ms/layer (large-v3 vs turbo slope) with no fixed per-step cost, while the
HBM floor is ~0.255 ms/layer (cross kernel 0.17 + weights 0.07 + cache
0.015). Variants here isolate the rest:

  v0  current decode_step layer (baseline)
  v1  cross_out = 0 (skip the Pallas call: is the kernel slower in-context?)
  v2  fused self-QKV matmul [D, 3D] (3 launches -> 1)
  v3  v2 + skip cross

Run: python tools/bench_layer_variants.py [model]
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
from whisper_diarize_tpu.ops import decode as dec
from whisper_diarize_tpu.tokenizer import DebugTokenizer

B = 16


def best_of(f, n=5):
    np.asarray(f())
    best = np.inf
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(f())
        best = min(best, time.perf_counter() - t0)
    return best


def make_loop_unrolled(cfg, P, *, skip_cross: bool):
    """Python-unrolled layer loop: weights indexed with STATIC slices so XLA
    reads them in place instead of materializing per-layer copies each step
    (the lax.scan dynamic-slice forces a write+read of all decoder weights
    every decode step — seen as kLoop 'squeeze' fusions in the HLO)."""
    H = cfg.n_text_head
    L = cfg.n_text_layer

    @functools.partial(jax.jit, static_argnames=("budget",))
    def loop(p, cache, cross, budget):
        dec_p = p["decoder"]
        dtype = dec_p["tok_emb"].dtype
        tok = jnp.full((B, 1), 100, jnp.int32)
        Tc = cache["k"].shape[-2]
        blocks = dec_p["blocks"]

        def step_fn(s):
            step, kc, vc, acc = s
            pos = P + step
            x = dec_p["tok_emb"][tok] + jax.lax.dynamic_slice(
                dec_p["pos_emb"], (pos, 0), (1, dec_p["pos_emb"].shape[1])
            )[None].astype(dtype)
            kpos = jnp.arange(Tc)[None, :]
            mask = jnp.where(kpos <= pos, 0.0, -jnp.inf).astype(jnp.float32)
            mask = mask[None, None]

            for l in range(L):
                blk = {k: v[l] for k, v in blocks.items()}
                h = _ln(x, blk["ln1_s"], blk["ln1_b"])
                q = _heads(h @ blk["q_w"] + blk["q_b"], H)
                k_new = _heads(h @ blk["k_w"], H)
                v_new = _heads(h @ blk["v_w"] + blk["v_b"], H)
                kc = jax.lax.dynamic_update_slice(
                    kc, k_new[None], (l, 0, 0, pos, 0))
                vc = jax.lax.dynamic_update_slice(
                    vc, v_new[None], (l, 0, 0, pos, 0))
                x = x + _unheads(_attn(q, kc[l], vc[l], mask)) @ blk["o_w"] \
                    + blk["o_b"]
                h = _ln(x, blk["ln2_s"], blk["ln2_b"])
                cq = _heads(h @ blk["cq_w"] + blk["cq_b"], H)
                if skip_cross:
                    cross_out = cq * 0.0
                else:
                    from whisper_diarize_tpu.ops.pallas_attn import (
                        cross_attn_layer,
                    )
                    Nb, Hh, Sq, Dh = cq.shape
                    qf = jnp.transpose(cq, (0, 2, 1, 3)).reshape(
                        Nb, Sq, Hh, Dh)
                    out = cross_attn_layer(
                        jnp.int32(l), qf, cross["k5"], cross["v5"],
                        ta_total=cfg.n_audio_ctx,
                        interpret=jax.default_backend() != "tpu",
                    )
                    cross_out = jnp.transpose(out, (0, 2, 1, 3))
                x = x + _unheads(cross_out) @ blk["co_w"] + blk["co_b"]
                h = _ln(x, blk["ln3_s"], blk["ln3_b"])
                h = jax.nn.gelu(h @ blk["fc1_w"] + blk["fc1_b"])
                x = x + h @ blk["fc2_w"] + blk["fc2_b"]

            x = _ln(x, dec_p["ln_s"], dec_p["ln_b"])
            logits = jnp.einsum("bsd,vd->bsv", x, dec_p["tok_emb"],
                                preferred_element_type=jnp.float32)
            return step + 1, kc, vc, acc + logits[:, 0, 0]

        _, _, _, acc = jax.lax.while_loop(
            lambda s: s[0] < budget, step_fn,
            (jnp.int32(0), cache["k"], cache["v"], jnp.zeros(B)),
        )
        return acc[:1]

    return loop


def make_loop(cfg, P, *, skip_cross: bool, fused_qkv: bool):
    H = cfg.n_text_head

    @functools.partial(jax.jit, static_argnames=("budget",))
    def loop(p, cache, cross, budget):
        dec_p = p["decoder"]
        dtype = dec_p["tok_emb"].dtype
        tok = jnp.full((B, 1), 100, jnp.int32)
        Tc = cache["k"].shape[-2]

        def step_fn(s):
            step, kc, vc, acc = s
            pos = P + step
            x = dec_p["tok_emb"][tok] + jax.lax.dynamic_slice(
                dec_p["pos_emb"], (pos, 0), (1, dec_p["pos_emb"].shape[1])
            )[None].astype(dtype)
            kpos = jnp.arange(Tc)[None, :]
            mask = jnp.where(kpos <= pos, 0.0, -jnp.inf).astype(jnp.float32)
            mask = mask[None, None, None, :, 0] if False else mask[None, None]

            def layer(carry, blk_l):
                x, = carry
                blk, kcache, vcache, lidx = blk_l
                h = _ln(x, blk["ln1_s"], blk["ln1_b"])
                if fused_qkv:
                    qkv = h @ blk["qkv_w"] + blk["qkv_b"]
                    q, k_new, v_new = (
                        _heads(t, H) for t in jnp.split(qkv, 3, axis=-1)
                    )
                else:
                    q = _heads(h @ blk["q_w"] + blk["q_b"], H)
                    k_new = _heads(h @ blk["k_w"], H)
                    v_new = _heads(h @ blk["v_w"] + blk["v_b"], H)
                kcache = jax.lax.dynamic_update_slice(
                    kcache, k_new, (0, 0, pos, 0))
                vcache = jax.lax.dynamic_update_slice(
                    vcache, v_new, (0, 0, pos, 0))
                x = x + _unheads(_attn(q, kcache, vcache, mask)) @ blk["o_w"] \
                    + blk["o_b"]
                h = _ln(x, blk["ln2_s"], blk["ln2_b"])
                cq = _heads(h @ blk["cq_w"] + blk["cq_b"], H)
                if skip_cross:
                    cross_out = cq * 0.0
                else:
                    from whisper_diarize_tpu.ops.pallas_attn import (
                        cross_attn_layer,
                    )
                    Nb, Hh, Sq, Dh = cq.shape
                    qf = jnp.transpose(cq, (0, 2, 1, 3)).reshape(Nb, Sq, Hh, Dh)
                    out = cross_attn_layer(
                        lidx, qf, cross["k5"], cross["v5"],
                        ta_total=cfg.n_audio_ctx,
                        interpret=jax.default_backend() != "tpu",
                    )
                    cross_out = jnp.transpose(out, (0, 2, 1, 3))
                x = x + _unheads(cross_out) @ blk["co_w"] + blk["co_b"]
                h = _ln(x, blk["ln3_s"], blk["ln3_b"])
                h = jax.nn.gelu(h @ blk["fc1_w"] + blk["fc1_b"])
                x = x + h @ blk["fc2_w"] + blk["fc2_b"]
                return (x,), (kcache, vcache)

            blocks = dict(dec_p["blocks"])
            if fused_qkv:
                blocks["qkv_w"] = jnp.concatenate(
                    [blocks["q_w"], blocks["k_w"], blocks["v_w"]], axis=-1)
                blocks["qkv_b"] = jnp.concatenate(
                    [blocks["q_b"], jnp.zeros_like(blocks["q_b"]),
                     blocks["v_b"]], axis=-1)
                for key in ("q_w", "k_w", "v_w", "q_b", "v_b"):
                    del blocks[key]
            L = cfg.n_text_layer
            (x,), (kc2, vc2) = jax.lax.scan(
                layer, (x,), (blocks, kc, vc, jnp.arange(L)))
            x = _ln(x, dec_p["ln_s"], dec_p["ln_b"])
            logits = jnp.einsum("bsd,vd->bsv", x, dec_p["tok_emb"],
                                preferred_element_type=jnp.float32)
            return step + 1, kc2, vc2, acc + logits[:, 0, 0]

        _, _, _, acc = jax.lax.while_loop(
            lambda s: s[0] < budget, step_fn,
            (jnp.int32(0), cache["k"], cache["v"], jnp.zeros(B)),
        )
        return acc[:1]

    return loop


def main() -> None:
    model = sys.argv[1] if len(sys.argv) > 1 else "large-v3"
    cfg = wm.PRESETS[model]
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    params = wm.init_params_fast(cfg, dtype=dtype)
    tk = DebugTokenizer(num_languages=cfg.num_languages)
    P = 5
    xa = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (B, cfg.n_audio_ctx, cfg.n_audio_state)).astype(np.float32) * 0.05,
        dtype)
    cross = wm.tile_cross_cache(wm.cross_kv(params, xa, cfg))
    cache = wm.init_self_cache(cfg, B, dtype, 128)
    L = cfg.n_text_layer

    import os
    variants = [
        ("v0 baseline", dict(skip_cross=False, fused_qkv=False)),
        ("v1 no-cross", dict(skip_cross=True, fused_qkv=False)),
        ("v2 fused-qkv", dict(skip_cross=False, fused_qkv=True)),
        ("v3 fused+nocross", dict(skip_cross=True, fused_qkv=True)),
        ("v4 unrolled", dict(unrolled=True, skip_cross=False)),
        ("v5 unrolled-nocross", dict(unrolled=True, skip_cross=True)),
    ]
    sel = os.environ.get("WDT_VARIANTS")
    if sel:
        want = set(sel.split(","))
        variants = [v for v in variants if v[0].split()[0] in want]
    for name, kw in variants:
        if kw.pop("unrolled", False):
            loop = make_loop_unrolled(cfg, P, **kw)
        else:
            loop = make_loop(cfg, P, **kw)
        t32 = best_of(lambda: loop(params, cache, cross, budget=32))
        t64 = best_of(lambda: loop(params, cache, cross, budget=64))
        slope = (t64 - t32) / 32
        print(f"{name:18s} {slope*1e3:7.3f} ms/step  "
              f"{slope/L*1e3:7.4f} ms/layer")


if __name__ == "__main__":
    main()
