"""Beam-step layer-variant bisection (large-v3 b16 K=5, N=80).

The beam breakdown (tools/bench_beam_breakdown.py, round 4) reads
model_N80 = 11.9 ms/step against a ~8.1 ms byte floor (6.6 GB/step at
819 GB/s), while greedy runs at 78% of its floor. This tool rebuilds the
beam sampling step ADDITIVELY, one component at a time, to locate the
~3.9 ms of slack — the same bisection style that found the greedy scan
weight-slice regression (tools/bench_layer_variants.py).

Variants (cumulative unless noted):
  embed     token embed + final ln + logits einsum (no layers)
  qkv       + per-layer ln1/qkv projections + cache slot writes
  self      + XLA split-cache self-attention (pmask/dmask joint softmax)
  selfk     qkv + Pallas split_self_attn_layer with ancestry (not cumulative
            with `self`; swaps the XLA attention for the kernel)
  tail      qkv + fused tail megakernel (o/ln2/cross/co/ln3/mlp), no self
  xtail     qkv + XLA tail (unfused cross flash path), no self
  full      qkv + self + tail  (= decode_step_split structure)

Each part runs in its own subprocess (HBM + isolating compiles).
Run: python tools/bench_beam_variants.py [model]
"""

from __future__ import annotations

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from whisper_diarize_tpu.models import whisper as wm
from whisper_diarize_tpu.ops import decode as dec
from whisper_diarize_tpu.tokenizer import DebugTokenizer

B = 16
K = 5
STEPS = 64
PARTS = ("embed", "qkv", "self", "selfk", "tail", "xtail", "full")


def best_of(f, n=4):
    np.asarray(f())
    best = np.inf
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(f())
        best = min(best, time.perf_counter() - t0)
    return best


def slope(f32, f64):
    t32 = best_of(f32)
    t64 = best_of(f64)
    return t64, (t64 - t32) / 32


def main() -> None:
    model = sys.argv[1] if len(sys.argv) > 1 else "large-v3"
    part = os.environ.get("WDT_PART")
    if part is None:
        from prewarm import run_parts

        def cmd_env(p):
            return ([sys.executable, os.path.abspath(__file__), model],
                    {"WDT_PART": p})

        for p, out, err in run_parts(cmd_env, PARTS):
            line = out.strip().splitlines()
            print(line[-1] if line else f"{p}: FAILED\n{err[-600:]}",
                  flush=True)
        return

    from prewarm import child_handshake

    child_handshake()

    cfg = wm.PRESETS[model]
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    tk = DebugTokenizer(num_languages=cfg.num_languages)
    sp = tk.specials
    N = B * K
    H = cfg.n_text_head
    Dh = cfg.head_dim
    rng = np.random.default_rng(0)

    params = wm.init_params_fast(cfg, dtype=dtype)
    dc = dec.DecodeConfig(
        max_tokens=STEPS, with_timestamps=True, beam_size=K,
        pallas_cross=jax.default_backend() == "tpu",
    )
    if dec._resolve_pallas_tail(dc) and part in ("tail", "full"):
        from whisper_diarize_tpu.ops.pallas_tail import pack_tail_weights

        params = {
            **params,
            "decoder": {**params["decoder"],
                        "tail": pack_tail_weights(params, cfg)},
        }
    suppress = jnp.asarray(
        dec.build_suppress_mask(sp, cfg.n_vocab, extra_suppress=[sp.eot]))
    xa = jnp.asarray(
        rng.standard_normal((B, cfg.n_audio_ctx, cfg.n_audio_state))
        .astype(np.float32) * 0.05, dtype)
    prompt = jnp.asarray(
        np.tile(np.array(tk.sot_sequence(language="en"), np.int32), (B, 1)))
    P = prompt.shape[1]

    state = dec.beam_init(params, cfg, dc, sp, xa, prompt, P,
                          suppress_mask=suppress)
    cache, cross = state["cache"], state["cross"]
    del state
    decoder = params["decoder"]
    L = cfg.n_text_layer
    Tp = cache["pk"].shape[3]
    Td = cache["dk"].shape[3]

    pmask = jnp.where(jnp.arange(Tp)[None, :] < P, 0.0, -jnp.inf).astype(
        jnp.float32)  # [1, Tp] — no row_pad in this bench
    row_pad_b = jnp.zeros((B,), jnp.int32)

    def qkv_layers(p, crossd, pk, pv, x, dk, dv, step, with_self, with_tail,
                   use_kernel, anc_j=None):
        """One decode step over all layers, component-gated.

        `p`/`crossd`/`pk`/`pv` arrive as jit ARGUMENTS of the caller —
        closing over them captures ~7 GB of weights/caches as lowered
        constants, and the remote-compile POST of that HLO dies with a
        broken pipe (round-5 finding: every layer part failed that way)."""
        decoder_ = p["decoder"]
        cross_fn, cross_select, _ = wm._cross_attend_factory(
            cfg, crossd, K, dtype, 1, mesh=None)
        dmask = jnp.where(jnp.arange(Td) <= step, 0.0, -jnp.inf).astype(
            jnp.float32)
        for l in range(L):
            blk = jax.tree.map(lambda a: a[l], decoder_["blocks"])
            q, k_new, v_new = wm._decoder_qkv(x, blk, H)
            dk = jax.lax.dynamic_update_slice(
                dk, k_new[None], (l, 0, 0, step, 0))
            dv = jax.lax.dynamic_update_slice(
                dv, v_new[None], (l, 0, 0, step, 0))
            if with_self and use_kernel:
                from whisper_diarize_tpu.ops.pallas_attn import (
                    split_self_attn_layer)

                self_out = split_self_attn_layer(
                    jnp.int32(l), q.reshape(B, K, H, Dh),
                    pk, pv, dk, dv, anc_j, step,
                    row_pad_b, P,
                ).reshape(N, H, 1, Dh)
            elif with_self:
                scale = Dh ** -0.25
                qb = (q * scale).reshape(B, K, H, Dh)
                sp_ = jnp.einsum(
                    "bkhd,bhtd->bkht", qb, pk[l] * scale,
                    preferred_element_type=jnp.float32,
                ) + pmask[:, None, None, :]
                sd = jnp.einsum(
                    "nhqd,nhtd->nhqt", q * scale, dk[l] * scale,
                    preferred_element_type=jnp.float32,
                )[:, :, 0].reshape(B, K, H, Td) + dmask[None, None, None, :]
                w = jax.nn.softmax(
                    jnp.concatenate([sp_, sd], axis=-1), axis=-1)
                wp = w[..., :Tp].astype(dtype)
                wd = w[..., Tp:].astype(dtype).reshape(N, H, 1, Td)
                op = jnp.einsum("bkht,bhtd->bkhd", wp, pv[l],
                                preferred_element_type=jnp.float32)
                od = jnp.einsum("nhqt,nhtd->nhqd", wd, dv[l],
                                preferred_element_type=jnp.float32)
                self_out = (op.reshape(N, H, 1, Dh) + od).astype(dtype)
            else:
                self_out = q  # stand-in with the right shape
            if with_tail == "kern":
                x = wm._fused_tail_call(decoder_, crossd, l, x, self_out, K,
                                        cfg)
            elif with_tail == "xla":
                ck, cv = cross_select(l)
                x = wm._decoder_layer_tail(
                    x, blk, self_out, cross_fn, ck, cv, jnp.int32(l), H)
            else:
                # keep a data dependency through x without the tail math
                x = x + wm._unheads(self_out).astype(dtype) * 1e-12
        return x, dk, dv

    spec = {
        "embed": dict(layers=False),
        "qkv": dict(with_self=False, with_tail=None, use_kernel=False),
        "self": dict(with_self=True, with_tail=None, use_kernel=False),
        "selfk": dict(with_self=True, with_tail=None, use_kernel=True),
        "tail": dict(with_self=False, with_tail="kern", use_kernel=False),
        "xtail": dict(with_self=False, with_tail="xla", use_kernel=False),
        "full": dict(with_self=True, with_tail="kern", use_kernel=False),
    }[part]

    anc_j0 = jnp.broadcast_to(
        (jnp.arange(N, dtype=jnp.int32) % K)[:, None], (N, Td)
    ).reshape(B, K, Td)

    @functools.partial(jax.jit, static_argnames=("budget",),
                       donate_argnums=(1, 2))
    def loop(p, dk, dv, pk, pv, crossd, anc_j, budget):
        decoder_ = p["decoder"]
        tok0 = jnp.full((N, 1), 100, jnp.int32)

        def body(s):
            step, dk, dv, acc = s
            x = decoder_["tok_emb"][tok0] + decoder_["pos_emb"][
                P + step][None, None].astype(dtype)
            if spec.get("layers", True):
                x, dk, dv = qkv_layers(
                    p, crossd, pk, pv, x, dk, dv, step, spec["with_self"],
                    spec["with_tail"], spec["use_kernel"], anc_j=anc_j)
            xn = wm._ln(x, decoder_["ln_s"], decoder_["ln_b"])
            logits = jnp.einsum("bsd,vd->bsv", xn, decoder_["tok_emb"],
                                preferred_element_type=jnp.float32)
            return step + 1, dk, dv, acc + logits[:, 0, 0]

        _, dk, dv, acc = jax.lax.while_loop(
            lambda s: s[0] < budget, body,
            (jnp.int32(0), dk, dv, jnp.zeros(N)))
        return dk, dv, acc[:1]

    def run(budget):
        dk = jnp.zeros_like(cache["dk"])
        dv = jnp.zeros_like(cache["dv"])
        return loop(params, dk, dv, cache["pk"], cache["pv"], cross,
                    anc_j0, budget)[2]

    t64, sl = slope(lambda: run(32), lambda: run(64))
    print(f"{part:8s} {t64*1e3:8.1f} ms  ({sl*1e3:6.3f} ms/step slope)")


if __name__ == "__main__":
    main()
