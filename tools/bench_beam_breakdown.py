"""Beam-5 decode breakdown (large-v3 b16): attribute the beam/greedy gap.

Each part runs in its own process (16 GB HBM cannot hold the beam state
twice): WDT_PART selects run|model|gather|topk; no value runs all four as
subprocesses.

  run      full beam_run loop slope between budgets 32/64 (fresh beam_init
           per call — beam_run donates its state)
  model    bare decode_step_split at N=B*K with shared cross + split cache
  gather   the per-step reindex of the split DECODE cache [L,N,H,Td,Dh]
  topk     exact 2-stage top-2K (per-beam then pooled)

Run: python tools/bench_beam_breakdown.py [model]
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
        import subprocess
        for p in ("run", "model", "modelgather", "modelmul", "gather", "topk", "sample"):
            env = dict(os.environ, WDT_PART=p)
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), model],
                capture_output=True, text=True, env=env,
            )
            line = out.stdout.strip().splitlines()
            print(line[-1] if line else f"{p}: FAILED\n{out.stderr[-400:]}")
        return

    cfg = wm.PRESETS[model]
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    tk = DebugTokenizer(num_languages=cfg.num_languages)
    sp = tk.specials
    N = B * K
    V = cfg.n_vocab
    rng = np.random.default_rng(0)

    if part == "gather":
        cache = wm.init_split_decode_cache(cfg, N, dtype, 64)

        @functools.partial(jax.jit, static_argnames=("budget",))
        def gather_loop(cache, budget):
            def body(s):
                step, c = s
                base = jnp.arange(N, dtype=jnp.int32)
                rot = step + c["k"][0, 0, 0, 0, 0].astype(jnp.int32) % 1
                perm = (base // K) * K + (base + rot) % K
                c = jax.tree.map(lambda a: a[:, perm], c)
                return step + 1, c

            _, c = jax.lax.while_loop(
                lambda s: s[0] < budget, body, (jnp.int32(0), cache))
            return c["k"][0, 0, 0, 0, :1]

        t64, sl = slope(lambda: gather_loop(cache, budget=32),
                        lambda: gather_loop(cache, budget=64))
        print(f"gather       {t64*1e3:8.1f} ms  ({sl*1e3:6.3f} ms/step slope)")
        return

    if part == "topk":
        logits0 = jnp.asarray(rng.standard_normal((N, V)).astype(np.float32))

        @functools.partial(jax.jit, static_argnames=("budget",))
        def topk_loop(logits, budget):
            def body(s):
                step, l, acc = s
                v1, i1 = jax.lax.top_k(l, 2 * K)
                v1 = v1.reshape(B, K * 2 * K)
                i1 = (i1 + (jnp.arange(N) % K)[:, None] * V).reshape(
                    B, K * 2 * K)
                topv, sel = jax.lax.top_k(v1, 2 * K)
                return (step + 1, l.at[:, 0].add(topv[0, 0] * 1e-9),
                        acc + topv[0, 0])

            _, _, acc = jax.lax.while_loop(
                lambda s: s[0] < budget, body, (jnp.int32(0), logits, 0.0))
            return acc.reshape(1)

        t64, sl = slope(lambda: topk_loop(logits0, budget=32),
                        lambda: topk_loop(logits0, budget=64))
        print(f"topk         {t64*1e3:8.1f} ms  ({sl*1e3:6.3f} ms/step slope)")
        return

    params = wm.init_params_fast(cfg, dtype=dtype)
    dc = dec.DecodeConfig(
        max_tokens=STEPS, with_timestamps=True, beam_size=K,
        pallas_cross=jax.default_backend() == "tpu",
    )
    if dec._resolve_pallas_tail(dc):
        # beam path uses the tail megakernel when the pack is attached
        from whisper_diarize_tpu.ops.pallas_tail import pack_tail_weights

        params = {
            **params,
            "decoder": {**params["decoder"],
                        "tail": pack_tail_weights(params, cfg)},
        }
    suppress = jnp.asarray(
        dec.build_suppress_mask(sp, V, extra_suppress=[sp.eot]))
    xa = jnp.asarray(
        rng.standard_normal((B, cfg.n_audio_ctx, cfg.n_audio_state))
        .astype(np.float32) * 0.05, dtype)
    prompt = jnp.asarray(
        np.tile(np.array(tk.sot_sequence(language="en"), np.int32), (B, 1)))
    P = prompt.shape[1]

    if part == "sample":
        # beam_run's full per-step sampling logic, minus decode_step_split
        # and the cache gather: prepare/softmax/2-stage topk/retire/
        # bookkeeping on a fake logits feedback loop
        state = dec.beam_init(params, cfg, dc, sp, xa, prompt, P,
                              suppress_mask=suppress)
        # drop the heavy arrays; keep sampling state
        small = {k: v for k, v in state.items() if k not in ("cache", "cross")}
        del state

        @functools.partial(jax.jit, static_argnames=("budget",))
        def sample_loop(s0, budget):
            max_steps = STEPS
            n_fin_target = K

            def body(s):
                logits = dec._prepare_logits(
                    s["logits"], suppress, sp, dc, s["step"],
                    s["last_was_ts"], s["penult_was_ts"], s["max_ts_tok"],
                    s["ts_seen"],
                )
                logprobs = jax.nn.log_softmax(logits, axis=-1)
                cand = s["scores"][:, None] + logprobs
                v1, i1 = jax.lax.top_k(cand, 2 * K)
                v1r = v1.reshape(B, K * 2 * K)
                i1r = (i1 + (jnp.arange(N) % K)[:, None] * V).reshape(
                    B, K * 2 * K)
                topv, sel = jax.lax.top_k(v1r, 2 * K)
                topi = jnp.take_along_axis(i1r, sel, 1)
                beam_idx = topi // V
                tok_idx = (topi % V).astype(jnp.int32)
                src_flat = (jnp.arange(B)[:, None] * K + beam_idx).astype(
                    jnp.int32)
                (ft, fp, fs, fl, fc) = dec._retire_eot_candidates(
                    sp, K, topv, tok_idx, src_flat,
                    s["tokens"], s["probs"], s["length"],
                    s["fin_tokens"], s["fin_probs"], s["fin_scores"],
                    s["fin_lengths"], s["fin_count"])
                active_score = jnp.where(tok_idx == sp.eot, dec.NEG_INF, topv)
                keepv, keepi = jax.lax.top_k(active_score, K)
                new_tok = jnp.take_along_axis(tok_idx, keepi, 1).reshape(N)
                new_src = jnp.take_along_axis(src_flat, keepi, 1).reshape(N)
                new_scores = keepv.reshape(N)
                tok_logprob = new_scores - s["scores"][new_src]
                tokens = s["tokens"][new_src].at[:, s["step"]].set(new_tok)
                probs = s["probs"][new_src].at[:, s["step"]].set(
                    jnp.exp(tok_logprob))
                is_ts = new_tok >= sp.timestamp_begin
                return dict(
                    s,
                    step=s["step"] + 1,
                    # fake logits feedback in place of decode_step_split
                    logits=s["logits"].at[:, 0].add(
                        new_tok.astype(jnp.float32) * 1e-9),
                    tokens=tokens, probs=probs, scores=new_scores,
                    length=s["length"][new_src] + 1,
                    last_was_ts=is_ts,
                    penult_was_ts=s["last_was_ts"][new_src],
                    max_ts_tok=jnp.where(
                        is_ts,
                        jnp.maximum(s["max_ts_tok"][new_src], new_tok),
                        s["max_ts_tok"][new_src]),
                    ts_seen=s["ts_seen"][new_src] | is_ts,
                    fin_tokens=ft, fin_probs=fp, fin_scores=fs,
                    fin_lengths=fl, fin_count=fc,
                )

            out = jax.lax.while_loop(
                lambda s: s["step"] < budget, body, s0)
            return out["tokens"][0, :2]

        t64, sl = slope(lambda: sample_loop(small, budget=32),
                        lambda: sample_loop(small, budget=64))
        print(f"sample       {t64*1e3:8.1f} ms  ({sl*1e3:6.3f} ms/step slope)")
        return

    if part in ("model", "modelgather", "modelmul"):
        state = dec.beam_init(params, cfg, dc, sp, xa, prompt, P,
                              suppress_mask=suppress)
        c0, x0 = state["cache"], state["cross"]
        del state

        @functools.partial(jax.jit, static_argnames=("budget",))
        def model_n(p, cache, cross, budget):
            tok = jnp.full((N, 1), 100, jnp.int32)

            def body(s):
                step, dk, dv, acc = s
                if part == "modelgather":
                    base = jnp.arange(N, dtype=jnp.int32)
                    perm = (base // K) * K + (base + step) % K
                    dk, dv = dk[:, perm], dv[:, perm]
                elif part == "modelmul":
                    # equal-volume elementwise pass instead of the gather
                    f = 1.0 + step.astype(dtype) * 1e-12
                    dk, dv = dk * f, dv * f
                logits, nd = wm.decode_step_split(
                    p, cfg, tok, step,
                    {"k": cache["pk"], "v": cache["pv"]},
                    {"k": dk, "v": dv},
                    cross, P, beams=K, unroll=dec._resolve_unroll(dc),
                )
                return step + 1, nd["k"], nd["v"], acc + logits[:, 0, 0]

            _, _, _, acc = jax.lax.while_loop(
                lambda s: s[0] < budget, body,
                (jnp.int32(0), cache["dk"], cache["dv"], jnp.zeros(N)))
            return acc[:1]

        t64, sl = slope(lambda: model_n(params, c0, x0, budget=32),
                        lambda: model_n(params, c0, x0, budget=64))
        print(f"{part}_N{N}    {t64*1e3:8.1f} ms  ({sl*1e3:6.3f} ms/step slope)")
        return

    # part == "run": fresh init per call (beam_run donates its state); the
    # init cost is constant across budgets, the slope cancels it
    def run(budget):
        st = dec.beam_init(params, cfg, dc, sp, xa, prompt, P,
                           suppress_mask=suppress)
        return dec.beam_run(
            params, cfg, dc, sp, st, suppress, P, jnp.int32(budget)
        )["tokens"][0, :2]

    t64, sl = slope(lambda: run(32), lambda: run(64))
    print(f"beam_run     {t64*1e3:8.1f} ms incl. init  "
          f"({sl*1e3:6.3f} ms/step slope)")


if __name__ == "__main__":
    main()
