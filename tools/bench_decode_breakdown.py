"""Decode-phase breakdown for the large-v3 greedy bench row.

The round-2 ledger estimates the large-v3 b16 greedy decode at ~930 ms but
only ~550 ms is explained by HBM traffic (cross-KV stream ~348 ms at the
measured 740 GB/s + ~145 ms weight stream + ~30 ms self-cache). This tool
times each phase in isolation to find the rest:

  mel          audio -> log-mel
  encode       mel -> xa
  prefill      greedy_init (cross_kv + tiling + prompt prefill)
  greedy_run   the full sampling loop (slope between two budgets)
  model_only   bare decode_step loop, fixed token (no sampling logic)
  sample_only  sampling logic loop, no model (prepare_logits/softmax/argmax)

Run: python tools/bench_decode_breakdown.py [model] (default large-v3)
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from whisper_diarize_tpu.models import whisper as wm
from whisper_diarize_tpu.ops import decode as dec
from whisper_diarize_tpu.ops.mel import N_SAMPLES, log_mel_spectrogram
from whisper_diarize_tpu.tokenizer import DebugTokenizer

B = 16
STEPS = 64


def best_of(f, n=5):
    np.asarray(f())  # compile + warm
    best = np.inf
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(f())
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    model = sys.argv[1] if len(sys.argv) > 1 else "large-v3"
    cfg = wm.PRESETS[model]
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    params = wm.init_params_fast(cfg, dtype=dtype)
    tk = DebugTokenizer(num_languages=cfg.num_languages)
    sp = tk.specials
    suppress = jnp.asarray(
        dec.build_suppress_mask(sp, cfg.n_vocab, extra_suppress=[sp.eot])
    )
    dc = dec.DecodeConfig(
        max_tokens=STEPS, with_timestamps=True,
        pallas_cross=jax.default_backend() == "tpu",
    )
    if dec._resolve_pallas_tail(dc):
        # tail megakernel weight pack (same attach TranscribeStep/bench.py
        # do; the front kernel lost the TPU gate and is no longer attached)
        from whisper_diarize_tpu.ops.pallas_tail import pack_tail_weights

        params = {
            **params,
            "decoder": {
                **params["decoder"],
                "tail": pack_tail_weights(params, cfg),
            },
        }
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((B, N_SAMPLES)).astype(np.float32) * 0.1)
    prompt = jnp.asarray(
        np.tile(np.array(tk.sot_sequence(language="en"), np.int32), (B, 1))
    )
    P = prompt.shape[1]

    # NOTE: sync must fetch only a few bytes — fetching a full array over
    # the tunnel costs ~seconds/GB and would swamp the timing.
    mel_fn = jax.jit(lambda a: log_mel_spectrogram(a, n_mels=cfg.n_mels))
    mel = mel_fn(audio)
    t_mel = best_of(lambda: mel_fn(audio)[0, 0, :1])
    print(f"mel          {t_mel*1e3:8.1f} ms  (single dispatch: includes "
          "~25 ms tunnel RTT)")

    # TRUE device time via the slope method: fori_loop of n dependent mel
    # passes inside ONE dispatch (ledger timing rule — single dispatches
    # only measure launch overhead)
    @functools.partial(jax.jit, static_argnames=("n",))
    def mel_loop(a, n):
        def body(_, carry):
            m = log_mel_spectrogram(carry, n_mels=cfg.n_mels)
            # feed a data-dependent scalar back so iterations can't fuse
            return carry + m[0, 0, 0] * 1e-12

        return jax.lax.fori_loop(0, n, body, a)[0, :1]

    m8 = best_of(lambda: mel_loop(audio, 8))
    m16 = best_of(lambda: mel_loop(audio, 16))
    print(f"  mel slope  {(m16-m8)/8*1e3:8.1f} ms/pass (8->16 rep slope)")

    enc_fn = jax.jit(lambda p, m: wm.encode(p, m.astype(dtype), cfg))
    xa = enc_fn(params, mel)
    t_enc = best_of(lambda: enc_fn(params, mel)[0, 0, :1])
    print(f"encode       {t_enc*1e3:8.1f} ms")

    # time prefill BEFORE keeping a persistent state: greedy_init peaks at
    # ~8 GB internally (untiled + tiled cross caches) on large-v3
    t_pre = best_of(
        lambda: dec.greedy_init(params, cfg, dc, sp, xa, prompt, P,
                                suppress_mask=suppress)["logits"][0, :1]
    )
    print(f"prefill      {t_pre*1e3:8.1f} ms  (single dispatch: includes "
          "~25 ms tunnel RTT)")

    # TRUE prefill device time via the slope method (ledger timing rule):
    # fori_loop of n dependent greedy_init passes inside ONE dispatch. The
    # carry perturbs xa by a data-dependent ~0 so XLA cannot hoist the
    # loop-invariant cross-KV build or fuse iterations.
    @functools.partial(jax.jit, static_argnames=("n",))
    def prefill_loop(p, a, n):
        def body(_, carry):
            st = dec.greedy_init(p, cfg, dc, sp, a + carry * 1e-12, prompt,
                                 P, suppress_mask=suppress)
            return (st["logits"][0, 0] * 1e-12).astype(a.dtype)

        return jax.lax.fori_loop(0, n, body, jnp.zeros((), xa.dtype))

    p2 = best_of(lambda: prefill_loop(params, xa, 2))
    p6 = best_of(lambda: prefill_loop(params, xa, 6))
    print(f"  prefill slope {(p6-p2)/4*1e3:6.1f} ms/pass (2->6 rep slope; "
          "true device time, RTT amortized)")

    # --- prefill sub-breakdown (where does t_pre go?) --------------------
    # runs BEFORE the persistent decode state exists: state holds one full
    # tiled cross cache (~8 GB on large-v3 b16) and cross_probe a second —
    # both resident plus the tail weight pack exhausts v5e HBM
    cross_fn = jax.jit(
        lambda p, a: dec.build_cross_cache(p, cfg, dc, a), static_argnums=()
    )
    cross_probe = cross_fn(params, xa)
    leaf = jax.tree.leaves(cross_probe)[0]
    t_cross = best_of(lambda: jax.tree.leaves(cross_fn(params, xa))[0]
                      .reshape(-1)[:1])
    print(f"  cross_kv   {t_cross*1e3:8.1f} ms  (build_cross_cache alone)")

    max_steps = min(dc.max_tokens, cfg.n_text_ctx - P - 1)
    cache_len = min(cfg.n_text_ctx, -(-(P + max_steps + 1) // 16) * 16)

    @jax.jit
    def prompt_fwd(p, cross):
        cache = wm.init_self_cache(cfg, B, xa.dtype, cache_len)
        # mirror greedy_init: only sot + last positions projected
        logits_all, cache = wm.decode_step(
            p, cfg, prompt, jnp.int32(0), cache, cross,
            logits_at=(0, P - 1) if P > 1 else (0,))
        return logits_all[:, -1, :1]

    t_pf = best_of(lambda: prompt_fwd(params, cross_probe))
    print(f"  prompt_fwd {t_pf*1e3:8.1f} ms  (cache init + prompt decode_step)")
    # t_pre/t_cross/t_pf are SINGLE-dispatch numbers, each carrying ~25 ms
    # tunnel RTT once; the subtraction removes the RTT twice, so residual
    # reads ~-25 ms when the true residual is ~0 (device times are roughly
    # the printed numbers minus one RTT each)
    print(f"  residual   {(t_pre - t_cross - t_pf)*1e3:8.1f} ms  "
          f"(softmax/no-speech/dispatch; ~-25 ms = double-counted RTT)")
    del cross_probe, leaf
    state = dec.greedy_init(
        params, cfg, dc, sp, xa, prompt, P, suppress_mask=suppress
    )

    def run(budget):
        # greedy_run donates its state: hand it a fresh copy every call
        # (constant per-call cost, cancelled by the slope method)
        st = jax.tree.map(jnp.copy, state)
        return dec.greedy_run(
            params, cfg, dc, sp, st, suppress, P, jnp.int32(budget)
        )["tokens"][0, :2]

    t32 = best_of(lambda: run(32))
    t64 = best_of(lambda: run(64))
    per_step = (t64 - t32) / 32
    print(f"greedy_run   {t64*1e3:8.1f} ms  ({per_step*1e3:6.3f} ms/step slope, "
          f"32-step run {t32*1e3:.1f} ms)")

    # --- model-only loop: decode_step with a fixed token ----------------
    @functools.partial(jax.jit, static_argnames=("budget",))
    def model_only(p, cache, cross, budget):
        tok = jnp.full((B, 1), 100, jnp.int32)

        def body(s):
            step, cache, acc = s
            logits, cache = wm.decode_step(
                p, cfg, tok, P + step, cache, cross
            )
            return step + 1, cache, acc + logits[:, 0, 0]

        _, _, acc = jax.lax.while_loop(
            lambda s: s[0] < budget, body, (jnp.int32(0), cache, jnp.zeros(B))
        )
        return acc[:1]

    c0, x0 = state["cache"], state["cross"]
    m32 = best_of(lambda: model_only(params, c0, x0, budget=32))
    m64 = best_of(lambda: model_only(params, c0, x0, budget=64))
    print(f"model_only   {m64*1e3:8.1f} ms  ({(m64-m32)/32*1e3:6.3f} ms/step slope)")

    # --- sampling-only loop: greedy body minus decode_step --------------
    @functools.partial(jax.jit, static_argnames=("budget",))
    def sample_only(logits0, budget):
        s0 = dict(
            step=jnp.int32(0), logits=logits0,
            last_was_ts=jnp.zeros((B,), bool),
            penult_was_ts=jnp.zeros((B,), bool),
            max_ts_tok=jnp.full((B,), sp.timestamp_begin, jnp.int32),
            ts_seen=jnp.zeros((B,), bool),
            tokens=jnp.full((B, STEPS), sp.eot, jnp.int32),
            probs=jnp.zeros((B, STEPS), jnp.float32),
            sum_logprob=jnp.zeros((B,), jnp.float32),
            length=jnp.zeros((B,), jnp.int32),
            finished=jnp.zeros((B,), bool),
        )

        def body(s):
            logits = dec._prepare_logits(
                s["logits"], suppress, sp, dc, s["step"],
                s["last_was_ts"], s["penult_was_ts"], s["max_ts_tok"],
                s["ts_seen"],
            )
            logprobs = jax.nn.log_softmax(logits, axis=-1)
            next_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            tok_logprob = jnp.take_along_axis(
                logprobs, next_tok[:, None], axis=-1)[:, 0]
            is_ts = next_tok >= sp.timestamp_begin
            return dict(
                step=s["step"] + 1,
                # feed the sampled token back so nothing hoists
                logits=s["logits"].at[:, 0].add(next_tok.astype(jnp.float32) * 1e-9),
                last_was_ts=is_ts,
                penult_was_ts=s["last_was_ts"],
                max_ts_tok=jnp.where(is_ts, jnp.maximum(s["max_ts_tok"], next_tok),
                                     s["max_ts_tok"]),
                ts_seen=s["ts_seen"] | is_ts,
                tokens=s["tokens"].at[:, s["step"]].set(next_tok),
                probs=s["probs"].at[:, s["step"]].set(jnp.exp(tok_logprob)),
                sum_logprob=s["sum_logprob"] + tok_logprob,
                length=s["length"] + 1,
                finished=s["finished"],
            )

        out = jax.lax.while_loop(lambda s: s["step"] < budget, body, s0)
        return out["tokens"][0, :2]

    l0 = state["logits"]
    s32 = best_of(lambda: sample_only(l0, budget=32))
    s64 = best_of(lambda: sample_only(l0, budget=64))
    print(f"sample_only  {s64*1e3:8.1f} ms  ({(s64-s32)/32*1e3:6.3f} ms/step slope)")

    total = t_mel + t_enc + t_pre + t64
    xrt = B * 30.0 / total
    print(f"\nsum(mel+enc+prefill+run64) = {total*1e3:.1f} ms -> {xrt:.0f} xRT")


if __name__ == "__main__":
    main()
