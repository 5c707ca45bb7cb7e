"""A/B the prefill (greedy_init) prompt-pass layer driver: scan vs unroll.

The round-2 unroll win (13.1 -> 10.5 ms/step) was measured on SAMPLING
steps (S=1), where the scan's per-layer weight dynamic-slices dominate a
step. The prompt pass (S=P) amortizes those slices over P tokens of work.

VERDICT (round 4, v5e, large-v3 b16): scan WINS at the prompt pass —
68.7 vs 70.2 ms at P=3 and 74.7 vs 78.0 ms at P=48 (greedy_init single
dispatch incl. ~25 ms tunnel RTT). greedy_init/beam_init therefore keep
the lax.scan layer driver for prefill; `unroll_layers` only governs the
S=1 sampling steps. This tool stays as the one-command re-check: it
drives the prefill chain (cross-cache build + cache init + prompt
decode_step) directly, passing decode_step the arm's layer driver.

Run on the real TPU: python tools/bench_prefill_ab.py [model] [batch] [P]
Prints one line per arm; both arms run in THIS process back-to-back
(prefill allocates no persistent state, so same-process ordering effects
are small; flip the arm order with WDT_AB_ORDER=unroll_first to check).
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from whisper_diarize_tpu.models import whisper as wm
from whisper_diarize_tpu.ops import decode as dec
from whisper_diarize_tpu.tokenizer import DebugTokenizer


def best_of(f, n=8):
    np.asarray(f())  # compile + warm
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(f())
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    model = sys.argv[1] if len(sys.argv) > 1 else "large-v3"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    P = int(sys.argv[3]) if len(sys.argv) > 3 else 0

    cfg = wm.PRESETS[model]
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    params = wm.init_params_fast(cfg, dtype=dtype)
    tk = DebugTokenizer(num_languages=cfg.num_languages)
    sp = tk.specials
    rng = np.random.default_rng(0)
    xa = jnp.asarray(
        rng.standard_normal((batch, cfg.n_audio_ctx, cfg.n_audio_state))
        .astype(np.float32) * 0.05, dtype)
    sot = np.array(tk.sot_sequence(language="en"), np.int32)
    if P > len(sot):  # left-pad with prev-text filler to a rolling-prompt len
        filler = np.full(P - len(sot), sp.sot_prev if sp.sot_prev else 100,
                         np.int32)
        sot = np.concatenate([filler, sot])
    prompt = jnp.asarray(np.tile(sot, (batch, 1)))
    suppress = jnp.asarray(dec.build_suppress_mask(sp, cfg.n_vocab))

    dc = dec.DecodeConfig(
        max_tokens=64, with_timestamps=True,
        pallas_cross=jax.default_backend() == "tpu")
    del suppress  # prefill chain below needs no sampling state
    Pn = prompt.shape[1]
    cache_len = min(cfg.n_text_ctx, -(-(Pn + 64 + 1) // 16) * 16)

    arms = ("scan", "unroll")
    if os.environ.get("WDT_AB_ORDER") == "unroll_first":
        arms = ("unroll", "scan")
    for arm in arms:
        import functools

        @functools.partial(jax.jit, static_argnames=("unroll",))
        def prefill(params, xa, prompt, unroll):
            cross = dec.build_cross_cache(params, cfg, dc, xa)
            cache = wm.init_self_cache(cfg, batch, xa.dtype, cache_len)
            logits, cache = wm.decode_step(
                params, cfg, prompt, jnp.int32(0), cache, cross,
                unroll=unroll, logits_at=(0, Pn - 1))
            return logits

        def init(unroll=arm == "unroll"):
            return prefill(params, xa, prompt, unroll)[0, -1, :2]

        t = best_of(init)
        print(f"prefill[{arm:6s}] P={Pn:3d} "
              f"{t * 1e3:7.1f} ms (incl. ~25 ms tunnel RTT)")


if __name__ == "__main__":
    main()
