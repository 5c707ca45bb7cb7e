"""Speculative greedy decoding: measured numbers (VERDICT r2 Missing #4).

The random-weight bench can't show speculative gains (a real draft never
agrees with the target on noise weights), so this tool measures the two
things that ARE measurable without trained checkpoints:

  ceiling   self-draft (draft == target): acceptance is ~1 by
            construction, so rounds ≈ 64/gamma — isolates the mechanism's
            per-round overhead at the maximum possible agreement.
  alpha=X   large-v3-turbo draft with the verify comparison REPLACED by a
            deterministic Bernoulli(X) draw (`sim_accept`, a bench-only
            hook that breaks output exactness — timing only). Sweeping X
            maps the break-even acceptance rate for the real
            turbo-drafts-for-large-v3 deployment, which shares the frozen
            large-v3 encoder (xa_d = xa_t).

Rows (large-v3 target, batch 16, 64 tokens, EOT suppressed so every row
decodes the full budget):

  greedy        plain greedy_decode baseline
  self-g4       self-draft, gamma=4 (mechanism ceiling at draft cost 1.0x)
  turbo-a1.0-g4 turbo draft, sim accept 1.0 (ceiling at draft cost ~0.25x)
  turbo-a0.8-g4 / turbo-a0.5-g4   realistic / pessimistic agreement
  turbo-a0.8-g8 longer proposal runs at realistic agreement

Timing: whole jitted decode (prefill + rounds) per CLAUDE.md rules — sync
by fetching a few bytes, best-of over full calls; the shared mel+encode
frontend is measured once and folded into the derived xRT. One subprocess
per row (fresh backend; large-v3 rows fragment HBM).

Run: python tools/bench_speculative.py            # all rows
     WDT_SPEC_ROW=self-g4 python tools/...       # one row
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from whisper_diarize_tpu.models import whisper as wm
from whisper_diarize_tpu.ops import decode as dec
from whisper_diarize_tpu.ops import speculative as spec
from whisper_diarize_tpu.ops.mel import N_SAMPLES, log_mel_spectrogram
from whisper_diarize_tpu.tokenizer import DebugTokenizer

B = 16
STEPS = 64

ROWS = {
    "greedy": None,
    "self-g4": dict(draft="large-v3", gamma=4, sim=None),
    "turbo-a1.0-g4": dict(draft="large-v3-turbo", gamma=4, sim=1.0),
    "turbo-a0.8-g4": dict(draft="large-v3-turbo", gamma=4, sim=0.8),
    "turbo-a0.5-g4": dict(draft="large-v3-turbo", gamma=4, sim=0.5),
    "turbo-a0.8-g8": dict(draft="large-v3-turbo", gamma=8, sim=0.8),
}


def best_of(f, n=4):
    np.asarray(f())  # compile
    best = np.inf
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(f())
        best = min(best, time.perf_counter() - t0)
    return best


def run_row(name: str) -> dict:
    spec_cfg = ROWS[name]
    cfg = wm.PRESETS["large-v3"]
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    params = wm.init_params_fast(cfg, dtype=dtype)
    tk = DebugTokenizer(num_languages=cfg.num_languages)
    sp = tk.specials
    suppress = jnp.asarray(
        dec.build_suppress_mask(sp, cfg.n_vocab, extra_suppress=[sp.eot]))
    dc = dec.DecodeConfig(
        max_tokens=STEPS, with_timestamps=True,
        pallas_cross=jax.default_backend() == "tpu",
    )
    rng = np.random.default_rng(0)
    audio = jnp.asarray(
        rng.standard_normal((B, N_SAMPLES)).astype(np.float32) * 0.1)
    prompt = jnp.asarray(np.tile(
        np.array(tk.sot_sequence(language="en"), np.int32), (B, 1)))
    P = prompt.shape[1]

    # params as jit ARGUMENTS — closing over them embeds gigabytes of
    # constants in the HLO and the tunneled remote_compile rejects the
    # payload (HTTP 413)
    frontend = jax.jit(lambda p, a: wm.encode(
        p, log_mel_spectrogram(a, n_mels=cfg.n_mels).astype(dtype), cfg))
    t_front = best_of(lambda: frontend(params, audio)[:1, :1, :1])
    xa = frontend(params, audio)

    rounds_out = None
    if spec_cfg is None:
        def decode_once():
            r = dec.greedy_decode(
                params, cfg, dc, sp, xa, prompt, P, suppress_mask=suppress)
            return r.tokens[:1, :2]
        t_dec = best_of(decode_once)
    else:
        if spec_cfg["draft"] == "large-v3":
            cfg_d, params_d = cfg, params
        else:
            cfg_d = wm.PRESETS[spec_cfg["draft"]]
            params_d = wm.init_params_fast(cfg_d, dtype=dtype)
        # turbo = large-v3's frozen encoder + small decoder: one shared
        # encoder output feeds both (the real deployment shape)
        def decode_once():
            r, rounds = spec.speculative_greedy_run(
                params, cfg, params_d, cfg_d, dc, sp, xa, xa, prompt, P,
                suppress, gamma=spec_cfg["gamma"],
                sim_accept=spec_cfg["sim"])
            return jnp.concatenate(
                [r.tokens[:1, 0], rounds[None].astype(jnp.int32)])
        t_dec = best_of(decode_once)
        rounds_out = int(np.asarray(decode_once())[-1])

    audio_s = B * (N_SAMPLES / 16000.0)
    row = {
        "row": name,
        "decode_ms": round(t_dec * 1e3, 1),
        "frontend_ms": round(t_front * 1e3, 1),
        "xrt": round(audio_s / (t_front + t_dec), 1),
        "tok_s": round(B * STEPS / t_dec, 0),
    }
    if rounds_out is not None:
        row["rounds"] = rounds_out
        row["tok_per_round"] = round(STEPS / max(rounds_out, 1), 2)
    return row


def main() -> None:
    row = os.environ.get("WDT_SPEC_ROW")
    if row:
        print(json.dumps(run_row(row)))
        return
    import subprocess
    out_rows = []
    for name in ROWS:
        env = dict(os.environ, WDT_SPEC_ROW=name)
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            capture_output=True, text=True, env=env)
        lines = r.stdout.strip().splitlines()
        try:
            out_rows.append(json.loads(lines[-1]))
        except (ValueError, IndexError):
            out_rows.append({"row": name, "error": r.stderr[-300:]})
        print(json.dumps(out_rows[-1]), flush=True)
    print(json.dumps({"rows": out_rows}))


if __name__ == "__main__":
    main()
