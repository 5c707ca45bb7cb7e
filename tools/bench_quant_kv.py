"""int8 cross-KV decode bench: fp vs quantized stream on the real TPU.

The decode loop's dominant HBM traffic is the cross K/V cache (~3.9 GB/step
on large-v3 b16). `DecodeConfig(quantize_cross_kv=True, pallas_cross=True)`
stores int8 payloads + f32 scales in the flash kernel's tiled layout and
dequantizes in VMEM, cutting that stream to ~55%. This tool puts a number
on it at production geometry: greedy + beam-5 step slopes, fp vs q8, each
in its own subprocess (same-process sequential configs read ~20% low,
CLAUDE.md).

Usage:
    python tools/bench_quant_kv.py [model=large-v3] [batch=16]
    WDT_QUANT_SMOKE=1 ... -> tiny budgets on CPU (plumbing check only)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def worker(model: str, batch: int, variant: str, mode: str) -> None:
    import jax

    if os.environ.get("WDT_QUANT_SMOKE") == "1":
        # plumbing check off-TPU: the site hook pins JAX_PLATFORMS=axon, so
        # flip the platform before backend init (CLAUDE.md)
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from whisper_diarize_tpu.models import whisper as wm
    from whisper_diarize_tpu.ops import decode as dec
    from whisper_diarize_tpu.ops.mel import N_SAMPLES, log_mel_spectrogram
    from whisper_diarize_tpu.tokenizer import DebugTokenizer

    cfg = wm.PRESETS[model]
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    params = wm.init_params_fast(cfg, dtype=dtype)
    tk = DebugTokenizer(num_languages=cfg.num_languages)
    sp = tk.specials
    smoke = os.environ.get("WDT_QUANT_SMOKE") == "1"
    # variant grammar: "fp" | "tail" | "q8kv" | "q8kv+tail" | "q8all+tail"
    # (q8all = int8 cross K/V AND int8 weight tiles; tail = megakernel pack)
    kvq = variant.startswith("q8")
    wq = variant.startswith("q8all")
    dc = dec.DecodeConfig(
        max_tokens=8 if smoke else 64, with_timestamps=True,
        beam_size=5 if mode == "beam" else None,
        pallas_cross=True, quantize_cross_kv=kvq,
        quantize_tail_weights=wq,
        pallas_tail="tail" in variant,
    )
    if "tail" in variant:
        from whisper_diarize_tpu.ops.pallas_tail import pack_tail_weights

        params = {
            **params,
            "decoder": {
                **params["decoder"],
                "tail": pack_tail_weights(params, cfg, quantize=wq),
            },
        }

    rng = np.random.default_rng(0)
    audio = jnp.asarray(
        rng.standard_normal((batch, N_SAMPLES)).astype(np.float32) * 0.1)
    prompt = jnp.asarray(np.tile(
        np.array(tk.sot_sequence(language="en"), np.int32), (batch, 1)))
    P = prompt.shape[1]
    suppress = jnp.asarray(
        dec.build_suppress_mask(sp, cfg.n_vocab, extra_suppress=[sp.eot]))
    mel = jax.jit(lambda a: log_mel_spectrogram(a, n_mels=cfg.n_mels))(audio)
    xa = jax.jit(lambda p, m: wm.encode(p, m.astype(dtype), cfg))(params, mel)
    xa.block_until_ready()

    def best_of(f, n):
        np.asarray(f())  # compile + warm; sync via a FEW-BYTE fetch
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            np.asarray(f())
            best = min(best, time.perf_counter() - t0)
        return best

    init = dec.greedy_init if mode == "greedy" else dec.beam_init
    run = dec.greedy_run if mode == "greedy" else dec.beam_run
    b_lo, b_hi, reps = (4, 8, 1) if smoke else (32, 64, 5)

    # prefill (init) timing FIRST, before the persistent decode state
    # exists — two live cross caches exhaust v5e HBM on large-v3 b16 (the
    # breakdown tool hit the same trap; probe-then-allocate)
    t_init = best_of(
        lambda: init(params, cfg, dc, sp, xa, prompt, P,
                     suppress_mask=suppress)["logits"][0, :2],
        n=max(1, reps - 2))
    state = init(params, cfg, dc, sp, xa, prompt, P, suppress_mask=suppress)

    def step_run(budget):
        st = jax.tree.map(jnp.copy, state)
        return run(params, cfg, dc, sp, st, suppress, P,
                   jnp.int32(budget))["tokens"][0, :2]

    t_lo = best_of(lambda: step_run(b_lo), n=reps)
    t_hi = best_of(lambda: step_run(b_hi), n=reps)
    print(json.dumps({
        "variant": variant, "mode": mode,
        "ms_per_step": (t_hi - t_lo) / (b_hi - b_lo) * 1e3,
        "t64_ms": t_hi * 1e3,
        "init_ms": t_init * 1e3,
    }))


def main() -> None:
    model = sys.argv[1] if len(sys.argv) > 1 else "large-v3"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    results = {}
    failed = False
    for mode in ("greedy", "beam"):
        # greedy's production default is fp+tail; the quantized ladder
        # keeps the tail kernel in (it folds the scales in VMEM). Beam
        # cannot hold the pack (HBM), so its ladder is pack-free.
        variants = (("fp", "tail", "q8kv", "q8kv+tail", "q8all+tail")
                    if mode == "greedy" else ("fp", "q8kv"))
        for variant in variants:
            out = subprocess.run(
                [sys.executable, __file__, "--worker", model, str(batch),
                 variant, mode],
                capture_output=True, text=True, timeout=1800)
            line = out.stdout.strip().splitlines()[-1] if out.stdout else ""
            try:
                r = json.loads(line)
            except (json.JSONDecodeError, IndexError):
                print(f"{mode:6s} {variant:3s} FAILED:\n{out.stderr[-2000:]}")
                results[(mode, variant)] = None
                failed = True
                continue
            results[(mode, variant)] = r
            print(f"{mode:6s} {variant:10s} {r['ms_per_step']:7.3f} ms/step "
                  f"(64-step {r['t64_ms']:.1f} ms, init {r['init_ms']:.1f} ms)")

    print("\nverdict (vs each mode's fp baseline):")
    for (mode, variant), r in results.items():
        fp = results.get((mode, "fp"))
        if r and fp and variant != "fp":
            print(f"  {mode} {variant}: {fp['ms_per_step']:.3f} -> "
                  f"{r['ms_per_step']:.3f} ms/step "
                  f"({fp['ms_per_step'] / r['ms_per_step']:.2f}x)")
    if failed:
        sys.exit(1)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(sys.argv[2], int(sys.argv[3]), sys.argv[4], sys.argv[5])
    else:
        main()
