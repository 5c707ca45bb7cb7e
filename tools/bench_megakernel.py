"""Decoder megakernel validation: step time with the fused tail/front
kernels on vs off (greedy and beam-5), on the real TPU.

The tail kernel (`ops/pallas_tail.py`) fuses o-proj+ln2+cross-q+flash
cross+co-proj+ln3+MLP; the front kernel fuses ln1+qkv+self-attention for
greedy steps. Both were built in interpret mode while the TPU tunnel was
down — this tool is the acceptance gate: keep them on only if the measured
sampling-step slope beats the un-fused Pallas-cross path.

Each variant runs in its OWN SUBPROCESS (same-process sequential configs
read ~20% low after large allocations, see CLAUDE.md perf ledger) and
times the greedy_run/beam_run slope between a 32- and 64-step budget
(single dispatches only measure tunnel latency).

Run: python tools/bench_megakernel.py [model] [batch]
     (defaults: large-v3, 16; prints one summary table + verdict)
Worker: python tools/bench_megakernel.py --worker MODEL BATCH VARIANT MODE
     VARIANT in {off, tail, tail+front}; MODE in {greedy, beam}
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def worker(model: str, batch: int, variant: str, mode: str) -> None:
    import jax
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
    beam = 5 if mode == "beam" else None
    max_tok = 8 if os.environ.get("WDT_MEGAKERNEL_SMOKE") == "1" else 64
    dc = dec.DecodeConfig(
        max_tokens=max_tok, with_timestamps=True, beam_size=beam,
        pallas_cross=True, pallas_tail=variant != "off",
    )
    if variant != "off":
        from whisper_diarize_tpu.ops.pallas_tail import pack_tail_weights

        extra = {"tail": pack_tail_weights(params, cfg)}
        if variant == "tail+front":
            # quarantined kernel (tools/pallas_front.py); this dir is on
            # sys.path so models/whisper.py's lazy import resolves too
            sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
            from pallas_front import pack_front_weights

            extra["front"] = pack_front_weights(params, cfg)
        params = {**params,
                  "decoder": {**params["decoder"], **extra}}

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

    def best_of(f, n=5):
        np.asarray(f())  # compile + warm; sync via a FEW-BYTE fetch
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            np.asarray(f())
            best = min(best, time.perf_counter() - t0)
        return best

    # Re-init per measurement, exactly like production (init -> donated
    # run). The previous tree.map(jnp.copy, state) pattern DOUBLED the
    # tiled cross cache's residency (~+4 GB at large-v3 b16) and was what
    # RESOURCE_EXHAUSTED the beam+tail arm — a tool artifact, not the
    # product path. The init cost is identical across budgets, so the
    # 32/64-step slope subtracts it out.
    if mode == "greedy":
        def run(budget):
            st = dec.greedy_init(
                params, cfg, dc, sp, xa, prompt, P, suppress_mask=suppress)
            return dec.greedy_run(
                params, cfg, dc, sp, st, suppress, P, jnp.int32(budget)
            )["tokens"][0, :2]
    else:
        def run(budget):
            st = dec.beam_init(
                params, cfg, dc, sp, xa, prompt, P, suppress_mask=suppress)
            return dec.beam_run(
                params, cfg, dc, sp, st, suppress, P, jnp.int32(budget)
            )["tokens"][0, :2]

    # WDT_MEGAKERNEL_SMOKE=1: tiny budgets/reps so the CPU interpret-mode
    # plumbing check finishes (numbers are meaningless off-TPU)
    smoke = os.environ.get("WDT_MEGAKERNEL_SMOKE") == "1"
    b_lo, b_hi, reps = (4, 8, 1) if smoke else (32, 64, 5)
    t_lo = best_of(lambda: run(b_lo), n=reps)
    t_hi = best_of(lambda: run(b_hi), n=reps)
    print(json.dumps({
        "variant": variant, "mode": mode,
        "ms_per_step": (t_hi - t_lo) / (b_hi - b_lo) * 1e3,
        "t64_ms": t_hi * 1e3,
    }))


def main() -> None:
    model = sys.argv[1] if len(sys.argv) > 1 else "large-v3"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    results = {}
    for mode in ("greedy", "beam"):
        # beam fronts go through decode_step_split: front is greedy-only
        variants = ("off", "tail", "tail+front") if mode == "greedy" \
            else ("off", "tail")
        for variant in variants:
            env = dict(os.environ)
            env.pop("WDT_DISABLE_PALLAS_TAIL", None)
            out = subprocess.run(
                [sys.executable, __file__, "--worker", model, str(batch),
                 variant, mode],
                capture_output=True, text=True, env=env, timeout=1800)
            line = out.stdout.strip().splitlines()[-1] if out.stdout else ""
            try:
                r = json.loads(line)
            except (json.JSONDecodeError, IndexError):
                print(f"{mode:6s} {variant:10s} FAILED:\n{out.stderr[-2000:]}")
                results[(mode, variant)] = None
                continue
            results[(mode, variant)] = r["ms_per_step"]
            print(f"{mode:6s} {variant:10s} {r['ms_per_step']:7.3f} ms/step "
                  f"(64-step run {r['t64_ms']:.1f} ms)")

    g_off = results.get(("greedy", "off"))
    g_tail = results.get(("greedy", "tail"))
    g_full = results.get(("greedy", "tail+front"))
    b_off = results.get(("beam", "off"))
    b_tail = results.get(("beam", "tail"))
    print("\nverdict:")
    if g_off and g_tail:
        print(f"  greedy tail:       {g_off:.3f} -> {g_tail:.3f} ms/step "
              f"({'KEEP' if g_tail < g_off else 'DROP'})")
    if g_tail and g_full:
        print(f"  greedy +front:     {g_tail:.3f} -> {g_full:.3f} ms/step "
              f"({'KEEP' if g_full < g_tail else 'DROP'})")
    if b_off and b_tail:
        print(f"  beam-5 tail:       {b_off:.3f} -> {b_tail:.3f} ms/step "
              f"({'KEEP' if b_tail < b_off else 'DROP'})")
    if any(v is None for v in results.values()):
        # the gate must not report success when a worker died (e.g. the
        # package was not importable inside the subprocess)
        sys.exit(1)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(sys.argv[2], int(sys.argv[3]), sys.argv[4], sys.argv[5])
    else:
        main()
