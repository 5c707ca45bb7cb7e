"""Benchmark: batched transcription throughput on one TPU chip.

Measures the BASELINE.json config-5 shape: 16 parallel 30 s audio windows
through the full compute path — fused log-mel frontend, large-v3-turbo
encoder, KV-cached greedy decode for a realistic token budget — and reports
**xRT**: audio-seconds transcribed per wall-clock second per chip.

The reference publishes no numbers (BASELINE.md); the north-star target is
>= 100x real-time per v5e chip. `vs_baseline` is therefore reported as the
ratio to that 100x target.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from whisper_diarize_tpu.models import whisper as wm
from whisper_diarize_tpu.ops import decode as dec
from whisper_diarize_tpu.ops.mel import N_SAMPLES, log_mel_spectrogram
from whisper_diarize_tpu.tokenizer import DebugTokenizer

BATCH = 16
DECODE_TOKENS = 64  # ~2.1 tok/s of audio — typical speech density
MODEL = "large-v3-turbo"


def main() -> None:
    cfg = wm.PRESETS[MODEL]
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    params = wm.init_params_fast(cfg, dtype=dtype)
    tk = DebugTokenizer(num_languages=cfg.num_languages)
    sp = tk.specials

    # suppress EOT so every run decodes exactly DECODE_TOKENS steps
    # (random weights would otherwise terminate at arbitrary points and make
    # runs incomparable)
    suppress = dec.build_suppress_mask(sp, cfg.n_vocab, extra_suppress=[sp.eot])
    dc = dec.DecodeConfig(max_tokens=DECODE_TOKENS, with_timestamps=True)

    rng = np.random.default_rng(0)
    audio = jnp.asarray(
        rng.standard_normal((BATCH, N_SAMPLES)).astype(np.float32) * 0.1
    )
    prompt = jnp.asarray(
        np.tile(np.array(tk.sot_sequence(language="en"), np.int32), (BATCH, 1))
    )

    suppress_dev = jnp.asarray(suppress)

    @jax.jit
    def full_step(params, audio, prompt, suppress):
        # ONE dispatch: fused mel -> encoder -> KV-cached greedy decode
        mel = log_mel_spectrogram(audio, n_mels=cfg.n_mels)
        xa = wm.encode(params, mel.astype(dtype), cfg)
        return dec.greedy_decode(
            params, cfg, dc, sp, xa, prompt, prompt.shape[1],
            suppress_mask=suppress,
        )

    def run_once():
        res = full_step(params, audio, prompt, suppress_dev)
        # NOTE: on the tunneled axon backend block_until_ready returns before
        # execution completes; a host fetch is the only reliable sync.
        np.asarray(res.tokens)
        return res

    # warmup / compile
    run_once()

    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        run_once()
    dt = (time.perf_counter() - t0) / iters

    audio_seconds = BATCH * (N_SAMPLES / 16000.0)
    xrt = audio_seconds / dt
    print(
        json.dumps(
            {
                "metric": f"xRT {MODEL} b{BATCH} greedy{DECODE_TOKENS} (audio-sec/sec/chip)",
                "value": round(xrt, 2),
                "unit": "x realtime",
                "vs_baseline": round(xrt / 100.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
