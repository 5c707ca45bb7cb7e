"""Numeric parity against REAL upstream checkpoints (when available).

The CI tests prove the JAX forwards match trusted implementations on random
weights (`tests/test_hf_parity.py`, `tests/test_converters.py`); this script
closes the loop on actual trained checkpoints once they are present on disk
(this dev box has no network egress — download them elsewhere):

  whisper    HF snapshot dir (e.g. openai/whisper-base) — encoder/decoder
             logits vs transformers, greedy transcription diff
  silero     silero_vad.jit (v5) — per-chunk speech probabilities vs the
             TorchScript model executed directly
  pyannote   pytorch_model.bin (segmentation-3.0) — log-probs vs the PyanNet
             replica loaded with the real weights
  campplus   campplus torch checkpoint — embeddings vs the DTDNN replica
             loaded with the real weights

Usage:
  python evals/parity.py whisper  /path/to/snapshot [--audio a.wav]
  python evals/parity.py silero   /path/to/silero_vad.jit
  python evals/parity.py pyannote /path/to/pytorch_model.bin
  python evals/parity.py campplus /path/to/campplus.pt

Each check prints max-abs-diff and PASS/FAIL against the stated tolerance.
Full-task metrics (WER / word-MAE / DER on labeled audio) live in
`evals/run_config.py`; this file is the component-level numeric gate.
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _report(name: str, diff: float, tol: float) -> bool:
    ok = diff <= tol
    print(f"[{name}] max abs diff {diff:.3e} (tol {tol:.0e}) -> "
          f"{'PASS' if ok else 'FAIL'}")
    return ok


def parity_whisper(snapshot: str, audio_path: str | None) -> bool:
    import jax.numpy as jnp
    import torch
    import transformers

    from whisper_diarize_tpu.models import weights as wmod
    from whisper_diarize_tpu.models import whisper as wm

    hf = transformers.WhisperForConditionalGeneration.from_pretrained(
        snapshot
    ).eval()
    params, cfg = wmod.load_model(snapshot)

    if audio_path:
        from whisper_diarize_tpu.audio import read_wav
        from whisper_diarize_tpu.ops.mel import N_SAMPLES, log_mel_spectrogram

        samples = read_wav(audio_path).astype(np.float32) / 32768.0
        buf = np.zeros(N_SAMPLES, np.float32)
        buf[: min(len(samples), N_SAMPLES)] = samples[:N_SAMPLES]
        mel = np.asarray(log_mel_spectrogram(buf, n_mels=cfg.n_mels))[None]
    else:
        rng = np.random.default_rng(0)
        mel = rng.standard_normal((1, cfg.n_mels, 3000)).astype(np.float32) * 0.5

    with torch.no_grad():
        enc_ref = hf.model.encoder(torch.tensor(mel)).last_hidden_state.numpy()
    enc = np.asarray(wm.encode(params, jnp.asarray(mel), cfg))
    ok = _report("whisper.encoder", float(np.abs(enc - enc_ref).max()), 5e-3)

    tokens = np.array([[50258, 50259, 50359, 50363, 1000, 2000]], np.int64)
    tokens = np.clip(tokens, 0, cfg.n_vocab - 1)
    with torch.no_grad():
        log_ref = hf(
            input_features=torch.tensor(mel),
            decoder_input_ids=torch.tensor(tokens),
        ).logits.numpy()
    logits = np.asarray(
        wm.decoder_forward_nocache(params, cfg, jnp.asarray(tokens, np.int32),
                                   jnp.asarray(enc))
    )
    ok &= _report("whisper.decoder_logits",
                  float(np.abs(logits - log_ref).max()), 5e-2)
    return ok


def parity_silero(jit_path: str) -> bool:
    import torch

    from convert_models import convert_silero
    from whisper_diarize_tpu.models import silero_vad as sv

    model = torch.jit.load(jit_path, map_location="cpu").eval()
    with tempfile.TemporaryDirectory() as td:
        npz = os.path.join(td, "silero.npz")
        convert_silero(jit_path, npz)
        params = sv.load_params(npz)

    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(sv.CHUNK * 20) * 0.3).astype(np.float32)

    # upstream JIT API: model(chunk_512, 16000) with internal state
    model.reset_states() if hasattr(model, "reset_states") else None
    ref = []
    with torch.no_grad():
        for i in range(20):
            chunk = torch.tensor(audio[i * sv.CHUNK: (i + 1) * sv.CHUNK])[None]
            ref.append(float(model(chunk, 16000).item()))
    ref = np.array(ref)

    # A/B the documented STFT pad-convention risk (docs/PARITY.md): run
    # BOTH candidate conventions against the executed upstream binary in
    # one command; the matching one is the verdict to pin.
    results = {}
    for pad_mode in ("left", "both", "zero"):
        ours = np.asarray(sv.speech_probs(params, audio[None],
                                          pad_mode=pad_mode))[0]
        results[pad_mode] = _report(
            f"silero.probs[stft_pad={pad_mode}]",
            float(np.abs(ours - ref).max()), 5e-3)
    winner = [k for k, v in results.items() if v]
    print(f"[silero] STFT pad convention verdict: "
          f"{winner[0] if winner else 'NEITHER — investigate'}"
          + (" (pin via WDT_SILERO_STFT_PAD / speech_probs(pad_mode=...))"
             if winner else ""))
    return any(results.values())


def parity_pyannote(ckpt: str) -> bool:
    import torch

    from convert_models import convert_pyannote
    from torch_refs import _build_torch_pyannet
    from whisper_diarize_tpu.models import segmentation as seg

    net = _build_torch_pyannet(torch).eval()
    sd = torch.load(ckpt, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = {k.removeprefix("model."): v for k, v in sd["state_dict"].items()}
    sd = {k.replace("filterbank.", ""): v for k, v in sd.items()}
    missing, unexpected = net.load_state_dict(sd, strict=False)
    print(f"[pyannote] replica load: {len(missing)} missing, "
          f"{len(unexpected)} unexpected")

    with tempfile.TemporaryDirectory() as td:
        npz = os.path.join(td, "seg.npz")
        convert_pyannote(ckpt, npz)
        params = seg.load_params(npz)

    rng = np.random.default_rng(0)
    audio = (rng.standard_normal((1, seg.WINDOW_SAMPLES)) * 0.3).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.tensor(audio).unsqueeze(1)).numpy()
    # A/B the documented SincNet window-shape risk (docs/PARITY.md): both
    # candidate hamming-ramp conventions vs the real checkpoint in one run.
    results = {}
    for win in ("sincnet", "torch", "hann"):
        ours = np.asarray(seg.forward(params, audio, sinc_window=win))
        results[win] = _report(
            f"pyannote.logprobs[sinc_window={win}]",
            float(np.abs(ours - ref).max()), 5e-3)
    winner = [k for k, v in results.items() if v]
    print(f"[pyannote] SincNet window verdict: "
          f"{winner[0] if winner else 'NEITHER — investigate'}"
          + (" (pin via WDT_SINC_WINDOW / forward(sinc_window=...))"
             if winner else ""))
    return any(results.values())


def parity_campplus(ckpt: str) -> bool:
    import jax.numpy as jnp
    import torch

    from convert_models import convert_campplus
    from torch_refs import _build_torch_campplus
    from whisper_diarize_tpu.models import campplus

    net = _build_torch_campplus(torch).eval()
    sd = torch.load(ckpt, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    missing, unexpected = net.load_state_dict(sd, strict=False)
    print(f"[campplus] replica load: {len(missing)} missing, "
          f"{len(unexpected)} unexpected")

    with tempfile.TemporaryDirectory() as td:
        npz = os.path.join(td, "campplus.npz")
        convert_campplus(ckpt, npz)
        params = campplus.load_params(npz)

    rng = np.random.default_rng(0)
    feats = rng.standard_normal((1, 300, 80)).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.tensor(feats)).numpy()
    ours = np.asarray(campplus.embed_from_fbank(
        params, jnp.asarray(feats), jnp.ones((1, 300), jnp.float32)
    ))
    return _report("campplus.embedding", float(np.abs(ours - ref).max()), 5e-3)


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("component",
                   choices=["whisper", "silero", "pyannote", "campplus"])
    p.add_argument("checkpoint")
    p.add_argument("--audio", default=None)
    args = p.parse_args(argv)
    if not os.path.exists(args.checkpoint):
        print(f"SKIP: checkpoint not found: {args.checkpoint}")
        return 0
    ok = {
        "whisper": lambda: parity_whisper(args.checkpoint, args.audio),
        "silero": lambda: parity_silero(args.checkpoint),
        "pyannote": lambda: parity_pyannote(args.checkpoint),
        "campplus": lambda: parity_campplus(args.checkpoint),
    }[args.component]()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
