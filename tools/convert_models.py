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

    for cand in ("_model.stft.forward_basis_buffer", "stft.forward_basis_buffer"):
        if cand in sd:
            # torch conv weight [258, 1, 256] -> framing matmul basis [256, 258]
            out["stft_basis"] = np.ascontiguousarray(
                sd[cand].reshape(sd[cand].shape[0], -1).T
            )
            mapped.add(cand)
            break

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
    models/segmentation.load_params layout (dotted keys).

    Accepts the raw PyanNet state dict, a pytorch-lightning checkpoint
    ({"state_dict": {"model.…"}}), and both asteroid filterbank key spellings
    (`sincnet.conv1d.0.filterbank.low_hz_` vs `sincnet.conv1d.0.low_hz_`)."""
    sd = _load_torch_state(src)
    for prefix in ("model.", "_model."):
        if any(k.startswith(prefix + "sincnet.") for k in sd):
            sd = {k[len(prefix):]: v for k, v in sd.items()
                  if k.startswith(prefix)}
            break
    out = {}
    mapped = set()

    def put(key, name, transform=lambda a: a):
        for cand in (name, name.replace("conv1d.0.", "conv1d.0.filterbank.")):
            if cand in sd:
                out[key] = transform(sd[cand])
                mapped.add(cand)
                return
        print(f"[pyannote] missing: {name}")

    put("wav_norm.s", "sincnet.wav_norm1d.weight", lambda a: a.reshape(-1))
    put("wav_norm.b", "sincnet.wav_norm1d.bias", lambda a: a.reshape(-1))
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


CAMPPLUS_BLOCK_LAYERS = (12, 24, 16)


def convert_campplus(src: str, dst: str):
    """wespeaker/modelscope CAM++ torch checkpoint ->
    models/campplus.load_params layout.

    Upstream module names (modelscope `speakerlab/models/campplus/DTDNN.py`,
    vendored by wespeaker; the reference's ONNX at `engine.rs:91` was
    exported from this net):

      head.conv1 / head.bn1 / head.layer{1,2}.{0,1}.(conv1|bn1|conv2|bn2|
        shortcut.{0,1}) / head.conv2 / head.bn2                     (FCM)
      xvector.tdnn.linear + .nonlinear.batchnorm                    (stem)
      xvector.block{1..3}.tdnnd{1..N}.nonlinear1.batchnorm,
        .linear1, .nonlinear2.batchnorm,
        .cam_layer.(linear_local|linear1|linear2)                   (blocks)
      xvector.transit{1..3}.(nonlinear.batchnorm|linear)
      xvector.out_nonlinear.batchnorm
      xvector.dense.linear + .nonlinear.batchnorm (affine=False)

    Returns (missing, unmapped) name lists; both empty on a clean convert.
    """
    sd = _load_torch_state(src)
    # strip a wrapper prefix if present (DDP / wespeaker wrappers)
    for prefix in ("", "module.", "speaker_extractor.", "embedding_model.",
                   "_model.", "model."):
        if prefix + "head.conv1.weight" in sd:
            if prefix:
                sd = {k[len(prefix):]: v for k, v in sd.items()
                      if k.startswith(prefix)}
            break

    out = {}
    mapped = set()
    missing = []

    def take(name):
        if name in sd:
            mapped.add(name)
            return sd[name]
        missing.append(name)
        return None

    def conv2d(key, name):
        w = take(name)
        if w is not None:  # torch [out, in, kh, kw] -> ours [kh, kw, in, out]
            out[key] = np.ascontiguousarray(w.transpose(2, 3, 1, 0))

    def conv1d(key, name):
        w = take(name)
        if w is not None:  # torch [out, in, k] -> ours [k, in, out]
            out[key] = np.ascontiguousarray(w.transpose(2, 1, 0))

    def vec(key, name):
        w = take(name)
        if w is not None:
            out[key] = np.asarray(w)

    def bn(key, name):
        vec(f"{key}.g", f"{name}.weight")
        vec(f"{key}.b", f"{name}.bias")
        vec(f"{key}.m", f"{name}.running_mean")
        vec(f"{key}.v", f"{name}.running_var")
        mapped.add(f"{name}.num_batches_tracked")  # bookkeeping, unused

    # FCM head
    conv2d("fcm.conv1_w", "head.conv1.weight")
    bn("fcm.bn1", "head.bn1")
    for li, layer in enumerate(("layer1", "layer2")):
        for bi in range(2):
            pre = f"head.{layer}.{bi}"
            okey = f"fcm.{layer}.{bi}"
            conv2d(f"{okey}.conv1_w", f"{pre}.conv1.weight")
            bn(f"{okey}.bn1", f"{pre}.bn1")
            conv2d(f"{okey}.conv2_w", f"{pre}.conv2.weight")
            bn(f"{okey}.bn2", f"{pre}.bn2")
            if f"{pre}.shortcut.0.weight" in sd:  # stride-2 blocks only
                conv2d(f"{okey}.sc_w", f"{pre}.shortcut.0.weight")
                bn(f"{okey}.sc_bn", f"{pre}.shortcut.1")
    conv2d("fcm.conv2_w", "head.conv2.weight")
    bn("fcm.bn2", "head.bn2")

    # TDNN stem
    conv1d("tdnn.w", "xvector.tdnn.linear.weight")
    bn("tdnn.bn", "xvector.tdnn.nonlinear.batchnorm")

    # CAM-Dense-TDNN blocks + transit layers
    for b, n_layers in enumerate(CAMPPLUS_BLOCK_LAYERS):
        for i in range(n_layers):
            pre = f"xvector.block{b + 1}.tdnnd{i + 1}"
            okey = f"blocks.{b}.layers.{i}"
            bn(f"{okey}.bn1", f"{pre}.nonlinear1.batchnorm")
            conv1d(f"{okey}.lin1_w", f"{pre}.linear1.weight")
            bn(f"{okey}.bn2", f"{pre}.nonlinear2.batchnorm")
            conv1d(f"{okey}.local_w", f"{pre}.cam_layer.linear_local.weight")
            conv1d(f"{okey}.cam1_w", f"{pre}.cam_layer.linear1.weight")
            vec(f"{okey}.cam1_b", f"{pre}.cam_layer.linear1.bias")
            conv1d(f"{okey}.cam2_w", f"{pre}.cam_layer.linear2.weight")
            vec(f"{okey}.cam2_b", f"{pre}.cam_layer.linear2.bias")
        bn(f"blocks.{b}.transit.bn", f"xvector.transit{b + 1}.nonlinear.batchnorm")
        conv1d(f"blocks.{b}.transit.w", f"xvector.transit{b + 1}.linear.weight")

    bn("out_bn", "xvector.out_nonlinear.batchnorm")
    conv1d("dense.w", "xvector.dense.linear.weight")
    vec("dense.bn_m", "xvector.dense.nonlinear.batchnorm.running_mean")
    vec("dense.bn_v", "xvector.dense.nonlinear.batchnorm.running_var")
    mapped.add("xvector.dense.nonlinear.batchnorm.num_batches_tracked")

    unmapped = sorted(set(sd) - mapped)
    if missing:
        print(f"[campplus] MISSING upstream tensors ({len(missing)}): "
              f"{missing[:10]}{'...' if len(missing) > 10 else ''}")
    if unmapped:
        print(f"[campplus] {len(unmapped)} unmapped tensors (first 10): "
              f"{unmapped[:10]}")
    np.savez(dst, **out)
    print(f"[campplus] wrote {dst} ({len(out)} tensors, "
          f"{len(missing)} missing, {len(unmapped)} unmapped)")
    return missing, unmapped


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
