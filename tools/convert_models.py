"""Convert upstream checkpoints into this framework's native .npz formats.

The reference consumes GGML (`ggml-{model}.bin`) and ONNX
(`segmentation-3.0.onnx`, `wespeaker_en_voxceleb_CAM++.onnx`,
`ggml-silero-v5.1.2.bin`) binaries. The TPU build loads:

* Whisper: HF `openai/whisper-*` safetensors snapshots, OpenAI `.pt`, or
  the reference's GGML files directly (`models/weights.py`, `models/ggml.py`).
* Silero VAD / pyannote segmentation / CAM++ embeddings: .npz files with
  the key layouts of the respective `load_params` functions.

This CLI produces those .npz files from EITHER the reference's exact
artifacts (ONNX / silero GGML — no conversion strictly needed at runtime,
the engine converts-and-caches on first use via
`whisper_diarize_tpu/models/convert.py`) OR the original torch checkpoints:

  python tools/convert_models.py silero   silero_vad.jit            out/silero_v5_jax.npz
  python tools/convert_models.py silero   ggml-silero-v5.1.2.bin    out/silero_v5_jax.npz
  python tools/convert_models.py pyannote pytorch_model.bin         out/segmentation3.npz
  python tools/convert_models.py pyannote segmentation-3.0.onnx     out/segmentation3.npz
  python tools/convert_models.py campplus campplus.pt               out/campplus.npz
  python tools/convert_models.py campplus wespeaker_..._CAM++.onnx  out/campplus.npz

The ONNX/GGML source kind is auto-detected per file. Upstream layouts
drift between releases, so converters print every unmapped/missing tensor
rather than failing silently — inspect the output before trusting a
converted file. The mapping logic lives in
`whisper_diarize_tpu/models/convert.py` (shared with the engine's runtime
ingestion); this file is the torch-loading CLI wrapper.
"""

from __future__ import annotations

import argparse
import struct
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from whisper_diarize_tpu.models import convert as _cv  # noqa: E402


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


def _detect(path: str) -> str:
    if str(path).endswith(".onnx"):
        return "onnx"
    with open(path, "rb") as f:
        if f.read(4) == struct.pack("<i", _cv.GGML_MAGIC):
            return "ggml"
    return "torch"


def convert_silero(src: str, dst: str) -> None:
    """Silero VAD v5 (torch jit OR whisper.cpp `ggml-silero-v5.1.2.bin`,
    `model_manager.rs:303-319`) -> models/silero_vad.load_params layout."""
    if _detect(src) == "ggml":
        out = _cv.silero_npz_from_ggml(src)
        unmapped = []
    else:
        sd = _load_torch_state(src)
        out, unmapped = _cv.map_silero_state(sd)
    if unmapped:
        print(f"[silero] {len(unmapped)} unmapped tensors (first 10): {unmapped[:10]}")
    np.savez(dst, **out)
    print(f"[silero] wrote {dst} with keys: {sorted(out)}")


def convert_pyannote(src: str, dst: str) -> None:
    """pyannote segmentation-3.0 (torch checkpoint OR the ONNX artifact the
    reference downloads, `engine.rs:90`) ->
    models/segmentation.load_params layout (dotted keys).

    Torch sources accept the raw PyanNet state dict, a pytorch-lightning
    checkpoint ({"state_dict": {"model.…"}}), and both asteroid filterbank
    key spellings. ONNX sources are converted structurally
    (`models/convert.py::segmentation_npz_from_onnx`)."""
    if _detect(src) == "onnx":
        out = _cv.segmentation_npz_from_onnx(src)
        missing = []
    else:
        sd = _load_torch_state(src)
        for prefix in ("model.", "_model."):
            if any(k.startswith(prefix + "sincnet.") for k in sd):
                sd = {k[len(prefix):]: v for k, v in sd.items()
                      if k.startswith(prefix)}
                break
        out, missing, mapped = _cv.map_pyannote_state(sd)
        unmapped = sorted(set(sd) - set(mapped))
        if unmapped:
            # upstream tensors we did NOT consume — drift diagnostic for
            # newer pyannote releases (renamed/extra weights)
            print(f"[pyannote] {len(unmapped)} unmapped tensors "
                  f"(first 10): {unmapped[:10]}")
    for name in missing:
        print(f"[pyannote] missing: {name}")
    np.savez(dst, **out)
    print(f"[pyannote] wrote {dst} ({len(out)} tensors)")


def convert_campplus(src: str, dst: str):
    """wespeaker/modelscope CAM++ (torch checkpoint OR the ONNX artifact
    the reference downloads, `engine.rs:91`) ->
    models/campplus.load_params layout.

    Returns (missing, unmapped) name lists; both empty on a clean convert.
    """
    if _detect(src) == "onnx":
        out = _cv.campplus_npz_from_onnx(src)
        missing, unmapped = [], []
    else:
        sd = _load_torch_state(src)
        # strip a wrapper prefix if present (DDP / wespeaker wrappers)
        for prefix in ("", "module.", "speaker_extractor.", "embedding_model.",
                       "_model.", "model."):
            if prefix + "head.conv1.weight" in sd:
                if prefix:
                    sd = {k[len(prefix):]: v for k, v in sd.items()
                          if k.startswith(prefix)}
                break
        out, missing, unmapped = _cv.map_campplus_state(sd)
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
