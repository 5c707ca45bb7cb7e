"""whisper_diarize_tpu — a TPU-native transcription + diarization framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of the reference
Rust crate `tmoroney/whisper-diarize-rs`.  The public surface mirrors the
crate facade (`/root/reference/src/lib.rs:1-36`): `Engine`, `EngineConfig`,
`Callbacks`, `TranscribeOptions`, `Segment`, `WordTimestamp`,
`ProgressType`, `ModelManager`, `get_segments`, `process_segments`,
`PostProcessConfig`, `FormattingOverrides`, language lists, and the
convenience `list_cached_models` / `delete_cached_model` helpers.

Heavy submodules (JAX models, engine) are imported lazily so that the pure
CPU utilities (types, audio, formatting) stay cheap to import.
"""

from __future__ import annotations

from .types import (
    AdvancedTranscribe,
    Callbacks,
    DiarizeOptions,
    ProgressType,
    Segment,
    SpeechSegment,
    TranscribeOptions,
    WordTimestamp,
    segments_to_json,
)
from .formatting import (
    FormattingOverrides,
    PostProcessConfig,
    ScriptProfile,
    VadMaskOracle,
    NoSilence,
    SilenceOracle,
    apply_overrides,
    process_segments,
)
from .utils import (
    calculate_dtw_mem_size,
    cs_to_s,
    get_translate_languages,
    get_whisper_languages,
    round_to_places,
)
from .audio import read_wav, write_wav

__version__ = "0.1.0"

_LAZY = {
    "Engine": ("whisper_diarize_tpu.engine", "Engine"),
    "EngineConfig": ("whisper_diarize_tpu.engine", "EngineConfig"),
    "ModelManager": ("whisper_diarize_tpu.model_manager", "ModelManager"),
    "get_segments": ("whisper_diarize_tpu.vad", "get_segments"),
    "translate_text": ("whisper_diarize_tpu.translate", "translate_text"),
    "translate_segments": ("whisper_diarize_tpu.translate", "translate_segments"),
    "to_srt": ("whisper_diarize_tpu.subtitles", "to_srt"),
    "to_vtt": ("whisper_diarize_tpu.subtitles", "to_vtt"),
    "to_txt": ("whisper_diarize_tpu.subtitles", "to_txt"),
    "wer": ("whisper_diarize_tpu.evals", "wer"),
    "der": ("whisper_diarize_tpu.evals", "der"),
}


def __getattr__(name: str):
    if name in _LAZY:
        import importlib

        mod, attr = _LAZY[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module 'whisper_diarize_tpu' has no attribute {name!r}")


def list_cached_models(cache_dir) -> list:
    """Convenience helper mirroring `src/lib.rs:21-26`."""
    from .engine import Engine, EngineConfig

    cfg = EngineConfig()
    cfg.cache_dir = str(cache_dir)
    return Engine(cfg).list_cached_models()


def delete_cached_model(cache_dir, model_name: str) -> bool:
    """Convenience helper mirroring `src/lib.rs:31-36`."""
    from .engine import Engine, EngineConfig

    cfg = EngineConfig()
    cfg.cache_dir = str(cache_dir)
    return Engine(cfg).delete_cached_model(model_name)
