"""Translate-stage progress reporting (counterpart of
examples/test_translate_progress.rs)."""

import sys

sys.path.insert(0, "examples")
from whisper_diarize_tpu.translate import translate_segments
from whisper_diarize_tpu.types import ProgressType, Segment


def main():
    segs = [Segment(i * 1.0, i * 1.0 + 1.0, f"sentence number {i}") for i in range(8)]
    events = []

    def progress(pct, kind, label):
        events.append(pct)
        print(f"[{kind.value}] {pct:3d}% {label}")

    translate_segments(segs, "en", sys.argv[1] if len(sys.argv) > 1 else "de",
                       progress=progress)
    print("first/last:", events[0], events[-1])


if __name__ == "__main__":
    main()
