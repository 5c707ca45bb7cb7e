"""Standalone text translation (counterpart of examples/translate-test.rs).
Requires network access to the Google endpoint."""

import sys

from whisper_diarize_tpu.translate import translate_text


def main():
    text = sys.argv[1] if len(sys.argv) > 1 else "Hello, how are you?"
    src = sys.argv[2] if len(sys.argv) > 2 else "en"
    dst = sys.argv[3] if len(sys.argv) > 3 else "de"
    print(translate_text(text, src, dst))


if __name__ == "__main__":
    main()
