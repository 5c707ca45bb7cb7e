"""List cached whisper models (counterpart of examples/list_cached_models.rs)."""

import sys

from whisper_diarize_tpu import list_cached_models


def main():
    cache = sys.argv[1] if len(sys.argv) > 1 else "./cache"
    models = list_cached_models(cache)
    if not models:
        print("no cached models")
    for m in models:
        print(m)


if __name__ == "__main__":
    main()
