"""Delete a cached whisper model (counterpart of examples/delete_cached_model.rs)."""

import sys

from whisper_diarize_tpu import delete_cached_model


def main():
    if len(sys.argv) < 2:
        print("usage: delete_cached_model.py <model> [cache_dir]")
        return
    model = sys.argv[1]
    cache = sys.argv[2] if len(sys.argv) > 2 else "./cache"
    ok = delete_cached_model(cache, model)
    print(f"deleted {model!r}: {ok}")


if __name__ == "__main__":
    main()
