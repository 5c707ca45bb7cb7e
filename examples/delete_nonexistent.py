"""Deleting a model that isn't cached returns False, no exception
(counterpart of examples/test_delete_nonexistent.rs)."""

from whisper_diarize_tpu import delete_cached_model


def main():
    ok = delete_cached_model("./cache", "definitely-not-a-model")
    assert ok is False
    print("delete of nonexistent model correctly returned False")


if __name__ == "__main__":
    main()
