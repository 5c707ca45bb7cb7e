"""Count progress callbacks per ProgressType (counterpart of
examples/progress_types.rs: atomic counters per stage)."""

import collections
import sys

sys.path.insert(0, "examples")
from _common import base_parser, make_engine, make_options

from whisper_diarize_tpu.types import Callbacks


def main():
    args = base_parser(__doc__).parse_args()
    engine = make_engine(args)
    counts = collections.Counter()
    cb = Callbacks(progress=lambda pct, kind, label: counts.update([kind.value]))
    engine.transcribe_audio(args.audio, make_options(args), callbacks=cb)
    for kind, n in counts.items():
        print(f"{kind}: {n} progress events")


if __name__ == "__main__":
    main()
