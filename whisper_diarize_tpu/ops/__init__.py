"""TPU compute ops: mel/fbank frontends, attention, decoding loops, DTW."""
