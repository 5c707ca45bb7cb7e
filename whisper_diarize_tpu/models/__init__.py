"""Model families: Whisper (tiny..large-v3-turbo), Silero-style VAD,
pyannote-style segmentation, CAM++ speaker embeddings."""
