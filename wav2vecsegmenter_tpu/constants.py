"""Global frame-math constants.

Semantics mirror the reference (/root/reference/lib/constants.py:1-14): the
wav2vec 2.0 feature extractor downsamples 16 kHz audio by 320x, but the
effective output frame rate used for all second<->frame conversions is 49.95
frames/s ("50 (16000/320) wasn't exactly correct" per the reference), because
the strided convolutions drop a few samples at segment edges.
"""

INPUT_SAMPLE_RATE = 16_000
# Output (classifier) frame rate in frames/sec.
TARGET_SAMPLE_RATE = 49.95
# Duration of one wav2vec 2.0 output frame in milliseconds.
WAV2VEC_FRAME_LEN = 20
# Hidden width of the wav2vec2-large family (xls-r-300m etc.).
HIDDEN_SIZE = 1024
# Segments shorter than this (seconds) are treated as noise and dropped.
NOISE_THRESHOLD = 0.1

# Token ids for the autoregressive segmenter vocabulary.
ID_SEG = 1
ID_OSEG = 0
ID_SEP = 2
ID_PAD = 3
SEG = "F"
OSEG = "B"
SEP = "<SEP>"
PAD = "<PAD>"
