"""Streaming segmentation algorithm (pSTRM).

Re-implementation of the "Streaming" algorithm of Gaido et al. 2021 with the
same observable behavior as /root/reference/lib/segment.py:419-505, but using
integer run-length encoding instead of Python string find/sort — the
reference builds a '0101...' string per talk and regex-scans it; here runs of
0s are located with vectorized NumPy.

Chunks of ``max_segm_len`` frames are consumed left to right (simulating a
stream); in each chunk the longest pause after the first ``min_segm_len``
frames is located, the speech before it is emitted as a segment, and the
remainder after the pause is carried over to the next chunk.
"""

from __future__ import annotations

import numpy as np

from ..constants import TARGET_SAMPLE_RATE, WAV2VEC_FRAME_LEN
from .segment import Segment


def _longest_zero_run(bits: np.ndarray) -> tuple[int, int]:
    """(start, length) of the longest run of zeros; ties pick the *first*
    run (np.argmax returns the first maximum, matching the reference: its
    str.split() locates the first occurrence of the max-pause string)."""
    if len(bits) == 0:
        return -1, 0
    padded = np.concatenate([[1], bits, [1]])
    diffs = np.diff(padded)
    starts = np.where(diffs == -1)[0]
    ends = np.where(diffs == 1)[0]
    if len(starts) == 0:
        return -1, 0
    lengths = ends - starts
    # The reference sorts runs ascending by length, takes the last as the
    # max-pause *string*, then str.split() finds its FIRST occurrence — for
    # tied maximal runs that is the first such run.
    idx = int(np.argmax(lengths))
    return int(starts[idx]), int(lengths[idx])


def _first_zero_run(bits: np.ndarray, run_start: int) -> bool:
    """True if bits[:run_start] is all zeros or empty (reference is_pause)."""
    return bool((bits[:run_start] == 0).all()) if run_start > 0 else True


def split_predictions_strm(
    preds: np.ndarray, max_segm_len: int, min_segm_len: int, min_pause_len: int
) -> list[tuple[int, int, bool]]:
    """Chunked streaming split.

    Args:
        preds: int8/bool array of thresholded frame predictions.
    Returns:
        list of (start, end, is_speech) spans covering [0, len(preds)),
        equivalent to the reference's list of '0'/'1' strings
        (lib/segment.py:454-505) with spans instead of substrings.
    """
    total = len(preds)
    start = 0
    leftover_start, leftover_len = 0, 0  # carried-over span
    spans: list[tuple[int, int, bool]] = []

    def emit(s: int, e: int):
        if e > s:
            seg = preds[s:e]
            spans.append((s, e, bool(seg.any())))

    while start < total:
        end = min(start + max_segm_len - leftover_len, total)
        cur_start = leftover_start if leftover_len else start
        cur = preds[cur_start:end]

        second = cur[min_segm_len:]
        run_start, run_len = _longest_zero_run(second)

        if run_len > min_pause_len:
            # first_part = cur[:min_segm_len]; first_part_b = second[:run_start]
            first_len = min(min_segm_len, len(cur))
            abs_pause_start = cur_start + first_len + run_start
            abs_pause_end = abs_pause_start + run_len
            first_part = cur[:first_len]
            if len(first_part) == 0 or not first_part.any():
                # first_part is a pause: emit separately
                emit(cur_start, cur_start + first_len)
                if run_start > 0:
                    emit(cur_start + first_len, abs_pause_start)
            else:
                emit(cur_start, abs_pause_start)
            emit(abs_pause_start, abs_pause_end)
            leftover_start = abs_pause_end
            leftover_len = end - abs_pause_end
        else:
            emit(cur_start, end)
            leftover_len = 0

        start = end

    return spans


def get_segments(spans: list[tuple[int, int, bool]], total_frames: int) -> list[Segment]:
    """Speech spans -> Segments, each expanded by 0.06 s on both sides
    (reference lib/segment.py:389-416)."""
    minu_frame = TARGET_SAMPLE_RATE * 0.06
    segments = []
    for s, e, is_speech in spans:
        if is_speech:
            start = max(0, s - minu_frame)
            end = min(e + minu_frame, total_frames)
            segments.append(Segment(start, end))
    return segments


def strm(
    probs: np.ndarray,
    max_segment_length: float = 18,
    min_segment_length: float = 0.2,
    min_pause_length: float = 0.2,
    threshold: float = 0.5,
) -> list[Segment]:
    """pSTRM entry point (reference lib/segment.py:419-443)."""
    frame_length = WAV2VEC_FRAME_LEN / 1000
    max_steps = int(max_segment_length / frame_length)
    min_steps = int(min_segment_length / frame_length)
    min_pause_steps = int(min_pause_length / frame_length)

    preds = (probs > threshold).astype(np.int8)
    spans = split_predictions_strm(preds, max_steps, min_steps, min_pause_steps)
    return get_segments(spans, len(preds))
