"""Threshold-walk segmentation (pTHR) with lerped thresholds and trailing
moving average.

Behavioral contract: /root/reference/lib/segment.py:508-592.  The trailing
moving average (reference's O(n*window) Python loop at :508-522) is computed
with a vectorized cumulative sum; the threshold walk itself is a cheap O(n)
host scan over the already-stitched talk array.
"""

from __future__ import annotations

import numpy as np

from ..constants import TARGET_SAMPLE_RATE, WAV2VEC_FRAME_LEN
from .segment import Segment


def moving_average(arr: np.ndarray, window: int) -> np.ndarray:
    """Trailing (causal) moving average: out[i] = mean(arr[max(0,i-w+1):i+1]).

    Equivalent to reference lib/segment.py:508-522 but O(n) via cumsum.
    """
    arr = np.asarray(arr, dtype=np.float64)
    n = len(arr)
    if n == 0:
        return arr.copy()
    window = max(1, int(window))
    csum = np.concatenate([[0.0], np.cumsum(arr)])
    idx = np.arange(1, n + 1)
    lo = np.maximum(0, idx - window)
    return (csum[idx] - csum[lo]) / (idx - lo)


def build_thresholds(
    max_segm_len_steps: int,
    min_segm_len_steps: int,
    max_lerp_steps: int,
    min_lerp_steps: int,
    threshold: float,
) -> np.ndarray:
    """Per-offset threshold curve (reference lib/segment.py:543-552):
    0 below the min length, lerp 0->threshold over min_lerp, flat, then lerp
    threshold->2*threshold over the final max_lerp span."""
    thresholds = np.full((max_segm_len_steps,), threshold, dtype=np.float64)
    thresholds[:min_segm_len_steps] = 0
    if min_lerp_steps:
        thresholds[min_segm_len_steps : min_segm_len_steps + min_lerp_steps] = (
            np.arange(min_lerp_steps, dtype=float) / (min_lerp_steps / threshold)
        )
    if max_lerp_steps:
        thresholds[max_segm_len_steps - max_lerp_steps : max_segm_len_steps] = (
            threshold
            + np.arange(max_lerp_steps, dtype=float) / (max_lerp_steps / threshold)
        )
    return thresholds


def pthr(
    probs: np.ndarray,
    max_segment_length: float = 18,
    min_segment_length: float = 0.2,
    max_lerp_range: float = 0,
    min_lerp_range: float = 0,
    threshold: float = 0.5,
    moving_average_window: float = 0,
) -> list[Segment]:
    """pTHR walk (reference lib/segment.py:525-592): advance to the first
    frame above threshold, then end the segment at the first frame whose
    (optionally smoothed) probability dips below the offset-dependent
    threshold curve; expand each segment by 0.06 s."""
    frame_length = WAV2VEC_FRAME_LEN / 1000
    max_steps = int(max_segment_length / frame_length)
    min_steps = int(min_segment_length / frame_length)
    max_lerp_steps = int(max_lerp_range / frame_length)
    min_lerp_steps = int(min_lerp_range / frame_length)

    thresholds = build_thresholds(
        max_steps, min_steps, max_lerp_steps, min_lerp_steps, threshold
    )

    if moving_average_window > 0:
        probs = moving_average(probs, int(moving_average_window / frame_length))

    total = len(probs)
    minu_frame = TARGET_SAMPLE_RATE * 0.06
    segments: list[Segment] = []

    start = 0
    while start < total:
        if probs[start] <= threshold:
            start += 1
            continue
        part = probs[start : start + len(thresholds)]
        below = np.where(part <= thresholds[: len(part)])[0]
        if len(below) > 0:
            end = start + int(below[0])
        else:
            end = min(start + len(thresholds), total - 1)
        segments.append(
            Segment(max(0, start - minu_frame), min(end + minu_frame, total - 1))
        )
        start = end + 1

    return segments
