"""Segmentation algorithms: frame probabilities -> sentence-like segments.

All functions consume the single stitched full-talk probability array (one
device->host transfer per talk) and run on host — they are O(frames) NumPy
and inherently sequential/data-dependent (reference lib/segment.py).
"""

from .pdac import pdac, pdac_with_logits
from .pthr import build_thresholds, moving_average, pthr
from .segment import (
    Segment,
    argtrim,
    soft_trim,
    split_and_argtrim,
    split_and_softtrim,
    split_and_trim,
    trim,
)
from .strm import split_predictions_strm, strm
from .tree import pdac_tree, visualize_tree
from .yaml_out import update_tree_yaml_content, update_yaml_content

__all__ = [
    "Segment",
    "trim",
    "argtrim",
    "soft_trim",
    "split_and_trim",
    "split_and_argtrim",
    "split_and_softtrim",
    "pdac",
    "pdac_with_logits",
    "pdac_tree",
    "visualize_tree",
    "strm",
    "split_predictions_strm",
    "pthr",
    "moving_average",
    "build_thresholds",
    "update_yaml_content",
    "update_tree_yaml_content",
]
