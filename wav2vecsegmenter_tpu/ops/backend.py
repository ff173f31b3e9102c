"""Kernel backend selection.

``kernels`` config value: 'pallas' | 'xla' | 'auto' (pallas on TPU, xla on
CPU/GPU).  Tests force 'xla' or use pallas interpret mode.
"""

from __future__ import annotations

import jax

_BACKEND: str | None = None  # resolved lazily


def set_backend(kind: str) -> None:
    global _BACKEND
    assert kind in ("pallas", "xla", "auto")
    _BACKEND = None if kind == "auto" else kind


def get_backend() -> str:
    if _BACKEND is not None:
        return _BACKEND
    return "pallas" if jax.default_backend() == "tpu" else "xla"
