"""Kernel backend selection + mesh context.

``kernels`` config value: 'pallas' | 'xla' | 'auto' (pallas on TPU, xla on
CPU/GPU).  Tests force 'xla' or use pallas interpret mode.

The mesh context makes the Pallas kernels compose with model/data
parallelism: GSPMD cannot auto-partition a Mosaic custom call (a pallas_call
inside a jit over sharded operands is a partitioner error), so when a
``jax.sharding.Mesh`` is active the ops wrap their kernels in
``jax.shard_map`` with per-op PartitionSpecs (ops/shmap.py) — heads split
over the 'model' axis, batch rows over 'data' — instead of the pre-round-4
behavior of silently falling back to the XLA ops path."""

from __future__ import annotations

import jax

_BACKEND: str | None = None  # resolved lazily
_MESH = None  # active jax.sharding.Mesh, set by the train/infer entries


def set_backend(kind: str) -> None:
    global _BACKEND
    assert kind in ("pallas", "xla", "auto")
    _BACKEND = None if kind == "auto" else kind


def get_backend() -> str:
    if _BACKEND is not None:
        return _BACKEND
    return "pallas" if jax.default_backend() == "tpu" else "xla"


def set_mesh(mesh) -> None:
    """Install (or clear, with None) the mesh the Pallas ops shard over.

    Must be set before the jitted functions that use the ops are TRACED —
    the ops read it at trace time.  train/loop.py, cli/common.segment_wavs
    and infer.pipeline.WindowInference set it from ``runtime.mesh``."""
    global _MESH
    _MESH = mesh


def get_mesh():
    return _MESH
