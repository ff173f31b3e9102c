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

import functools
from contextlib import contextmanager

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
    the ops read it at trace time.  Prefer the scoped forms below
    (``ops_mesh`` / ``mesh_scoped``): a bare set_mesh that is never cleared
    leaks the mesh to every later trace in the process (a stale 8-device
    mesh deadlocks interpret-mode shard_map on this host, see CLAUDE.md)."""
    global _MESH
    _MESH = mesh


def get_mesh():
    return _MESH


@contextmanager
def ops_mesh(mesh):
    """Scope the kernel mesh context: installs ``mesh`` (possibly None,
    which shields the body from any leaked ambient mesh) for the duration
    and restores the previous value on exit.  jit traces at first CALL, so
    wrap jitted-function call sites, not their construction.

    The global is process-wide, not thread-local: concurrent callers with
    the SAME mesh (the threaded dispatch pipelines all share one engine)
    are benign, and no CLI runs two different-mesh engines concurrently."""
    global _MESH
    prev = _MESH
    _MESH = mesh
    try:
        yield
    finally:
        _MESH = prev


def mesh_scoped(fn, mesh):
    """Bind a callable (typically a jitted function) to ``mesh``: every
    invocation runs under ``ops_mesh(mesh)``, so the trace sees the mesh
    the factory was built for regardless of ambient global state."""

    @functools.wraps(fn)
    def call(*args, **kwargs):
        with ops_mesh(mesh):
            return fn(*args, **kwargs)

    return call
