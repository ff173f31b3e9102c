"""Process-level JAX runtime setup: persistent compilation cache.

The wav2vec2-large forward takes minutes to compile on TPU (remote-compile
service); the persistent cache makes that a one-time cost per (shape, config)
across processes.  Called by every CLI entry point, bench.py and
__graft_entry__.
"""

from __future__ import annotations

import os


def setup_compilation_cache(cache_dir: str | None = None) -> None:
    import jax

    try:
        if jax.default_backend() != "tpu":
            # CPU AOT cache entries embed host machine features and can
            # SIGILL when loaded on a different host — cache TPU only
            return
    except Exception:
        return
    cache_dir = cache_dir or os.environ.get(
        "W2VSEG_JAX_CACHE",
        os.path.expanduser("~/.cache/w2vseg_jax_cache"),
    )
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # older jax without these flags
        pass


def maybe_init_distributed() -> bool:
    """Multi-host SPMD initialization (jax.distributed).

    Called by every CLI entry point BEFORE the first device query.  Three
    modes, chosen by environment (config cannot drive this: the coordinator
    handshake must happen before the backend initializes, i.e. before any
    jax call the config system's consumers might make):

      * ``W2VSEG_COORDINATOR`` set -> explicit rendezvous:
        ``W2VSEG_COORDINATOR=host:port W2VSEG_NUM_PROCESSES=N
        W2VSEG_PROCESS_ID=i`` (works on CPU fleets too — how the
        multi-host tests run).
      * ``W2VSEG_DISTRIBUTED=auto`` -> ``jax.distributed.initialize()``
        with no arguments: TPU pods self-discover coordinator/process
        topology from the TPU environment.
      * neither -> single-host, no-op.

    After init, ``jax.devices()`` is the GLOBAL device list, so the mesh
    helpers (parallel/mesh.resolve_mesh) and the jitted train step work
    unchanged: every process feeds the same global batch (the loaders are
    seed-deterministic), ``jax.device_put`` transfers only each host's
    addressable shards, and GSPMD inserts the cross-host collectives.

    Returns True if running multi-process after the call.
    """
    import jax

    coord = os.environ.get("W2VSEG_COORDINATOR")
    auto = os.environ.get("W2VSEG_DISTRIBUTED", "").lower() == "auto"
    if coord:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["W2VSEG_NUM_PROCESSES"]),
            process_id=int(os.environ["W2VSEG_PROCESS_ID"]),
        )
    elif auto:
        jax.distributed.initialize()
    return jax.process_count() > 1
