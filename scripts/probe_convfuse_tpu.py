#!/usr/bin/env python
"""Staged real-TPU lowering probe for ops/convfuse (run with python -u).

Each stage prints BEFORE it compiles, so a Mosaic hang (see PERF.md
fold-epilogue pathology) is attributable to one program.  Stages go tiny ->
real geometry, 1-tap -> 2-tap (the 2-tap kernel adds pltpu.roll + the
clamped halo index map, the prime hang suspects).

Run:
  JAX_PLATFORMS=axon PYTHONPATH=/root/repo:$PYTHONPATH \
    timeout 580 python -u scripts/probe_convfuse_tpu.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

t0 = time.time()


def log(msg):
    print(f"[{time.time() - t0:7.1f}s] {msg}", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    log(f"backend: {jax.default_backend()}")
    x = jnp.ones((8, 128))
    v = float(jax.jit(lambda x: (x @ x.T).sum())(x))
    log(f"health jit ok ({v})")

    from wav2vecsegmenter_tpu.ops.convfuse import _pallas_call, _xla_ref

    rng = np.random.RandomState(1)
    stages = [
        ("tiny-1tap", 1, 64, 256, 256, 32),
        ("tiny-2tap", 2, 64, 256, 256, 32),
        ("full-1tap", 1, 1000, 1024, 512, 512),
        ("full-2tap", 2, 999, 1024, 512, 512),
    ]
    only = os.environ.get("STAGES")
    for name, n_taps, t_out, ck, o, block_rows in stages:
        if only and name not in only.split(","):
            continue
        tf = t_out + n_taps - 1
        y = jax.device_put((rng.randn(2, tf, ck) * 0.1).astype(np.float32))
        w = jax.device_put(
            (rng.randn(n_taps, ck, o) * 0.03).astype(np.float32))
        cb = jax.device_put((rng.randn(o) * 0.1).astype(np.float32))
        s = jax.device_put(rng.randn(o).astype(np.float32))
        b = jax.device_put(rng.randn(o).astype(np.float32))
        log(f"{name}: compiling ref (jit)...")
        want = np.asarray(jax.jit(
            lambda y, w, cb, s, b: _xla_ref(y, w, cb, s, b, 1e-5, t_out)
        )(y, w, cb, s, b))
        log(f"{name}: ref done; compiling fused pallas...")
        got = np.asarray(jax.jit(
            lambda y, w, cb, s, b: _pallas_call(y, w, cb, s, b, 1e-5,
                                                t_out, block_rows)
        )(y, w, cb, s, b))
        d = np.abs(got - want)
        log(f"{name}: OK max|d|={d.max():.3e} mean|d|={d.mean():.3e}")
    log("ALL_STAGES_OK")


if __name__ == "__main__":
    main()
