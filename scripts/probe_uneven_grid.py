#!/usr/bin/env python
"""Probe: does Pallas TPU handle a grid that does not divide the rows?

bias_layer_norm_gelu pads its [rows, h] input to a multiple of block_rows
with jnp.pad — a full-buffer HBM copy when it fires.  The backward pad
chain in feature_extractor (kills the inter-layer fold pads) produces row
counts like 16*64120 = 1025920 that 256 does not divide, so that pad WOULD
fire on a 1 GB activation and eat the win.  If Mosaic masks the ragged
final block (reads defined where in-bounds, out-of-bounds writes dropped),
the pad can be dropped entirely: grid = ceil(rows/block).

Arms over [rows, 512] bf16:
  even   : rows = 1024000 (divides 256) — baseline
  ragged : rows = 1025920 (256 does not divide; 16*64120 pad-chain shape)

Checks ragged output vs the XLA fallback on all rows, then times both.

Run: timeout 580 ARMS=... python scripts/probe_uneven_grid.py
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REPS = int(os.environ.get("REPS", 30))
H = 512


def main():
    from wav2vecsegmenter_tpu.core.runtime import setup_compilation_cache

    setup_compilation_cache()
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from wav2vecsegmenter_tpu.ops.layernorm import (
        _bln_gelu_kernel, _bln_gelu_xla)

    def uneven_call(x2, cb, sc, bi, eps, block_rows=256):
        rows, h = x2.shape
        grid = -(-rows // block_rows)
        return pl.pallas_call(
            functools.partial(_bln_gelu_kernel, eps=eps),
            out_shape=jax.ShapeDtypeStruct((rows, h), x2.dtype),
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((block_rows, h), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((h,), lambda i: (0,), memory_space=pltpu.VMEM),
                pl.BlockSpec((h,), lambda i: (0,), memory_space=pltpu.VMEM),
                pl.BlockSpec((h,), lambda i: (0,), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((block_rows, h), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(x2, cb, sc, bi)

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    cb = jax.random.normal(ks[1], (H,), jnp.float32) * 0.1
    sc = 1.0 + 0.1 * jax.random.normal(ks[2], (H,), jnp.float32)
    bi = 0.1 * jax.random.normal(ks[3], (H,), jnp.float32)
    eps = 1e-5

    shapes = {"even": 1024000, "ragged": 1025920}
    sel = os.environ.get("ARMS")
    if sel:
        shapes = {k: v for k, v in shapes.items() if k in sel.split(",")}

    if "ragged" in shapes and not os.environ.get("SKIP_CHECK"):
        rows = shapes["ragged"]
        xr = jax.random.normal(ks[0], (rows, H), jnp.bfloat16)

        @jax.jit
        def check(x):
            yk = uneven_call(x, cb, sc, bi, eps)
            yx = _bln_gelu_xla(x, cb, sc, bi, eps).astype(yk.dtype)
            d = jnp.abs(yk.astype(jnp.float32) - yx.astype(jnp.float32))
            return jnp.max(d)

        d = float(np.asarray(check(xr)))
        print(f"ragged vs xla max|d| = {d:.3e}", flush=True)
        assert d < 3e-2, d  # bf16 output quantization

    for name, rows in shapes.items():
        x = jax.random.normal(ks[0], (rows, H), jnp.bfloat16)

        def run(_, x=x):
            def body(carry, _):
                y = uneven_call(x + 0 * carry.astype(jnp.bfloat16),
                                cb, sc, bi, eps)
                return 0.0 * y[0, 0].astype(jnp.float32), None
            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=REPS)
            return c

        lp = jax.jit(run)
        t0 = time.time()
        np.asarray(lp(0))
        t1 = time.time()
        walls = []
        for _ in range(3):
            s = time.time()
            np.asarray(lp(0))
            walls.append(time.time() - s)
        best = min(walls)
        print(f"{name:7s}: rows={rows} compile {t1-t0:.1f}s, "
              f"best {best/REPS*1e3:.3f} ms/call", flush=True)


if __name__ == "__main__":
    main()
