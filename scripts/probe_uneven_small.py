#!/usr/bin/env python
"""Small/fast ragged-grid Pallas probe: does a grid that does not divide
rows lower on real TPU and produce correct values on the real rows?

rows=1000, block=256 -> grid 4, final block ragged (232 real rows).
Checks kernel output vs the XLA composition on ALL real rows.
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

H = 512
ROWS = int(os.environ.get("ROWS", 1000))
BLOCK = 256

t0 = time.time()


def stamp(msg):
    print(f"[{time.time() - t0:7.1f}s] {msg}", flush=True)


def main():
    from wav2vecsegmenter_tpu.core.runtime import setup_compilation_cache

    setup_compilation_cache()
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from wav2vecsegmenter_tpu.ops.layernorm import (
        _bln_gelu_kernel, _bln_gelu_xla)

    stamp(f"devices: {jax.devices()}")

    def uneven_call(x2, cb, sc, bi, eps, block_rows=BLOCK):
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

    @jax.jit
    def check():
        x = jax.random.normal(ks[0], (ROWS, H), jnp.bfloat16)
        yk = uneven_call(x, cb, sc, bi, eps)
        yx = _bln_gelu_xla(x, cb, sc, bi, eps).astype(yk.dtype)
        d = jnp.abs(yk.astype(jnp.float32) - yx.astype(jnp.float32))
        return jnp.max(d)

    stamp("compiling check...")
    d = float(np.asarray(check()))
    stamp(f"ragged rows={ROWS} block={BLOCK}: max|kernel - xla| = {d:.3e}")
    assert d < 3e-2, d
    stamp("OK")


if __name__ == "__main__":
    main()
