#!/usr/bin/env python
"""Probe: can the fused conv epilogue write its output already stride-folded
for the next conv layer?

The conv stack's remaining overhead after t_out alignment is the per-layer
fold regroup ([B,T,512] -> [B,T/2,1024] reshape, ~10.5 ms total) plus the
fold pad rows (~5.5 ms) — separate HBM passes because XLA cannot fuse into
the opaque Pallas epilogue custom-call.  If the epilogue kernel emits
[rows/2, 2h] directly (in-kernel [R,512] -> [R/2,1024] reshape = sublane
pairs moving into lanes), those passes disappear.  Mosaic may or may not
lower that reshape efficiently — this probe measures it before any
integration (cf. the rejected in-kernel lane slicing, PERF.md).

Arms over [1024000, 512] bf16 (layer-0-output scale, the biggest epilogue):
  base   : current _bln_gelu_call                      (expect ~5.4 ms)
  fold   : same math, output [rows/2, 1024] regrouped
  f32in  : base but f32 input, bf16 output (saves the tap-accum convert pass)
  f32fold: f32 input + folded output (the full fusion candidate)

Run: timeout 580 python scripts/probe_fold_epilogue.py

RESULT (2026-08-17): the fold arms are PATHOLOGICAL — the in-kernel
sublane->lane reshape hangs the Mosaic compiler server-side (a minimal
rows=2560 call never compiled in 6+ min and wedged the axon backend for
later processes).  Kept only as a record; do not re-run the fold arms.
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REPS = int(os.environ.get("REPS", 30))
ROWS = int(os.environ.get("ROWS", 1024000))
H = 512


def main():
    from wav2vecsegmenter_tpu.core.runtime import setup_compilation_cache

    setup_compilation_cache()
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from wav2vecsegmenter_tpu.ops.layernorm import (
        _bln_gelu_call, _bln_gelu_kernel, _erf_approx)

    t_start = time.time()

    def stamp(msg):
        print(f"[{time.time() - t_start:7.1f}s] {msg}", flush=True)

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    x16 = jax.random.normal(ks[0], (ROWS, H), jnp.bfloat16)
    x32 = x16.astype(jnp.float32)
    np.asarray(x32[0, :1])
    stamp("inputs materialized")
    cb = jax.random.normal(ks[1], (H,), jnp.float32) * 0.1
    sc = 1.0 + 0.1 * jax.random.normal(ks[2], (H,), jnp.float32)
    bi = 0.1 * jax.random.normal(ks[3], (H,), jnp.float32)
    eps = 1e-5

    def fold_kernel(x_ref, cb_ref, scale_ref, bias_ref, o_ref, *, eps):
        x = x_ref[:].astype(jnp.float32) + cb_ref[:].astype(jnp.float32)
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + eps)
        y = y * scale_ref[:] + bias_ref[:]
        g = 0.5 * y * (1.0 + _erf_approx(y * (2.0 ** -0.5)))
        r = g.shape[0]
        o_ref[:] = g.astype(o_ref.dtype).reshape(r // 2, 2 * g.shape[1])

    def fold_call(x2, block_rows=256):
        rows, h = x2.shape
        return pl.pallas_call(
            functools.partial(fold_kernel, eps=eps),
            out_shape=jax.ShapeDtypeStruct((rows // 2, 2 * h), jnp.bfloat16),
            grid=(rows // block_rows,),
            in_specs=[
                pl.BlockSpec((block_rows, h), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((h,), lambda i: (0,), memory_space=pltpu.VMEM),
                pl.BlockSpec((h,), lambda i: (0,), memory_space=pltpu.VMEM),
                pl.BlockSpec((h,), lambda i: (0,), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((block_rows // 2, 2 * h),
                                   lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(x2, cb, sc, bi)

    arms = {
        "base": lambda c: _bln_gelu_call(x16 + 0 * c.astype(jnp.bfloat16),
                                         cb, sc, bi, eps, 256),
        "fold": lambda c: fold_call(x16 + 0 * c.astype(jnp.bfloat16)),
        "f32in": lambda c: _bln_gelu_call(x32 + c, cb, sc, bi, eps, 256),
        "f32fold": lambda c: fold_call(x32 + c),
    }
    sel = os.environ.get("ARMS")
    if sel:
        arms = {k: v for k, v in arms.items() if k in sel.split(",")}
    # NB: the +c forces a scan-carry dependency; "+0*c" keeps base/fold input
    # bf16 but costs one extra elementwise pass over x in EVERY arm equally
    # (x32+c is the same pass), so relative timings stay honest.

    # numerics: fold == base regrouped (device-side compare, scalar download
    # — a full download is ~20 s through the tunnel)
    if not os.environ.get("SKIP_CHECK"):
        @jax.jit
        def check():
            yb = _bln_gelu_call(x16, cb, sc, bi, eps, 256)
            yf = fold_call(x16)
            return jnp.max(jnp.abs(yb.reshape(yf.shape).astype(jnp.float32)
                                   - yf.astype(jnp.float32)))
        d = float(np.asarray(check()))
        assert d == 0.0, d
        stamp("fold == base.reshape: exact")

    import jax

    def make_loop(fn):
        def run(_):
            def body(carry, _):
                y = fn(carry)
                return 0.0 * y[0, 0].astype(jnp.float32), None
            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=REPS)
            return c
        return jax.jit(run)

    for name, fn in arms.items():
        stamp(f"{name}: tracing/compiling...")
        lp = make_loop(fn)
        t0 = time.time()
        np.asarray(lp(0))
        t1 = time.time()
        walls = []
        for _ in range(3):
            s = time.time()
            np.asarray(lp(0))
            walls.append(time.time() - s)
        best = min(walls)
        print(f"{name:8s}: compile {t1-t0:.1f}s, best {best/REPS*1e3:.3f} "
              f"ms/call", flush=True)


if __name__ == "__main__":
    main()
