#!/usr/bin/env python
"""Staged real-TPU lowering probe for the round-4b conv kernel changes:

  * the wide-N 2-tap kernel (ops/convfuse._kernel_2tap_wide — one
    [bt,CK]x[CK,2O] dot + f32 output roll + 8-row halo dot), and
  * the tiny-ck 1-tap path (raw-audio layer: ck = k*c = 10 equals the
    array dim; K=10 dot on the MXU).

Each stage prints BEFORE it compiles so a Mosaic hang is attributable to
one program (PERF.md fold-epilogue pathology).  After the lowering stages,
a scanned-loop timing A/B of the 2-tap kernels at full geometry.

Run:
  timeout 580 python -u scripts/probe_convwide_tpu.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

t0 = time.time()
REPS = int(os.environ.get("REPS", 30))


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

    # (name, wide-env, n_taps, t_out, ck, o, block_rows, bf16)
    stages = [
        ("tinyck-1tap-f32", "1", 1, 256, 10, 512, 64, False),
        ("tinyck-1tap-bf16", "1", 1, 256, 10, 512, 64, True),
        ("wide-2tap-tiny", "1", 2, 256, 256, 128, 32, False),
        ("wide-2tap-full-f32", "1", 2, 999, 1024, 512, 512, False),
        ("wide-2tap-full-bf16", "1", 2, 999, 1024, 512, 512, True),
        ("tinyck-1tap-full-bf16", "1", 1, 64000, 10, 512, 512, True),
    ]
    only = os.environ.get("STAGES")
    for name, wide, n_taps, t_out, ck, o, block_rows, bf16 in stages:
        if only and name not in only.split(","):
            continue
        os.environ["W2VSEG_CONVWIDE"] = wide
        tf = t_out + n_taps - 1
        cast = jnp.bfloat16 if bf16 else jnp.float32
        y = jax.device_put(
            (rng.randn(2, tf, ck) * 0.1).astype(np.float32)).astype(cast)
        w = jax.device_put(
            (rng.randn(n_taps, ck, o) * 0.03).astype(np.float32)).astype(cast)
        cb = jax.device_put((rng.randn(o) * 0.1).astype(np.float32))
        s = jax.device_put(rng.randn(o).astype(np.float32))
        b = jax.device_put(rng.randn(o).astype(np.float32))
        log(f"{name}: compiling ref (jit)...")
        want = np.asarray(jax.jit(
            lambda y, w, cb, s, b: _xla_ref(y, w, cb, s, b, 1e-5, t_out)
        )(y, w, cb, s, b), np.float32)
        log(f"{name}: ref done; compiling fused pallas...")
        got = np.asarray(jax.jit(
            lambda y, w, cb, s, b: _pallas_call(y, w, cb, s, b, 1e-5,
                                                t_out, block_rows)
        )(y, w, cb, s, b), np.float32)
        d = np.abs(got - want)
        log(f"{name}: OK max|d|={d.max():.3e} mean|d|={d.mean():.3e}")
    log("ALL_LOWERING_STAGES_OK")

    if os.environ.get("SKIP_TIMING"):
        return
    # timing A/B at the production 2-tap geometry (layer 1 of a 16x20s
    # batch: bt rows = 16*32000 grouped as [16, 32000+1, 1024]) — data on
    # device, REPS loops inside ONE jit via lax.scan (CLAUDE.md rig rules)
    b_sz, t_out, ck, o, block_rows = 16, 32000, 1024, 512, 512
    key = jax.random.PRNGKey(0)
    y = (jax.random.normal(key, (b_sz, t_out + 1, ck), jnp.float32) * 0.1
         ).astype(jnp.bfloat16)
    w = (jax.random.normal(key, (2, ck, o), jnp.float32) * 0.03
         ).astype(jnp.bfloat16)
    cb = jax.random.normal(key, (o,), jnp.float32) * 0.1
    s = jax.random.normal(key, (o,), jnp.float32)
    bb = jax.random.normal(key, (o,), jnp.float32)

    outs = {}
    for name, wide in (("narrow", "0"), ("wide", "1")):
        os.environ["W2VSEG_CONVWIDE"] = wide

        def run(y0):
            def body(carry, _):
                # carry perturbs the BIAS (512 floats), not the GB-scale
                # activation — forces re-execution each rep without adding
                # an elementwise pass over y0 to the measurement
                out = _pallas_call(y0, w, cb + carry, s,
                                   bb, 1e-5, t_out, block_rows)
                return out[0, 0, 0].astype(jnp.float32) * 0.0, None
            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=REPS)
            return c

        log(f"timing {name}: compiling scan loop...")
        fn = jax.jit(run)
        np.asarray(fn(y))
        walls = []
        for _ in range(3):
            tw = time.time()
            np.asarray(fn(y))
            walls.append(time.time() - tw)
        ms = min(walls) / REPS * 1e3
        outs[name] = ms
        gf = 2 * b_sz * t_out * ck * o * 2 / 1e9  # 2 taps
        log(f"timing {name}: {ms:.3f} ms/layer-call "
            f"({gf / ms:.1f} TF/s effective)")
    log(f"SPEEDUP wide vs narrow: {outs['narrow'] / outs['wide']:.3f}x")


if __name__ == "__main__":
    main()
