#!/usr/bin/env python
"""A/B: wav2vec2 feature extractor with the fused whole-conv-layer Pallas
kernel (ops/convfuse.py, W2VSEG_CONVFUSE=1) vs the default stride-folded
GEMM + fused-epilogue path.

Both arms trace the SAME ``models.wav2vec2.feature_extractor``; the gate is
read at trace time, so arm B flips the env var and re-jits.  Methodology per
CLAUDE.md: data on device, REPS looped inside one jit via lax.scan with a
scalar carry, wall timed over the scan call; numerics cross-checked first.

Run on TPU (axon is the default backend for ad-hoc scripts):
  timeout 580 python -u scripts/bench_convfuse_ab.py
Optional: PROFILE_DIR=/tmp/cfab dumps per-op XLA timelines per arm.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REPS = int(os.environ.get("REPS", 20))
BATCH = int(os.environ.get("BATCH", 16))
SECS = float(os.environ.get("SECS", 20.0))


def main():
    from wav2vecsegmenter_tpu.core.runtime import setup_compilation_cache

    setup_compilation_cache()
    import jax
    import jax.numpy as jnp

    from wav2vecsegmenter_tpu.models.wav2vec2 import (
        Wav2Vec2Config, feature_extractor)
    from wav2vecsegmenter_tpu.ops.backend import set_backend

    on_tpu = jax.default_backend() == "tpu"
    dt = jnp.bfloat16 if on_tpu else jnp.float32
    if on_tpu:
        set_backend("pallas")
    cfg = Wav2Vec2Config()
    L = int(16000 * SECS)

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 64)
    convs = []
    ki = 0
    for i, (c_out, k, s) in enumerate(
            zip(cfg.conv_dim, cfg.conv_kernel, cfg.conv_stride)):
        c_in = 1 if i == 0 else cfg.conv_dim[i - 1]
        convs.append({
            "w": jax.random.normal(ks[ki], (k, c_in, c_out), jnp.float32)
            * (1.0 / np.sqrt(k * c_in)),
            "b": jax.random.normal(ks[ki + 1], (c_out,), jnp.float32) * 0.1,
            "ln": {
                "scale": 1.0 + 0.1 * jax.random.normal(
                    ks[ki + 2], (c_out,), jnp.float32),
                "bias": 0.1 * jax.random.normal(
                    ks[ki + 3], (c_out,), jnp.float32),
            },
        })
        ki += 4
    params = {"feature_extractor": {"convs": convs}}
    audio = jax.random.normal(ks[ki], (BATCH, L), jnp.float32) * 0.1

    def make_loop():
        def run(a0):
            def body(carry, _):
                y = feature_extractor(params, a0 + carry, cfg, dt)
                return (jnp.float32(0.0) * y[0, 0, 0].astype(jnp.float32),
                        None)
            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=REPS)
            return c
        return jax.jit(run)

    profile_dir = os.environ.get("PROFILE_DIR")
    results = {}
    outs = {}
    for name, flag in (("gemm+epilogue", "0"), ("convfuse", "1")):
        os.environ["W2VSEG_CONVFUSE"] = flag
        print(f"{name}: compiling single forward (numerics)...", flush=True)
        fe = jax.jit(lambda p, a: feature_extractor(p, a, cfg, dt))
        outs[name] = np.asarray(fe(params, audio), np.float32)
        fn = make_loop()
        t0 = time.time()
        np.asarray(fn(audio))
        t1 = time.time()
        walls = []
        for _ in range(3):
            s = time.time()
            np.asarray(fn(audio))
            walls.append(time.time() - s)
        best = min(walls)
        results[name] = best / REPS * 1e3
        print(f"{name}: compile+first {t1 - t0:.1f}s, best "
              f"{best:.3f}s/{REPS} reps = {results[name]:.2f} ms/batch",
              flush=True)
        if profile_dir:
            d = os.path.join(profile_dir, name.replace("+", "_"))
            with jax.profiler.trace(d):
                np.asarray(fn(audio))

    a, b = outs["gemm+epilogue"], outs["convfuse"]
    d = np.abs(a - b)
    scale = np.abs(a).mean() + 1e-9
    print(f"numerics: max|d|={d.max():.3e} mean|d|={d.mean():.3e} "
          f"rel={d.max() / scale:.3e}", flush=True)
    print(f"speedup: {results['gemm+epilogue'] / results['convfuse']:.3f}x "
          f"({results['gemm+epilogue']:.2f} -> {results['convfuse']:.2f} "
          f"ms/batch)", flush=True)


if __name__ == "__main__":
    main()
