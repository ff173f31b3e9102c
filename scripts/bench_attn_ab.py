#!/usr/bin/env python
"""A/B: the 24-layer encoder with the packed-layout attention kernel
(attention_packed, W2VSEG_ATTNPACK=1) vs the legacy [B,T,3,H,D]->[B,H,T,D]
relayout + [B,H,T,D] kernel path.

Times the FULL encoder scan at production geometry ([16, 999, 1024], bf16)
— not the FFN op standalone — because v5e's VMEM pinning makes standalone
GEMM microbenches meaningless here (PERF.md: the same shapes do 39 vs
190 TF/s depending on residency).  Methodology per CLAUDE.md: data generated
on device, REPS back-to-back async dispatches of the compiled forward
(force only the tail), numerics cross-checked first.

Run on TPU: timeout 580 python -u scripts/bench_attn_ab.py
Optional: PROFILE_DIR=/tmp/attnab dumps an xplane trace per arm.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REPS = int(os.environ.get("REPS", 20))
BATCH = int(os.environ.get("BATCH", 16))
T = int(os.environ.get("T", 999))


def main():
    from wav2vecsegmenter_tpu.core.runtime import setup_compilation_cache

    setup_compilation_cache()
    import jax
    import jax.numpy as jnp

    from wav2vecsegmenter_tpu.models.wav2vec2 import (
        Wav2Vec2Config, encoder, init_wav2vec2_params)
    from wav2vecsegmenter_tpu.ops.backend import set_backend

    on_tpu = jax.default_backend() == "tpu"
    dt = jnp.bfloat16 if on_tpu else jnp.float32
    if on_tpu:
        set_backend("pallas")
    # isolate the attention variable: pin the FFN path to the separate-GEMM
    # chain for BOTH arms (bench_ffn_ab.py owns the FFN A/B)
    os.environ.setdefault("W2VSEG_FFNFUSE", "0")
    cfg = Wav2Vec2Config()

    # init params ON DEVICE in one jit (eager init through the tunnel is
    # minutes of per-op round trips)
    params = jax.jit(init_wav2vec2_params, static_argnums=(1,))(
        jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (BATCH, T, cfg.hidden_size),
                          jnp.float32) * 0.3
    frame_mask = jnp.ones((BATCH, T), bool)

    # Timing WITHOUT a REPS-scan mega-program: a lax.scan over the 24-layer
    # encoder triples the compile into the regime that crashed the remote
    # compile service (broken pipe, 2026-08-20).  Instead dispatch the
    # already-compiled single forward back-to-back N times (async dispatch
    # queues on device; the ~25-30 ms per-call RTT overlaps the ~150 ms
    # program) and force only the last output.

    profile_dir = os.environ.get("PROFILE_DIR")
    results = {}
    outs = {}
    for name, flag in (("relayout", "0"), ("attnpack", "1")):
        os.environ["W2VSEG_ATTNPACK"] = flag
        print(f"{name}: compiling single forward (numerics)...", flush=True)
        enc = jax.jit(lambda p, a: encoder(p, a, frame_mask, cfg,
                                           deterministic=True,
                                           compute_dtype=dt))
        t_c0 = time.time()
        outs[name] = np.asarray(enc(params, x), np.float32)
        t_c1 = time.time()

        def timed_pass():
            y = None
            for _ in range(REPS):
                y = enc(params, x)
            np.asarray(y[0, 0, :2])  # force the tail of the queue

        timed_pass()  # warm the dispatch path
        walls = []
        for _ in range(3):
            s = time.time()
            timed_pass()
            walls.append(time.time() - s)
        best = min(walls)
        results[name] = best / REPS * 1e3
        print(f"{name}: compile+first {t_c1 - t_c0:.1f}s, best "
              f"{best:.3f}s/{REPS} reps = {results[name]:.2f} ms/batch "
              f"({results[name] / cfg.num_layers:.2f} ms/layer)", flush=True)
        if profile_dir:
            d = os.path.join(profile_dir, name.replace("+", "_"))
            with jax.profiler.trace(d):
                timed_pass()

    a, b = outs["relayout"], outs["attnpack"]
    d = np.abs(a - b)
    scale = np.abs(a).mean() + 1e-9
    print(f"numerics: max|d|={d.max():.3e} mean|d|={d.mean():.3e} "
          f"rel(mean-scale)={d.max() / scale:.3e}", flush=True)
    print(f"speedup: {results['relayout'] / results['attnpack']:.3f}x "
          f"({results['relayout']:.2f} -> {results['attnpack']:.2f} "
          f"ms/batch)", flush=True)


if __name__ == "__main__":
    main()
