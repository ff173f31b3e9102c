#!/usr/bin/env python
"""A/B microbench: bf16 vs int8 (w8a8) GEMM rates at the model's shapes.

Answers whether v5e's int8 MXU path (2x the bf16 ceiling) is reachable
through XLA's dot lowering for the shapes `runtime.quantize=int8` hits:

* encoder GEMMs (M=B*T=15984 at batch 16 x 999 frames) with
  N in {3072 (fused QKV), 1024 (o/w2), 4096 (w1)};
* a conv-stack-shaped N=512 contraction (issue-limited at bf16 per
  PERF.md — if the limit is instruction issue, int8 may not help it).

The int8 arm times the FULL dynamic-quantization chain the serving path
runs (per-row abs-max, scale, round, cast, int32 dot, dequant multiply),
so the comparison is end-to-end honest.

CAVEAT (CLAUDE.md rig notes): standalone scanned GEMMs at these shapes
measured ~39 TF/s bf16 while the SAME shapes inside the encoder hit
~190 TF/s (XLA pins activations in VMEM there) — this microbench
understates both arms and only the in-encoder A/B
(`BENCH_QUANT=int8 python bench.py`) is decisive; use this script to
check that int8 dots lower at all and their standalone ratio vs bf16.

Methodology per CLAUDE.md: operands generated ON DEVICE; reps looped
inside ONE jit via lax.scan; the input depends on the scalar carry (so
the GEMM cannot be hoisted) and the output reduces back into the carry
(so nothing big leaves the device); np.asarray forces completion.

Run on TPU:  timeout 580 python scripts/bench_int8_gemm.py
CPU check:   FORCE_CPU=1 REPS=2 M=256 python scripts/bench_int8_gemm.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REPS = int(os.environ.get("REPS", 30))
M = int(os.environ.get("M", 16 * 999))  # batch 16 x 999 frames


def main():
    import jax
    if os.environ.get("FORCE_CPU"):
        jax.config.update("jax_platforms", "cpu")
    else:
        from wav2vecsegmenter_tpu.core.runtime import setup_compilation_cache

        setup_compilation_cache()
    import jax.numpy as jnp

    from wav2vecsegmenter_tpu.ops.quant import int8_matmul, quantize_linear

    on_tpu = jax.default_backend() == "tpu"
    dt = jnp.bfloat16 if on_tpu else jnp.float32
    print(f"backend={jax.default_backend()} M={M} reps={REPS}", flush=True)

    shapes = [
        ("qkv  h->3h", 1024, 3072),
        ("o/w2 h->h ", 1024, 1024),
        ("w1   h->4h", 1024, 4096),
        ("w2   4h->h", 4096, 1024),
        ("conv N=512", 4608, 512),  # tap-folded conv-ish contraction
    ]

    for name, k, n in shapes:
        kx, kw = jax.random.split(jax.random.PRNGKey(0))
        x0 = jax.random.normal(kx, (M, k), dt)
        w = jax.random.normal(kw, (k, n), jnp.float32) / 8.0
        q = quantize_linear({"w": w, "b": np.zeros(n, np.float32)})
        qw, qs = q["qw"], q["qs"]
        wd = w.astype(dt)
        flops = 2.0 * M * k * n * REPS

        def make(mm):
            @jax.jit
            def run():
                def step(s, _):
                    # x depends on the carry: the GEMM can't be hoisted
                    x = x0 * (1 + s).astype(dt)
                    y = mm(x)
                    return jnp.float32(1e-9) * y.sum().astype(jnp.float32), ()
                s, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=REPS)
                return s
            return run

        run_bf16 = make(lambda x: x @ wd)
        run_int8 = make(lambda x: int8_matmul(x, qw, qs))

        rates = {}
        for tag, fn in (("bf16", run_bf16), ("int8", run_int8)):
            np.asarray(fn())  # compile + warm
            t0 = time.perf_counter()
            np.asarray(fn())
            dt_s = time.perf_counter() - t0
            rates[tag] = flops / dt_s / 1e12
            print(f"{name} [{M}x{k}]@[{k}x{n}] {tag}: "
                  f"{dt_s*1e3/REPS:7.2f} ms/rep  {rates[tag]:6.1f} TF/s",
                  flush=True)
        print(f"{name} int8/bf16 speedup: "
              f"{rates['int8']/rates['bf16']:.2f}x", flush=True)


if __name__ == "__main__":
    main()
