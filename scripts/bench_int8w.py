#!/usr/bin/env python
"""Decide weight-only int8 (w8 dequant-into-bf16 GEMM) with one microbench
(VERDICT r4 next #6).

The parked w8a8 path (ops/quant.py, 0.44x end-to-end) loses to its dynamic
activation-quant chain; the remaining hypothesis is WEIGHT-ONLY int8:
halve the per-layer weight bytes streamed from HBM through the encoder's
stacked-layer lax.scan (25 MB/layer bf16 -> 12.5 MB), dequantizing into
bf16 right before a normal bf16 MXU GEMM — no activation quantization at
all.

This benches exactly that regime: a scan over L stacked layer weight sets
with a VMEM-resident [M, h] activation carry (the PERF.md VMEM-pinning
regime where in-scan GEMMs sustain ~190 TF/s), running the four encoder
GEMM shapes per layer (qkv h->3h, o h->h, w1 h->4h, w2 4h->h).

  arm bf16 : weights stored bf16, straight GEMMs
  arm int8w: weights stored int8 + f32 per-output-channel scale
             (quantize_linear layout), dequantized to bf16 in the body

Back-of-envelope for why this is expected to be a wash at inference batch
16x999: weights are ~79 us/layer of HBM at 317 GB/s vs ~4 ms/layer of
compute — the stream saving is ~1%, and the dequant multiply is O(params)
VPU work of the same order.  The microbench settles it (CLAUDE.md: never
trust arithmetic over a measurement on this chip).

Run on TPU: timeout 580 python -u scripts/bench_int8w.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REPS = int(os.environ.get("REPS", 20))
M = int(os.environ.get("M", 16 * 999))
H = int(os.environ.get("H", 1024))
L = int(os.environ.get("L", 24))


def main():
    from wav2vecsegmenter_tpu.core.runtime import setup_compilation_cache

    setup_compilation_cache()
    import jax
    import jax.numpy as jnp

    on_tpu = jax.default_backend() == "tpu"
    dt = jnp.bfloat16 if on_tpu else jnp.float32

    def stage(msg):
        print(f"## [{time.strftime('%H:%M:%S')}] {msg}", flush=True)

    shapes = {"qkv": (H, 3 * H), "o": (H, H), "w1": (H, 4 * H),
              "w2": (4 * H, H)}

    stage("make stacked weights + carry on device")
    keys = jax.random.split(jax.random.PRNGKey(0), len(shapes) + 1)
    wts = {n: (jax.random.normal(k, (L,) + s, jnp.float32) * (s[0] ** -0.5))
           for (n, s), k in zip(shapes.items(), keys[:-1])}
    x0 = jax.random.normal(keys[-1], (M, H), jnp.float32).astype(dt)

    def quant(w):  # per-output-channel symmetric, quantize_linear layout
        s = jnp.maximum(jnp.max(jnp.abs(w), axis=-2, keepdims=True), 1e-12)
        s = s / 127.0
        qw = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
        return qw, jnp.squeeze(s, -2)  # [L, d_out]

    wts_bf = jax.jit(lambda t: jax.tree.map(lambda a: a.astype(dt), t))(wts)
    wts_q = jax.jit(lambda t: {n: quant(w) for n, w in t.items()})(wts)
    jax.block_until_ready((wts_bf, wts_q))
    np.asarray(x0[0, :2])
    stage("weights ready")

    def body_bf(x, layer):
        a = x @ layer["qkv"]
        a = a[:, :H] @ layer["o"]
        x = (x + a).astype(dt)
        f = jax.nn.gelu(x @ layer["w1"], approximate=False).astype(dt)
        return (x + f @ layer["w2"]).astype(dt), None

    def deq(qw, s):
        return (qw.astype(dt) * s.astype(dt)[None, :])

    def body_q(x, layer):
        a = x @ deq(*layer["qkv"])
        a = a[:, :H] @ deq(*layer["o"])
        x = (x + a).astype(dt)
        f = jax.nn.gelu(x @ deq(*layer["w1"]), approximate=False).astype(dt)
        return (x + f @ deq(*layer["w2"])).astype(dt), None

    fns = {
        "bf16": jax.jit(lambda x, w: jax.lax.scan(body_bf, x, w)[0]),
        "int8w": jax.jit(lambda x, w: jax.lax.scan(body_q, x, w)[0]),
    }
    args = {"bf16": wts_bf, "int8w": wts_q}

    results, outs = {}, {}
    for name, fn in fns.items():
        stage(f"{name}: compile + numerics")
        t0 = time.time()
        outs[name] = np.asarray(fn(x0, args[name]), np.float32)
        stage(f"{name}: compiled in {time.time() - t0:.1f}s")

        def timed_pass():
            y = None
            for _ in range(REPS):
                y = fn(x0, args[name])
            np.asarray(y[0, :2])

        timed_pass()
        walls = []
        for _ in range(3):
            s = time.time()
            timed_pass()
            walls.append(time.time() - s)
        best = min(walls)
        results[name] = best / REPS * 1e3
        # 4 GEMMs: 3H^2 + H^2 + 4H^2 + 4H^2 = 12 H^2 MACs per row per layer
        tf = 2 * 12 * H * H * M * L / (results[name] / 1e3) / 1e12
        print(f"{name}: {results[name]:.2f} ms/pass "
              f"({results[name] / L:.3f} ms/layer, {tf:.1f} TF/s)",
              flush=True)

    d = np.abs(outs["bf16"] - outs["int8w"])
    sc = np.abs(outs["bf16"]).mean() + 1e-9
    print(f"numerics: max|d|={d.max():.3e} rel={d.max() / sc:.3e}")
    print(f"speedup int8w vs bf16: "
          f"{results['bf16'] / results['int8w']:.3f}x", flush=True)


if __name__ == "__main__":
    main()
