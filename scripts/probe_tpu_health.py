#!/usr/bin/env python
"""Tiny axon-tunnel health probe: device init + one trivial jit + a GEMM.

Run bounded (timeout 120) before attempting any risky TPU work; each stage
is logged BEFORE it starts so a hang is attributable.
"""
import sys
import time

t0 = time.perf_counter()


def log(msg):
    print(f"[{time.perf_counter() - t0:6.1f}s] {msg}", flush=True)


log("importing jax")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

log("jax.devices() ...")
devs = jax.devices()
log(f"devices: {devs} backend={jax.default_backend()}")

log("trivial jit (x+1) ...")
x = jnp.ones((8, 128), jnp.bfloat16)
y = jax.jit(lambda a: a + 1)(x)
log(f"trivial jit ok: {np.asarray(y)[0, 0]}")

log("GEMM jit (1024x1024x1024 bf16) ...")
a = jax.random.normal(jax.random.PRNGKey(0), (1024, 1024), jnp.bfloat16)
g = jax.jit(lambda m: m @ m)(a)
log(f"GEMM ok: {float(np.asarray(g, np.float32).sum()):.3f}")
log("HEALTHY")
sys.exit(0)
