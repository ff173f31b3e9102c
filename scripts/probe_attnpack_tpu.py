#!/usr/bin/env python
"""Staged real-Mosaic probe of the packed attention kernel
(ops/attention.attention_packed) — tiny -> production geometry, d=64 pair
and d=128 single-head regimes.  Run when the kernel or its BlockSpecs
change; interpret mode does not catch lowering failures (CLAUDE.md).

timeout 580 python -u scripts/probe_attnpack_tpu.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    from wav2vecsegmenter_tpu.core.runtime import setup_compilation_cache

    setup_compilation_cache()
    import jax
    import jax.numpy as jnp

    from wav2vecsegmenter_tpu.ops.attention import (
        _fused_attn_packed, _key_bias, attention_xla)
    from wav2vecsegmenter_tpu.ops.backend import set_backend

    assert jax.default_backend() == "tpu", jax.default_backend()
    set_backend("pallas")

    # (B, T, heads, D, dtype) — staged sizes up to the production shape
    stages = [
        (1, 64, 2, 64, jnp.float32),
        (1, 64, 1, 128, jnp.float32),
        (2, 999, 16, 64, jnp.float32),
        (16, 999, 16, 64, jnp.bfloat16),
        (16, 999, 8, 128, jnp.bfloat16),
    ]
    for b, t, nh, d, dt in stages:
        h = nh * d
        key = jax.random.PRNGKey(b * 1000 + t)
        proj = (jax.random.normal(key, (b, t, 3 * h), jnp.float32) * 0.3
                ).astype(dt)
        lens = np.full(b, t)
        lens[b // 2:] = max(1, t - 17)
        mask = jnp.asarray(np.arange(t)[None, :] < lens[:, None])
        bias = _key_bias(mask, b, t)
        t0 = time.time()
        got = np.asarray(jax.jit(
            lambda p: _fused_attn_packed(p, bias, float(d) ** -0.5, nh)
        )(proj), np.float32)
        dt_s = time.time() - t0
        qkv = np.asarray(proj, np.float32).reshape(b, t, 3, nh, d)
        qkv = qkv.transpose(2, 0, 3, 1, 4)
        want = np.asarray(attention_xla(
            jnp.asarray(qkv[0]), jnp.asarray(qkv[1]), jnp.asarray(qkv[2]),
            mask, d ** -0.5), np.float32)
        want = want.transpose(0, 2, 1, 3).reshape(b, t, h)
        m = np.asarray(mask)
        err = max(np.abs(got[i, m[i]] - want[i, m[i]]).max()
                  for i in range(b))
        tol = 5e-2 if dt == jnp.bfloat16 else 5e-3
        status = "OK" if err < tol else "FAIL"
        print(f"[{status}] B={b} T={t} H={nh} D={d} {jnp.dtype(dt).name}: "
              f"max|d|={err:.2e} compile+run {dt_s:.1f}s", flush=True)
        assert err < tol, (b, t, nh, d)
    print("ATTNPACK_PROBE_OK", flush=True)


if __name__ == "__main__":
    main()
