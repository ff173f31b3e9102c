#!/usr/bin/env python
"""Isolate encoder-compile pathologies: time the jit compile of a
production-WIDTH encoder at small DEPTH under each kernel-flag combination.
Used to attribute a hanging full-encoder compile (the per-kernel probes
compile in seconds standalone — scripts/probe_attnpack_tpu.py).

N_LAYERS=2 timeout 580 python -u scripts/probe_encoder_compile.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N_LAYERS = int(os.environ.get("N_LAYERS", 2))
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

    assert jax.default_backend() == "tpu", jax.default_backend()
    set_backend("pallas")
    cfg = Wav2Vec2Config(num_layers=N_LAYERS)
    params = jax.jit(init_wav2vec2_params, static_argnums=(1,))(
        jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (BATCH, T, cfg.hidden_size),
                          jnp.float32) * 0.3
    frame_mask = jnp.ones((BATCH, T), bool)

    for attnpack, ffnfuse in (("0", "0"), ("1", "0"), ("0", "1"), ("1", "1")):
        os.environ["W2VSEG_ATTNPACK"] = attnpack
        os.environ["W2VSEG_FFNFUSE"] = ffnfuse
        t0 = time.time()
        out = np.asarray(jax.jit(
            lambda p, a, ap=attnpack, ff=ffnfuse: encoder(
                p, a, frame_mask, cfg, deterministic=True,
                compute_dtype=jnp.bfloat16)
        )(params, x), np.float32)
        print(f"attnpack={attnpack} ffnfuse={ffnfuse}: compile+run "
              f"{time.time() - t0:.1f}s  out_mean={out.mean():.4f}",
              flush=True)
    print("ENCODER_COMPILE_PROBE_DONE", flush=True)


if __name__ == "__main__":
    main()
