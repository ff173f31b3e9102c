#!/usr/bin/env python
"""Decompose the headline inference benchmark's wall time.

bench.py measures ~667x RT on one chip (round 1) ~= 14% MFU, while the train
step sustains ~32% MFU — so roughly half the inference wall is not forward
compute.  This script splits one bench pass into:

  host:     wav decode + window slicing + batch assembly (BatchIterator)
  upload:   host->device transfer of the assembled int16 batches
  compute:  jitted forward on device-resident batches (forced output read)
  stitch:   prob download + talk-array stitching + nan-fill
  full:     the real pipeline (bench.py run_once), overlap included

Optionally captures a jax.profiler trace (PROFILE_DIR=...).

Run on TPU:  python scripts/profile_infer.py
"""

import os
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    from wav2vecsegmenter_tpu.core.runtime import setup_compilation_cache

    setup_compilation_cache()
    import jax
    import jax.numpy as jnp

    from wav2vecsegmenter_tpu.data.audio import write_wav
    from wav2vecsegmenter_tpu.data.datasets import FixedSegmentationDatasetNoTarget
    from wav2vecsegmenter_tpu.data.loader import BatchIterator
    from wav2vecsegmenter_tpu.infer.pipeline import WindowInference, infer_talk
    from wav2vecsegmenter_tpu.models.shas import SHAS

    on_tpu = jax.default_backend() == "tpu"
    compute_dtype = jnp.bfloat16 if on_tpu else jnp.float32
    keep = 24 if on_tpu else 2
    talk_secs = float(os.environ.get("BENCH_TALK_SECS", 600 if on_tpu else 60))
    batch_size = int(os.environ.get("BENCH_BATCH", 16))

    model = SHAS(wav2vec_model_name="facebook/wav2vec2-xls-r-300m",
                 wav2vec_keep_layers=keep, n_transformer_enc_layers=1,
                 n_transformer_enc_heads=8, init_dropout=0.1)
    if not on_tpu:
        from wav2vecsegmenter_tpu.models.wav2vec2 import Wav2Vec2Config

        model.w2v_cfg = Wav2Vec2Config(
            hidden_size=64, num_layers=2, num_heads=4, ffn_dim=128,
            conv_dim=(32,) * 7, conv_kernel=(10, 3, 3, 3, 3, 2, 2),
            conv_stride=(5, 2, 2, 2, 2, 2, 2),
            num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4)
        model.d_model = 64
    with jax.default_device(jax.devices("cpu")[0]):
        params = model.init(jax.random.PRNGKey(0))
    if on_tpu:
        params = jax.device_put(params, jax.devices()[0])
    engine = WindowInference(model, params, loss_tag="bce",
                             compute_dtype=compute_dtype)

    with tempfile.TemporaryDirectory() as td:
        wav_path = Path(td) / "talk.wav"
        rng = np.random.RandomState(0)
        n = int(talk_secs * 16000)
        audio = (rng.randn(n).astype(np.float32) * 0.1
                 * ((np.arange(n) % 56000) < 48000))
        write_wav(wav_path, audio)
        dataset = FixedSegmentationDatasetNoTarget(wav_path, 20, 1)
        dataset.fixed_length_segmentation(0)

        def batches():
            return BatchIterator(dataset, batch_size, 20.0, shuffle=False,
                                 device_normalize=on_tpu)

        # warmup: compile both buckets + one full pass
        infer_talk(engine, batches(), dataset.duration_outframes)

        def t(fn, reps=3):
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                fn()
                best = min(best, time.perf_counter() - t0)
            return best

        # 1. host only: decode + slice + assemble
        def host_only():
            for b in batches():
                pass
        host_s = t(host_only)

        # 2. upload only (reuses pre-assembled host batches)
        blist = list(batches())
        def upload_only():
            outs = []
            for b in blist:
                outs.append((jnp.asarray(b.audio), jnp.asarray(b.in_lengths),
                             jnp.asarray(b.out_mask),
                             jnp.asarray(b.norm_length, jnp.int32)
                             if b.device_normalize else None,
                             jnp.asarray(b.included)
                             if b.device_normalize else None))
            for o in outs:
                np.asarray(o[0][0, 0])  # force
            return outs
        upload_s = t(upload_only)

        # 3. compute only: device-resident inputs
        dev = upload_only()
        key = "fwd_norm" if blist[0].device_normalize else "fwd"
        fwd = engine._jitted[key]
        def compute_only():
            outs = []
            for (a, il, om, nl, inc) in dev:
                if nl is not None:
                    outs.append(fwd(engine.params, a, il, om, nl, inc))
                else:
                    outs.append(fwd(engine.params, a, il, om))
            for p, l in outs:
                np.asarray(p[0, 0])
        compute_s = t(compute_only)

        # 4. full pipeline
        def full():
            infer_talk(engine, batches(), dataset.duration_outframes)
        full_s = t(full)

    n_windows = len(dataset.starts) if hasattr(dataset, "starts") else -1
    fwd_flops = (29.3e6 * 999 * keep + 96e9) * talk_secs / 20.0
    print(f"backend={jax.default_backend()} layers={keep} talk={talk_secs}s "
          f"batch={batch_size} n_batches={len(blist)}")
    print(f"host   {host_s:7.3f} s")
    print(f"upload {upload_s:7.3f} s "
          f"({sum(b.audio.nbytes for b in blist) / 1e6:.1f} MB)")
    print(f"compute{compute_s:7.3f} s "
          f"({fwd_flops / compute_s / 1e12:.1f} TFLOP/s, "
          f"{fwd_flops / compute_s / 197e12 * 100:.1f}% v5e MFU)")
    print(f"full   {full_s:7.3f} s -> {talk_secs / full_s:.0f}x RT "
          f"(overlap saves {host_s + upload_s + compute_s - full_s:.3f} s)")

    pdir = os.environ.get("PROFILE_DIR")
    if pdir:
        with jax.profiler.trace(pdir):
            full()
        print(f"trace written to {pdir}")


if __name__ == "__main__":
    main()
