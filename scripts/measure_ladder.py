"""A/B the inference remainder ladder (runtime.infer_remainder_ladder).

Same 3-talk x 2-pass product sweep as scripts/profile_sweep.py, alternating
ladder on/off reps in ONE process after warming both arms, so the rig's
high tunnel variance (CLAUDE.md) hits both arms equally.  Report min and
median per arm.

Run on TPU: timeout 3000 python scripts/measure_ladder.py
Env: LADDER_REPS (default 5 per arm).
"""

import os
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

TALKS = [621.5, 487.9, 300.0]
PASSES = 2
BATCH = 10


def main():
    from wav2vecsegmenter_tpu.core.runtime import setup_compilation_cache

    setup_compilation_cache()
    import jax
    import jax.numpy as jnp

    from wav2vecsegmenter_tpu.algorithms import pdac, update_yaml_content
    from wav2vecsegmenter_tpu.data.audio import write_wav
    from wav2vecsegmenter_tpu.data.datasets import (
        FixedSegmentationDatasetNoTarget,
    )
    from wav2vecsegmenter_tpu.data.loader import BatchIterator
    from wav2vecsegmenter_tpu.infer.pipeline import (
        WindowInference,
        collect_talk,
        dispatch_talk,
    )
    from wav2vecsegmenter_tpu.models.shas import SHAS

    reps = int(os.environ.get("LADDER_REPS", 5))
    assert jax.default_backend() == "tpu", "measure on the TPU"
    model = SHAS(wav2vec_model_name="facebook/wav2vec2-xls-r-300m",
                 wav2vec_keep_layers=24, n_transformer_enc_layers=1,
                 n_transformer_enc_heads=8, init_dropout=0.1)
    with jax.default_device(jax.devices("cpu")[0]):
        params = model.init(jax.random.PRNGKey(0))
    params = jax.device_put(params, jax.devices()[0])
    engine = WindowInference(model, params, loss_tag="bce",
                             compute_dtype=jnp.bfloat16)

    with tempfile.TemporaryDirectory() as td:
        rng = np.random.RandomState(0)
        wavs = []
        for i, secs in enumerate(TALKS):
            p = Path(td) / f"talk{i}.wav"
            n = int(secs * 16000)
            write_wav(p, (rng.randn(n).astype(np.float32) * 0.1
                          * ((np.arange(n) % 56000) < 48000)))
            wavs.append(p)

        def dispatch_one(wav, ladder):
            ds = FixedSegmentationDatasetNoTarget(wav, 20, PASSES)
            passes = []
            for it in range(PASSES):
                ds.fixed_length_segmentation(it)
                passes.append(dispatch_talk(engine, BatchIterator(
                    ds, BATCH, 20.0, shuffle=False, device_normalize=True,
                    remainder_ladder=ladder)))
            return ds, passes

        def drain_one(ds, passes):
            acc = None
            for pending in passes:
                probs, _, _ = collect_talk(engine, pending,
                                           ds.duration_outframes,
                                           need_logits=False)
                acc = probs if acc is None else acc + probs
            segs = pdac(acc / PASSES, max_segment_length=10, threshold=0.5)
            return update_yaml_content([], segs, "x.wav")

        def sweep(ladder):
            in_flight = None
            for w in wavs:
                h = dispatch_one(w, ladder)
                if in_flight is not None:
                    drain_one(*in_flight)
                in_flight = h
            drain_one(*in_flight)

        for arm in (False, True):  # warmup/compile all shapes of both arms
            t0 = time.perf_counter()
            sweep(arm)
            print(f"warmup ladder={arm}: {time.perf_counter() - t0:.1f}s",
                  flush=True)

        walls: dict = {False: [], True: []}
        for r in range(reps):
            for arm in (False, True) if r % 2 == 0 else (True, False):
                t0 = time.perf_counter()
                sweep(arm)
                walls[arm].append(time.perf_counter() - t0)

        total = sum(TALKS)
        for arm in (False, True):
            v = np.array(walls[arm])
            print(f"ladder={arm}: min={v.min():.2f}s med={np.median(v):.2f}s "
                  f"xRT(min)={total / v.min():.0f} "
                  f"walls={[f'{x:.2f}' for x in v]}")
        print(f"ladder speedup (min/min): "
              f"{min(walls[False]) / min(walls[True]):.3f}x")


if __name__ == "__main__":
    main()
