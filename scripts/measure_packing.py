"""Measure cross-talk packing on a many-talk sweep (PERF.md follow-up).

The 3-talk recorded bench showed packing inside tunnel noise; the win
scales with talks-per-bucket.  This sweeps N short talks whose window
grids leave a partial batch each, packed vs unpacked, on whatever backend
is active (TPU via axon by default).

Run: timeout 3000 python scripts/measure_packing.py
Env: PACK_TALKS (default 16), PACK_TALK_SECS (default 127.9), PACK_BATCH
(default 10), PACK_REPS (default 3).
"""

import os
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    from wav2vecsegmenter_tpu.core.runtime import setup_compilation_cache

    setup_compilation_cache()
    import jax
    import jax.numpy as jnp

    from wav2vecsegmenter_tpu.cli.common import segment_wavs
    from wav2vecsegmenter_tpu.config import Config
    from wav2vecsegmenter_tpu.data.audio import write_wav
    from wav2vecsegmenter_tpu.infer.pipeline import WindowInference
    from wav2vecsegmenter_tpu.models.shas import SHAS

    on_tpu = jax.default_backend() == "tpu"
    compute_dtype = jnp.bfloat16 if on_tpu else jnp.float32
    n_talks = int(os.environ.get("PACK_TALKS", 16))
    talk_secs = float(os.environ.get("PACK_TALK_SECS", 127.9))
    batch = int(os.environ.get("PACK_BATCH", 10))
    reps = int(os.environ.get("PACK_REPS", 3))

    model = SHAS(
        wav2vec_model_name="facebook/wav2vec2-xls-r-300m",
        wav2vec_keep_layers=24 if on_tpu else 2,
        n_transformer_enc_layers=1, n_transformer_enc_heads=8,
        init_dropout=0.1,
    )
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

    def cfg(pack):
        return Config({
            "batch_size": batch, "inference_times": 1,
            "inference_segment_length": 20,
            "algorithm": {"tag": "dac", "max_segment_length": 10,
                          "threshold": 0.5},
            "task": {"loss": {"tag": "bce"}},
            "runtime": {"pack_across_talks": pack},
        })

    with tempfile.TemporaryDirectory() as td:
        rng = np.random.RandomState(0)
        wavs = []
        for i in range(n_talks):
            p = Path(td) / f"t{i}.wav"
            n = int(talk_secs * 16000)
            write_wav(p, (rng.randn(n).astype(np.float32) * 0.1
                          * ((np.arange(n) % 56000) < 48000)))
            wavs.append(p)
        total = n_talks * talk_secs

        results = {}
        for pack in (False, True):
            segment_wavs(cfg(pack), model, params, None, wavs,
                         compute_dtype, engine=engine)  # warmup
            walls = []
            for _ in range(reps):
                t0 = time.perf_counter()
                segment_wavs(cfg(pack), model, params, None, wavs,
                             compute_dtype, engine=engine)
                walls.append(time.perf_counter() - t0)
            results[pack] = walls
            print(f"pack={pack}: walls={[f'{w:.2f}' for w in walls]} "
                  f"best xRT={total / min(walls):.0f}", file=sys.stderr)
        speedup = min(results[False]) / min(results[True])
        print(f"packed speedup: {speedup:.3f}x over {n_talks} talks x "
              f"{talk_secs}s (batch={batch}, backend={jax.default_backend()})")


if __name__ == "__main__":
    main()
