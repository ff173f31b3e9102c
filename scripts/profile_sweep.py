"""Decompose the recorded 3-talk sweep bench (bench.py infer mode).

Phase timers around the product loop (dispatch vs drain per talk) plus an
xplane trace of one timed pass to get true device-busy time — wall minus
busy is tunnel/host stall.  Parses the trace directly per the rig recipe
(tensorboard-plugin-profile converters are broken here):
PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python + xplane_pb2, plane
/device:TPU:0, line "XLA Ops" = serialized compute timeline.

Run on TPU: timeout 3000 python scripts/profile_sweep.py
"""

import os
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

TALKS = [621.5, 487.9, 300.0]
PASSES = 2
BATCH = 10


def parse_device_busy(trace_dir: Path) -> tuple[float, float]:
    """(busy_seconds, span_seconds) of the XLA Ops line on /device:TPU:0.

    Busy is the UNION of event intervals, not the duration sum: the line
    is hierarchical — `while` ops (lax.scan) bracket their body ops as
    nested events, so a plain sum double-counts every scan body (it read
    2.12 s on the recorded sweep where the union is 1.31 s; see
    bench.py._device_busy_seconds)."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    pb = sorted(trace_dir.rglob("*.xplane.pb"))[-1]
    sp = xplane_pb2.XSpace()
    sp.ParseFromString(pb.read_bytes())
    for plane in sp.planes:
        if "TPU:0" not in plane.name:
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            if not line.events:
                return 0.0, 0.0
            iv = sorted((e.offset_ps, e.offset_ps + e.duration_ps)
                        for e in line.events)
            busy = 0
            cur_s, cur_e = iv[0]
            for s, e in iv[1:]:
                if s <= cur_e:
                    cur_e = max(cur_e, e)
                else:
                    busy += cur_e - cur_s
                    cur_s, cur_e = s, e
            busy += cur_e - cur_s
            t0 = min(e.offset_ps for e in line.events)
            t1 = max(e.offset_ps + e.duration_ps for e in line.events)
            return busy / 1e12, (t1 - t0) / 1e12
    return 0.0, 0.0


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

    assert jax.default_backend() == "tpu", "profile on the TPU"
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

        def dispatch_one(wav):
            ds = FixedSegmentationDatasetNoTarget(wav, 20, PASSES)
            passes = []
            for it in range(PASSES):
                ds.fixed_length_segmentation(it)
                passes.append(dispatch_talk(engine, BatchIterator(
                    ds, BATCH, 20.0, shuffle=False, device_normalize=True)))
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

        def sweep(timers=None):
            in_flight = None
            for w in wavs:
                t0 = time.perf_counter()
                h = dispatch_one(w)
                t1 = time.perf_counter()
                if timers is not None:
                    timers.append(("dispatch", t1 - t0))
                if in_flight is not None:
                    t0 = time.perf_counter()
                    drain_one(*in_flight)
                    if timers is not None:
                        timers.append(("drain", time.perf_counter() - t0))
                in_flight = h
            t0 = time.perf_counter()
            drain_one(*in_flight)
            if timers is not None:
                timers.append(("drain", time.perf_counter() - t0))

        sweep()  # warmup / compile both buckets
        # phase-timed passes
        best, best_timers = None, None
        for _ in range(3):
            timers: list = []
            t0 = time.perf_counter()
            sweep(timers)
            wall = time.perf_counter() - t0
            if best is None or wall < best:
                best, best_timers = wall, timers
        total = sum(TALKS)
        print(f"wall(best)={best:.2f}s xRT={total / best:.0f}")
        for phase in ("dispatch", "drain"):
            vals = [v for k, v in best_timers if k == phase]
            print(f"  {phase}: sum={sum(vals):.2f}s "
                  f"per-talk={[f'{v:.2f}' for v in vals]}")

        # traced pass -> device busy
        trace_dir = Path(td) / "trace"
        with jax.profiler.trace(str(trace_dir)):
            t0 = time.perf_counter()
            sweep()
            wall_traced = time.perf_counter() - t0
        busy, span = parse_device_busy(trace_dir)
        print(f"traced pass: wall={wall_traced:.2f}s device_busy={busy:.2f}s "
              f"device_span={span:.2f}s idle_in_span={span - busy:.2f}s "
              f"stall={wall_traced - busy:.2f}s")


if __name__ == "__main__":
    main()
