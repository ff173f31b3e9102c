#!/usr/bin/env python
"""Production-path numerics bound at FULL geometry: TPU bf16 + Pallas
kernels vs the CPU float32 XLA oracle (VERDICT r3 missing #1).

All earlier full-geometry parity (PARITY.md: backbone 2.9e-05 vs torch) runs
the CPU-f32 XLA path; production inference runs TPU-bf16 through the Pallas
kernels.  This script bounds the COMPOSED pipeline the product CLI runs
(reference lib/evaluate.py:9-127 + segment.py:26-131 semantics):
FixedSegmentationDatasetNoTarget window grids -> BatchIterator
(device-normalized, remainder ladder) -> SHAS forward (24L / h=1024 /
999-frame windows) -> stitching -> multi-pass averaging -> all four headline
algorithms (pDAC / pSTRM / pTHR / pTHR+MA, reference README.md:149-152).

Two arms run in separate PROCESSES (the platform must be pinned at jax
import on this rig — CLAUDE.md):

  python scripts/parity_tpu_fullgeom.py oracle   # CPU f32, kernels=xla
  python scripts/parity_tpu_fullgeom.py tpu      # TPU bf16, kernels=pallas
  python scripts/parity_tpu_fullgeom.py compare  # deltas -> PARITY.md table

Mixed-precision ladder arms (runtime.precision, VERDICT r4 next #3) — each
a separate process like the main arms; compare picks up every
probs_tpu*.npz present and reports dprob + boundary deltas + the measured
wall per talk (the xRT-cost side of the ladder):

  python scripts/parity_tpu_fullgeom.py tpu_f32head
  python scripts/parity_tpu_fullgeom.py tpu_f32res
  python scripts/parity_tpu_fullgeom.py tpu_f32last4

Artifacts land in /tmp/w2vseg_parity_fullgeom (override PARITY_OUT).
Talks are bench-shaped (tail-merged window -> tail bucket, free-standing
short window -> std bucket, whole windows) but scaled to PARITY_TALK_SPECS
(default "101.5,87.9,60") — the CPU-f32 oracle costs ~20 s per 24-layer
window forward on this 1-core host, so full 600 s talks are impractical;
the scaled sweep exercises the identical code paths (both shape buckets,
ladder slots, multi-pass grids, stitch/average) at ~14 windows x2 passes.

Weights: seeded random init with the SFC output layer scaled by 40 so the
logits span a real range (out-of-the-box random init puts every prob at
~0.5, where threshold algorithms are degenerate) — boundary deltas then
measure real decision movement, not noise at the decision boundary.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

OUT_DIR = Path(os.environ.get("PARITY_OUT", "/tmp/w2vseg_parity_fullgeom"))
TALK_SPECS = [float(x) for x in os.environ.get(
    "PARITY_TALK_SPECS", "101.5,87.9,60").split(",")]
BATCH = 10
PASSES = 2

ALGOS = {
    "dac": ("dac", dict(max_segment_length=10, min_segment_length=0.2,
                        threshold=0.5)),
    "strm": ("strm", dict(max_segment_length=20, min_segment_length=0.2,
                          threshold=0.5)),
    "pthr": ("pthr", dict(max_segment_length=10, min_segment_length=0.2,
                          threshold=0.1, moving_average_window=0)),
    "pthr_ma": ("pthr", dict(max_segment_length=10, min_segment_length=0.2,
                             threshold=0.1, moving_average_window=0.1)),
}


def _log(msg):
    print(f"[parity] {msg}", flush=True)


def _make_wavs():
    from wav2vecsegmenter_tpu.data.audio import write_wav

    wav_dir = OUT_DIR / "wavs"
    wav_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.RandomState(0)
    paths = []
    for i, secs in enumerate(TALK_SPECS):
        p = wav_dir / f"talk{i}.wav"
        n = int(secs * 16000)
        audio = (rng.randn(n).astype(np.float32) * 0.1
                 * ((np.arange(n) % 56000) < 48000))
        if not p.exists():
            write_wav(p, audio)
        paths.append(p)
    return paths


def _build_model_params():
    import jax

    from wav2vecsegmenter_tpu.models.shas import SHAS

    model = SHAS(
        wav2vec_model_name="facebook/wav2vec2-xls-r-300m",
        wav2vec_keep_layers=24,
        n_transformer_enc_layers=1,
        n_transformer_enc_heads=8,
        init_dropout=0.1,
    )
    with jax.default_device(jax.devices("cpu")[0]):
        params = model.init(jax.random.PRNGKey(0))
        # spread the logits (see module docstring)
        params["seg"]["out"]["w"] = params["seg"]["out"]["w"] * 40.0
    return model, params


def _run_arm(arm: str):
    import jax
    import jax.numpy as jnp

    from wav2vecsegmenter_tpu.data.datasets import (
        FixedSegmentationDatasetNoTarget)
    from wav2vecsegmenter_tpu.data.loader import BatchIterator
    from wav2vecsegmenter_tpu.infer.pipeline import WindowInference, infer_talk
    from wav2vecsegmenter_tpu.ops.backend import set_backend

    precision = None
    if arm == "oracle":
        assert jax.default_backend() == "cpu", jax.default_backend()
        set_backend("xla")
        dtype = jnp.float32
    else:
        assert jax.default_backend() == "tpu", (
            "tpu arm must run on the axon backend")
        # attribution arms: tpu_xla isolates the bf16 dtype (XLA kernels),
        # tpu_f32 isolates the Pallas kernels (f32 compute); tpu_f32head /
        # tpu_f32res / tpu_f32last<k> are the runtime.precision ladder
        set_backend("xla" if arm == "tpu_xla" else "pallas")
        dtype = jnp.float32 if arm == "tpu_f32" else jnp.bfloat16
        if arm.startswith("tpu_f32") and arm != "tpu_f32":
            precision = arm[len("tpu_"):]

    wav_paths = _make_wavs()
    model, params = _build_model_params()
    if arm.startswith("tpu"):
        params = jax.device_put(params, jax.devices()[0])
    engine = WindowInference(model, params, loss_tag="bce",
                             compute_dtype=dtype, precision=precision)

    out = {}
    walls = {}
    for wav in wav_paths:
        t0 = time.perf_counter()
        dataset = FixedSegmentationDatasetNoTarget(wav, 20, PASSES)
        avg_probs = avg_logits = None
        for it in range(PASSES):
            dataset.fixed_length_segmentation(it)
            batches = BatchIterator(
                dataset, BATCH, 20.0, shuffle=False, device_normalize=True,
                remainder_ladder=True)
            probs, logits, _ = infer_talk(
                engine, batches, dataset.duration_outframes,
                need_logits=False)
            if avg_probs is None:
                avg_probs, avg_logits = probs, logits
            else:
                avg_probs = avg_probs + probs
                avg_logits = avg_logits + logits
        avg_probs = avg_probs / PASSES
        out[wav.stem] = avg_probs.astype(np.float64)
        walls[wav.stem] = time.perf_counter() - t0
        _log(f"{arm}: {wav.name} ({dataset.duration_outframes} frames) "
             f"in {walls[wav.stem]:.1f}s")
    np.savez(OUT_DIR / f"probs_{arm}.npz", **out)
    # second timed sweep (first pays compiles); used for the ladder's
    # xRT-cost column
    t0 = time.perf_counter()
    for wav in wav_paths:
        dataset = FixedSegmentationDatasetNoTarget(wav, 20, PASSES)
        for it in range(PASSES):
            dataset.fixed_length_segmentation(it)
            infer_talk(engine, BatchIterator(
                dataset, BATCH, 20.0, shuffle=False, device_normalize=True,
                remainder_ladder=True), dataset.duration_outframes,
                need_logits=False)
    wall2 = time.perf_counter() - t0
    with open(OUT_DIR / f"wall_{arm}.json", "w") as f:
        json.dump({"first_sweep_s": walls, "warm_sweep_s": wall2,
                   "xrt_warm": sum(TALK_SPECS) / wall2}, f)
    _log(f"{arm}: wrote {OUT_DIR / f'probs_{arm}.npz'}; warm sweep "
         f"{wall2:.1f}s ({sum(TALK_SPECS) / wall2:.0f}x RT)")


def _segments_for(probs: np.ndarray):
    from wav2vecsegmenter_tpu.cli.common import run_algorithm

    res = {}
    for name, (tag, conf) in ALGOS.items():
        segs = run_algorithm(tag, dict(conf), probs, np.zeros_like(probs),
                             None)
        res[name] = [(float(s.offset), float(s.duration)) for s in segs]
    return res


def _compare():
    a = np.load(OUT_DIR / "probs_oracle.npz")
    b = np.load(OUT_DIR / "probs_tpu.npz")

    # ladder arms: every probs_tpu_*.npz present gets a dprob + boundary +
    # xRT-cost row against the same oracle (PARITY.md "precision ladder")
    ladder = {}
    for pb in sorted(OUT_DIR.glob("probs_tpu_*.npz")) + \
            [OUT_DIR / "probs_tpu.npz"]:
        arm = pb.stem[len("probs_"):]
        d = np.load(pb)
        dmax = max(float(np.abs(a[t] - d[t]).max()) for t in a.files)
        dmean = float(np.mean(
            np.concatenate([np.abs(a[t] - d[t]) for t in a.files])))
        segs_o = {t: _segments_for(a[t]) for t in a.files}
        segs_d = {t: _segments_for(d[t]) for t in a.files}
        flips = sum(
            1 for t in a.files for al in ALGOS
            if len(segs_o[t][al]) != len(segs_d[t][al]))
        wall_p = OUT_DIR / f"wall_{arm}.json"
        xrt = None
        if wall_p.exists():
            xrt = json.loads(wall_p.read_text()).get("xrt_warm")
        ladder[arm] = {"max_dprob": dmax, "mean_dprob": dmean,
                       "count_flips_talk_algo": flips, "xrt_warm": xrt}
        _log(f"ladder {arm}: max|dprob|={dmax:.5f} mean={dmean:.6f} "
             f"count-flips={flips}/{len(a.files) * len(ALGOS)} "
             f"xrt={xrt if xrt is None else round(xrt)}")

    report = {"talks": {}, "algorithms": {}, "ladder": ladder}
    worst = 0.0
    for talk in a.files:
        pa, pb = a[talk], b[talk]
        assert pa.shape == pb.shape, (talk, pa.shape, pb.shape)
        d = np.abs(pa - pb)
        report["talks"][talk] = {
            "frames": int(pa.size),
            "max_dprob": float(d.max()),
            "mean_dprob": float(d.mean()),
            "p99_dprob": float(np.percentile(d, 99)),
        }
        worst = max(worst, float(d.max()))
        _log(f"{talk}: max|dprob|={d.max():.5f} mean={d.mean():.6f} "
             f"p99={np.percentile(d, 99):.5f}")

    # one segmentation pass per (talk, arm): _segments_for runs all four
    # algorithms per call, so calling it inside the algorithm loop would
    # redo each talk 4x
    segs_a = {talk: _segments_for(a[talk]) for talk in a.files}
    segs_b = {talk: _segments_for(b[talk]) for talk in a.files}
    for name in ALGOS:
        n_eq = 0
        max_shift = 0.0
        n_a = n_b = 0
        per_talk = {}
        for talk in a.files:
            sa = segs_a[talk][name]
            sb = segs_b[talk][name]
            n_a += len(sa)
            n_b += len(sb)
            shift = float("nan")
            if len(sa) == len(sb):
                n_eq += 1
                ba = np.array([[o, o + du] for o, du in sa])
                bb = np.array([[o, o + du] for o, du in sb])
                shift = float(np.abs(ba - bb).max()) if len(sa) else 0.0
                max_shift = max(max_shift, shift)
            per_talk[talk] = {"n_oracle": len(sa), "n_tpu": len(sb),
                              "max_boundary_shift_s": shift}
        report["algorithms"][name] = {
            "segments_oracle": n_a, "segments_tpu": n_b,
            "talks_with_equal_counts": n_eq, "n_talks": len(a.files),
            "max_boundary_shift_s": max_shift, "per_talk": per_talk,
        }
        _log(f"{name}: segs {n_a} vs {n_b}, equal-count talks "
             f"{n_eq}/{len(a.files)}, max boundary shift {max_shift:.3f}s")
    report["max_dprob_overall"] = worst
    with open(OUT_DIR / "report.json", "w") as f:
        json.dump(report, f, indent=1)
    _log(f"wrote {OUT_DIR / 'report.json'}")


def main():
    cmd = sys.argv[1] if len(sys.argv) > 1 else "compare"
    OUT_DIR.mkdir(parents=True, exist_ok=True)
    if cmd == "oracle":
        import jax

        jax.config.update("jax_platforms", "cpu")
        _run_arm("oracle")
    elif cmd.startswith("tpu"):
        _run_arm(cmd)
    elif cmd == "compare":
        import jax

        jax.config.update("jax_platforms", "cpu")
        _compare()
    else:
        raise SystemExit(f"unknown command {cmd!r}")


if __name__ == "__main__":
    main()
