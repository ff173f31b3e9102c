"""Online (streaming) segmentation: incremental pSTRM + OnlineSegmenter.

Contracts:
  * StreamingSTRM is chunk-boundary independent: feeding any partition of
    the prediction array commits exactly the spans of the one-shot run
    (which tests/test_algorithms.py separately fuzzes against the reference
    oracle's string implementation).
  * OnlineSegmenter over a wav fed in arbitrary chunks equals the offline
    ``strm`` entry point over the same per-window batch-1 probabilities.
"""

import numpy as np
import pytest

from wav2vecsegmenter_tpu.algorithms.strm import (
    StreamingSTRM,
    split_predictions_strm,
    strm,
)

from .helpers import tiny_shas


@pytest.mark.parametrize("seed", range(8))
def test_streaming_strm_matches_offline(seed):
    rng = np.random.RandomState(seed)
    n = rng.randint(1, 4000)
    # blocky speech/pause structure so real pauses exist
    bits = (rng.rand(n) < 0.6).astype(np.int8)
    runs = rng.randint(1, 60)
    for _ in range(runs):
        a = rng.randint(0, n)
        b = min(n, a + rng.randint(1, 80))
        bits[a:b] = rng.randint(0, 2)

    max_len = rng.randint(2, 400)
    min_len = rng.randint(0, max_len)
    min_pause = rng.randint(0, 40)

    want = split_predictions_strm(bits, max_len, min_len, min_pause)

    s = StreamingSTRM(max_len, min_len, min_pause)
    got = []
    i = 0
    while i < n:
        step = rng.randint(1, 300)
        got.extend(s.feed(bits[i : i + step]))
        i += step
    got.extend(s.flush())
    assert got == want

    # spans partition [0, consumed) without gaps inside
    for (s0, e0, _), (s1, e1, _) in zip(got, got[1:]):
        assert e0 == s1
    if got:
        assert got[0][0] == 0


def test_streaming_strm_commits_before_flush():
    """Spans commit as soon as their chunk fills — not all at flush()."""
    s = StreamingSTRM(10, 2, 1)
    bits = np.array([1, 1, 1, 0, 0, 0, 1, 1, 1, 1] * 3, np.int8)
    early = s.feed(bits)
    assert len(early) > 0
    s.flush()


@pytest.mark.parametrize("seg_len,talk_secs", [
    (4.0, 19.3),
    # 14 s windows: W*49.95/16000 = 699.3 — some window out-spans round to
    # 700 > out_len_for(W) = 699, exercising the batch -1-frame correction
    # and the online frame-clock repeat on the fractional-Wr path
    (14.0, 45.2),
])
def test_online_segmenter_matches_offline_strm(seg_len, talk_secs):
    import jax

    from wav2vecsegmenter_tpu.data.collate import collate, out_len_for
    from wav2vecsegmenter_tpu.infer.online import OnlineSegmenter
    from wav2vecsegmenter_tpu.infer.pipeline import WindowInference

    model = tiny_shas()
    params = model.init(jax.random.PRNGKey(0))
    engine = WindowInference(model, params)

    rng = np.random.RandomState(7)
    n = int(talk_secs * 16000)
    wav = (rng.randn(n).astype(np.float32) * 0.1
           * ((np.arange(n) % 32000) < 24000))
    # make one full window silent (excluded-row semantics)
    W0 = int(seg_len * 16000)
    wav[2 * W0 : 3 * W0] = 0.0
    algo = dict(max_segment_length=3, min_segment_length=0.2,
                min_pause_length=0.2, threshold=0.5)

    # ---- offline comparator: same batch-1 windows, then offline strm ----
    W = int(seg_len * 16000)
    out_len = out_len_for(W)
    probs_parts = []
    pos = 0
    while pos < n:
        window = wav[pos : pos + W]
        pos += len(window)
        from wav2vecsegmenter_tpu.core.frames import inframes_to_outframes

        end_out = int(inframes_to_outframes(pos))
        start_out = sum(len(p) for p in probs_parts)
        n_out = end_out - start_out
        batch = collate([(window, None, 0, n_out)], 1, W, out_len)
        if not batch.included[0]:
            probs_parts.append(np.zeros(n_out, np.float32))
            continue
        p = np.asarray(engine.run_batch(batch)[0])[0]
        valid = int(batch.ends[0] - batch.starts[0])
        p = p[:valid]
        if valid < n_out:
            p = np.concatenate([p, np.repeat(p[-1:], n_out - valid)])
        probs_parts.append(p)
    full_probs = np.concatenate(probs_parts)
    want = strm(full_probs, **{
        "max_segment_length": algo["max_segment_length"],
        "min_segment_length": algo["min_segment_length"],
        "min_pause_length": algo["min_pause_length"],
        "threshold": algo["threshold"],
    })

    # ---- online: arbitrary feed chunk sizes ----
    online = OnlineSegmenter(engine, segment_length=seg_len, **algo)
    got = []
    i = 0
    while i < n:
        step = rng.randint(1000, 90000)
        got.extend(online.feed(wav[i : i + step]))
        i += step
    n_before_finish = len(got)
    got.extend(online.finish())

    assert len(got) == len(want) > 0
    for g, w in zip(got, want):
        assert g.offset == w.offset
        assert g.duration == w.duration
    assert online.segments[0].offset == got[0].offset
    # streaming actually streamed: some segments committed before finish()
    assert n_before_finish > 0


def test_online_segmenter_single_shot_equals_chunked():
    import jax

    from wav2vecsegmenter_tpu.infer.online import OnlineSegmenter
    from wav2vecsegmenter_tpu.infer.pipeline import WindowInference

    model = tiny_shas()
    params = model.init(jax.random.PRNGKey(1))
    engine = WindowInference(model, params)
    rng = np.random.RandomState(9)
    n = int(11.7 * 16000)
    wav = (rng.randn(n).astype(np.float32) * 0.1
           * ((np.arange(n) % 16000) < 12000))

    def run(chunks):
        o = OnlineSegmenter(engine, segment_length=4.0,
                            max_segment_length=3)
        for c in chunks:
            o.feed(c)
        o.finish()
        return [(s.offset, s.duration) for s in o.segments]

    one = run([wav])
    many = run([wav[i : i + 13000] for i in range(0, n, 13000)])
    assert one == many and len(one) > 0


@pytest.mark.parametrize("seed", range(8))
def test_streaming_pthr_matches_offline(seed):
    """StreamingPTHR + StreamingMA over any feed partition == the batch
    pthr() walk (which test_algorithms.py fuzzes against the oracle)."""
    from wav2vecsegmenter_tpu.algorithms.pthr import (
        StreamingMA,
        StreamingPTHR,
        build_thresholds,
        moving_average,
        pthr,
    )

    rng = np.random.RandomState(100 + seed)
    n = rng.randint(5, 3000)
    probs = rng.rand(n)
    kw = dict(
        max_segment_length=rng.choice([1.0, 3.0, 7.7, 18.0]),
        min_segment_length=rng.choice([0.0, 0.2, 1.0]),
        max_lerp_range=rng.choice([0.0, 0.5]),
        min_lerp_range=rng.choice([0.0, 0.3]),
        threshold=rng.choice([0.3, 0.5, 0.7]),
        moving_average_window=rng.choice([0.0, 0.1, 0.9]),
    )
    want = [(s.offset, s.duration) for s in pthr(probs, **kw)]

    frame_len = 0.02
    thresholds = build_thresholds(
        int(kw["max_segment_length"] / frame_len),
        int(kw["min_segment_length"] / frame_len),
        int(kw["max_lerp_range"] / frame_len),
        int(kw["min_lerp_range"] / frame_len),
        kw["threshold"],
    )
    walker = StreamingPTHR(thresholds, kw["threshold"])
    ma = (StreamingMA(int(kw["moving_average_window"] / frame_len))
          if kw["moving_average_window"] > 0 else None)
    spans = []
    i = 0
    while i < n:
        step = rng.randint(1, 200)
        piece = probs[i : i + step]
        spans.extend(walker.feed(ma.feed(piece) if ma else piece))
        i += step
    spans.extend(walker.flush())

    from wav2vecsegmenter_tpu.algorithms.segment import Segment
    from wav2vecsegmenter_tpu.constants import TARGET_SAMPLE_RATE

    minu = TARGET_SAMPLE_RATE * 0.06
    got = [
        (Segment(max(0, s - minu), min(e + minu, n - 1)).offset,
         Segment(max(0, s - minu), min(e + minu, n - 1)).duration)
        for s, e in spans
    ]
    assert got == want

    # MA smoothing itself is partition-independent
    if ma is not None:
        full = moving_average(probs, int(kw["moving_average_window"] / frame_len))
        ma2 = StreamingMA(int(kw["moving_average_window"] / frame_len))
        parts, j = [], 0
        while j < n:
            st = rng.randint(1, 97)
            parts.append(ma2.feed(probs[j : j + st]))
            j += st
        np.testing.assert_allclose(np.concatenate(parts), full, rtol=1e-12)


def test_online_segmenter_pthr_matches_offline():
    import jax

    from wav2vecsegmenter_tpu.algorithms.pthr import pthr
    from wav2vecsegmenter_tpu.data.collate import collate, out_len_for
    from wav2vecsegmenter_tpu.core.frames import inframes_to_outframes
    from wav2vecsegmenter_tpu.infer.online import OnlineSegmenter
    from wav2vecsegmenter_tpu.infer.pipeline import WindowInference

    model = tiny_shas()
    params = model.init(jax.random.PRNGKey(2))
    engine = WindowInference(model, params)

    rng = np.random.RandomState(17)
    n = int(14.6 * 16000)
    wav = (rng.randn(n).astype(np.float32) * 0.1
           * ((np.arange(n) % 24000) < 18000))

    seg_len = 4.0
    algo = dict(max_segment_length=2.5, min_segment_length=0.2,
                threshold=0.5, moving_average_window=0.1)

    # offline comparator: same batch-1 windows -> batch pthr
    W = int(seg_len * 16000)
    out_len = out_len_for(W)
    parts, pos = [], 0
    while pos < n:
        window = wav[pos : pos + W]
        pos += len(window)
        end_out = int(inframes_to_outframes(pos))
        start_out = sum(len(p) for p in parts)
        n_out = end_out - start_out
        batch = collate([(window, None, 0, n_out)], 1, W, out_len)
        p = np.asarray(engine.run_batch(batch)[0])[0]
        valid = int(batch.ends[0] - batch.starts[0])
        p = p[:valid]
        if valid < n_out:
            p = np.concatenate([p, np.repeat(p[-1:], n_out - valid)])
        parts.append(p)
    want = [(s.offset, s.duration)
            for s in pthr(np.concatenate(parts), **algo)]

    online = OnlineSegmenter(engine, segment_length=seg_len,
                             algorithm="pthr", **algo)
    got = []
    i = 0
    while i < n:
        step = rng.randint(5000, 70000)
        got.extend(online.feed(wav[i : i + step]))
        i += step
    got.extend(online.finish())
    assert [(s.offset, s.duration) for s in got] == want
    assert len(want) > 0


def test_online_segmenter_rejects_dac():
    import jax

    from wav2vecsegmenter_tpu.infer.online import OnlineSegmenter
    from wav2vecsegmenter_tpu.infer.pipeline import WindowInference

    model = tiny_shas()
    engine = WindowInference(model, model.init(jax.random.PRNGKey(0)))
    with pytest.raises(NotImplementedError, match="dac"):
        OnlineSegmenter(engine, algorithm="dac")


def test_streaming_ma_bit_exact():
    """StreamingMA == moving_average EXACTLY (array_equal, not allclose):
    the smoothed value feeds a threshold comparison, so an ulp of drift
    could flip a committed boundary between online and offline.  The
    seeded-cumsum construction reproduces the offline csum floats."""
    from wav2vecsegmenter_tpu.algorithms.pthr import StreamingMA, moving_average

    rng = np.random.RandomState(7)
    x = rng.rand(100_000)
    for window in (1, 5, 37, 500):
        full = moving_average(x, window)
        ma = StreamingMA(window)
        parts, j = [], 0
        while j < len(x):
            st = rng.randint(1, 4096)
            parts.append(ma.feed(x[j : j + st]))
            j += st
        got = np.concatenate(parts)
        assert got.shape == full.shape
        assert np.array_equal(got, full), f"window={window} drifted"


def test_streaming_pthr_bounded_buffer_on_silence():
    """A long sub-threshold stream must not grow the lookahead buffer
    (hours of silence would otherwise retain the whole history in _buf)."""
    from wav2vecsegmenter_tpu.algorithms.pthr import StreamingPTHR

    w = StreamingPTHR(np.full(50, 0.5), 0.5)
    for _ in range(20):
        w.feed(np.full(1000, 0.1))
    assert len(w._buf) == 0
    # a speech onset after the silence still resolves at the right frame
    spans = list(w.feed(np.full(10, 0.9)))
    assert len(w._buf) <= 10
    spans += w.feed(np.full(60, 0.1))
    assert spans and spans[0] == (20_000, 20_010)


def test_online_frame_clock_robust_to_short_rows():
    """Exactly n_out frames reach the core per window even when the raw
    model row is shorter than the out-span estimate (fractional 49.95 Hz
    spans / collate's -1 correction) or the final window is sub-frame."""
    from wav2vecsegmenter_tpu.core.frames import inframes_to_outframes
    from wav2vecsegmenter_tpu.infer.online import OnlineSegmenter

    class ShortRowEngine:
        def run_batch(self, batch):
            # 3-wide rows: far shorter than any real window span
            return np.full((1, 3), 0.9, np.float32), None

    seg = OnlineSegmenter(
        ShortRowEngine(), segment_length=14.0, algorithm="strm",
        max_segment_length=2.0, min_segment_length=0.2,
        min_pause_length=0.2, threshold=0.5,
    )
    fed = []
    real_feed = seg._core.feed

    def counting_feed(arr):
        fed.append(len(arr))
        return real_feed(arr)

    seg._core.feed = counting_feed
    W = seg.window_inframes
    rng = np.random.RandomState(0)
    for _ in range(3):
        seg.feed((rng.randn(W) * 0.1 + 0.5).astype(np.float32))
    seg.feed(np.full(300, 0.5, np.float32))  # sub-frame tail
    seg.finish()
    total = int(inframes_to_outframes(3 * W + 300))
    assert sum(fed) == total == seg._out_head


# ---------------------------------------------------------------------------
# MultiStreamSegmenter: N concurrent streams through batched forwards
# ---------------------------------------------------------------------------

class _CountingEngine:
    """Delegates run_batch, recording each call's real-row count and span."""

    def __init__(self, engine):
        self._engine = engine
        self.calls = []  # (n_real, span) per run_batch

    def run_batch(self, batch):
        span = int((batch.ends[: batch.n_real] - batch.starts[: batch.n_real]).max())
        self.calls.append((batch.n_real, span))
        return self._engine.run_batch(batch)


def _mux_wavs(rng, n_streams, secs, silent_stream=None, seg_len=4.0):
    wavs = []
    for k in range(n_streams):
        n = int(secs[k] * 16000)
        w = (rng.randn(n).astype(np.float32) * 0.1
             * ((np.arange(n) % (16000 + 4000 * k)) < 12000))
        if k == silent_stream:
            W = int(seg_len * 16000)
            w[W : 2 * W] = 0.0  # one full silent window (excluded row)
        wavs.append(w)
    return wavs


@pytest.mark.parametrize("algorithm,algo", [
    ("strm", dict(max_segment_length=3, min_segment_length=0.2,
                  min_pause_length=0.2, threshold=0.5)),
    ("pthr", dict(max_segment_length=2.5, min_segment_length=0.2,
                  threshold=0.5, moving_average_window=0.1)),
])
def test_multistream_matches_single(algorithm, algo):
    """Per-stream commits of the batched multiplexer == independent
    OnlineSegmenter runs, and the windows really were batched."""
    import jax

    from wav2vecsegmenter_tpu.infer.online import (
        MultiStreamSegmenter,
        OnlineSegmenter,
    )
    from wav2vecsegmenter_tpu.infer.pipeline import WindowInference

    model = tiny_shas()
    engine = WindowInference(model, model.init(jax.random.PRNGKey(3)))
    counting = _CountingEngine(engine)

    rng = np.random.RandomState(23)
    seg_len = 4.0
    wavs = _mux_wavs(rng, 3, [18.7, 13.2, 21.0], silent_stream=0,
                     seg_len=seg_len)

    # ---- single-stream truth (chunk partition is immaterial) ----
    want = []
    for wav in wavs:
        o = OnlineSegmenter(engine, segment_length=seg_len,
                            algorithm=algorithm, **algo)
        o.feed(wav)
        o.finish()
        want.append([(s.offset, s.duration) for s in o.segments])

    # ---- multiplexed: interleaved feeds, different rates per stream ----
    mux = MultiStreamSegmenter(counting, max_batch=4, segment_length=seg_len,
                               algorithm=algorithm, **algo)
    steps = [int(1.3 * seg_len * 16000), int(0.7 * seg_len * 16000),
             int(2.1 * seg_len * 16000)]
    pos = [0, 0, 0]
    incremental = {k: [] for k in range(3)}
    while any(pos[k] < len(wavs[k]) for k in range(3)):
        chunks = {}
        for k in range(3):
            if pos[k] < len(wavs[k]):
                chunks[k] = wavs[k][pos[k] : pos[k] + steps[k]]
                pos[k] += steps[k]
        for sid, segs in mux.feed(chunks).items():
            incremental[sid].extend(segs)
    for sid, segs in mux.finish_all().items():
        incremental[sid].extend(segs)

    for k in range(3):
        got = [(s.offset, s.duration) for s in mux.segments(k)]
        assert got == want[k], f"stream {k} diverged"
        assert got == [(s.offset, s.duration) for s in incremental[k]]
        assert len(got) > 0
    # batching actually happened: at least one multi-row forward
    assert max(n for n, _ in counting.calls) > 1
    # and strictly fewer engine calls than total windows run through it
    total_windows = sum(n for n, _ in counting.calls)
    assert len(counting.calls) < total_windows


def test_multistream_fractional_spans_grouped():
    """At segment_length=14 the 49.95 Hz clock yields 699- AND 700-frame
    window spans; streams at different window indices must not share a
    batch (collate's batch-level -1 correction would couple them)."""
    import jax

    from wav2vecsegmenter_tpu.infer.online import (
        MultiStreamSegmenter,
        OnlineSegmenter,
    )
    from wav2vecsegmenter_tpu.infer.pipeline import WindowInference

    model = tiny_shas()
    engine = WindowInference(model, model.init(jax.random.PRNGKey(4)))
    counting = _CountingEngine(engine)

    rng = np.random.RandomState(31)
    seg_len = 14.0
    wavs = _mux_wavs(rng, 2, [43.1, 57.4], seg_len=seg_len)
    algo = dict(max_segment_length=3, min_segment_length=0.2,
                min_pause_length=0.2, threshold=0.5)

    want = []
    for wav in wavs:
        o = OnlineSegmenter(engine, segment_length=seg_len, **algo)
        o.feed(wav)
        o.finish()
        want.append([(s.offset, s.duration) for s in o.segments])

    seen_spans = []  # the span mix of each batched-feed round

    class SpyMux(MultiStreamSegmenter):
        def _batched_probs(self, examples):
            seen_spans.append({ex[3] for ex in examples})
            return super()._batched_probs(examples)

    mux = SpyMux(counting, max_batch=4, segment_length=seg_len, **algo)
    # stream 1 runs 2 windows ahead so window indices (and spans) differ
    W = int(seg_len * 16000)
    mux.feed({1: wavs[1][: 2 * W]})
    pos = [0, 2 * W]
    step = int(1.5 * W)
    while any(pos[k] < len(wavs[k]) for k in range(2)):
        chunks = {}
        for k in range(2):
            if pos[k] < len(wavs[k]):
                chunks[k] = wavs[k][pos[k] : pos[k] + step]
                pos[k] += step
        mux.feed(chunks)
    mux.finish_all()

    for k in range(2):
        got = [(s.offset, s.duration) for s in mux.segments(k)]
        assert got == want[k], f"stream {k} diverged"
        assert len(got) > 0
    # at least one feed round really saw BOTH span groups at once (the
    # grouping path ran; a mixed batch would couple the streams through
    # collate's batch-level -1 correction)
    assert any(spans == {699, 700} for spans in seen_spans), seen_spans


def _hop_engine():
    import jax

    from wav2vecsegmenter_tpu.infer.pipeline import WindowInference

    model = tiny_shas()
    params = model.init(jax.random.PRNGKey(0))
    return WindowInference(model, params)


def test_hop_mode_full_hop_equals_tumbling():
    """hop_secs == segment_length with lookahead 0 produces EXACTLY the
    tumbling window grid (trailing windows at k*W are [k*W - W, k*W)), so
    segments must match the default mode bit-for-bit — pins the hop-mode
    frame clock and commit bookkeeping to the proven tumbling path."""
    from wav2vecsegmenter_tpu.infer.online import OnlineSegmenter

    engine = _hop_engine()
    rng = np.random.RandomState(11)
    n = int(13.0 * 16000)
    wav = (rng.randn(n).astype(np.float32) * 0.1
           * ((np.arange(n) % 32000) < 24000))
    algo = dict(algorithm="strm", max_segment_length=3,
                min_segment_length=0.2, min_pause_length=0.2, threshold=0.5)

    base = OnlineSegmenter(engine, segment_length=4, **algo)
    hop = OnlineSegmenter(engine, segment_length=4, hop_secs=4,
                          lookahead_secs=0, **algo)
    for seg_obj in (base, hop):
        i = 0
        while i < n:
            seg_obj.feed(wav[i: i + 25000])
            i += 25000
        seg_obj.finish()
    assert len(base.segments) == len(hop.segments) > 0
    for a, b in zip(base.segments, hop.segments):
        assert a.offset == b.offset and a.duration == b.duration


def test_hop_mode_commits_earlier_and_covers_stream():
    """A 1 s hop with 1 s lookahead must commit segments with LOWER lag than
    the tumbling default (that is the knob's contract), produce sane
    segments over the full stream, and feed every output frame exactly once
    (the internal frame clock stays aligned)."""
    from wav2vecsegmenter_tpu.core.frames import inframes_to_outframes
    from wav2vecsegmenter_tpu.infer.online import OnlineSegmenter

    engine = _hop_engine()
    rng = np.random.RandomState(12)
    n = int(20.0 * 16000)
    wav = (rng.randn(n).astype(np.float32) * 0.1
           * ((np.arange(n) % 32000) < 24000))
    algo = dict(algorithm="strm", max_segment_length=3,
                min_segment_length=0.2, min_pause_length=0.2, threshold=0.5)

    def run(**kw):
        seg_obj = OnlineSegmenter(engine, segment_length=4, **algo, **kw)
        lags = []
        chunk = 16000  # 1 s ticks
        i = 0
        while i < n:
            for s in seg_obj.feed(wav[i: i + chunk]):
                pos_s = (i + chunk) / 16000
                lags.append(pos_s - (s.offset + s.duration))
            i += chunk
        seg_obj.finish()
        return seg_obj, lags

    base, lags_base = run()
    hop, lags_hop = run(hop_secs=1, lookahead_secs=1)

    # hop mode fed the entire stream to the core exactly once
    assert hop._fed_out == int(inframes_to_outframes(n))
    assert len(hop.segments) > 0
    # and commits are earlier on average (lags exist pre-finish in both)
    assert lags_hop and lags_base
    assert np.mean(lags_hop) < np.mean(lags_base)
    # segment surface stays sane: ordered, inside the stream
    ends = [s.offset + s.duration for s in hop.segments]
    assert all(e <= n / 16000 + 0.5 for e in ends)
    assert all(hop.segments[i].offset <= hop.segments[i + 1].offset
               for i in range(len(hop.segments) - 1))


def test_hop_mode_multistream_matches_single():
    """MultiStreamSegmenter in hop mode: batched hop jobs commit the same
    segments as the same stream run alone (same windows, batch-max
    normalization seeing identical full windows)."""
    from wav2vecsegmenter_tpu.infer.online import (
        MultiStreamSegmenter, OnlineSegmenter)

    engine = _hop_engine()
    rng = np.random.RandomState(13)
    n = int(12.0 * 16000)
    wavs = {k: (rng.randn(n).astype(np.float32) * 0.1
                * ((np.arange(n) % (32000 + 1600 * k)) < 24000))
            for k in range(3)}
    algo = dict(algorithm="pthr", max_segment_length=3,
                min_segment_length=0.2, threshold=0.4,
                moving_average_window=0.1, hop_secs=2, lookahead_secs=1)

    solo = {}
    for k, wav in wavs.items():
        seg_obj = OnlineSegmenter(engine, segment_length=4, **algo)
        i = 0
        while i < n:
            seg_obj.feed(wav[i: i + 16000])
            i += 16000
        seg_obj.finish()
        solo[k] = seg_obj.segments

    mux = MultiStreamSegmenter(engine, max_batch=4, segment_length=4, **algo)
    i = 0
    while i < n:
        mux.feed({k: wav[i: i + 16000] for k, wav in wavs.items()})
        i += 16000
    mux.finish_all()
    for k in wavs:
        got = mux.segments(k)
        assert len(got) == len(solo[k]) > 0, k
        for a, b in zip(got, solo[k]):
            assert a.offset == b.offset and a.duration == b.duration


def test_hop_mode_validation():
    from wav2vecsegmenter_tpu.infer.online import OnlineSegmenter

    engine = _hop_engine()
    with pytest.raises(ValueError):
        OnlineSegmenter(engine, segment_length=4, hop_secs=5)
    with pytest.raises(ValueError):
        OnlineSegmenter(engine, segment_length=4, hop_secs=2,
                        lookahead_secs=3)
