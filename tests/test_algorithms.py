"""Differential tests: our segmentation algorithms vs the reference
implementation imported as an oracle (see reference_oracle.py)."""

import numpy as np
import pytest

from wav2vecsegmenter_tpu.algorithms import (
    Segment,
    moving_average,
    pdac,
    pdac_tree,
    pthr,
    strm,
    trim,
    update_yaml_content,
)

from .reference_oracle import load_reference_segment, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)


@pytest.fixture(scope="module")
def ref():
    return load_reference_segment()


def _random_probs(rng, n=3000):
    # piecewise-smooth probabilities resembling SFC output: long speech spans
    # with dips at pauses
    base = rng.rand(n)
    smooth = np.convolve(base, np.ones(25) / 25, mode="same")
    return np.clip(smooth * 1.4, 0, 1)


def _as_tuples(segments):
    return [(round(s.offset, 6), round(s.duration, 6)) for s in segments]


def test_segment_properties_match(ref):
    ours = Segment(123, 456)
    theirs = ref.Segment(123, 456)
    assert ours.duration == theirs.duration
    assert ours.offset == theirs.offset
    assert ours.offset_plus_duration == theirs.offset_plus_duration


def test_trim_matches(ref, rng):
    for _ in range(20):
        probs = rng.rand(200)
        ours = trim(Segment(17, 17 + 200, probs=probs.copy()), 0.5)
        theirs = ref.trim(ref.Segment(17, 17 + 200, probs=probs.copy()), 0.5)
        assert ours.start == theirs.start and ours.end == theirs.end


@pytest.mark.parametrize("max_len,thr", [(10, 0.5), (18, 0.5), (16, 0.3)])
def test_pdac_matches_reference(ref, rng, max_len, thr):
    for _ in range(5):
        probs = _random_probs(rng)
        ours = pdac(probs.copy(), max_len, 0.2, thr)
        theirs = ref.pdac(probs.copy(), max_len, 0.2, thr)
        assert _as_tuples(ours) == _as_tuples(theirs)


@pytest.mark.parametrize("max_len,thr", [(18, 0.5), (20, 0.5), (18, 0.4)])
def test_strm_matches_reference(ref, rng, max_len, thr):
    for _ in range(5):
        probs = _random_probs(rng)
        ours = strm(probs.copy(), max_len, 0.2, 0.2, thr)
        theirs = ref.strm(probs.copy(), max_len, 0.2, 0.2, thr)
        assert _as_tuples(ours) == _as_tuples(theirs)


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(max_segment_length=28, min_segment_length=0.2, max_lerp_range=4,
             min_lerp_range=0.4, threshold=0.1, moving_average_window=0.1),
        dict(max_segment_length=28, min_segment_length=0.2, max_lerp_range=0,
             min_lerp_range=0, threshold=0.1, moving_average_window=0),
        dict(max_segment_length=18, min_segment_length=0.2, max_lerp_range=2,
             min_lerp_range=1, threshold=0.5, moving_average_window=0.2),
    ],
)
def test_pthr_matches_reference(ref, rng, kwargs):
    for _ in range(5):
        probs = _random_probs(rng)
        ours = pthr(probs.copy(), **kwargs)
        theirs = ref.pthr(probs.copy(), **kwargs)
        assert _as_tuples(ours) == _as_tuples(theirs)


def test_moving_average_matches_reference(ref, rng):
    arr = rng.rand(500)
    np.testing.assert_allclose(
        moving_average(arr, 5), ref.moving_average(arr, 5), rtol=1e-12
    )
    np.testing.assert_allclose(
        moving_average(arr, 1), ref.moving_average(arr, 1), rtol=1e-12
    )


def test_pdac_tree_matches_reference(ref, rng):
    for _ in range(3):
        probs = _random_probs(rng, 2000)
        ours = pdac_tree(probs.copy(), 18, 0.2, 0.5, 0, 6)
        theirs = ref.pdac_tree(probs.copy(), 18, 0.2, 0.5, 0, 6)
        assert _as_tuples(ours) == _as_tuples(theirs)


def test_yaml_content_matches_reference(ref, rng):
    probs = _random_probs(rng)
    ours = update_yaml_content([], pdac(probs.copy(), 10, 0.2, 0.5), "talk.wav")
    theirs = ref.update_yaml_content(
        [], ref.pdac(probs.copy(), 10, 0.2, 0.5), "talk.wav"
    )
    assert ours == theirs


def test_edge_cases_match_reference(ref, rng):
    """Degenerate inputs: all-speech, all-silence, tiny arrays, exact
    threshold values."""
    cases = [
        np.ones(500),                      # all speech
        np.zeros(500),                     # all silence
        np.full(500, 0.5),                 # exactly at threshold
        rng.rand(5),                       # shorter than any window
        np.concatenate([np.ones(400), np.zeros(3), np.ones(400)]),  # 1 pause
    ]
    for probs in cases:
        ours_d = pdac(probs.copy(), 6, 0.2, 0.5)
        theirs_d = ref.pdac(probs.copy(), 6, 0.2, 0.5)
        assert _as_tuples(ours_d) == _as_tuples(theirs_d)
        ours_s = strm(probs.copy(), 6, 0.2, 0.2, 0.5)
        theirs_s = ref.strm(probs.copy(), 6, 0.2, 0.2, 0.5)
        assert _as_tuples(ours_s) == _as_tuples(theirs_s)
        ours_p = pthr(probs.copy(), 6, 0.2, 1.0, 0.4, 0.5, 0.1)
        theirs_p = ref.pthr(probs.copy(), 6, 0.2, 1.0, 0.4, 0.5, 0.1)
        assert _as_tuples(ours_p) == _as_tuples(theirs_p)


def test_fuzz_long_arrays_match_reference(ref, rng):
    """Hour-scale arrays with hard thresholds (tie-dense)."""
    for seed in range(3):
        r = np.random.RandomState(seed)
        # quantized probs -> many exact ties exercising argsort/split orders
        probs = np.round(r.rand(180_000) * 8) / 8
        ours = pdac(probs.copy(), 18, 0.2, 0.5)
        theirs = ref.pdac(probs.copy(), 18, 0.2, 0.5)
        assert _as_tuples(ours) == _as_tuples(theirs)
        ours = pthr(probs.copy(), 28, 0.2, 4, 0.4, 0.1, 0.1)
        theirs = ref.pthr(probs.copy(), 28, 0.2, 4, 0.4, 0.1, 0.1)
        assert _as_tuples(ours) == _as_tuples(theirs)
        ours = strm(probs.copy(), 18, 0.2, 0.2, 0.5)
        theirs = ref.strm(probs.copy(), 18, 0.2, 0.2, 0.5)
        assert _as_tuples(ours) == _as_tuples(theirs)
