import numpy as np

from wav2vecsegmenter_tpu.core.frames import (
    conv_output_length,
    inframes_to_outframes,
    outframes_to_inframes,
    secs_to_inframes,
    secs_to_outframes,
)
from wav2vecsegmenter_tpu.core.windows import fixed_window_grid, random_window_grid


def test_frame_conversions_match_reference_semantics():
    # 20 s window: 320000 samples, 999 output frames at 49.95 Hz
    assert secs_to_inframes(20) == 320000
    assert secs_to_outframes(20) == 999
    assert inframes_to_outframes(320000) == 999
    # np.round banker's rounding is used (0.5 -> even)
    assert inframes_to_outframes(np.array([0, 160, 321])).tolist() == [0, 0, 1]


def test_conv_output_length_matches_frame_estimate_at_20s():
    assert conv_output_length(320000) == 999
    # arbitrary lengths: never more than 1 off the 49.95 Hz estimate
    for n in [16000, 100000, 319999, 123457]:
        est = inframes_to_outframes(n)
        true = conv_output_length(n)
        assert abs(int(est) - int(true)) <= 1


def test_fixed_window_grid_basic():
    dur = secs_to_inframes(65)  # 65 s talk
    starts, ends = fixed_window_grid(int(dur), 20, 1, 0)
    assert starts[0] == 0
    assert ends[-1] == dur
    # 65 s = 3 full 20s windows + 5 s remainder (>=2 s -> separate window)
    assert len(starts) == 4
    assert (ends[:-1] == starts[1:]).all()


def test_fixed_window_grid_merges_short_tail():
    dur = int(secs_to_inframes(41))  # 1 s tail < 2 s: merged into last window
    starts, ends = fixed_window_grid(dur, 20, 1, 0)
    assert len(starts) == 2
    assert ends[-1] == dur


def test_fixed_window_grid_iterations_shift():
    dur = int(secs_to_inframes(60))
    s0, _ = fixed_window_grid(dur, 20, 2, 0)
    s1, e1 = fixed_window_grid(dur, 20, 2, 1)
    assert s0[0] == 0 and s1[0] == 0
    # iteration 1 starts its grid at 10 s
    assert s1[1] == round(secs_to_inframes(20) / 2)
    assert e1[-1] == dur


def test_random_window_grid(rng):
    dur = int(secs_to_inframes(100))
    starts, ends = random_window_grid(dur, 20, rng)
    assert (starts >= 0).all() and (ends <= dur).all()
    assert (ends > starts).all()
    # windows cover the talk with <=10% overlap between consecutive windows
    assert starts[0] <= 0 + secs_to_inframes(2)
    assert ends[-1] >= dur - secs_to_inframes(20)
