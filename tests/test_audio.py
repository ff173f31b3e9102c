"""Audio IO: python fallback and native C++ loader agree bit-for-bit."""

import numpy as np
import pytest

from wav2vecsegmenter_tpu.data import audio, native_audio
from wav2vecsegmenter_tpu.data.audio import read_wav_window, wav_info, write_wav


@pytest.fixture
def wav_file(tmp_path, rng):
    path = tmp_path / "x.wav"
    samples = (rng.randn(48000) * 0.2).clip(-1, 1).astype(np.float32)
    write_wav(path, samples)
    return path, samples


def test_wav_info_and_full_read(wav_file):
    path, samples = wav_file
    n, sr, ch = wav_info(path)
    assert (n, sr, ch) == (48000, 16000, 1)
    data = read_wav_window(path, 0, None)
    assert len(data) == 48000
    # int16 quantization round-trip
    np.testing.assert_allclose(data, samples, atol=1.0 / 32768)


def test_window_reads(wav_file):
    path, _ = wav_file
    full = read_wav_window(path, 0, None)
    win = read_wav_window(path, 1000, 5000)
    np.testing.assert_array_equal(win, full[1000:6000])
    # over-read clamps
    tail = read_wav_window(path, 47000, 5000)
    assert len(tail) == 1000


def test_native_loader_matches_python(wav_file, monkeypatch):
    if not native_audio.available():
        pytest.skip("native loader unavailable (no toolchain)")
    path, _ = wav_file
    n, sr, ch = native_audio.wav_info(str(path))
    assert (n, sr, ch) == (48000, 16000, 1)

    # force-python read for comparison
    monkeypatch.setattr(audio, "_native", False)
    py = audio.read_wav_window(path, 123, 7000)
    nat = native_audio.read_window(str(path), 123, 7000)
    np.testing.assert_array_equal(py, nat)


def test_native_loader_is_default_backend(wav_file):
    if not native_audio.available():
        pytest.skip("native loader unavailable")
    # reset the backend probe so the default path selects native
    audio._native = None
    assert audio._get_native() is native_audio
