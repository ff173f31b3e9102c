"""Wav decoding with random-access window reads.

Replaces the reference's torchaudio sox_io seek-reads
(lib/dataset.py:248-250, 488-490, 659-663).  Backends:
  * native C++ loader (native/audio, via ctypes) when built — releases the
    GIL and serves the multi-threaded prefetcher;
  * stdlib ``wave`` fallback — 16-bit PCM mono, which is what MuST-C ships.

Samples are returned float32 in [-1, 1) (int16 / 32768, torchaudio's
convention).
"""

from __future__ import annotations

import wave
from pathlib import Path

import numpy as np

from ..constants import INPUT_SAMPLE_RATE

_native = None


def _get_native():
    global _native
    if _native is None:
        try:
            from . import native_audio

            _native = native_audio if native_audio.available() else False
        except Exception:
            _native = False
    return _native


def wav_info(path: str | Path) -> tuple[int, int, int]:
    """(num_frames, sample_rate, channels)."""
    nat = _get_native()
    if nat:
        return nat.wav_info(str(path))
    with wave.open(str(path), "rb") as f:
        return f.getnframes(), f.getframerate(), f.getnchannels()


def read_wav_window(path: str | Path, offset: int = 0,
                    num_frames: int | None = None) -> np.ndarray:
    """Read ``num_frames`` samples starting at ``offset`` -> float32 [-1, 1)."""
    nat = _get_native()
    if nat:
        return nat.read_window(str(path), int(offset),
                               -1 if num_frames is None else int(num_frames))
    with wave.open(str(path), "rb") as f:
        n_channels = f.getnchannels()
        sampwidth = f.getsampwidth()
        total = f.getnframes()
        if num_frames is None:
            num_frames = total - offset
        num_frames = max(0, min(num_frames, total - offset))
        f.setpos(int(offset))
        raw = f.readframes(int(num_frames))
    if sampwidth == 2:
        data = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif sampwidth == 4:
        data = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    elif sampwidth == 1:
        data = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"Unsupported sample width {sampwidth} in {path}")
    if n_channels > 1:
        # the reference keeps only the first channel (waveform[0],
        # lib/dataset.py:257) — match that, not a downmix
        data = np.ascontiguousarray(data.reshape(-1, n_channels)[:, 0])
    return data


class WaveformCache:
    """Thread-safe tiny LRU of fully-decoded waveforms.

    The fixed-grid inference/eval datasets read the SAME wav once per
    window and once per pass (the reference's torchaudio seek-read pattern,
    lib/dataset.py:659-663) — for a 600 s talk at 2 passes that is ~60
    file-open+seek+decode round trips for 38 MB of samples.  Access is
    talk-sequential there, so a capacity-2 LRU turns all but the first
    read into memory slices.  NOT used by the random training dataset
    (shuffled corpus-wide access would thrash any small cache).
    """

    def __init__(self, capacity: int = 2):
        import collections
        import threading

        self._cap = capacity
        self._data: "collections.OrderedDict[str, np.ndarray]" = \
            collections.OrderedDict()
        self._lock = threading.Lock()
        # per-key decode-in-progress events: producer pools touch a talk's
        # first windows concurrently; followers wait for the one decode
        # instead of each re-decoding the whole file (double-checked locking)
        self._threading = threading
        self._inflight: dict = {}

    def full(self, path: str | Path) -> np.ndarray:
        key = str(path)
        while True:
            with self._lock:
                if key in self._data:
                    self._data.move_to_end(key)
                    return self._data[key]
                ev = self._inflight.get(key)
                if ev is None:
                    self._inflight[key] = self._threading.Event()
                    break
            ev.wait()
            # decoded entry may already be evicted under heavy churn —
            # loop back and re-check (worst case this thread decodes)
        try:
            data = read_wav_window(key, 0, None)
            with self._lock:
                self._data[key] = data
                self._data.move_to_end(key)
                while len(self._data) > self._cap:
                    self._data.popitem(last=False)
        finally:
            with self._lock:
                self._inflight.pop(key).set()
        return data

    def window(self, path: str | Path, offset: int,
               num_frames: int) -> np.ndarray:
        full = self.full(path)
        return full[offset : offset + num_frames]

    def clear(self) -> None:
        """Drop cached waveforms (a long-lived eval dataset would otherwise
        pin the last talks' full decodes between evals).  In-flight decodes
        are untouched — they re-insert and age out normally."""
        with self._lock:
            self._data.clear()


def assert_sample_rate(path: str | Path) -> int:
    """Sample-rate guard (reference lib/dataset.py:600-602)."""
    n, sr, _ = wav_info(path)
    assert sr == INPUT_SAMPLE_RATE, (
        f"Audio needs to have sample rate of {INPUT_SAMPLE_RATE} (got {sr})"
    )
    return n


def write_wav(path: str | Path, samples: np.ndarray,
              sample_rate: int = INPUT_SAMPLE_RATE) -> None:
    """Write mono float32 [-1,1] samples as 16-bit PCM (test fixtures)."""
    pcm = np.clip(samples * 32768.0, -32768, 32767).astype("<i2")
    with wave.open(str(path), "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(pcm.tobytes())
