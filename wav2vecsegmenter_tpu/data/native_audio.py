"""ctypes binding for the native wav loader (native/audio/libw2vaudio.so).

Builds the library on first use if the toolchain is available; data/audio.py
falls back to the stdlib ``wave`` path when the native loader can't load.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path

import numpy as np

NATIVE_DIR = Path(__file__).resolve().parents[2] / "native" / "audio"
_LIB = None
_TRIED = False
_INIT_LOCK = threading.Lock()


def _load():
    global _LIB, _TRIED
    # loader pool threads race the first call: without the lock a second
    # thread could see _TRIED mid-build and permanently report "no native
    # loader" (or run `make` twice in the same directory)
    with _INIT_LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        return _load_locked()


def _load_locked():
    global _LIB
    so = NATIVE_DIR / "libw2vaudio.so"
    try:
        if not so.exists():
            subprocess.run(["make"], cwd=NATIVE_DIR, check=True,
                           capture_output=True)
        lib = ctypes.CDLL(str(so))
        lib.w2v_wav_info.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_long),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.w2v_wav_info.restype = ctypes.c_int
        lib.w2v_read_window.argtypes = [
            ctypes.c_char_p, ctypes.c_long, ctypes.c_long,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.w2v_read_window.restype = ctypes.c_long
        lib.w2v_flac_bound.argtypes = [ctypes.c_long]
        lib.w2v_flac_bound.restype = ctypes.c_long
        lib.w2v_encode_flac.argtypes = [
            ctypes.POINTER(ctypes.c_int16), ctypes.c_long, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
        ]
        lib.w2v_encode_flac.restype = ctypes.c_long
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def wav_info(path: str) -> tuple[int, int, int]:
    lib = _load()
    n = ctypes.c_long()
    sr = ctypes.c_int()
    ch = ctypes.c_int()
    rc = lib.w2v_wav_info(path.encode(), ctypes.byref(n), ctypes.byref(sr),
                          ctypes.byref(ch))
    if rc != 0:
        raise OSError(f"w2v_wav_info failed ({rc}) for {path}")
    return int(n.value), int(sr.value), int(ch.value)


def read_window(path: str, offset: int, num_frames: int) -> np.ndarray:
    lib = _load()
    if num_frames < 0:
        total, _, _ = wav_info(path)
        num_frames = total - offset
    out = np.empty(max(0, num_frames), np.float32)
    if num_frames == 0:
        return out
    got = lib.w2v_read_window(
        path.encode(), int(offset), int(num_frames),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if got < 0:
        raise OSError(f"w2v_read_window failed ({got}) for {path}")
    return out[: int(got)]


def encode_flac(samples_i16: np.ndarray, sample_rate: int) -> bytes:
    lib = _load()
    samples_i16 = np.ascontiguousarray(samples_i16, dtype=np.int16)
    n = len(samples_i16)
    cap = int(lib.w2v_flac_bound(n))
    out = np.empty(cap, np.uint8)
    got = lib.w2v_encode_flac(
        samples_i16.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), n,
        int(sample_rate), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        cap,
    )
    if got < 0:
        raise OSError(f"w2v_encode_flac failed ({got})")
    return out[: int(got)].tobytes()
