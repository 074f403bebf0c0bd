"""ctypes bindings for the native C++ audio frontend (audio.cpp).

Builds the shared library on first use if a toolchain is available
(`g++ -O3 -shared -fPIC`); falls back cleanly when not. Public entry points
mirror neutts_tpu/audio/io.py so callers can switch implementations:

    from neutts_tpu import native
    if native.available():
        wav, sr = native.read_wav(path)
        y = native.resample(wav, sr, 16_000)
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_DIR = Path(__file__).parent
_SO = _DIR / "libneutts_audio.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
             str(_DIR / "audio.cpp"), "-o", str(_SO)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not _SO.exists() or _SO.stat().st_mtime < (_DIR / "audio.cpp").stat().st_mtime:
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(str(_SO))
        except OSError:
            _build_failed = True
            return None
        lib.ntpu_read_wav.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.ntpu_read_wav.restype = ctypes.c_int
        lib.ntpu_write_wav.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.ntpu_write_wav.restype = ctypes.c_int
        lib.ntpu_resample_len.argtypes = [ctypes.c_int64, ctypes.c_int, ctypes.c_int]
        lib.ntpu_resample_len.restype = ctypes.c_int64
        lib.ntpu_resample.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_double,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
        ]
        lib.ntpu_resample.restype = ctypes.c_int
        lib.ntpu_overlap_add.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
        ]
        lib.ntpu_overlap_add.restype = ctypes.c_int
        lib.ntpu_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def read_wav(path: str | Path) -> Tuple[np.ndarray, int]:
    """Returns (float32 [T] or [T, C], sample_rate)."""
    lib = _load()
    assert lib is not None, "native audio library unavailable"
    out = ctypes.POINTER(ctypes.c_float)()
    frames = ctypes.c_int64()
    ch = ctypes.c_int()
    sr = ctypes.c_int()
    rc = lib.ntpu_read_wav(str(path).encode(), ctypes.byref(out),
                           ctypes.byref(frames), ctypes.byref(ch), ctypes.byref(sr))
    if rc != 0:
        raise IOError(f"ntpu_read_wav({path}) failed with code {rc}")
    n = frames.value * ch.value
    arr = np.ctypeslib.as_array(out, shape=(n,)).copy()
    lib.ntpu_free(out)
    if ch.value > 1:
        arr = arr.reshape(frames.value, ch.value)
    return arr, sr.value


def write_wav(path: str | Path, wav: np.ndarray, sample_rate: int) -> None:
    lib = _load()
    assert lib is not None, "native audio library unavailable"
    x = np.ascontiguousarray(wav, np.float32)
    ch = 1 if x.ndim == 1 else x.shape[1]
    frames = x.shape[0]
    rc = lib.ntpu_write_wav(
        str(path).encode(),
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        frames, ch, sample_rate,
    )
    if rc != 0:
        raise IOError(f"ntpu_write_wav({path}) failed with code {rc}")


def resample(x: np.ndarray, sr_in: int, sr_out: int, beta: float = 12.0) -> np.ndarray:
    lib = _load()
    assert lib is not None, "native audio library unavailable"
    xin = np.ascontiguousarray(x, np.float32)
    n_out = lib.ntpu_resample_len(len(xin), sr_in, sr_out)
    out = np.empty(n_out, np.float32)
    rc = lib.ntpu_resample(
        xin.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(xin), sr_in, sr_out, beta,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_out,
    )
    if rc != 0:
        raise RuntimeError(f"ntpu_resample failed with code {rc}")
    return out


def overlap_add(frames: np.ndarray, stride: int) -> np.ndarray:
    """frames: [n_frames, frame_len] equal-length chunks."""
    lib = _load()
    assert lib is not None, "native audio library unavailable"
    fr = np.ascontiguousarray(frames, np.float32)
    n_frames, frame_len = fr.shape
    total = stride * (n_frames - 1) + frame_len
    out = np.empty(total, np.float32)
    rc = lib.ntpu_overlap_add(
        fr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n_frames, frame_len, stride,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), total,
    )
    if rc != 0:
        raise RuntimeError(f"ntpu_overlap_add failed with code {rc}")
    return out
