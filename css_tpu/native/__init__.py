"""ctypes bindings for the native data-pipeline core (mixcore.cpp).

Lazy self-build via make on first import; every entry point has a numpy
fallback in the callers (css_tpu.data.augment / mixer), so the framework
works without a toolchain — the native path just feeds TPUs faster.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_DIR = Path(__file__).parent
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


_ABI = 3


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", str(_DIR)], check=True,
                       capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    f32p = ctypes.POINTER(ctypes.c_float)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.mix_and_window.argtypes = [f32p, ctypes.c_int64, f32p, ctypes.c_int64,
                                   ctypes.c_int64, ctypes.c_int64,
                                   ctypes.c_int64, f32p, f32p, f32p]
    lib.mix_and_window_k.argtypes = [f32p, i64p, i64p, ctypes.c_int64,
                                     ctypes.c_int64, ctypes.c_int64,
                                     f32p, f32p]
    lib.fft_convolve_trunc.argtypes = [f32p, ctypes.c_int64, f32p,
                                       ctypes.c_int64, ctypes.c_int32, f32p]
    lib.fft_convolve_trunc_cached.argtypes = [
        f32p, ctypes.c_int64, f32p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int32, f32p]
    lib.add_noise_snr.argtypes = [f32p, ctypes.c_int64, f32p, ctypes.c_int64,
                                  ctypes.c_int64, ctypes.c_float]
    return lib


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    so = _DIR / "libmixcore.so"
    if not so.exists() and not _build():
        return None
    try:
        lib = ctypes.CDLL(str(so))
    except OSError:
        return None
    lib.mixcore_abi_version.restype = ctypes.c_int32
    if lib.mixcore_abi_version() != _ABI:
        # stale build from an older ABI — rebuild once
        try:
            so.unlink()
        except OSError:
            return None
        if not _build():
            return None
        try:
            lib = ctypes.CDLL(str(so))
        except OSError:
            return None
        lib.mixcore_abi_version.restype = ctypes.c_int32
        if lib.mixcore_abi_version() != _ABI:
            return None
    _LIB = _bind(lib)
    return _LIB


def available() -> bool:
    return _load() is not None


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def mix_and_window(w1: np.ndarray, w2: np.ndarray, offset: int, win: int,
                   num_windows: int):
    """Returns (mix, s1, s2), each (num_windows, win) float32."""
    lib = _load()
    w1 = np.ascontiguousarray(w1, np.float32)
    w2 = np.ascontiguousarray(w2, np.float32)
    mix = np.empty((num_windows, win), np.float32)
    s1 = np.empty((num_windows, win), np.float32)
    s2 = np.empty((num_windows, win), np.float32)
    lib.mix_and_window(_ptr(w1), len(w1), _ptr(w2), len(w2), offset, win,
                       num_windows, _ptr(mix), _ptr(s1), _ptr(s2))
    return mix, s1, s2


def mix_and_window_k(waves, offsets, win: int, num_windows: int):
    """K-speaker mixing: ``waves`` is a list of K 1-D utterances, each
    placed at ``offsets[i]`` of the mixture timeline. Returns
    (mix (num_windows, win), srcs (K, num_windows, win))."""
    lib = _load()
    k = len(waves)
    waves = [np.ascontiguousarray(w, np.float32) for w in waves]
    concat = (np.concatenate(waves) if k > 1
              else np.ascontiguousarray(waves[0]))
    lens = np.asarray([len(w) for w in waves], np.int64)
    offs = np.asarray(offsets, np.int64)
    mix = np.empty((num_windows, win), np.float32)
    srcs = np.empty((k, num_windows, win), np.float32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.mix_and_window_k(_ptr(concat), lens.ctypes.data_as(i64p),
                         offs.ctypes.data_as(i64p), k, win, num_windows,
                         _ptr(mix), _ptr(srcs))
    return mix, srcs


def fft_convolve_trunc(x: np.ndarray, h: np.ndarray,
                       normalize: bool = True,
                       rir_id: Optional[int] = None) -> np.ndarray:
    """FFT convolution truncated to len(x). Pass a stable ``rir_id`` for a
    fixed RIR pool: its spectrum is then computed once per process."""
    lib = _load()
    x = np.ascontiguousarray(x, np.float32)
    h = np.ascontiguousarray(h, np.float32)
    out = np.empty(len(x), np.float32)
    if rir_id is None:
        lib.fft_convolve_trunc(_ptr(x), len(x), _ptr(h), len(h),
                               1 if normalize else 0, _ptr(out))
    else:
        lib.fft_convolve_trunc_cached(_ptr(x), len(x), _ptr(h), len(h),
                                      int(rir_id), 1 if normalize else 0,
                                      _ptr(out))
    return out


def add_noise_snr(wav: np.ndarray, noise: np.ndarray, start: int,
                  snr_db: float) -> np.ndarray:
    lib = _load()
    wav = np.ascontiguousarray(wav, np.float32).copy()
    noise = np.ascontiguousarray(noise, np.float32)
    lib.add_noise_snr(_ptr(wav), len(wav), _ptr(noise), len(noise),
                      start, snr_db)
    return wav
