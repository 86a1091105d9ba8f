"""ctypes bindings for the native data-plane runtime.

Builds ``libpdt_runtime.so`` from ``wav_runtime.cpp`` on first use (one
``g++ -O3`` invocation, cached next to the source) and exposes:

* :func:`decode_wav` — single-file decode;
* :func:`load_batch` — the training hot loop (decode pair + crop + RMS
  normalize + pad) across a worker thread pool, one call per batch.

Everything degrades gracefully: if the toolchain or the .so is
unavailable, :func:`available` is False and callers use the pure-Python
``prior_diffuse_tpu.data.wavio`` path.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional, Sequence, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "wav_runtime.cpp")
_SO = os.path.join(_DIR, "libpdt_runtime.so")

_lib = None
_lock = threading.Lock()
_build_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
             _SRC, "-o", _SO],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except (OSError, subprocess.SubprocessError) as e:
        logging.warning("native runtime build failed: %s", e)
        return False


def _get_lib():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError as e:
            logging.warning("native runtime load failed: %s", e)
            _build_failed = True
            return None
        lib.pdt_decode_wav.restype = ctypes.c_long
        lib.pdt_decode_wav.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
            ctypes.c_long, ctypes.POINTER(ctypes.c_int),
        ]
        lib.pdt_wav_info.restype = ctypes.c_long
        lib.pdt_wav_info.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int)]
        lib.pdt_load_batch.restype = ctypes.c_int
        lib.pdt_load_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int, ctypes.c_long, ctypes.POINTER(ctypes.c_long),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_float),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _get_lib() is not None


def wav_info(path: str) -> Optional[Tuple[int, int]]:
    """-> (num_samples, sample_rate) without decoding to Python."""
    lib = _get_lib()
    if lib is None:
        return None
    sr = ctypes.c_int(0)
    n = lib.pdt_wav_info(path.encode(), ctypes.byref(sr))
    if n < 0:
        return None
    return int(n), int(sr.value)


def decode_wav(path: str, max_len: int = 16000 * 60) -> Optional[Tuple[np.ndarray, int]]:
    lib = _get_lib()
    if lib is None:
        return None
    out = np.empty(max_len, np.float32)
    sr = ctypes.c_int(0)
    n = lib.pdt_decode_wav(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_len, ctypes.byref(sr),
    )
    if n < 0:
        return None
    return out[:n].copy(), int(sr.value)


def load_batch(
    noisy_paths: Sequence[str],
    clean_paths: Sequence[str],
    chunk: int,
    crop_starts: Sequence[int],
    win_size: int = 320,
    fft_num: int = 320,
    win_shift: int = 160,
    sample_rate: int = 16000,
    num_threads: int = 0,
):
    """Native paired-batch load; returns (noisy, clean, frame_nums,
    wav_lens, scales) or None when the native path can't serve it."""
    lib = _get_lib()
    if lib is None:
        return None
    n = len(noisy_paths)
    if num_threads <= 0:
        num_threads = min(n, os.cpu_count() or 1)
    noisy = np.zeros((n, chunk), np.float32)
    clean = np.zeros((n, chunk), np.float32)
    frames = np.zeros(n, np.int32)
    lens = np.zeros(n, np.int32)
    scales = np.zeros(n, np.float32)
    np_arr = (ctypes.c_char_p * n)(*[p.encode() for p in noisy_paths])
    cp_arr = (ctypes.c_char_p * n)(*[p.encode() for p in clean_paths])
    starts = np.asarray(crop_starts, np.int64)
    rc = lib.pdt_load_batch(
        np_arr, cp_arr, n, chunk,
        starts.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        win_size, fft_num, win_shift, sample_rate, num_threads,
        noisy.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        clean.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        frames.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        scales.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 0:
        return None  # some file unsupported: caller falls back to Python
    return noisy, clean, frames, lens, scales
