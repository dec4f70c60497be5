# -*- coding: utf-8 -*-
"""ctypes bindings for the native PCM/WAV library (native/pcm.cpp).

Builds the shared library on demand with g++ (cached next to the source);
every entry point has a numpy fallback so the framework works without a
toolchain."""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_SRC = os.path.join(_NATIVE_DIR, "pcm.cpp")
_SO = os.path.join(_NATIVE_DIR, "libttspcm.so")

_lib: Optional[ctypes.CDLL] = None
_lock = threading.Lock()
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _SO],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception as exc:
        logger.info("native pcm build unavailable (%s); using numpy", exc)
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SRC):
            return None
        if not os.path.exists(_SO) or (
            os.path.getmtime(_SO) < os.path.getmtime(_SRC)
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
            lib.pcm_f32_to_i16.restype = ctypes.c_float
            lib.pcm_f32_to_i16.argtypes = [
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int16),
                ctypes.c_size_t,
            ]
            lib.pcm_i16_to_f32.argtypes = [
                ctypes.POINTER(ctypes.c_int16),
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_size_t,
            ]
            lib.wav_header.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_uint32,
                ctypes.c_uint32,
            ]
            _lib = lib
            logger.info("native pcm library loaded: %s", _SO)
        except OSError as exc:
            logger.info("native pcm load failed (%s); using numpy", exc)
    return _lib


def f32_to_i16(audio: np.ndarray) -> np.ndarray:
    """float32 -> int16 PCM with peak normalization (native or numpy)."""
    audio = np.ascontiguousarray(audio, np.float32)
    lib = get_lib()
    if lib is not None:
        out = np.empty(audio.shape, np.int16)
        lib.pcm_f32_to_i16(
            audio.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
            audio.size,
        )
        return out
    peak = np.max(np.abs(audio)) if audio.size else 0.0
    if peak > 1.0:
        audio = audio / peak
    return (np.clip(audio, -1.0, 1.0) * 32767.0).round().astype(np.int16)


def i16_to_f32(pcm: np.ndarray) -> np.ndarray:
    pcm = np.ascontiguousarray(pcm, np.int16)
    lib = get_lib()
    if lib is not None:
        out = np.empty(pcm.shape, np.float32)
        lib.pcm_i16_to_f32(
            pcm.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            pcm.size,
        )
        return out
    return pcm.astype(np.float32) / 32767.0


def wav_bytes(pcm: np.ndarray, sample_rate: int = 24000) -> bytes:
    """int16 PCM -> WAV container bytes (native header when available)."""
    pcm = np.ascontiguousarray(pcm, np.int16)
    lib = get_lib()
    if lib is not None:
        header = np.empty(44, np.uint8)
        lib.wav_header(
            header.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            pcm.size, sample_rate,
        )
        return header.tobytes() + pcm.astype("<i2").tobytes()
    from .wav import encode_wav

    return encode_wav(pcm, sample_rate)
