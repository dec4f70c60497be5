# -*- coding: utf-8 -*-
"""WAV encode/decode with the stdlib (no torchaudio/soundfile dependency).

Replaces the reference's torchaudio.save/read round-trip
(reference: src/illufly_tts/core/service.py:373-404, api/endpoints.py:148).
Audio also stays in memory as bytes for the API path (SURVEY §7 step 5)."""
from __future__ import annotations

import io
import struct
import wave

import numpy as np


def encode_wav(audio: np.ndarray, sample_rate: int = 24000) -> bytes:
    """Waveform (float32 [-1,1]-ish, or already-int16 PCM) -> WAV bytes."""
    audio = np.asarray(audio)
    if audio.dtype == np.int16:
        pcm = audio.astype("<i2")
    else:
        audio = audio.astype(np.float32)
        peak = np.max(np.abs(audio)) if audio.size else 0.0
        if peak > 1.0:
            audio = audio / peak
        pcm = (np.clip(audio, -1.0, 1.0) * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def save_wav(path: str, audio: np.ndarray, sample_rate: int = 24000) -> None:
    with open(path, "wb") as f:
        f.write(encode_wav(audio, sample_rate))


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    with wave.open(io.BytesIO(data), "rb") as w:
        rate = w.getframerate()
        n = w.getnframes()
        raw = w.readframes(n)
        width = w.getsampwidth()
    if width == 2:
        pcm = np.frombuffer(raw, "<i2").astype(np.float32) / 32767.0
    elif width == 4:
        pcm = np.frombuffer(raw, "<i4").astype(np.float32) / 2147483647.0
    else:
        pcm = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128) / 127.0
    return pcm, rate


def load_wav(path: str) -> tuple[np.ndarray, int]:
    with open(path, "rb") as f:
        return decode_wav(f.read())
