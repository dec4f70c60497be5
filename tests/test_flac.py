# -*- coding: utf-8 -*-
"""FLAC codec tests (audio/flac.py + native/flacenc.cpp).

The reference ships no audio codecs; this framework's OpenAI-compatible
surface offers ``response_format: "flac"``. FLAC is lossless, so the
codec self-verifies: encode -> decode must be bit-exact, and the native
C++ encoder must produce byte-identical streams to the numpy fallback.
"""
import numpy as np
import pytest

from illufly_tts_tpu.audio import flac
from illufly_tts_tpu.audio.wav import save_audio


def _speechish(n=60000, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 24000.0
    sig = (
        0.5 * np.sin(2 * np.pi * 180 * t) * (0.6 + 0.4 * np.sin(2 * np.pi * 3 * t))
        + 0.02 * rng.standard_normal(n)
    )
    return (sig * 32767).clip(-32768, 32767).astype(np.int16)


class TestRoundtrip:
    def test_speechish_exact(self):
        pcm = _speechish()
        data = flac.encode_flac(pcm, 24000)
        dec, sr = flac.decode_flac(data)
        assert sr == 24000
        assert np.array_equal(dec, pcm)

    def test_mixed_content_and_partial_last_frame(self):
        rng = np.random.default_rng(1)
        pcm = np.concatenate([
            _speechish(4096 * 2, seed=1),        # exact frames
            np.zeros(5000, np.int16),            # constant (silence gap)
            rng.integers(-32768, 32768, 999).astype(np.int16),  # verbatim-ish
            np.full(7, 123, np.int16),           # tiny constant tail
        ])
        data = flac.encode_flac(pcm, 24000)
        dec, _ = flac.decode_flac(data)
        assert np.array_equal(dec, pcm)

    @pytest.mark.parametrize("block_size", [192, 256, 1024, 4096, 4000])
    def test_block_sizes(self, block_size):
        pcm = _speechish(block_size * 3 + 17)
        data = flac.encode_flac(pcm, 24000, block_size=block_size)
        dec, _ = flac.decode_flac(data)
        assert np.array_equal(dec, pcm)

    @pytest.mark.parametrize("rate", [8000, 16000, 22050, 24000, 44100,
                                      11025, 12345])
    def test_sample_rates(self, rate):
        # named codes, the kHz/Hz escape codes, and an odd Hz value
        pcm = _speechish(3000)
        dec, sr = flac.decode_flac(flac.encode_flac(pcm, rate))
        assert sr == rate and np.array_equal(dec, pcm)

    def test_extremes_and_empty(self):
        pcm = np.array([-32768, 32767, -32768, 32767, 0, -1, 1],
                       np.int16)
        dec, _ = flac.decode_flac(flac.encode_flac(pcm, 24000))
        assert np.array_equal(dec, pcm)
        dec, _ = flac.decode_flac(flac.encode_flac(np.empty(0, np.int16)))
        assert dec.size == 0

    def test_single_sample(self):
        pcm = np.array([-7], np.int16)
        dec, _ = flac.decode_flac(flac.encode_flac(pcm, 24000))
        assert np.array_equal(dec, pcm)


class TestNativeParity:
    def test_native_matches_python_bytes(self):
        lib = flac._get_lib()
        if lib is None:
            pytest.skip("native toolchain unavailable")
        rng = np.random.default_rng(2)
        pcm = np.concatenate([
            _speechish(20000, seed=2),
            np.zeros(3000, np.int16),
            rng.integers(-32768, 32768, 512).astype(np.int16),
        ])
        for rate in (24000, 8000, 12345):
            nat = flac._encode_frames_native(pcm, rate, 4096)
            py = flac._encode_frames_py(pcm, rate, 4096)
            assert nat == py, f"native/python frame bytes differ at {rate}"


class TestFormat:
    def test_container_fields(self):
        pcm = _speechish(10000)
        data = flac.encode_flac(pcm, 24000)
        assert data[:4] == b"fLaC"
        assert data[4] == 0x80  # last metadata block, STREAMINFO
        # first frame sync code after the 4+4+34 byte header
        assert data[42] == 0xFF and (data[43] & 0xFE) == 0xF8

    def test_silence_compresses_massively(self):
        pcm = np.zeros(24000 * 5, np.int16)  # 5 s of silence = 240 KB raw
        data = flac.encode_flac(pcm, 24000)
        assert len(data) < 1000  # constant subframes: a few bytes/frame

    def test_speech_compresses(self):
        pcm = _speechish(24000 * 2)
        data = flac.encode_flac(pcm, 24000)
        assert len(data) < pcm.size * 2 * 0.95

    def test_crc_detects_corruption(self):
        pcm = _speechish(9000)
        data = bytearray(flac.encode_flac(pcm, 24000))
        data[60] ^= 0x01  # flip a bit inside the first frame's payload
        with pytest.raises(ValueError):
            flac.decode_flac(bytes(data))

    def test_md5_detects_wrong_audio(self):
        pcm = _speechish(9000)
        data = bytearray(flac.encode_flac(pcm, 24000))
        # corrupt the STREAMINFO MD5 (bytes 26..42 of the stream):
        # frames decode fine, signature check must still fail
        data[30] ^= 0xFF
        with pytest.raises(ValueError, match="MD5"):
            flac.decode_flac(bytes(data))


class TestSaveAudio:
    def test_save_audio_flac_matches_wav_quantization(self, tmp_path):
        rng = np.random.default_rng(3)
        audio = (0.8 * rng.standard_normal(12345)).astype(np.float32)
        wav_path = tmp_path / "a.wav"
        flac_path = tmp_path / "a.flac"
        save_audio(str(wav_path), audio, 24000)
        save_audio(str(flac_path), audio, 24000)
        import wave

        with wave.open(str(wav_path), "rb") as w:
            wav_pcm = np.frombuffer(
                w.readframes(w.getnframes()), "<i2"
            )
        dec, sr = flac.decode_flac(flac_path.read_bytes())
        assert sr == 24000
        assert np.array_equal(dec, wav_pcm)
