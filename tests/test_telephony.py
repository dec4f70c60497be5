# -*- coding: utf-8 -*-
"""Telephony output path: G.711 mu-law + 24k->8k decimation.

The encoder must be BIT-EXACT against CPython's audioop (the ITU 14-bit
algorithm) — mu-law bytes go straight onto PSTN media streams where a
wrong code is an audible artifact, not a tolerance question."""
import numpy as np
import pytest

from illufly_tts_tpu.audio.telephony import (
    RATIO,
    TELEPHONY_RATE,
    design_decimation_fir,
    mulaw_decode_np,
    mulaw_encode,
    mulaw_encode_np,
    resample_to_8k,
)
from illufly_tts_tpu.audio.wav import decode_wav, encode_wav_mulaw

audioop = pytest.importorskip("audioop")  # removed in 3.13; vectors below


def _full_range():
    return np.arange(-32768, 32768).astype("<i2")


def test_mulaw_encode_np_bit_exact_vs_audioop():
    x = _full_range()
    ref = np.frombuffer(audioop.lin2ulaw(x.tobytes(), 2), np.uint8)
    np.testing.assert_array_equal(mulaw_encode_np(x), ref)


def test_mulaw_encode_device_bit_exact_vs_audioop():
    import jax.numpy as jnp

    x = _full_range()
    ref = np.frombuffer(audioop.lin2ulaw(x.tobytes(), 2), np.uint8)
    got = np.asarray(
        mulaw_encode(jnp.asarray(x.astype(np.float32) / 32767.0))
    )
    np.testing.assert_array_equal(got, ref)


def test_mulaw_known_vectors():
    # frozen ITU vectors so the gate survives audioop's removal in 3.13
    x = np.array([0, 1, -1, 1000, -1000, 32767, -32768], np.int16)
    np.testing.assert_array_equal(
        mulaw_encode_np(x),
        np.array([255, 255, 126, 206, 78, 128, 0], np.uint8),
    )


def test_mulaw_decode_matches_audioop():
    codes = bytes(range(256))
    ref = np.frombuffer(audioop.ulaw2lin(codes, 2), "<i2").astype(np.int32)
    got = np.round(
        mulaw_decode_np(np.arange(256, dtype=np.uint8)) * 32767
    ).astype(np.int32)
    np.testing.assert_array_equal(got, ref)


def test_mulaw_roundtrip_snr():
    t = np.arange(24000) / 24000.0
    sig = (
        0.3 * np.sin(2 * np.pi * 220 * t)
        + 0.2 * np.sin(2 * np.pi * 700 * t)
    ).astype(np.float32)
    rt = mulaw_decode_np(
        mulaw_encode_np(np.round(sig * 32767).astype(np.int16))
    )
    snr = 10 * np.log10(np.mean(sig**2) / np.mean((sig - rt) ** 2))
    assert snr > 33.0  # G.711 delivers ~35-38 dB at speech levels


class TestResampler:
    def test_fir_dc_gain_and_symmetry(self):
        taps = design_decimation_fir()
        assert abs(taps.sum() - 1.0) < 1e-6
        np.testing.assert_allclose(taps, taps[::-1], atol=1e-9)

    def test_passband_preserved_stopband_killed(self):
        import jax.numpy as jnp

        taps = design_decimation_fir()
        t = np.arange(24000) / 24000.0
        # 1 kHz (passband): amplitude within 0.3%
        s = np.sin(2 * np.pi * 1000 * t).astype(np.float32)[None, :]
        y = np.asarray(resample_to_8k(jnp.asarray(s), taps))[0]
        assert y.shape[0] == 24000 // RATIO
        rms = np.sqrt(np.mean(y[200:-200] ** 2))
        assert abs(rms - 1 / np.sqrt(2)) < 0.003
        # 5 kHz (would alias to 3 kHz): > 40 dB down
        s5 = np.sin(2 * np.pi * 5000 * t).astype(np.float32)[None, :]
        y5 = np.asarray(resample_to_8k(jnp.asarray(s5), taps))[0]
        assert np.sqrt(np.mean(y5**2)) < 0.01

    def test_phase_alignment(self):
        """out[i] must be the FIR centered on in[3i] so model-frame
        boundaries (600 in -> 200 out) stay aligned for per-item trims."""
        import jax.numpy as jnp

        taps = design_decimation_fir()
        x = np.zeros((1, 600), np.float32)
        x[0, 300] = 1.0  # unit impulse at an input multiple of 3
        y = np.asarray(resample_to_8k(jnp.asarray(x), taps))[0]
        assert y.argmax() == 100  # center tap lands at out[300//3]


def test_wav_mulaw_roundtrip():
    rng = np.random.RandomState(0)
    u8 = rng.randint(0, 256, size=1601, dtype=np.uint8)  # odd: pad path
    blob = encode_wav_mulaw(u8, TELEPHONY_RATE)
    audio, rate = decode_wav(blob)
    assert rate == TELEPHONY_RATE
    np.testing.assert_allclose(audio, mulaw_decode_np(u8))


@pytest.mark.slow
class TestSynthesizerMulaw:
    def test_device_path_matches_host_path(self):
        """fmt='mulaw8k' (resample+compand fused into stage B) must agree
        with the host reference (f32 collect -> numpy resample -> numpy
        mu-law) up to one mu-law code of quantization."""
        import jax.numpy as jnp

        from illufly_tts_tpu.engine.synthesizer import Synthesizer
        from tests.test_model import tiny_config

        synth = Synthesizer(
            config=tiny_config(), token_buckets=(16,), frame_buckets=(32,)
        )
        synth.register_random_voice("v", seed=3)
        texts = ["ni→xau↓", "tsʰɤ↘ʂɨ↘"]

        dev = synth.synthesize_batch(texts, ["v"] * 2, fmt="mulaw8k")
        ref_f32 = synth.synthesize_batch(texts, ["v"] * 2, fmt="f32")

        taps = design_decimation_fir()
        for d_u8, f32 in zip(dev, ref_f32):
            assert d_u8.dtype == np.uint8
            assert d_u8.size * RATIO == f32.size
            peak = np.abs(f32).max()
            norm = f32 / peak if peak > 1.0 else f32
            host_8k = np.asarray(
                resample_to_8k(jnp.asarray(norm[None, :]), taps)
            )[0]
            host_u8 = mulaw_encode_np(
                np.round(np.clip(host_8k, -1, 1) * 32767).astype(np.int16)
            )
            # bf16 model numerics reorder across programs; compare the
            # DECODED waveforms, not the raw codes
            a = mulaw_decode_np(d_u8)
            b = mulaw_decode_np(host_u8)
            assert np.mean(np.abs(a - b)) < 2e-3
            assert np.corrcoef(a, b)[0, 1] > 0.999


def test_mulaw_lut_matches_decode():
    from illufly_tts_tpu.audio.telephony import mulaw_lut

    codes = np.arange(256, dtype=np.uint8)
    np.testing.assert_array_equal(mulaw_lut(np.float32), mulaw_decode_np(codes))
    np.testing.assert_array_equal(
        mulaw_lut(np.int16),
        np.round(mulaw_decode_np(codes) * 32767.0).astype(np.int16),
    )


@pytest.mark.slow
class TestMulaw24kWire:
    """fmt='mulaw24k': pure wire codec — uint8 G.711 @24 kHz on the link,
    ordinary 24 kHz PCM delivered after the host LUT expansion."""

    def _synth(self):
        from illufly_tts_tpu.engine.synthesizer import Synthesizer
        from tests.test_model import tiny_config

        synth = Synthesizer(
            config=tiny_config(), token_buckets=(16,), frame_buckets=(32,)
        )
        synth.register_random_voice("v", seed=3)
        return synth

    def test_wire_matches_pcm16_path(self):
        from illufly_tts_tpu.audio.telephony import mulaw_lut

        synth = self._synth()
        texts = ["ni→xau↓", "tsʰɤ↘ʂɨ↘"]
        wire = synth.synthesize_batch(
            texts, ["v"] * 2, fmt="mulaw24k", pcm16=True
        )
        pcm = synth.synthesize_batch(
            texts, ["v"] * 2, fmt="pcm16", pcm16=True
        )
        grid = set(mulaw_lut(np.int16).tolist())
        for w, p in zip(wire, pcm):
            assert w.dtype == np.int16 and w.size == p.size
            # every delivered sample sits on the 256-level mu-law grid
            assert set(np.unique(w).tolist()) <= grid
            # bf16 numerics reorder across programs: compare waveforms
            # against the host-side mu-law roundtrip of the pcm16 path
            host = mulaw_lut(np.int16)[mulaw_encode_np(p)]
            diff = np.abs(w.astype(np.float32) - host.astype(np.float32))
            assert np.mean(diff) / 32767.0 < 2e-3

    def test_wire_f32_delivery(self):
        from illufly_tts_tpu.audio.telephony import mulaw_lut

        synth = self._synth()
        out = synth.synthesize_batch(["ni→xau↓"], ["v"], fmt="mulaw24k")
        assert out[0].dtype == np.float32
        assert set(np.unique(out[0]).tolist()) <= set(
            mulaw_lut(np.float32).tolist()
        )

    def test_pipeline_wire_format_knob(self):
        """wire_format='mulaw24k' on the pipeline: PCM requests ride the
        wire codec transparently (split-phase path included) and the
        audio cache stays per-requested-format."""
        from illufly_tts_tpu.pipeline import CachedTTSPipeline
        from illufly_tts_tpu.audio.telephony import mulaw_lut

        pipe = CachedTTSPipeline(
            synthesizer=self._synth(), wire_format="mulaw24k"
        )
        texts = ["你好"]
        f32 = pipe.batch_process_texts(texts, ["v"], output_format="f32")
        assert f32[0].dtype == np.float32
        assert set(np.unique(f32[0]).tolist()) <= set(
            mulaw_lut(np.float32).tolist()
        )
        # split-phase surface delivers the requested PCM type too
        h = pipe.dispatch_texts(texts, ["v"], output_format="pcm16")
        pipe.launch_decode(h)
        out = pipe.collect_batch(h, output_format="pcm16")
        assert out[0].dtype == np.int16
        assert set(np.unique(out[0]).tolist()) <= set(
            mulaw_lut(np.int16).tolist()
        )
