# -*- coding: utf-8 -*-
"""Custom dictionaries, dotenv, WAV round-trip, mel metrics, profiling."""
import numpy as np

from illufly_tts_tpu.audio.mel import mel_l1, mel_spectrogram
from illufly_tts_tpu.audio.wav import decode_wav, encode_wav
from illufly_tts_tpu.frontend.g2p.custom_dict import load_en_dict, load_zh_dict
from illufly_tts_tpu.utils.env import load_dotenv
from illufly_tts_tpu.utils.profiling import StageTimers


def test_wav_roundtrip():
    audio = np.sin(np.linspace(0, 100, 24000)).astype(np.float32) * 0.5
    data = encode_wav(audio, 24000)
    decoded, rate = decode_wav(data)
    assert rate == 24000
    np.testing.assert_allclose(decoded, audio, atol=1e-3)


def test_mel_l1_zero_for_identical():
    audio = np.random.RandomState(0).randn(24000).astype(np.float32)
    assert mel_l1(audio, audio) == 0.0
    other = np.random.RandomState(1).randn(24000).astype(np.float32)
    assert mel_l1(audio, other) > 0.0


def test_mel_shape():
    audio = np.zeros(24000, np.float32)
    mel = mel_spectrogram(audio)
    assert mel.shape[0] == 80


def test_custom_zh_dict(tmp_path):
    path = tmp_path / "zh.txt"
    path.write_text("# comment\n测词 ce4 ci2\n坏行 huai4 xing2\n", encoding="utf-8")
    added = load_zh_dict(str(path))
    assert added["测词"] == ["ce4", "ci2"]
    from illufly_tts_tpu.frontend.g2p.pinyin.engine import word_pinyin

    assert word_pinyin("测词") == ["ce4", "ci2"]


def test_custom_en_dict(tmp_path):
    path = tmp_path / "en.txt"
    path.write_text("kokoro koʊkoʊɹoʊ\n", encoding="utf-8")
    load_en_dict(str(path))
    from illufly_tts_tpu.frontend.g2p.en_g2p import EnglishG2P

    assert EnglishG2P().word_to_ipa("Kokoro") == "koʊkoʊɹoʊ"


def test_custom_en_dict_arpa(tmp_path):
    """CMU/ARPAbet lines (the reference's english_dict.txt format,
    resources/dictionaries/english_dict.txt:1-60) convert to IPA with
    stress digits honored."""
    path = tmp_path / "en_arpa.txt"
    path.write_text(
        "hello HH AH0 L OW1\nworld W ER1 L D\n", encoding="utf-8"
    )
    load_en_dict(str(path))
    from illufly_tts_tpu.frontend.g2p.en_g2p import EnglishG2P

    g2p = EnglishG2P()
    assert g2p.word_to_ipa("hello") == "həlˈoʊ"
    assert g2p.word_to_ipa("world") == "wˈɝld"


def test_arpa_to_ipa_helper():
    from illufly_tts_tpu.frontend.g2p.arpa import arpa_to_ipa, is_arpa
    from illufly_tts_tpu.pipeline import TTSPipeline

    assert is_arpa("HH AH0 L OW1")
    assert not is_arpa("koʊkoʊɹoʊ")
    assert arpa_to_ipa("R EH1 K ER0 D") == "ɹˈɛkɚd"
    assert arpa_to_ipa("ZZZ R") == "ZZZɹ"  # unknown tokens pass through
    # the reference exposes this on the pipeline (pipeline.py:515-550)
    assert TTSPipeline.arpa_to_ipa is not None


def test_dotenv(tmp_path, monkeypatch):
    path = tmp_path / ".env"
    path.write_text('FOO_TEST_VAR="bar"\n# comment\nBAZ=1\n')
    monkeypatch.delenv("FOO_TEST_VAR", raising=False)
    count = load_dotenv(str(path))
    import os

    assert count >= 1
    assert os.environ["FOO_TEST_VAR"] == "bar"


def test_stage_timers():
    timers = StageTimers()
    with timers.track("g2p"):
        pass
    with timers.track("g2p"):
        pass
    snap = timers.snapshot()
    assert snap["g2p"]["count"] == 2
    assert snap["g2p"]["total_s"] >= 0


def test_wav_24bit_decodes():
    """24-bit PCM decodes with sign extension (was reinterpreted as 3x
    uint8 noise) and unknown widths raise."""
    import struct
    import wave
    import io

    import numpy as np

    from illufly_tts_tpu.audio.wav import decode_wav

    ref = (np.sin(np.linspace(0, 20, 480)) * 0.5).astype(np.float32)
    vals = np.round(ref * 8388607.0).astype(np.int32)
    raw = b"".join(struct.pack("<i", v)[:3] for v in vals)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(3)
        w.setframerate(24000)
        w.writeframes(raw)
    audio, rate = decode_wav(buf.getvalue())
    assert rate == 24000 and audio.size == 480
    np.testing.assert_allclose(audio, ref, atol=2e-7)


def test_zhuyin_syllabic_nasals_roundtrip():
    """Dedicated glyphs for syllabic n/ng/m keep the zhuyin intermediate
    invertible (嗯 used to come back as 'en2')."""
    from illufly_tts_tpu.frontend.g2p.zhuyin import (
        syllable_to_zhuyin,
        zhuyin_syllable_to_pinyin,
    )

    for fin in ("n2", "ng2", "m2", "en2"):
        zy = syllable_to_zhuyin("", fin)
        assert zhuyin_syllable_to_pinyin(zy) == ("", fin), (fin, zy)


def test_mel_numpy_matches_jax():
    """Eval-time (numpy) and train-time (jax) log-mel agree: same
    periodic window, same floor (they silently diverged before)."""
    import jax
    import numpy as np

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from illufly_tts_tpu.audio.mel import mel_spectrogram
    from illufly_tts_tpu.audio.mel_jax import log_mel

    a = np.sin(np.linspace(0, 100, 4096)).astype(np.float32)
    m_np = mel_spectrogram(a)
    m_jx = np.asarray(log_mel(jnp.asarray(a)[None]))[0]
    f = min(m_np.shape[1], m_jx.shape[1])
    assert float(np.abs(m_np[:, :f] - m_jx[:, :f]).max()) < 0.02


def test_prometheus_render():
    """Exposition format: counters get _total names and TYPE lines, labels
    are escaped, floats/ints render per the text format."""
    from illufly_tts_tpu.utils.prometheus import render_prometheus

    stats = {
        "submitted": 5, "completed": 4, "failed": 1, "canceled": 0,
        "batches": 2, "audio_seconds": 12.5, "batch_seconds": 0.25,
        "throughput_x_realtime": 50.0, "pending": 3,
        "cache": {
            "text_hits": 7, "text_misses": 3, "text_hit_rate": 0.7,
            "voice_hits": 1, "voice_misses": 0, "voice_hit_rate": 1.0,
        },
        "stage_timers": {
            'front"end': {"ewma_s": 0.01, "count": 9, "total_s": 0.09},
        },
    }
    text = render_prometheus(stats)
    lines = text.splitlines()
    assert "tts_tasks_submitted_total 5" in lines
    assert "# TYPE tts_tasks_submitted_total counter" in lines
    assert "tts_audio_seconds_total 12.5" in lines
    assert "tts_pending_tasks 3" in lines
    assert "# TYPE tts_pending_tasks gauge" in lines
    assert 'tts_cache_hits_total{kind="text"} 7' in lines
    assert 'tts_cache_hit_rate{kind="voice"} 1' in lines
    # label value escaping (the stage name carries a quote)
    assert 'tts_stage_invocations_total{stage="front\\"end"} 9' in lines
    assert text.endswith("\n")
    # every sample line parses as  name{...} value  with a float value
    for ln in lines:
        if ln.startswith("#"):
            continue
        name, _, value = ln.rpartition(" ")
        assert name and float(value) == float(value)


def test_prometheus_render_partial_stats():
    """Missing sections (no cache layer, no timers yet) render cleanly."""
    from illufly_tts_tpu.utils.prometheus import render_prometheus

    text = render_prometheus({"submitted": 0, "pending": 0})
    assert "tts_tasks_submitted_total 0" in text
    assert "tts_cache" not in text
    assert "tts_stage" not in text
