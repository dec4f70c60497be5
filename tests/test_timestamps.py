# -*- coding: utf-8 -*-
"""Word-level timestamp tests.

Beyond-reference capability: the reference's MToken carries start_ts/end_ts
fields but never populates them (reference english_g2p.py:640,698). Here
timestamps come from the duration predictor's quantized per-phoneme frame
counts — the exact alignment stage B renders — mapped to word spans via
ChineseG2P.text_to_ipa_words (per-token zhuyin->IPA is boundary-safe:
word separators '/' never sit inside a syllable run).
"""
import numpy as np
import pytest

from illufly_tts_tpu.frontend.g2p.chinese_g2p import ChineseG2P
from illufly_tts_tpu.frontend.g2p.en_g2p import EnglishG2P


@pytest.fixture(scope="module")
def g2p():
    return ChineseG2P(en_callable=EnglishG2P())


WORD_CASES = [
    "今天天气真好，我们去公园散步。",
    "你好，世界。",
    "这是一个 test case 混合文本。",
    "hello world",
    "二零二六年八月十八日，天气晴。",
    "银行行长走在行人道上。",
]


class TestIpaWords:
    def test_words_cover_full_ipa_in_order(self, g2p):
        """Every word's IPA locates in the full IPA string by monotone
        search (the invariant the timestamp mapper relies on), and the
        pronounceable content is fully covered."""
        for text in WORD_CASES:
            full = g2p.text_to_ipa(text)
            entries = g2p.text_to_ipa_words(text)
            assert entries, text
            cursor = 0
            covered = 0
            for surface, wipa in entries:
                idx = full.find(wipa, cursor)
                assert idx >= 0, (text, surface, wipa, full, cursor)
                cursor = idx + len(wipa)
                covered += len(wipa)
            # separators are single spaces; everything else is word IPA
            assert covered >= len(full.replace(" ", "")), (text, full)

    def test_surface_words_match_segmentation(self, g2p):
        entries = g2p.text_to_ipa_words("今天天气真好。")
        surfaces = [s for s, _ in entries]
        assert "".join(surfaces) == "今天天气真好."

    def test_english_word_pairing(self, g2p):
        entries = g2p.text_to_ipa_words("hello world")
        assert [s for s, _ in entries] == ["hello", "world"]
        for _, wipa in entries:
            assert wipa and " " not in wipa

    def test_empty(self, g2p):
        assert g2p.text_to_ipa_words("   ") == []


@pytest.mark.slow
class TestPipelineTimestamps:
    @pytest.fixture(scope="class")
    def pipe(self):
        from illufly_tts_tpu.engine.synthesizer import Synthesizer
        from illufly_tts_tpu.pipeline import TTSPipeline
        from tests.test_model import tiny_config

        s = Synthesizer(
            config=tiny_config(),
            token_buckets=(32, 64),
            frame_buckets=(64, 128, 256),
        )
        s.register_random_voice("v", seed=3)
        return TTSPipeline(synthesizer=s)

    def test_monotone_and_bounded(self, pipe):
        audio, words = pipe.process_with_timestamps("今天天气真好。", "v")
        assert words
        dur = audio.size / pipe.sample_rate
        prev_end = 0.0
        for w in words:
            assert 0.0 <= w["start_s"] <= w["end_s"] <= dur + 1e-6, w
            assert w["start_s"] >= prev_end - 1e-6, (w, prev_end)
            prev_end = w["end_s"]
        # the spoken span ends exactly at the rendered audio (the fitted
        # durations ARE the rendered alignment)
        assert abs(words[-1]["end_s"] - dur) < 0.2

    def test_mixed_text_has_both_scripts(self, pipe):
        _, words = pipe.process_with_timestamps("你好 hello 世界。", "v")
        surfaces = [w["text"] for w in words]
        assert "hello" in surfaces
        assert any("你" in s or "好" in s for s in surfaces)

    def test_batch_with_want_mask(self, pipe):
        texts = ["今天天气真好。", "你好世界。"]
        audios, stamps = pipe.batch_process_texts_with_timestamps(
            texts, ["v", "v"], want=[False, True]
        )
        assert stamps[0] is None
        assert stamps[1] and stamps[1][0]["start_s"] >= 0.0
        plain = pipe.batch_process_texts(texts, ["v", "v"])
        for a, b in zip(audios, plain):
            assert a.size == b.size
            scale = max(np.abs(b).max(), 1.0)
            np.testing.assert_allclose(a / scale, b / scale, atol=5e-4)

    def test_speed_scales_timestamps(self, pipe):
        _, slow = pipe.process_with_timestamps("今天天气真好。", "v", speed=0.7)
        _, fast = pipe.process_with_timestamps("今天天气真好。", "v", speed=1.5)
        assert slow and fast
        assert fast[-1]["end_s"] < slow[-1]["end_s"]


@pytest.mark.slow
class TestSplitPhaseTimestamps:
    """Timestamps ride the split-phase dispatch (decode-ahead kept)."""

    @pytest.fixture(scope="class")
    def cached_pipe(self):
        from illufly_tts_tpu.engine.synthesizer import Synthesizer
        from illufly_tts_tpu.pipeline import CachedTTSPipeline
        from tests.test_model import tiny_config

        s = Synthesizer(
            config=tiny_config(),
            token_buckets=(32, 64),
            frame_buckets=(64, 128, 256),
        )
        s.register_random_voice("v", seed=3)
        return CachedTTSPipeline(synthesizer=s)

    def test_split_phase_stamps_match_fused(self, cached_pipe):
        texts = ["今天天气真好。", "你好世界。"]
        want = [True, False]
        h = cached_pipe.dispatch_texts(
            texts, ["v", "v"], [1.0, 1.0], want_timestamps=want
        )
        audios = cached_pipe.collect_batch(h)
        stamps = cached_pipe.collect_timestamps(h)
        assert stamps[1] is None
        assert stamps[0] and stamps[0][-1]["end_s"] > 0
        _, fused = cached_pipe.batch_process_texts_with_timestamps(
            texts[:1], ["v"], [1.0], want=[True]
        )
        assert stamps[0] == fused[0]
        assert audios[0].size > 0

    def test_cache_hit_serves_stamps(self, cached_pipe):
        """Second identical timestamped request is a full cache hit
        (audio AND stamps — no device dispatch)."""
        text = "缓存命中测试。"
        h1 = cached_pipe.dispatch_texts(
            [text], ["v"], [1.0], want_timestamps=[True]
        )
        cached_pipe.collect_batch(h1)
        first = cached_pipe.collect_timestamps(h1)[0]
        assert first
        h2 = cached_pipe.dispatch_texts(
            [text], ["v"], [1.0], want_timestamps=[True]
        )
        assert h2.inner is None  # pure cache hit, nothing dispatched
        audios = cached_pipe.collect_batch(h2)
        assert audios[0] is not None
        assert cached_pipe.collect_timestamps(h2)[0] == first

    def test_audio_hit_without_stamps_recomputes(self, cached_pipe):
        """A row whose audio is cached from a plain request still
        recomputes when it asks for timestamps (stamps not yet cached),
        then hits on the next ask."""
        text = "先无时间戳后有。"
        plain = cached_pipe.dispatch_texts([text], ["v"], [1.0])
        cached_pipe.collect_batch(plain)  # audio now cached, no stamps
        h = cached_pipe.dispatch_texts(
            [text], ["v"], [1.0], want_timestamps=[True]
        )
        assert h.inner is not None  # demoted to recompute
        cached_pipe.collect_batch(h)
        stamps = cached_pipe.collect_timestamps(h)[0]
        assert stamps
        h2 = cached_pipe.dispatch_texts(
            [text], ["v"], [1.0], want_timestamps=[True]
        )
        assert h2.inner is None
        cached_pipe.collect_batch(h2)
        assert cached_pipe.collect_timestamps(h2)[0] == stamps


@pytest.mark.slow
def test_scheduler_returns_timestamps():
    """return_timestamps rides the task machinery end-to-end."""
    import asyncio

    from illufly_tts_tpu.engine.synthesizer import Synthesizer
    from illufly_tts_tpu.pipeline import TTSPipeline
    from illufly_tts_tpu.runtime.scheduler import TTSServiceManager
    from tests.test_model import tiny_config

    s = Synthesizer(
        config=tiny_config(), token_buckets=(32,), frame_buckets=(64, 128),
    )
    s.register_random_voice("v", seed=3)
    manager = TTSServiceManager(
        pipeline=TTSPipeline(synthesizer=s), batch_size=2,
        max_wait_time=0.02,
    )

    async def run():
        await manager.start()
        try:
            tid_ts = await manager.submit_task(
                "今天天气真好。", voice_id="v", return_timestamps=True
            )
            tid_plain = await manager.submit_task(
                "你好世界。", voice_id="v"
            )
            for tid in (tid_ts, tid_plain):
                while (await manager.get_task_status(tid))["status"] not in (
                    "completed", "failed",
                ):
                    await asyncio.sleep(0.02)
            assert manager.tasks[tid_ts].status.value == "completed", (
                manager.tasks[tid_ts].error
            )
            ts = manager.tasks[tid_ts].timestamps
            assert ts and ts[0]["end_s"] >= ts[0]["start_s"]
            assert manager.tasks[tid_plain].timestamps is None
        finally:
            await manager.shutdown()

    asyncio.run(run())
