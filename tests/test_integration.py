# -*- coding: utf-8 -*-
"""End-to-end integration: text -> normalize -> G2P -> model -> wav,
and scheduler lifecycle over the real (tiny) model
(mirrors reference tests/test_integration.py intent)."""
import asyncio
import os

import jax.numpy as jnp
import numpy as np
import pytest

from illufly_tts_tpu.engine.synthesizer import Synthesizer
from illufly_tts_tpu.pipeline import CachedTTSPipeline, TTSPipeline
from illufly_tts_tpu.runtime.scheduler import TTSServiceManager
from tests.test_model import tiny_config


@pytest.fixture(scope="module")
def pipe():
    synth = Synthesizer(
        config=tiny_config(),
        token_buckets=(32, 64),
        frame_buckets=(64, 128),
    )
    synth.register_random_voice("zf_001", seed=11)
    return CachedTTSPipeline(synthesizer=synth)


def test_process_zh(pipe, tmp_path):
    out = str(tmp_path / "out.wav")
    audio = pipe.process("你好，这是一个测试。", voice_id="zf_001",
                         output_path=out)
    assert audio.size > 0
    assert np.all(np.isfinite(audio))
    assert os.path.exists(out)
    from illufly_tts_tpu.audio.wav import load_wav

    loaded, rate = load_wav(out)
    assert rate == 24000
    assert loaded.size == audio.size


def test_process_mixed(pipe):
    audio = pipe.process("今天是May 10th，气温25°C。", voice_id="zf_001")
    assert audio.size > 0


def test_process_segmented(pipe):
    text = "第一句话。第二句话！第三句话？"
    audio = pipe.process(text, voice_id="zf_001", segment_text=True)
    assert audio.size > 0


def test_batch_process_texts(pipe):
    audios = pipe.batch_process_texts(
        ["你好。", "再见。"], ["zf_001", "zf_001"]
    )
    assert len(audios) == 2
    assert all(a.size > 0 for a in audios)


def test_audio_cache_hit(pipe):
    a1 = pipe.batch_process_texts(["缓存测试。"], ["zf_001"])
    a2 = pipe.batch_process_texts(["缓存测试。"], ["zf_001"])
    np.testing.assert_array_equal(a1[0], a2[0])
    # the second call short-circuits on the audio cache (no re-preprocess)
    assert any(k.startswith("audio:") for k in pipe._audio_cache)
    assert pipe.get_cache_stats()["text_misses"] >= 1


def test_cache_thread_safety(pipe):
    """Concurrent dispatch threads (scheduler pipeline_depth >= 2) hammer
    the frontend + audio caches at their eviction limit — unguarded
    check-then-pop eviction raced (KeyError / RuntimeError)."""
    import threading

    old_text, old_audio = (
        CachedTTSPipeline.TEXT_CACHE_LIMIT,
        CachedTTSPipeline.AUDIO_CACHE_LIMIT,
    )
    CachedTTSPipeline.TEXT_CACHE_LIMIT = 4
    CachedTTSPipeline.AUDIO_CACHE_LIMIT = 2
    pipe.clear_caches()  # shrink below the tiny limits set above
    errors = []

    def worker(seed):
        try:
            for i in range(60):
                pipe._cached(
                    "text", f"k{(seed * 31 + i) % 9}", lambda: i
                )
                pipe._audio_cache_put(
                    f"audio:{(seed + i) % 5}", np.zeros(4, np.float32)
                )
                pipe._audio_cache_get(f"audio:{i % 5}")
        except Exception as exc:  # pragma: no cover - the regression
            errors.append(exc)

    try:
        threads = [
            threading.Thread(target=worker, args=(s,)) for s in range(6)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors, errors
        assert len(pipe._cache) <= 4
        assert len(pipe._audio_cache) <= 2
    finally:
        CachedTTSPipeline.TEXT_CACHE_LIMIT = old_text
        CachedTTSPipeline.AUDIO_CACHE_LIMIT = old_audio
        pipe.clear_caches()


def test_stream_batch_process(pipe):
    texts = ["第一句。第二句。", "只有一句。"]
    batches = list(pipe.stream_batch_process(texts, ["zf_001"] * 2,
                                             chunk_size=6))
    assert len(batches) >= 1
    # first batch covers both texts; later batches drop the short one
    assert len(batches[0]) == 2


async def test_scheduler_end_to_end(pipe, tmp_path):
    manager = TTSServiceManager(
        pipeline=pipe, output_dir=str(tmp_path), max_wait_time=0.02
    )
    await manager.start()
    try:
        task_id = await manager.submit_task("集成测试。", "zf_001", user_id="u")
        # generous deadline: run in isolation this pays the cold jit
        # compile inside the batch (tens of seconds on a loaded host)
        deadline = asyncio.get_event_loop().time() + 120.0
        while asyncio.get_event_loop().time() < deadline:
            status = await manager.get_task_status(task_id)
            if status["status"] in ("completed", "failed"):
                break
            await asyncio.sleep(0.05)
        assert status["status"] == "completed", status
        assert os.path.exists(str(tmp_path / f"{task_id}.wav"))
    finally:
        await manager.shutdown()


def test_bf16_forward_finite():
    import dataclasses

    cfg = dataclasses.replace(tiny_config(), dtype=jnp.bfloat16)
    synth = Synthesizer(config=cfg, token_buckets=(32,), frame_buckets=(64,))
    synth.register_random_voice("v", seed=1)
    audio = synth.synthesize_batch(["ni→xau↓ma"], ["v"])[0]
    assert audio.dtype == np.float32
    assert np.all(np.isfinite(audio))


def test_within_batch_dedup(pipe):
    """Identical (text, voice, speed) items in one batch compute once."""
    calls = []
    orig = type(pipe).__mro__[1].batch_process_texts  # TTSPipeline impl

    def spy(texts, voice_ids, speeds=None, output_format="f32",
            pitches=None):
        calls.append(list(texts))
        return orig(pipe, texts, voice_ids, speeds, output_format,
                    pitches=pitches)

    import unittest.mock as mock

    with mock.patch.object(
        type(pipe).__mro__[1], "batch_process_texts", side_effect=spy,
        autospec=False,
    ):
        out = pipe.batch_process_texts(
            ["去重测试。", "去重测试。", "另一句。"], ["zf_001"] * 3
        )
    assert len(out) == 3
    np.testing.assert_array_equal(out[0], out[1])
    assert len(calls) == 1 and len(calls[0]) == 2  # only 2 unique computed


def test_split_phase_matches_oneshot(pipe):
    """Plain split-phase (dispatch -> launch_decode -> collect) over the
    real tiny model must equal the one-shot batch path, with two batches
    in flight (the serving scheduler's decode-ahead schedule)."""
    plain = TTSPipeline(synthesizer=pipe.synthesizer)
    assert plain.supports_split_phase
    batches = [
        (["你好。", "再见。"], ["zf_001", "zf_001"]),
        (["今天天气不错。"], ["zf_001"]),
    ]
    handles = [
        plain.dispatch_texts(texts, voices) for texts, voices in batches
    ]
    # both stage Bs launched before either collect (decode-ahead)
    for h in handles:
        plain.launch_decode(h)
    staged = [plain.collect_batch(h) for h in handles]
    for (texts, voices), got in zip(batches, staged):
        want = plain.batch_process_texts(texts, voices)
        assert len(got) == len(want)
        for a, b in zip(got, want):
            assert a.size == b.size
            np.testing.assert_allclose(a, b, atol=1e-6)


def test_split_phase_cached(pipe):
    """Cached split-phase: misses compute once, hits skip the device
    entirely (handle.inner is None), and results match batch path."""
    texts = ["缓存分相一。", "缓存分相二。"]
    voices = ["zf_001", "zf_001"]
    h = pipe.dispatch_texts(texts, voices)
    assert h.inner is not None  # cold: real device work dispatched
    pipe.launch_decode(h)
    first = pipe.collect_batch(h)
    assert len(first) == 2 and all(a.size > 0 for a in first)
    # second dispatch: every row is a cache hit, no device handle at all
    h2 = pipe.dispatch_texts(texts, voices)
    assert h2.inner is None
    pipe.launch_decode(h2)  # must be a no-op, not crash
    again = pipe.collect_batch(h2)
    for a, b in zip(first, again):
        np.testing.assert_array_equal(a, b)
    # mixed batch: one hit + one new text -> only the miss computes
    h3 = pipe.dispatch_texts(["缓存分相一。", "新句子。"], voices)
    assert h3.inner is not None and h3.uncached == [1]
    pipe.launch_decode(h3)
    mixed = pipe.collect_batch(h3)
    np.testing.assert_array_equal(mixed[0], first[0])
    assert mixed[1].size > 0


def test_split_phase_dedups_within_batch(pipe):
    """Cached split-phase dedups identical uncached rows in one batch."""
    texts = ["分相去重。", "分相去重。", "分相另句。"]
    h = pipe.dispatch_texts(texts, ["zf_001"] * 3)
    assert h.inner is not None
    pipe.launch_decode(h)
    out = pipe.collect_batch(h)
    assert len(out) == 3
    np.testing.assert_array_equal(out[0], out[1])
