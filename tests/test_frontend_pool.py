# -*- coding: utf-8 -*-
"""Process-pool frontend (frontend/pool.py, VERDICT r3 next-7).

The pool is ONLY an accelerator: pooled output must equal the serial
per-row chain exactly, the pool must fall back to serial while warming
or after a worker dies, and custom-dictionary state must replay into
workers."""
import os

import numpy as np
import pytest

# the pipeline self-disables the pool on single-CPU hosts (pooling
# there is strictly slower than the serial memoized path); these tests
# exercise pool CORRECTNESS, so force construction regardless
os.environ["TTS_FRONTEND_POOL_FORCE"] = "1"

from illufly_tts_tpu.pipeline import TTSPipeline

pytestmark = pytest.mark.slow  # spawn + per-worker frontend load


class _StubSynth:
    sample_rate = 24000


def _frontend_pipe(**kw):
    return TTSPipeline(synthesizer=_StubSynth.__new__(_StubSynth), **kw)


BATTERY = [
    "今天天气真不错，我们一起去公园散步。",
    "他说：“行不行？”我说行。",
    "The quick brown fox jumps over the lazy dog.",
    "2024年5月10日，气温25°C，共花费￥1234.56。",
    "Mixed 中英文 sentences with numbers like 42 and dates May 10th.",
    "重庆的重量很重要。",
    "银行行长走在行人道上。",
    "Dr. Smith lives on St. John St. since 1999.",
] * 2  # 16 rows: enough to shard


@pytest.fixture(scope="module")
def pool_pipe():
    pipe = _frontend_pipe(frontend_workers=2)
    yield pipe
    if pipe._frontend_pool is not None:
        pipe._frontend_pool.close()


def test_pool_matches_serial(pool_pipe):
    serial = [
        pool_pipe.phonemes_to_ipa(
            pool_pipe.text_to_phonemes(pool_pipe.preprocess_text(t))
        )[:510]
        for t in BATTERY
    ]
    # wait for warmup so the pooled path actually runs
    import time

    deadline = time.time() + 120
    while not pool_pipe._frontend_pool.ready and time.time() < deadline:
        time.sleep(0.2)
    assert pool_pipe._frontend_pool.ready, "pool failed to warm"
    pooled = pool_pipe._frontend_pool.texts_to_ipa(BATTERY)
    assert pooled is not None
    assert pooled == serial


def test_small_batches_stay_serial(pool_pipe):
    # under 2*MIN_ROWS_PER_SHARD rows the pool declines (IPC would
    # dominate); _texts_to_ipa then runs the serial chain
    assert pool_pipe._frontend_pool.texts_to_ipa(["你好。"]) is None
    out = pool_pipe._texts_to_ipa(["你好。"])
    assert len(out) == 1 and out[0]


def test_texts_to_ipa_uses_pool(pool_pipe):
    out = pool_pipe._texts_to_ipa(BATTERY)
    assert len(out) == len(BATTERY)
    assert all(isinstance(x, str) and x for x in out)


def test_broken_pool_falls_back():
    pipe = _frontend_pipe(frontend_workers=1)
    pipe._frontend_pool.close()  # simulate a dead pool
    out = pipe._texts_to_ipa(BATTERY)  # must not raise
    assert len(out) == len(BATTERY)


def test_no_pool_by_default(monkeypatch):
    monkeypatch.delenv("TTS_FRONTEND_WORKERS", raising=False)
    pipe = _frontend_pipe()
    assert pipe._frontend_pool is None
