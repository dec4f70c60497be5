# -*- coding: utf-8 -*-
"""Pitch-control knob: F0 scaling through model/engine/scheduler/API.

Beyond the reference's surface — its KModel exposes speed only
(reference kmodel.py:94-103); pitch is the orthogonal prosody axis
(speed scales durations in stage A, pitch scales the F0 contour in
stage B before the harmonic source)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_model import tiny_config


def _tiny_model_and_inputs(tokens=12, frames=16, batch=2):
    from illufly_tts_tpu.model.kokoro import KokoroModel

    cfg = tiny_config()
    model = KokoroModel(cfg)
    rng = np.random.RandomState(0)
    ids = jnp.asarray(
        rng.randint(1, cfg.albert.vocab_size, (batch, tokens)), jnp.int32
    )
    mask = jnp.ones((batch, tokens), jnp.float32)
    ref = jnp.asarray(
        (rng.randn(batch, 2 * cfg.style_dim) * 0.2).astype(np.float32)
    )
    params = model.init(jax.random.PRNGKey(0), ids, mask, ref,
                        num_frames=frames)
    _, d = model.apply(
        params, ids, mask, ref, jnp.ones((batch,), jnp.float32),
        method=KokoroModel.encode_durations,
    )
    pred = jnp.ones((batch, tokens), jnp.int32)
    return cfg, model, params, ids, mask, d, pred, ref, frames


def test_pitch_scales_f0_exactly():
    """decode_prepare's F0 contour under pitch=2 is bit-exactly 2x the
    neutral contour (the trunk returns the masked curve unchanged)."""
    from illufly_tts_tpu.model.kokoro import KokoroModel

    cfg, model, params, ids, mask, d, pred, ref, frames = (
        _tiny_model_and_inputs()
    )
    batch = ids.shape[0]

    def prepare(pitch):
        return model.apply(
            params, ids, mask, d, pred, ref, frames,
            pitch=jnp.full((batch,), pitch, jnp.float32),
            method=KokoroModel.decode_prepare,
        )

    _, f0_neutral, _, _ = prepare(1.0)
    _, f0_double, _, _ = prepare(2.0)
    np.testing.assert_allclose(
        np.asarray(f0_double, np.float32),
        2.0 * np.asarray(f0_neutral, np.float32), rtol=1e-6,
    )
    # and None (the training/teacher path) == explicit 1.0
    _, f0_none, _, _ = model.apply(
        params, ids, mask, d, pred, ref, frames,
        method=KokoroModel.decode_prepare,
    )
    np.testing.assert_array_equal(
        np.asarray(f0_none), np.asarray(f0_neutral)
    )


def test_pitch_changes_audio_and_neutral_matches_default():
    cfg, model, params, ids, mask, d, pred, ref, frames = (
        _tiny_model_and_inputs()
    )
    from illufly_tts_tpu.model.kokoro import KokoroModel

    batch = ids.shape[0]

    def decode(pitch):
        audio, _ = model.apply(
            params, ids, mask, d, pred, ref, frames,
            pitch=(None if pitch is None
                   else jnp.full((batch,), pitch, jnp.float32)),
            method=KokoroModel.decode_frames,
        )
        return np.asarray(audio, np.float32)

    base = decode(None)
    neutral = decode(1.0)
    shifted = decode(1.5)
    np.testing.assert_array_equal(base, neutral)
    assert np.abs(shifted - base).max() > 0  # the knob reaches the audio


@pytest.mark.slow
def test_engine_dispatch_pitch():
    """Per-item pitches ride the serving dispatch: a mixed batch renders
    row-for-row identical to the corresponding uniform batches."""
    from illufly_tts_tpu.engine.synthesizer import Synthesizer

    synth = Synthesizer(config=tiny_config(), token_buckets=(16,),
                        frame_buckets=(24,), batch_buckets=(2,))
    synth.register_random_voice("v", seed=3)
    phon = ["nixau", "nixau"]
    base = synth.collect(synth.dispatch(phon, ["v", "v"]))
    up = synth.collect(synth.dispatch(phon, ["v", "v"],
                                      pitches=[2.0, 2.0]))
    mixed = synth.collect(synth.dispatch(phon, ["v", "v"],
                                         pitches=[1.0, 2.0]))
    np.testing.assert_array_equal(mixed[0], base[0])
    np.testing.assert_array_equal(mixed[1], up[1])
    assert np.abs(up[0].astype(np.float32)
                  - base[0].astype(np.float32)).max() > 0


async def test_api_pitch_passthrough_and_capability():
    from aiohttp.test_utils import TestClient, TestServer

    from tests.test_api import (
        FakePipeline,
        MinimalDuckPipeline,
        auth_headers,
    )

    class PitchPipeline(FakePipeline):
        def __init__(self):
            super().__init__()
            self.last_pitches = None

        def batch_process_texts(self, texts, voice_ids, speeds=None,
                                output_format="f32", pitches=None):
            self.last_pitches = pitches
            return super().batch_process_texts(
                texts, voice_ids, speeds, output_format
            )

    import os

    os.makedirs("/tmp/tts_api_test", exist_ok=True)
    os.environ.pop("TTS_DEV_MODE", None)
    os.environ["FASTAPI_SECRET_KEY"] = "test-secret"
    from illufly_tts_tpu.api.endpoints import create_app

    pipe = PitchPipeline()
    app = create_app(output_dir="/tmp/tts_api_test", pipeline=pipe,
                     max_wait_time=0.02)
    client = TestClient(TestServer(app))
    await client.start_server()
    try:
        resp = await client.post(
            "/api/tts", json={"text": "你好", "pitch": 1.5},
            headers=auth_headers(),
        )
        assert resp.status == 200, await resp.text()
        assert pipe.last_pitches == [1.5]
        # out-of-range -> 400
        resp = await client.post(
            "/api/tts", json={"text": "你好", "pitch": 10.0},
            headers=auth_headers(),
        )
        assert resp.status == 400
        # non-numeric -> 400
        resp = await client.post(
            "/api/tts", json={"text": "你好", "pitch": "high"},
            headers=auth_headers(),
        )
        assert resp.status == 400
    finally:
        await client.close()

    # a pipeline without the pitches kwarg: explicit rejection, not
    # silent neutral-pitch audio
    app = create_app(output_dir="/tmp/tts_api_test",
                     pipeline=MinimalDuckPipeline(), max_wait_time=0.02)
    client = TestClient(TestServer(app))
    await client.start_server()
    try:
        resp = await client.post(
            "/api/tts", json={"text": "你好", "pitch": 1.5},
            headers=auth_headers(),
        )
        assert resp.status == 400
        assert "pitch" in (await resp.text()).lower()
    finally:
        await client.close()


def test_audio_cache_key_collision_free():
    """Pitch is a fixed-form component BEFORE the free text: suffix (or
    conditional) tags collide crafted texts with pitched requests."""
    from illufly_tts_tpu.pipeline import CachedTTSPipeline

    key = CachedTTSPipeline._audio_key
    pairs = [
        (("f32", "v", 1.0, "hi", 2.0), ("f32", "v", 1.0, "hi:p2.0", 1.0)),
        (("f32", "v", 1.0, "hello", 2.0),
         ("f32", "v", 1.0, "p2.0:hello", 1.0)),
    ]
    for a, b in pairs:
        assert key(*a) != key(*b), (a, b)
    assert key("f32", "v", 1.0, "hi", 1.0) != key("f32", "v", 1.0, "hi", 2.0)


async def test_capability_check_mirrors_dispatch_surface():
    """A split-phase pipeline whose dispatch_texts predates the pitch
    knob must be rejected at submit even if its batch_process_texts has
    it — approving the wrong surface turns the 400 into a mid-batch
    TypeError."""
    from illufly_tts_tpu.runtime.scheduler import TTSServiceManager
    from tests.test_api import FakePipeline

    class SplitNoPitch(FakePipeline):
        supports_split_phase = True

        def dispatch_texts(self, texts, voice_ids, speeds=None,
                           output_format="f32", want_timestamps=None):
            raise AssertionError("should never be dispatched")

        def batch_process_texts(self, texts, voice_ids, speeds=None,
                                output_format="f32", pitches=None):
            return super().batch_process_texts(
                texts, voice_ids, speeds, output_format
            )

    manager = TTSServiceManager(pipeline=SplitNoPitch(), output_dir=None)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="pitch"):
        await manager.submit_task("你好", pitch=2.0)
