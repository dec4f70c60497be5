# -*- coding: utf-8 -*-
"""Model shape/correctness tests on a tiny config (CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # model-compile-heavy (see pyproject markers)

from illufly_tts_tpu.model.config import (
    AlbertConfig,
    IstftNetConfig,
    KokoroConfig,
)
from illufly_tts_tpu.model.kokoro import KokoroModel, _fit_durations
from illufly_tts_tpu.ops.align import (
    expand_by_duration,
    frame_mask,
    frame_token_indices,
)
from illufly_tts_tpu.ops.stft import istft, overlap_add, stft_magphase


def tiny_config():
    return KokoroConfig(
        n_token=64,
        hidden_dim=32,
        style_dim=16,
        max_dur=10,
        n_layer=2,
        albert=AlbertConfig(
            vocab_size=64, embedding_size=16, hidden_size=32, num_heads=4,
            intermediate_size=64, num_layers=2, max_position=128,
        ),
        istftnet=IstftNetConfig(
            upsample_rates=(10, 6),
            upsample_kernel_sizes=(20, 12),
            upsample_initial_channel=32,
            resblock_kernel_sizes=(3,),
            resblock_dilation_sizes=((1, 3),),
        ),
    )


class TestAlign:
    def test_frame_token_indices(self):
        dur = jnp.array([[2, 3, 1], [1, 1, 1]], jnp.int32)
        idx = frame_token_indices(dur, 8)
        np.testing.assert_array_equal(
            np.asarray(idx[0]), [0, 0, 1, 1, 1, 2, 2, 2]
        )  # frames past total clamp to last token
        np.testing.assert_array_equal(
            np.asarray(idx[1]), [0, 1, 2, 2, 2, 2, 2, 2]
        )

    def test_expand_matches_repeat_interleave(self):
        rng = np.random.RandomState(0)
        feats = jnp.asarray(rng.randn(1, 4, 3).astype(np.float32))
        dur = jnp.array([[1, 3, 2, 1]], jnp.int32)
        out = expand_by_duration(feats, dur, 7)
        expected = np.repeat(np.asarray(feats[0]), np.asarray(dur[0]), axis=0)
        np.testing.assert_allclose(np.asarray(out[0]), expected, rtol=1e-6)

    def test_frame_mask(self):
        dur = jnp.array([[2, 2]], jnp.int32)
        m = frame_mask(dur, 6)
        np.testing.assert_array_equal(np.asarray(m[0]), [1, 1, 1, 1, 0, 0])

    def test_fit_durations(self):
        dur = jnp.array([[3, 4, 5]], jnp.int32)
        fitted = _fit_durations(dur, 8)
        np.testing.assert_array_equal(np.asarray(fitted[0]), [3, 4, 1])
        assert int(fitted.sum()) == 8


class TestSTFT:
    def test_overlap_add(self):
        frames = jnp.ones((1, 3, 4))
        y = overlap_add(frames, 2)
        # length (3-1)*2+4 = 8; middle samples get 2 contributions
        np.testing.assert_allclose(
            np.asarray(y[0]), [1, 1, 2, 2, 2, 2, 1, 1]
        )

    def test_istft_reconstruction(self):
        # iSTFT(STFT(x)) == x away from edges (COLA with hann, hop=n/4)
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(2, 400).astype(np.float32))
        mag, phase = stft_magphase(x, 20, 5)
        y = istft(mag, phase, 20, 5)
        np.testing.assert_allclose(
            np.asarray(y[:, 20:380]), np.asarray(x[:, 20:380]), atol=2e-3
        )


class TestModel:
    @pytest.fixture(scope="class")
    def model_and_params(self):
        cfg = tiny_config()
        model = KokoroModel(cfg)
        ids = jnp.zeros((2, 16), jnp.int32).at[:, 1:9].set(5)
        mask = jnp.zeros((2, 16)).at[:, :10].set(1.0)
        ref_s = jnp.ones((2, 2 * cfg.style_dim)) * 0.01
        params = model.init(
            jax.random.PRNGKey(0), ids, mask, ref_s,
            num_frames=32,
        )
        return cfg, model, params, ids, mask, ref_s

    def test_forward_shapes(self, model_and_params):
        cfg, model, params, ids, mask, ref_s = model_and_params
        audio, pred_dur, duration, fmask = model.apply(
            params, ids, mask, ref_s, num_frames=32
        )
        assert audio.shape == (2, 32 * cfg.samples_per_frame)
        assert pred_dur.shape == (2, 16)
        assert duration.shape == (2, 16)
        # padded tokens get zero duration
        assert int(pred_dur[0, 12]) == 0
        assert np.all(np.isfinite(np.asarray(audio)))

    def test_jit_compiles(self, model_and_params):
        cfg, model, params, ids, mask, ref_s = model_and_params
        fn = jax.jit(
            lambda p, i, m, r: model.apply(p, i, m, r, num_frames=32)
        )
        audio, *_ = fn(params, ids, mask, ref_s)
        audio.block_until_ready()

    def test_two_stage_matches_combined(self, model_and_params):
        cfg, model, params, ids, mask, ref_s = model_and_params
        speed = jnp.ones((2,))
        duration, d = model.apply(
            params, ids, mask, ref_s, speed,
            method=KokoroModel.encode_durations,
        )
        pred = KokoroModel.quantize_durations(duration, mask)
        pred = _fit_durations(pred, 32)
        audio2, _ = model.apply(
            params, ids, mask, d, pred, ref_s, 32,
            method=KokoroModel.decode_frames,
        )
        audio1, *_ = model.apply(params, ids, mask, ref_s, num_frames=32)
        np.testing.assert_allclose(
            np.asarray(audio1), np.asarray(audio2), atol=1e-5
        )

    def test_audio_masked_beyond_frames(self, model_and_params):
        cfg, model, params, ids, mask, ref_s = model_and_params
        audio, pred_dur, _, fmask = model.apply(
            params, ids, mask, ref_s, num_frames=32
        )
        total = int(np.asarray(pred_dur).sum(-1).max())
        if total < 32:
            tail = np.asarray(audio[0, total * cfg.samples_per_frame:])
            assert np.allclose(tail[-10:], 0.0)
