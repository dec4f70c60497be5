# -*- coding: utf-8 -*-
"""Frozen golden-audio gate (VERDICT r2 next-5).

Real-checkpoint parity is environment-blocked (zero egress — the HF
checkpoint is unreachable), so nothing else stops a refactor from silently
changing synthesized audio. This gate freezes the full numeric path:
deterministic seeded params (host-side numpy; platform-stable) + two fixed
phoneme strings -> waveforms committed under tests/golden/. Any change to
model numerics, the converter-facing layer stack, duration quantization,
or the vocoder shifts the waveform and fails here.

Analogue: the reference's waveform-MSE harness
(reference: tests/integration/test_processing_steps.py:384-418).

Regenerate CONSCIOUSLY after an intended numeric change:
  GOLDEN_REGEN=1 python -m pytest tests/test_golden_audio.py -q
"""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # model-compile-heavy (see pyproject markers)

from illufly_tts_tpu.audio.mel import mel_l1  # noqa: E402
from illufly_tts_tpu.engine.synthesizer import Synthesizer  # noqa: E402
from tests.test_model import tiny_config  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")
SEED = 123
TEXTS = [
    "ni→xau↓ma, tsʰɤ↘ʂɨ↘i↗kɤ↘tʰəst.",
    "tʰjɛn→tʃʰi↘tʃən→pu↗tsʰwo↘. hello wɝld.",
]


@pytest.fixture(scope="module")
def synth():
    s = Synthesizer(
        config=tiny_config(), seed=SEED,
        token_buckets=(64,), frame_buckets=(128,),
    )
    s.register_random_voice("golden_voice", seed=SEED)
    return s


def _paths(i):
    return os.path.join(GOLDEN_DIR, f"wave_{i}_f32.npy")


def _render(synth):
    return synth.synthesize_batch(
        TEXTS, ["golden_voice"] * len(TEXTS)
    )


def test_golden_waveforms(synth):
    out = _render(synth)
    if os.environ.get("GOLDEN_REGEN"):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        for i, wave in enumerate(out):
            np.save(_paths(i), wave.astype(np.float32))
        pytest.skip("golden waveforms regenerated")
    for i, wave in enumerate(out):
        path = _paths(i)
        assert os.path.exists(path), (
            f"missing {path} — run GOLDEN_REGEN=1 pytest "
            "tests/test_golden_audio.py"
        )
        gold = np.load(path)
        assert wave.shape == gold.shape, (wave.shape, gold.shape)
        # f32 CPU path: tight waveform agreement (XLA-version jitter only)
        rms = float(np.sqrt(np.mean((wave - gold) ** 2)))
        scale = float(np.sqrt(np.mean(gold**2))) + 1e-9
        assert rms / scale < 5e-3, (i, rms, scale)
        # and perceptual-domain agreement
        assert mel_l1(wave, gold) < 5e-3, i


def test_golden_deterministic_across_calls(synth):
    a = _render(synth)
    b = _render(synth)
    for x, y in zip(a, b):
        np.testing.assert_allclose(x, y, atol=1e-6)


def test_golden_bf16_sane(synth):
    """bf16 numerics on the same frozen inputs must yield finite,
    non-empty audio of comparable length (random-init activations are
    chaotic, so waveform-level bf16-vs-f32 tolerance is meaningless here;
    the f32 gate above is the numeric tripwire, this guards bf16-specific
    blowups like exp-magnitude overflow)."""
    import dataclasses

    import jax.numpy as jnp

    cfg = dataclasses.replace(tiny_config(), dtype=jnp.bfloat16)
    s = Synthesizer(
        config=cfg, seed=SEED,
        token_buckets=(64,), frame_buckets=(128,),
    )
    s.register_random_voice("golden_voice", seed=SEED)
    out = s.synthesize_batch(TEXTS, ["golden_voice"] * len(TEXTS))
    for i, wave in enumerate(out):
        path = _paths(i)
        if not os.path.exists(path):
            pytest.skip("goldens not generated yet")
        gold = np.load(path)
        assert wave.size > 0
        assert np.isfinite(wave).all(), i
        assert float(np.abs(wave).max()) > 1e-4, i  # not silence
        # duration quantization must agree within a couple of frames
        assert abs(wave.size - gold.size) <= 2 * 600, (
            wave.size, gold.size,
        )