# -*- coding: utf-8 -*-
"""Voice adaptation: a style vector is recoverable by gradient descent
through the frozen model (training/voice_adapt.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from illufly_tts_tpu.training.voice_adapt import (
    adapt_voice,
    rendered_batches,
    style_to_pack,
)
from tests.test_model import tiny_config


def test_style_to_pack_layout():
    s = np.arange(8, dtype=np.float32)
    pack = style_to_pack(s, max_len=16)
    assert pack.shape == (16, 1, 8)
    np.testing.assert_array_equal(pack[0, 0], s)
    np.testing.assert_array_equal(pack[15, 0], s)
    pack[3, 0, 0] = 99.0  # must be writable (a real copy)
    assert pack[0, 0, 0] == 0.0


@pytest.mark.slow
def test_adapt_recovers_target_voice():
    """Render targets under a hidden style vector, adapt from zero:
    the loss must collapse far below the zero-style baseline."""
    from illufly_tts_tpu.model.kokoro import KokoroModel

    cfg = tiny_config()
    model = KokoroModel(cfg)
    tokens, frames, batch = 16, 24, 2
    ids = jnp.zeros((batch, tokens), jnp.int32)
    mask = jnp.ones((batch, tokens), jnp.float32)
    ref = jnp.zeros((batch, 2 * cfg.style_dim), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), ids, mask, ref,
                        num_frames=frames)

    rng = np.random.RandomState(7)
    target = jnp.asarray(
        (rng.randn(2 * cfg.style_dim) * 0.3).astype(np.float32)
    )
    batches = rendered_batches(
        model, params, target, batch, tokens, frames, seed=1
    )

    # baseline: the zero init's loss on a held batch
    from illufly_tts_tpu.training.step import make_loss_fn

    loss_fn = make_loss_fn(model, frames, spectral=False)
    probe = next(batches)
    zero_batch = probe._replace(
        ref_s=jnp.zeros_like(probe.ref_s)
    )
    base_loss, _ = loss_fn(params, zero_batch)
    oracle_loss, _ = loss_fn(params, probe)  # true style: the floor

    style, metrics = adapt_voice(
        model, params, batches, steps=160, learning_rate=5e-2,
        frames=frames, spectral=False, log_every=0,
    )
    assert style.shape == (2 * cfg.style_dim,)
    assert np.isfinite(style).all()
    best = metrics["best_loss"]
    assert np.isfinite(best)
    base = float(base_loss)
    floor = float(oracle_loss)
    # the random-init vocoder's landscape is rough (its exp() spans make
    # waveform matching chaotic far from a trained operating point — the
    # same reason test_golden_audio treats bf16-vs-f32 waveforms as
    # incomparable), so the gate is meaningful improvement over the
    # zero-style baseline, not oracle recovery; with trained weights the
    # spectral objective is the production path
    assert best < 0.88 * base, (best, base, floor)
    # and the adapted style must render CLOSER to the target than the
    # zero init on the held probe batch
    adapted_loss, _ = loss_fn(
        params, probe._replace(
            ref_s=jnp.broadcast_to(jnp.asarray(style), probe.ref_s.shape)
        )
    )
    assert float(adapted_loss) < base, (float(adapted_loss), base)
