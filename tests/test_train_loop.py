# -*- coding: utf-8 -*-
"""Training loop: loss decreases on the synthetic-teacher task,
checkpoints save/resume, and the mesh variant runs (beyond the
reference, which ships no training code — SURVEY §0)."""
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # model-compile-heavy (see pyproject markers)

from illufly_tts_tpu.model.kokoro import KokoroModel
from illufly_tts_tpu.training.loop import synthetic_batches, train
from tests.test_model import tiny_config


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    model = KokoroModel(cfg)
    tokens, frames = 16, 32
    ids = jnp.zeros((1, tokens), jnp.int32).at[:, 1:9].set(5)
    mask = jnp.zeros((1, tokens), jnp.float32).at[:, :10].set(1.0)
    ref_s = jnp.zeros((1, 2 * cfg.style_dim), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), ids, mask, ref_s,
                        num_frames=frames)
    return model, params, tokens, frames


def test_loss_decreases_and_checkpoints(setup, tmp_path):
    model, teacher, tokens, frames = setup
    ckpt = str(tmp_path / "ckpt")
    # student starts from a DIFFERENT init than the teacher, so both the
    # duration and waveform losses have room to decrease
    ids = jnp.zeros((1, tokens), jnp.int32).at[:, 1:9].set(5)
    mask = jnp.zeros((1, tokens), jnp.float32).at[:, :10].set(1.0)
    ref_s = jnp.zeros((1, 2 * model.config.style_dim), jnp.float32)
    student = model.init(jax.random.PRNGKey(7), ids, mask, ref_s,
                         num_frames=frames)
    batches = synthetic_batches(model, teacher, 2, tokens, frames, seed=1)
    first = next(batches)
    _, _, m1 = train(
        model, student, steps=1, batch_size=2, tokens=tokens,
        frames=frames, learning_rate=1e-3, log_every=0,
        checkpoint_dir=None, batches=iter([first] * 1),
    )
    _, _, m8 = train(
        model, student, steps=8, batch_size=2, tokens=tokens,
        frames=frames, learning_rate=1e-3, log_every=0,
        checkpoint_dir=ckpt, checkpoint_every=0,
        batches=iter([first] * 8),  # fixed batch: loss must drop
    )
    assert m8["loss"] < m1["loss"], (m1, m8)

    # resume restores the saved step
    from illufly_tts_tpu.training.checkpoint import latest_checkpoint

    assert latest_checkpoint(ckpt) is not None
    _, _, m_resumed = train(
        model, student, steps=1, batch_size=2, tokens=tokens,
        frames=frames, learning_rate=1e-3, log_every=0,
        checkpoint_dir=ckpt, resume=True, checkpoint_every=0,
        batches=iter([first] * 1),
    )
    # resumed params continue from the trained state: loss stays below
    # the from-scratch first-step loss
    assert m_resumed["loss"] < m1["loss"]


def test_train_on_mesh(setup):
    model, params, tokens, frames = setup
    from illufly_tts_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(n_data=4, n_model=2)
    _, _, metrics = train(
        model, params, steps=2, batch_size=4, tokens=tokens,
        frames=frames, learning_rate=1e-3, mesh=mesh, log_every=0,
    )
    assert jnp.isfinite(metrics["loss"])
