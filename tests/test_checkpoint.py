# -*- coding: utf-8 -*-
"""Training checkpoint save/restore round trip."""
import jax.numpy as jnp
import numpy as np
import optax

from illufly_tts_tpu.training.checkpoint import (
    latest_checkpoint,
    restore_train_state,
    save_train_state,
)


def test_save_restore_roundtrip(tmp_path):
    params = {"dense": {"kernel": jnp.arange(6.0).reshape(2, 3),
                        "bias": jnp.ones((3,))}}
    optimizer = optax.adamw(1e-3)
    opt_state = optimizer.init(params)

    save_train_state(str(tmp_path), 7, params, opt_state)
    path = latest_checkpoint(str(tmp_path))
    assert path and path.endswith("step_00000007")

    zeros = {"dense": {"kernel": jnp.zeros((2, 3)), "bias": jnp.zeros((3,))}}
    r_params, r_opt, step = restore_train_state(
        path, zeros, optimizer.init(zeros)
    )
    assert step == 7
    np.testing.assert_array_equal(
        np.asarray(r_params["dense"]["kernel"]),
        np.asarray(params["dense"]["kernel"]),
    )


def test_latest_checkpoint_picks_newest(tmp_path):
    params = {"w": jnp.ones((2,))}
    opt = optax.sgd(0.1).init(params)
    save_train_state(str(tmp_path), 1, params, opt)
    save_train_state(str(tmp_path), 12, params, opt)
    assert latest_checkpoint(str(tmp_path)).endswith("step_00000012")
    assert latest_checkpoint(str(tmp_path / "nope")) is None
