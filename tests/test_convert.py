# -*- coding: utf-8 -*-
"""torch->flax conversion mechanics (weight-norm folding, layouts, LSTM)."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # model-compile-heavy (see pyproject markers)

from illufly_tts_tpu.model.convert import (
    conv_kernel,
    dense_kernel,
    fold_weight_norm,
    lstm_params,
)


def test_fold_weight_norm_matches_torch():
    torch = pytest.importorskip("torch")

    conv = torch.nn.Conv1d(8, 16, 3)
    conv = torch.nn.utils.weight_norm(conv)
    state = {k: v.detach().numpy() for k, v in conv.state_dict().items()}
    folded = fold_weight_norm(state)
    assert "weight" in folded
    # folded weight must equal the effective torch weight
    with torch.no_grad():
        effective = conv.weight.detach().numpy()
    np.testing.assert_allclose(folded["weight"], effective, atol=1e-6)


def test_conv_kernel_layout():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    import jax.numpy as jnp
    import jax

    w = np.random.RandomState(0).randn(16, 8, 3).astype(np.float32)
    x = np.random.RandomState(1).randn(2, 8, 20).astype(np.float32)
    ref = F.conv1d(
        torch.from_numpy(x), torch.from_numpy(w), padding=1
    ).numpy()
    out = jax.lax.conv_general_dilated(
        jnp.asarray(np.transpose(x, (0, 2, 1))),       # NHC
        jnp.asarray(conv_kernel(w)),                   # HIO
        (1,), "SAME", dimension_numbers=("NHC", "HIO", "NHC"),
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(out), (0, 2, 1)), ref, atol=1e-4
    )


def test_dense_kernel_layout():
    w = np.random.RandomState(0).randn(6, 4).astype(np.float32)  # [out, in]
    x = np.random.RandomState(1).randn(3, 4).astype(np.float32)
    ref = x @ w.T
    np.testing.assert_allclose(x @ dense_kernel(w), ref, atol=1e-6)


def test_lstm_params_match_torch_cell():
    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp

    d_in, hidden, steps = 6, 4, 5
    lstm = torch.nn.LSTM(d_in, hidden, batch_first=True)
    state = {f"l.{k}": v.detach().numpy() for k, v in lstm.state_dict().items()}
    params = lstm_params("l", state, "fwd")

    x = np.random.RandomState(0).randn(1, steps, d_in).astype(np.float32)
    with torch.no_grad():
        ref, _ = lstm(torch.from_numpy(x))
    ref = ref.numpy()

    # run our fused-gate recurrence with the converted params
    w_ih = jnp.asarray(params["fwd_ih"]["kernel"])
    b = jnp.asarray(params["fwd_ih"]["bias"])
    w_hh = jnp.asarray(params["fwd_hh"])
    h = jnp.zeros((1, hidden))
    c = jnp.zeros((1, hidden))
    outs = []
    for t in range(steps):
        gates = jnp.asarray(x[:, t]) @ w_ih + b + h @ w_hh
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        outs.append(np.asarray(h))
    ours = np.stack(outs, axis=1)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_vocab_remap_rows():
    """Real-checkpoint path: source rows land at OUR vocab ids; symbols
    we lack are skipped; rows the source lacks keep the template init."""
    import numpy as np

    from illufly_tts_tpu.model.convert import _remap_vocab_rows
    from illufly_tts_tpu.model.vocab import VOCAB

    src_vocab = {"a": 0, "i": 1, "$": 2, "☃": 3}  # snowman: not ours
    src = np.arange(4 * 3, dtype=np.float32).reshape(4, 3)
    template = np.full((len(VOCAB), 3), -1.0, np.float32)
    new, hits = _remap_vocab_rows(src, template, src_vocab)
    assert hits == 3
    for sym, row in (("a", 0), ("i", 1), ("$", 2)):
        np.testing.assert_array_equal(new[VOCAB[sym]], src[row])
    touched = {VOCAB["a"], VOCAB["i"], VOCAB["$"]}
    for r in range(len(VOCAB)):
        if r not in touched:
            assert (new[r] == -1.0).all()
