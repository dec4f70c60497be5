# -*- coding: utf-8 -*-
"""Pallas kernels vs jnp reference implementations (interpret mode on CPU)."""
import jax.numpy as jnp
import numpy as np
import pytest

from illufly_tts_tpu.ops.pallas.istft_oa import istft_pallas
from illufly_tts_tpu.ops.stft import istft


@pytest.mark.parametrize("frames,fpb", [(64, 64), (200, 64), (1024, 256)])
def test_istft_pallas_matches_reference(frames, fpb):
    rng = np.random.RandomState(0)
    batch, k, n_fft, hop = 2, 11, 20, 5
    mag = jnp.asarray(np.abs(rng.randn(batch, frames, k)).astype(np.float32))
    phase = jnp.asarray(
        (rng.rand(batch, frames, k).astype(np.float32) * 2 - 1) * np.pi
    )
    ref = istft(mag, phase, n_fft, hop)[:, : frames * hop]
    out = istft_pallas(
        mag, phase, n_fft, hop, frames_per_block=fpb, interpret=True
    )
    assert out.shape == (batch, frames * hop)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_istft_pallas_zero_input():
    mag = jnp.zeros((1, 64, 11))
    phase = jnp.zeros((1, 64, 11))
    out = istft_pallas(mag, phase, interpret=True)
    np.testing.assert_allclose(np.asarray(out), 0.0)
