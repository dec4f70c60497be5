# -*- coding: utf-8 -*-
"""Pallas kernels vs jnp reference implementations (interpret mode on CPU)."""
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # model-compile-heavy (see pyproject markers)

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


import jax


@pytest.mark.parametrize("k,d", [(3, 1), (7, 3), (11, 5)])
def test_fused_adain_snake_conv(k, d):
    from illufly_tts_tpu.ops.pallas.fused_conv import (
        adain_snake_conv,
        adain_snake_conv_reference,
        fold_adain,
        instance_moments,
    )

    rng = np.random.RandomState(0)
    B, L, C = 2, 384, 128
    x = jnp.asarray(rng.randn(B, L, C).astype(np.float32) * 0.5)
    mask = jnp.asarray(
        (np.arange(L)[None, :] < np.array([[L], [300]])).astype(np.float32)
    ).reshape(B, L)
    gamma = jnp.asarray(rng.randn(B, C).astype(np.float32) * 0.1)
    beta = jnp.asarray(rng.randn(B, C).astype(np.float32) * 0.1)
    alpha = jnp.asarray(np.abs(rng.randn(C)).astype(np.float32) + 0.5)
    w = jnp.asarray(rng.randn(k, C, C).astype(np.float32) * 0.05)
    bias = jnp.asarray(rng.randn(C).astype(np.float32) * 0.1)
    mean, rstd = instance_moments(x, mask)
    scale, shift = fold_adain(mean, rstd, gamma, beta)

    x_t = jnp.transpose(x, (0, 2, 1))  # kernel layout [B, C, L]
    ref = adain_snake_conv_reference(
        x_t, mask, scale, shift, alpha, w, bias, k, d
    )
    out = adain_snake_conv(
        x_t, mask, scale, shift, alpha, w, bias, k, d,
        block_len=256, interpret=True,
    )
    assert out.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-3, rtol=1e-3
    )


def test_instance_moments_masked():
    from illufly_tts_tpu.ops.pallas.fused_conv import instance_moments

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 64, 8).astype(np.float32))
    mask = jnp.zeros((2, 64)).at[:, :40].set(1.0)
    mean, rstd = instance_moments(x, mask)
    ref_mean = np.asarray(x[:, :40]).mean(axis=1)
    np.testing.assert_allclose(np.asarray(mean), ref_mean, atol=1e-5)


@pytest.mark.parametrize("k,d,L,bl", [
    (3, 1, 384, 256), (7, 3, 384, 256), (11, 5, 384, 256),
    (11, 5, 130, 256),   # single partial block
    (7, 3, 1000, 256),   # multi-block with partial tail
])
def test_carry_adain_snake_conv(k, d, L, bl):
    """Single-read carry-scratch kernel (round 3) vs the jnp reference:
    block-boundary halos, batch-carry reset, and edge zero-padding."""
    from illufly_tts_tpu.ops.pallas.carry_conv import adain_snake_conv_carry
    from illufly_tts_tpu.ops.pallas.fused_conv import (
        adain_snake_conv_reference,
        fold_adain,
        instance_moments,
    )

    rng = np.random.RandomState(0)
    B, C = 2, 128
    x = jnp.asarray(rng.randn(B, L, C).astype(np.float32) * 0.5)
    mask = jnp.asarray(
        (np.arange(L)[None, :] < np.array([[L], [max(L - 60, 9)]]))
        .astype(np.float32)
    ).reshape(B, L)
    gamma = jnp.asarray(rng.randn(B, C).astype(np.float32) * 0.1)
    beta = jnp.asarray(rng.randn(B, C).astype(np.float32) * 0.1)
    alpha = jnp.asarray(np.abs(rng.randn(C)).astype(np.float32) + 0.5)
    w = jnp.asarray(rng.randn(k, C, C).astype(np.float32) * 0.05)
    bias = jnp.asarray(rng.randn(C).astype(np.float32) * 0.1)
    mean, rstd = instance_moments(x, mask)
    scale, shift = fold_adain(mean, rstd, gamma, beta)

    x_t = jnp.transpose(x, (0, 2, 1))
    ref = adain_snake_conv_reference(
        x_t, mask, scale, shift, alpha, w, bias, k, d
    )
    out = adain_snake_conv_carry(
        x_t, mask, scale, shift, alpha, w, bias, k, d,
        block_len=bl, interpret=True,
    )
    assert out.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-3, rtol=1e-3
    )
