# -*- coding: utf-8 -*-
"""Waveform discriminators for adversarial training (HiFi-GAN recipe).

The reference ships no training code (SURVEY §0); its model family
(Kokoro <- StyleTTS2 <- HiFi-GAN/iSTFTNet) is trained with an LSGAN
objective over two discriminator ensembles. This implements that recipe
TPU-first:

- ``MultiPeriodDiscriminator`` (HiFi-GAN): the waveform folds into a
  ``[B, S/p, p, 1]`` image per period p and runs a strided Conv stack —
  every reshape is static and the convs are MXU-shaped NHWC.
- ``MultiResolutionDiscriminator`` (UnivNet/BigVGAN-style): operates on
  STFT magnitudes at three resolutions, reusing the same XLA-native
  ``ops.stft.stft_magphase`` the reconstruction losses use (one fused
  framing/rfft path for the whole training step).

All control flow is trace-time Python over static module attributes —
nothing data-dependent — so the ensemble jits into a single program.
Channel widths default well below HiFi-GAN's 1024 (the 82M-parameter
acoustic model doesn't need a 70M discriminator; widths are attributes
for scaling up).

LSGAN losses follow HiFi-GAN eq. (1)-(3): D minimizes (1-D(y))^2 +
D(G(x))^2, G minimizes (1-D(G(x)))^2 plus L1 feature matching over every
intermediate activation.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..ops.stft import stft_magphase


class PeriodDiscriminator(nn.Module):
    """One period's fold-and-conv stack. Input ``[B, S]`` float waveform."""

    period: int
    base_channels: int = 32
    max_channels: int = 256
    n_layers: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        b, s = x.shape
        pad = (-s) % self.period
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad)), mode="reflect")
        h = x.reshape(b, -1, self.period, 1)  # NHWC: [B, S/p, p, 1]
        feats: List[jnp.ndarray] = []
        ch = self.base_channels
        for _ in range(self.n_layers):
            h = nn.Conv(ch, (5, 1), strides=(3, 1),
                        padding=((2, 2), (0, 0)))(h)
            h = nn.leaky_relu(h, 0.1)
            feats.append(h)
            ch = min(ch * 4, self.max_channels)
        h = nn.Conv(self.max_channels, (5, 1), padding=((2, 2), (0, 0)))(h)
        h = nn.leaky_relu(h, 0.1)
        feats.append(h)
        h = nn.Conv(1, (3, 1), padding=((1, 1), (0, 0)))(h)
        feats.append(h)
        return h.reshape(b, -1), feats


class ResolutionDiscriminator(nn.Module):
    """Conv stack over one STFT-magnitude image ``[B, T, bins, 1]``."""

    n_fft: int
    hop: int
    channels: int = 32

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        mag, _ = stft_magphase(x, self.n_fft, self.hop)  # [B, T, bins]
        h = mag[..., None]
        feats: List[jnp.ndarray] = []
        for strides in ((1, 2), (1, 2), (2, 2), (1, 1)):
            h = nn.Conv(self.channels, (3, 9), strides=strides,
                        padding="SAME")(h)
            h = nn.leaky_relu(h, 0.1)
            feats.append(h)
        h = nn.Conv(1, (3, 3), padding="SAME")(h)
        feats.append(h)
        return h.reshape(x.shape[0], -1), feats


class HiFiGANDiscriminator(nn.Module):
    """The full ensemble: every sub-discriminator scores the waveform;
    returns (list of per-sub logits, list of per-sub feature lists)."""

    periods: Sequence[int] = (2, 3, 5, 7, 11)
    resolutions: Sequence[Tuple[int, int]] = (
        (512, 128), (1024, 256), (2048, 512),
    )
    base_channels: int = 32
    max_channels: int = 256

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        logits: List[jnp.ndarray] = []
        feats: List[List[jnp.ndarray]] = []
        for p in self.periods:
            lo, fe = PeriodDiscriminator(
                period=p, base_channels=self.base_channels,
                max_channels=self.max_channels, name=f"period_{p}",
            )(x)
            logits.append(lo)
            feats.append(fe)
        for n_fft, hop in self.resolutions:
            lo, fe = ResolutionDiscriminator(
                n_fft=n_fft, hop=hop, channels=self.base_channels,
                name=f"res_{n_fft}",
            )(x)
            logits.append(lo)
            feats.append(fe)
        return logits, feats


# --------------------------------------------------------------------------
# LSGAN losses (HiFi-GAN eq. 1-3)
# --------------------------------------------------------------------------

def discriminator_loss(real_logits, fake_logits) -> jnp.ndarray:
    total = 0.0
    for r, f in zip(real_logits, fake_logits):
        total = total + jnp.mean(jnp.square(1.0 - r)) + jnp.mean(
            jnp.square(f)
        )
    return total


def generator_adv_loss(fake_logits) -> jnp.ndarray:
    total = 0.0
    for f in fake_logits:
        total = total + jnp.mean(jnp.square(1.0 - f))
    return total


def feature_matching_loss(real_feats, fake_feats) -> jnp.ndarray:
    total = 0.0
    count = 0
    for r_list, f_list in zip(real_feats, fake_feats):
        for r, f in zip(r_list, f_list):
            total = total + jnp.mean(jnp.abs(r - f))
            count += 1
    return total / max(count, 1)
