# -*- coding: utf-8 -*-
"""Foundational layers for the TPU model.

TPU-first design notes:
- Feature-last layout ``[B, T, C]`` everywhere (XLA-friendly; convs lower to
  MXU matmuls without transposes).
- LSTM = one big input projection over all timesteps (single MXU matmul)
  + ``lax.scan`` for the recurrent half. Mask-aware carry-hold reproduces
  torch pack_padded semantics for both directions.
- No weight normalization at inference: torch weight-norm folds into plain
  kernels at conversion time (model/convert.py).

Replaces the torch modules used by the reference's external model
(reference call surface: src/illufly_tts/core/kmodel.py:70-144).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class LSTM(nn.Module):
    """Mask-aware (optionally bidirectional) LSTM.

    Input  [B, T, D], mask [B, T] (1 = valid)  ->  [B, T, H*dirs].
    """

    hidden: int
    bidirectional: bool = True
    dtype: jnp.dtype = jnp.float32

    def _direction(self, x, mask, name):
        batch, _, _ = x.shape
        h_dim = self.hidden
        # One fused input projection for all timesteps (MXU-friendly).
        x_proj = nn.Dense(4 * h_dim, name=f"{name}_ih", dtype=self.dtype)(x)
        w_hh = self.param(
            f"{name}_hh",
            nn.initializers.orthogonal(),
            (h_dim, 4 * h_dim),
            jnp.float32,
        ).astype(self.dtype)

        def step(carry, inputs):
            h, c = carry
            xp, m = inputs  # xp [B, 4H], m [B, 1]
            gates = xp + h @ w_hh
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            i = jax.nn.sigmoid(i)
            f = jax.nn.sigmoid(f)
            g = jnp.tanh(g)
            o = jax.nn.sigmoid(o)
            c_new = f * c + i * g
            h_new = o * jnp.tanh(c_new)
            # hold carry through padded steps
            h_new = jnp.where(m > 0, h_new, h)
            c_new = jnp.where(m > 0, c_new, c)
            return (h_new, c_new), h_new

        init = (
            jnp.zeros((batch, h_dim), self.dtype),
            jnp.zeros((batch, h_dim), self.dtype),
        )
        xs = (
            jnp.swapaxes(x_proj, 0, 1),              # [T, B, 4H]
            jnp.swapaxes(mask[..., None], 0, 1),     # [T, B, 1]
        )
        _, ys = jax.lax.scan(step, init, xs)
        return jnp.swapaxes(ys, 0, 1)  # [B, T, H]

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None):
        if mask is None:
            mask = jnp.ones(x.shape[:2], x.dtype)
        mask = mask.astype(x.dtype)
        fwd = self._direction(x, mask, "fwd")
        if not self.bidirectional:
            return fwd * mask[..., None]
        x_rev = jnp.flip(x, axis=1)
        m_rev = jnp.flip(mask, axis=1)
        bwd = jnp.flip(self._direction(x_rev, m_rev, "bwd"), axis=1)
        return jnp.concatenate([fwd, bwd], axis=-1) * mask[..., None]


class AdaIN1d(nn.Module):
    """Style-conditioned instance norm over the time axis. x [B,T,C], s [B,S]."""

    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, s, mask: Optional[jnp.ndarray] = None):
        h = nn.Dense(2 * self.channels, name="fc", dtype=self.dtype)(s)
        gamma, beta = jnp.split(h[:, None, :], 2, axis=-1)
        if mask is not None:
            m = mask[..., None].astype(x.dtype)
            count = jnp.maximum(m.sum(axis=1, keepdims=True), 1.0)
            mean = (x * m).sum(axis=1, keepdims=True) / count
            var = ((x - mean) ** 2 * m).sum(axis=1, keepdims=True) / count
        else:
            mean = x.mean(axis=1, keepdims=True)
            var = x.var(axis=1, keepdims=True)
        x_norm = (x - mean) * jax.lax.rsqrt(var + 1e-5)
        return (1.0 + gamma) * x_norm + beta


class AdaLayerNorm(nn.Module):
    """Style-conditioned layer norm over channels. x [B,T,C], s [B,S]."""

    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, s):
        h = nn.Dense(2 * self.channels, name="fc", dtype=self.dtype)(s)
        gamma, beta = jnp.split(h[:, None, :], 2, axis=-1)
        mean = x.mean(axis=-1, keepdims=True)
        var = x.var(axis=-1, keepdims=True)
        x_norm = (x - mean) * jax.lax.rsqrt(var + 1e-5)
        return (1.0 + gamma) * x_norm + beta


class Conv1d(nn.Module):
    """1-D conv, feature-last, torch-exact padding.

    Default padding is torch's common "same-ish" ((k-1)*dilation)//2 on both
    sides; pass ``padding`` explicitly for strided convs (torch and XLA
    'SAME' disagree on the phase for stride > 1, e.g. the decoder's
    stride-2 F0/N convs use torch padding=1)."""

    features: int
    kernel: int
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    padding: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = self.padding
        if pad is None:
            pad = ((self.kernel - 1) * self.dilation) // 2
        return nn.Conv(
            features=self.features,
            kernel_size=(self.kernel,),
            strides=(self.stride,),
            kernel_dilation=(self.dilation,),
            feature_group_count=self.groups,
            padding=[(pad, pad)],
            dtype=self.dtype,
            name="conv",
        )(x)


class ConvTranspose1d(nn.Module):
    """Transposed 1-D conv with torch-exact geometry.

    Semantics: lhs-dilated conv with a flipped kernel (flax
    nn.ConvTranspose 'SAME' has a different phase than torch
    ConvTranspose1d(padding=(k-s)//2)). Effective torch params:
    padding = (k - s + 1)//2, output_padding = s - k + 2*padding, which
    yields output length T*s for all (k, s) used in this model
    (kokoro istftnet ups: (20,10), (12,6); AdainResBlk1d pool: (3,2)).

    TPU lowering note (measured, round 2): the lhs-dilation form LOOKS
    like it wastes (s-1)/s of the MXU work on inserted zeros, but XLA's
    TPU conv emitter already decomposes it — measured 3.46 ms at the
    generator's (k=20, s=10) [32, 1024, 512->256] shape vs a 2.0 ms
    useful-FLOPs roofline (~85 TF/s bf16 chip). An explicit sub-pixel
    phase decomposition (stride-1 conv with a [ceil(k/s)+1, C_in,
    s*C_out] phase-stacked weight + depth-to-space reshape) was built,
    torch-parity-tested, and measured SLOWER (0.61x / 0.45x at the two
    generator geometries) because it does k/s+1 taps where only k/s
    carry signal. Keep the dilated form."""

    features: int
    kernel: int
    stride: int
    groups: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        assert self.features % self.groups == 0
        group_in = x.shape[-1] // self.groups
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel, group_in, self.features),
            jnp.float32,
        ).astype(self.dtype)
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        ).astype(self.dtype)
        k, s = self.kernel, self.stride
        pad = max(0, (k - s + 1) // 2)
        out_pad = s - k + 2 * pad  # >= 0 by choice of pad
        pad_lo = k - 1 - pad
        pad_hi = k - 1 - pad + out_pad
        flipped = jnp.flip(kernel, axis=0)  # [K, in/groups, out]
        y = jax.lax.conv_general_dilated(
            x,
            flipped,
            window_strides=(1,),
            padding=[(pad_lo, pad_hi)],
            lhs_dilation=(s,),
            dimension_numbers=("NHC", "HIO", "NHC"),
            feature_group_count=self.groups,
        )
        return y + bias


def leaky_relu(x, slope: float = 0.2):
    return jnp.where(x >= 0, x, slope * x)


def snake(x, alpha):
    """Snake activation x + sin^2(alpha x)/alpha (iSTFTNet generator)."""
    return x + (1.0 / alpha) * jnp.square(jnp.sin(alpha * x))


class AdainResBlk1d(nn.Module):
    """Style-conditioned residual block (StyleTTS2 AdainResBlk1d shape)."""

    dim_in: int
    dim_out: int
    style_dim: int
    upsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, s, mask: Optional[jnp.ndarray] = None):
        # mask activations BEFORE every conv/pool, not just the AdaIN
        # statistics: AdaIN maps padded frames to (1+gamma)(x-mean)rstd
        # + beta != 0, and the k=3 convs would pull that garbage into
        # the last valid frames — the reference renders at exact length
        # and sees zeros there (same policy as AdaSnakeResBlock below)
        def m(h, up=False):
            if mask is None:
                return h
            mm = jnp.repeat(mask, 2, axis=1) if up else mask
            return h * mm[..., None].astype(h.dtype)

        # residual branch
        h = AdaIN1d(self.dim_in, name="norm1", dtype=self.dtype)(x, s, mask)
        h = leaky_relu(h)
        if self.upsample:
            h = ConvTranspose1d(
                self.dim_in, kernel=3, stride=2, groups=self.dim_in,
                name="pool", dtype=self.dtype,
            )(m(h))
        h = Conv1d(self.dim_out, 3, name="conv1", dtype=self.dtype)(
            m(h, up=self.upsample)
        )
        up_mask = None
        if mask is not None:
            up_mask = (
                jnp.repeat(mask, 2, axis=1) if self.upsample else mask
            )
        h = AdaIN1d(self.dim_out, name="norm2", dtype=self.dtype)(h, s, up_mask)
        h = leaky_relu(h)
        h = Conv1d(self.dim_out, 3, name="conv2", dtype=self.dtype)(
            m(h, up=self.upsample)
        )
        # shortcut branch
        sc = m(x)
        if self.upsample:
            sc = jnp.repeat(sc, 2, axis=1)  # nearest 2x
        if self.dim_in != self.dim_out:
            sc = Conv1d(self.dim_out, 1, name="conv1x1", dtype=self.dtype)(sc)
        return (h + sc) * (1.0 / jnp.sqrt(2.0).astype(x.dtype))


class AdaSnakeResBlock(nn.Module):
    """Generator residual block: dilated convs + AdaIN + Snake
    (iSTFTNet AdaINResBlock1 shape)."""

    channels: int
    kernel: int
    dilations: Sequence[int]
    style_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, s, mask: Optional[jnp.ndarray] = None):
        for j, d in enumerate(self.dilations):
            alpha1 = self.param(
                f"alpha1_{j}", nn.initializers.ones, (1, 1, self.channels),
                jnp.float32,
            ).astype(x.dtype)
            alpha2 = self.param(
                f"alpha2_{j}", nn.initializers.ones, (1, 1, self.channels),
                jnp.float32,
            ).astype(x.dtype)
            m = mask[..., None].astype(x.dtype) if mask is not None else None
            h = AdaIN1d(self.channels, name=f"adain1_{j}", dtype=self.dtype)(
                x, s, mask
            )
            h = snake(h, alpha1)
            if m is not None:
                h = h * m
            h = Conv1d(
                self.channels, self.kernel, dilation=d,
                name=f"conv1_{j}", dtype=self.dtype,
            )(h)
            h = AdaIN1d(self.channels, name=f"adain2_{j}", dtype=self.dtype)(
                h, s, mask
            )
            h = snake(h, alpha2)
            if m is not None:
                h = h * m
            h = Conv1d(
                self.channels, self.kernel, name=f"conv2_{j}", dtype=self.dtype
            )(h)
            x = x + h
            if m is not None:
                x = x * m
        return x
