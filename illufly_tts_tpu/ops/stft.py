# -*- coding: utf-8 -*-
"""Tiny-window STFT/iSTFT as basis matmuls (TPU-native).

The iSTFTNet head uses n_fft=20, hop=5 (reference decoder semantics,
SURVEY C21). At this size FFTs are slower than a dense basis matmul on the
MXU, so both transforms are expressed as matmuls with precomputed real
DFT bases, plus overlap-add with exact torch.istft-style window-envelope
normalization.
"""
from __future__ import annotations

from functools import lru_cache

import jax
import numpy as np
import jax.numpy as jnp


def hann(n: int) -> np.ndarray:
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)  # periodic


@lru_cache(maxsize=None)
def _bases(n_fft: int):
    """Pure numpy (host) — never cache traced values (lru_cache + jit)."""
    k = np.arange(n_fft // 2 + 1)
    n = np.arange(n_fft)
    angle = 2.0 * np.pi * np.outer(n, k) / n_fft          # [n_fft, K]
    fwd_cos = np.cos(angle).T                              # [K, n_fft]
    fwd_sin = -np.sin(angle).T
    # snap analytically-zero entries (DC/Nyquist sine rows) to +0.0: the
    # sign of a ±0 imaginary part decides atan2's ±π branch, which must be
    # deterministic across backends (phase is a network input feature)
    fwd_cos = np.where(np.abs(fwd_cos) < 1e-12, 0.0, fwd_cos)
    fwd_sin = np.where(np.abs(fwd_sin) < 1e-12, 0.0, fwd_sin)
    # inverse: x[n] = sum_k w_k (Re cos - Im sin), w = 2/N except DC/Nyquist
    w = np.full(n_fft // 2 + 1, 2.0 / n_fft)
    w[0] = 1.0 / n_fft
    if n_fft % 2 == 0:
        w[-1] = 1.0 / n_fft
    inv_cos = np.cos(angle) * w                            # [n_fft, K]
    inv_sin = -np.sin(angle) * w
    return (
        np.asarray(fwd_cos, np.float32),
        np.asarray(fwd_sin, np.float32),
        np.asarray(inv_cos.T, np.float32),                 # [K, n_fft]
        np.asarray(inv_sin.T, np.float32),
    )


def frame_signal(x: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """x [B, L] -> frames [B, F, n_fft], F = (L - n_fft)//hop + 1.

    When hop divides n_fft, framing is pure reshape+slice (no gather —
    gathers of F*n_fft indices lower poorly on TPU)."""
    batch, length = x.shape
    num_frames = (length - n_fft) // hop + 1
    if n_fft % hop == 0:
        chunks = n_fft // hop
        rows = num_frames + chunks - 1
        y = x[:, : rows * hop].reshape(batch, rows, hop)
        return jnp.concatenate(
            [y[:, c: c + num_frames] for c in range(chunks)], axis=-1
        )
    idx = (
        jnp.arange(num_frames)[:, None] * hop + jnp.arange(n_fft)[None, :]
    )
    return x[:, idx]


def stft_magphase(x: jnp.ndarray, n_fft: int, hop: int):
    """x [B,L] -> (mag [B,F,K], phase [B,F,K]) with hann window."""
    fwd_cos, fwd_sin, _, _ = _bases(n_fft)
    win = jnp.asarray(hann(n_fft), x.dtype)
    frames = frame_signal(x, n_fft, hop) * win[None, None, :]
    hi = jax.lax.Precision.HIGHEST  # keep f32 on the TPU MXU
    re = jnp.matmul(frames, fwd_cos.T.astype(x.dtype), precision=hi)
    im = jnp.matmul(frames, fwd_sin.T.astype(x.dtype), precision=hi)
    power = re * re + im * im
    mag = jnp.sqrt(power + 1e-9)
    # canonicalize -0.0 -> +0.0 so atan2(0, re<0) lands on +pi everywhere
    im = jnp.where(im == 0.0, 0.0, im)
    # dead bins (unvoiced harmonic source): atan2's gradient at (0, 0)
    # is 0/0 = NaN and poisons the whole backward pass during training;
    # substitute (re, im) = (1, 0) there — same forward (atan2(0,1)=0),
    # zero gradient
    dead = power < 1e-12
    re_safe = jnp.where(dead, 1.0, re)
    im_safe = jnp.where(dead, 0.0, im)
    phase = jnp.arctan2(im_safe, re_safe)
    return mag, phase


def overlap_add(frames: jnp.ndarray, hop: int) -> jnp.ndarray:
    """frames [B,F,W] -> [B, (F-1)*hop + W] via shifted partial sums.

    Requires hop | W: the shifted-partial-sum scheme covers each frame
    with exactly W/hop hop-sized chunks — a non-dividing hop would
    silently drop each frame's trailing W % hop samples."""
    batch, num_frames, win = frames.shape
    if win % hop:
        raise ValueError(
            f"overlap_add requires hop ({hop}) to divide the window "
            f"({win}); {win % hop} trailing samples per frame would be "
            "silently dropped"
        )
    out_len = (num_frames - 1) * hop + win
    chunks = win // hop  # number of overlapping frames per sample
    y = jnp.zeros((batch, out_len), frames.dtype)
    for j in range(chunks):
        part = frames[:, :, j * hop:(j + 1) * hop].reshape(batch, -1)
        y = y.at[:, j * hop:j * hop + num_frames * hop].add(part)
    return y


def istft(mag: jnp.ndarray, phase: jnp.ndarray, n_fft: int, hop: int):
    """(mag, phase) [B,F,K] -> audio [B, (F-1)*hop + n_fft].

    torch.istft semantics: windowed frames overlap-added, normalized by the
    summed squared window envelope.
    """
    _, _, inv_cos, inv_sin = _bases(n_fft)
    re = mag * jnp.cos(phase)
    im = mag * jnp.sin(phase)
    hi = jax.lax.Precision.HIGHEST
    frames = jnp.matmul(re, inv_cos.astype(mag.dtype), precision=hi) + \
        jnp.matmul(im, inv_sin.astype(mag.dtype), precision=hi)
    win = jnp.asarray(hann(n_fft), mag.dtype)
    frames = frames * win[None, None, :]
    audio = overlap_add(frames, hop)
    # window-envelope normalization (sum of squared windows per sample)
    num_frames = mag.shape[1]
    env = overlap_add(
        jnp.broadcast_to(
            (win * win)[None, None, :], (1, num_frames, n_fft)
        ),
        hop,
    )
    return audio / jnp.maximum(env, 1e-8)
