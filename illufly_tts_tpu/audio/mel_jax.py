# -*- coding: utf-8 -*-
"""Differentiable (JAX) mel-spectrogram and multi-resolution STFT losses.

Training-side counterpart of audio/mel.py (numpy, metrics-only). The mel
filterbank is identical (same slaney-style construction) so train-time
mel-L1 and eval-time mel-L1 agree. Used by training/step.py for the real
(dataset) training objective; the reference ships no training code
(SURVEY §0) — the StyleTTS2 recipe it descends from uses exactly these
reconstruction terms (mel L1 + multi-res STFT)."""
from __future__ import annotations

from functools import lru_cache
from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..ops.stft import stft_magphase
from .mel import mel_filterbank


@lru_cache(maxsize=8)
def _fb(sample_rate: int, n_fft: int, n_mels: int) -> np.ndarray:
    return mel_filterbank(sample_rate, n_fft, n_mels).astype(np.float32)


def log_mel(
    audio: jnp.ndarray,
    sample_rate: int = 24000,
    n_fft: int = 1024,
    hop: int = 256,
    n_mels: int = 80,
) -> jnp.ndarray:
    """audio [B, L] -> log-mel [B, n_mels, F] (differentiable)."""
    mag, _ = stft_magphase(audio, n_fft, hop)   # [B, F, bins]
    power = jnp.square(mag)
    fb = jnp.asarray(_fb(sample_rate, n_fft, n_mels))  # [M, bins]
    mel = jnp.einsum("mf,btf->bmt", fb, power)
    return jnp.log(jnp.maximum(mel, 1e-5))


def mel_l1(
    a: jnp.ndarray, b: jnp.ndarray, sample_rate: int = 24000
) -> jnp.ndarray:
    """Mean |log-mel difference| between waveform batches [B, L]."""
    return jnp.mean(jnp.abs(
        log_mel(a, sample_rate) - log_mel(b, sample_rate)
    ))


def multi_res_stft_loss(
    a: jnp.ndarray,
    b: jnp.ndarray,
    resolutions: Sequence[Tuple[int, int]] = (
        (512, 128), (1024, 256), (2048, 512),
    ),
    sc_weight: float = 0.1,
) -> jnp.ndarray:
    """Log-magnitude L1 + down-weighted spectral convergence, summed over
    resolutions (the Parallel-WaveGAN / StyleTTS2 auxiliary loss). The
    convergence term is LINEAR in magnitude: against this model's
    unbounded exp-magnitude head it dominates early training and diverges
    from random init (measured: loss -> 1e3 within 10 steps at full
    weight), so it rides at 0.1 while the log terms carry the gradient."""
    total = 0.0
    for n_fft, hop in resolutions:
        mag_a, _ = stft_magphase(a, n_fft, hop)
        mag_b, _ = stft_magphase(b, n_fft, hop)
        sc = jnp.linalg.norm(mag_a - mag_b) / jnp.maximum(
            jnp.linalg.norm(mag_b), 1e-6
        )
        log_l1 = jnp.mean(jnp.abs(
            jnp.log(jnp.maximum(mag_a, 1e-6))
            - jnp.log(jnp.maximum(mag_b, 1e-6))
        ))
        total = total + sc_weight * sc + log_l1
    return total / len(resolutions)
