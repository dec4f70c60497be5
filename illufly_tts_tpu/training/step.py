# -*- coding: utf-8 -*-
"""Training step (teacher-forced) for the TTS stack.

The reference ships no training code (SURVEY §0); this makes the framework
trainable on TPU pods: duration-prediction loss + waveform reconstruction
with teacher-forced alignments (differentiable end to end — rounding never
appears in the gradient path), pjit-able over a ('data', 'model') mesh.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..model.kokoro import KokoroModel


class TrainBatch(NamedTuple):
    input_ids: jnp.ndarray    # [B, T] int32
    mask: jnp.ndarray         # [B, T]
    ref_s: jnp.ndarray        # [B, 256]
    target_dur: jnp.ndarray   # [B, T] float frames (teacher alignment)
    target_audio: jnp.ndarray  # [B, F*samples_per_frame]


def make_loss_fn(model: KokoroModel, num_frames: int,
                 spectral: bool = False, mel_weight: float = 1.0,
                 stft_weight: float = 0.5):
    """Teacher-forced loss. ``spectral=False`` keeps the round-1/2
    objective (duration MSE + masked waveform L1, used by the synthetic
    distillation path where the teacher waveform is exact).
    ``spectral=True`` is the real-data objective: duration MSE + mel-L1 +
    multi-resolution STFT (StyleTTS2's reconstruction terms — raw
    waveform L1 is meaningless against real recordings because phase is
    unconstrained)."""

    def loss_fn(params, batch: TrainBatch):
        duration, d = model.apply(
            params, batch.input_ids, batch.mask, batch.ref_s,
            jnp.ones((batch.input_ids.shape[0],), jnp.float32),
            method=KokoroModel.encode_durations,
        )
        denom = jnp.maximum(batch.mask.sum(), 1.0)
        dur_loss = (
            jnp.square(duration - batch.target_dur) * batch.mask
        ).sum() / denom

        teacher = jnp.round(batch.target_dur * batch.mask).astype(jnp.int32)
        audio, fmask = model.apply(
            params, batch.input_ids, batch.mask, d, teacher, batch.ref_s,
            num_frames, method=KokoroModel.decode_frames,
        )
        spf = model.config.samples_per_frame
        sample_mask = jnp.repeat(fmask, spf, axis=1)
        if spectral:
            from ..audio.mel_jax import mel_l1, multi_res_stft_loss

            pred = audio * sample_mask
            tgt = batch.target_audio * sample_mask
            mel_loss = mel_l1(pred, tgt, model.config.sample_rate)
            stft_loss = multi_res_stft_loss(pred, tgt)
            loss = dur_loss + mel_weight * mel_loss + (
                stft_weight * stft_loss
            )
            return loss, {
                "dur_loss": dur_loss, "mel_l1": mel_loss,
                "stft_loss": stft_loss, "audio_loss": mel_loss,
            }
        a_denom = jnp.maximum(sample_mask.sum(), 1.0)
        audio_loss = (
            jnp.abs(audio - batch.target_audio) * sample_mask
        ).sum() / a_denom

        loss = dur_loss + audio_loss
        return loss, {"dur_loss": dur_loss, "audio_loss": audio_loss}

    return loss_fn


def make_train_step(model: KokoroModel, optimizer: optax.GradientTransformation,
                    num_frames: int, spectral: bool = False):
    loss_fn = make_loss_fn(model, num_frames, spectral=spectral)

    def train_step(params, opt_state, batch: TrainBatch):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = dict(metrics, loss=loss)
        return params, opt_state, metrics

    return train_step
