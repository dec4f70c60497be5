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


def _teacher_forced_audio(model: KokoroModel, num_frames: int, params,
                          batch: TrainBatch):
    """Shared generator forward: (masked fake, masked real, dur_loss)."""
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
    sample_mask = jnp.repeat(fmask, model.config.samples_per_frame, axis=1)
    return audio * sample_mask, batch.target_audio * sample_mask, dur_loss


def make_gan_train_step(
    model: KokoroModel,
    disc,
    g_optimizer: optax.GradientTransformation,
    d_optimizer: optax.GradientTransformation,
    num_frames: int,
    dur_weight: float = 1.0,
    mel_weight: float = 45.0,
    stft_weight: float = 0.5,
    adv_weight: float = 1.0,
    fm_weight: float = 2.0,
):
    """Adversarial (HiFi-GAN/StyleTTS2 recipe) training step.

    One step = D update on stop-gradient generator output (LSGAN), then
    G update against the refreshed discriminator with reconstruction
    (duration MSE + mel-L1 at HiFi-GAN's lambda_mel=45 + multi-res STFT)
    + adversarial + feature-matching terms. The whole thing jits into a
    single program; under a mesh, shard the batch over 'data' and keep
    the (small) discriminator replicated — its convs are purely local so
    GSPMD turns the batch dim into plain data parallelism.
    """
    from ..audio.mel_jax import mel_l1, multi_res_stft_loss
    from .discriminator import (
        discriminator_loss,
        feature_matching_loss,
        generator_adv_loss,
    )

    sr = model.config.sample_rate

    def d_loss_fn(d_params, fake, real):
        f_logits, _ = disc.apply(d_params, fake)
        r_logits, _ = disc.apply(d_params, real)
        return discriminator_loss(r_logits, f_logits)

    def g_loss_fn(g_params, d_params, batch: TrainBatch):
        fake, real, dur_loss = _teacher_forced_audio(
            model, num_frames, g_params, batch
        )
        mel_loss = mel_l1(fake, real, sr)
        stft_loss = multi_res_stft_loss(fake, real)
        f_logits, f_feats = disc.apply(d_params, fake)
        _, r_feats = disc.apply(d_params, real)
        adv = generator_adv_loss(f_logits)
        fm = feature_matching_loss(r_feats, f_feats)
        loss = (
            dur_weight * dur_loss
            + mel_weight * mel_loss
            + stft_weight * stft_loss
            + adv_weight * adv
            + fm_weight * fm
        )
        return loss, {
            "dur_loss": dur_loss, "mel_l1": mel_loss,
            "stft_loss": stft_loss, "adv_loss": adv, "fm_loss": fm,
            "audio_loss": mel_loss,
        }

    def gan_train_step(g_params, d_params, g_opt_state, d_opt_state,
                       batch: TrainBatch):
        # --- D step (fake detached: only D learns here) ---
        fake, real, _ = _teacher_forced_audio(
            model, num_frames, g_params, batch
        )
        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(
            d_params, jax.lax.stop_gradient(fake), real
        )
        d_updates, d_opt_state = d_optimizer.update(
            d_grads, d_opt_state, d_params
        )
        d_params = optax.apply_updates(d_params, d_updates)
        # --- G step against the refreshed D (HiFi-GAN order) ---
        (g_loss, metrics), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(g_params, d_params, batch)
        g_updates, g_opt_state = g_optimizer.update(
            g_grads, g_opt_state, g_params
        )
        g_params = optax.apply_updates(g_params, g_updates)
        metrics = dict(metrics, loss=g_loss, d_loss=d_loss)
        return g_params, d_params, g_opt_state, d_opt_state, metrics

    return gan_train_step
