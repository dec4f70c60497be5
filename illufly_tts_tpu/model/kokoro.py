# -*- coding: utf-8 -*-
"""KokoroModel: the full TTS stack, split into two jittable stages.

Reference behavior (src/illufly_tts/core/kmodel.py:66-146): BERT -> duration
prediction -> per-item alignment loop -> F0/N -> text encoding -> decoder.

TPU-native redesign:
- Stage A ``encode_durations``: everything whose shape depends only on the
  token budget T. Returns float durations + token-level hidden states.
- Stage B ``decode_frames``: everything at a fixed frame budget F. Alignment
  is a batched cumsum/gather (ops/align.py) — no host loop, no dynamic
  shapes. The engine buckets (T, F) so XLA compiles a small set of programs.
- ``__call__`` runs both with F fixed to max capacity (training / dryrun).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.align import expand_by_duration, frame_mask
from .albert import Albert
from .config import KokoroConfig
from .predictor import ProsodyPredictor
from .text_encoder import TextEncoder
from .vocoder import Decoder


class KokoroModel(nn.Module):
    config: KokoroConfig

    def setup(self):
        cfg = self.config
        dt = cfg.dtype
        self.bert = Albert(cfg.albert, name="bert", dtype=dt)
        self.bert_encoder = nn.Dense(cfg.hidden_dim, name="bert_encoder",
                                     dtype=dt)
        self.predictor = ProsodyPredictor(cfg, name="predictor", dtype=dt)
        self.text_encoder = TextEncoder(cfg, name="text_encoder", dtype=dt)
        self.decoder = Decoder(cfg, name="decoder", dtype=dt)

    # ---- stage A: token-length shapes only ---------------------------------

    def encode_durations(
        self,
        input_ids: jnp.ndarray,     # [B, T] int32, 0-padded
        mask: jnp.ndarray,          # [B, T] 1=valid
        ref_s: jnp.ndarray,         # [B, 256] voice embedding
        speed: jnp.ndarray,         # [B] float
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cfg = self.config
        style = ref_s[:, cfg.style_split:].astype(cfg.dtype)   # prosody half
        bert_out = self.bert(input_ids, mask)
        d_en = self.bert_encoder(bert_out)
        duration, d = self.predictor.encode_durations(d_en, style, mask)
        duration = duration / jnp.maximum(speed, 1e-3)[:, None]
        return duration, d

    @staticmethod
    def quantize_durations(
        duration: jnp.ndarray, mask: jnp.ndarray
    ) -> jnp.ndarray:
        """round + clamp(min=1) on valid tokens, 0 on padding
        (matches reference rounding, kmodel.py:115)."""
        pred = jnp.clip(jnp.round(duration), 1, None)
        return (pred * mask).astype(jnp.int32)

    # ---- stage B: fixed frame budget F --------------------------------------

    def decode_frames(
        self,
        input_ids: jnp.ndarray,     # [B, T]
        mask: jnp.ndarray,          # [B, T]
        d: jnp.ndarray,             # [B, T, hidden+style] from stage A
        pred_dur: jnp.ndarray,      # [B, T] int32 frames
        ref_s: jnp.ndarray,         # [B, 256]
        num_frames: int,
        rng: Optional[jax.Array] = None,
        pcm16: bool = False,
        pitch: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cfg = self.config
        asr, f0, n_energy, fmask, dec_style = self._stage_b_front(
            input_ids, mask, d, pred_dur, ref_s, num_frames, pitch=pitch
        )
        audio = self.decoder(asr, f0, n_energy, dec_style, fmask, rng)
        sample_mask = jnp.repeat(fmask, cfg.samples_per_frame, axis=1)
        audio = audio * sample_mask
        if pcm16:
            # on-device 16-bit PCM (halves host transfer; matches the WAV
            # encoder's peak-normalize-if-clipping policy)
            peak = jnp.max(jnp.abs(audio), axis=-1, keepdims=True)
            scale = jnp.where(peak > 1.0, 1.0 / jnp.maximum(peak, 1e-9), 1.0)
            audio = jnp.clip(audio * scale, -1.0, 1.0)
            audio = jnp.round(audio * 32767.0).astype(jnp.int16)
        return audio, fmask

    def _stage_b_front(self, input_ids, mask, d, pred_dur, ref_s,
                       num_frames, pitch=None):
        """Shared front half of stage B (batch AND streaming paths —
        keep them in lockstep): style split, duration expansion, frame
        mask, F0/N towers, text encoder alignment.
        -> (asr [B,F,H], f0, n_energy, fmask [B,F], dec_style).

        ``pitch`` ([B] float, 1.0 = neutral) scales the predicted F0
        contour before the harmonic source — the prosody knob orthogonal
        to ``speed`` (which scales durations in stage A). Beyond the
        reference's surface (its KModel exposes speed only,
        kmodel.py:94-103)."""
        cfg = self.config
        style = ref_s[:, cfg.style_split:].astype(cfg.dtype)
        dec_style = ref_s[:, : cfg.style_split].astype(cfg.dtype)
        en = expand_by_duration(d, pred_dur, num_frames)        # [B,F,H+S]
        fmask = frame_mask(pred_dur, num_frames)                # [B,F]
        f0, n_energy = self.predictor.f0n_train(en, style, fmask)
        if pitch is not None:
            f0 = f0 * pitch[:, None].astype(f0.dtype)
        t_en = self.text_encoder(input_ids, mask)               # [B,T,H]
        asr = expand_by_duration(t_en, pred_dur, num_frames)    # [B,F,H]
        return asr, f0, n_energy, fmask, dec_style

    # ---- streaming stage B: prepare once, render windows --------------------

    def decode_prepare(
        self,
        input_ids: jnp.ndarray,     # [B, T]
        mask: jnp.ndarray,          # [B, T]
        d: jnp.ndarray,             # [B, T, hidden+style] from stage A
        pred_dur: jnp.ndarray,      # [B, T] int32 frames
        ref_s: jnp.ndarray,         # [B, 256]
        num_frames: int,
        pitch: Optional[jnp.ndarray] = None,
    ):
        """Everything with sequence-global state, at the full frame budget:
        the prosody BiLSTM (f0n_train), the decoder trunk, and the harmonic
        source's cumulative phase. Returns generator-rate tensors ready for
        ``decode_window`` (VERDICT r2 next-8: intra-utterance streaming)."""
        cfg = self.config
        asr, f0, n_energy, fmask, dec_style = self._stage_b_front(
            input_ids, mask, d, pred_dur, ref_s, num_frames, pitch=pitch
        )
        x, f0_m, cur_mask = self.decoder.trunk(
            asr, f0, n_energy, dec_style, fmask
        )
        # cumulative source phase (revolutions) at each generator-frame
        # start: each of the 2F positions spans samples_per_frame/2
        # samples of constant f0 (vocoder.py Generator f0_up repeat)
        samples_per_in = cfg.samples_per_frame // 2
        per_pos = f0_m.astype(jnp.float32) * (
            samples_per_in / cfg.sample_rate
        )
        cum_rad = jnp.cumsum(per_pos, axis=-1) - per_pos  # phase BEFORE pos
        return x, f0_m, cum_rad, cur_mask

    def decode_window(
        self,
        x: jnp.ndarray,          # [B, 2F, C] trunk output
        f0_m: jnp.ndarray,       # [B, 2F]
        cum_rad: jnp.ndarray,    # [B, 2F]
        cur_mask: jnp.ndarray,   # [B, 2F]
        ref_s: jnp.ndarray,      # [B, 256]
        start: jnp.ndarray,      # scalar int32, generator-frame units (2F)
        window: int,             # static, generator-frame units
        halo: int,               # static, generator-frame units
        pcm16: bool = False,
    ) -> jnp.ndarray:
        """Render generator frames [start, start+window+halo) with ``halo``
        context on each side (the right halo is RETURNED: consecutive
        windows overlap by halo frames so the caller can crossfade the
        seam). One compiled program serves every window position (start is
        a traced scalar).

        Exactness note: the generator's AdaIN layers are instance norms
        over TIME (layers.py AdaIN1d, mirroring upstream iSTFTNet), so a
        window's activation statistics differ slightly from the full
        render's — windowed output is an approximation that converges as
        windows grow. Phase (cum_rad) and conv context (halo) ARE exact;
        the overlap crossfade in Synthesizer.stream_decode removes the
        residual seam."""
        cfg = self.config
        dec_style = ref_s[:, : cfg.style_split].astype(cfg.dtype)
        span = window + 2 * halo
        # no LEFT padding (synthetic pad frames would bias-propagate
        # through the convs; clamping instead lets the first windows see
        # the true sequence start, like the full render). The RIGHT gets
        # `halo` zero frames: they sit past the masked end of the
        # sequence, exactly where the full render's own SAME-padding
        # zeros live, so the final window's valid tail matches too.
        rpad = ((0, 0), (0, halo))
        x_p = jnp.pad(x, rpad + ((0, 0),))
        f0_p = jnp.pad(f0_m, rpad)
        rad_p = jnp.pad(cum_rad, rpad)
        mask_p = jnp.pad(cur_mask, rpad)
        total_p = x_p.shape[1]
        slice_start = jnp.clip(start - halo, 0, total_p - span)
        x_w = jax.lax.dynamic_slice_in_dim(x_p, slice_start, span, axis=1)
        f0_w = jax.lax.dynamic_slice_in_dim(f0_p, slice_start, span, axis=1)
        mask_w = jax.lax.dynamic_slice_in_dim(
            mask_p, slice_start, span, axis=1
        )
        # phase accumulated BEFORE the slice's first position
        rad0 = jax.lax.dynamic_slice_in_dim(
            rad_p, slice_start, 1, axis=1
        )[:, 0]
        audio = self.decoder.generate(
            x_w, dec_style, f0_w, mask_w, rng=None, rad_offset=rad0,
        )
        samples_per_in = cfg.samples_per_frame // 2
        lo = (start - slice_start) * samples_per_in
        emit = window + halo  # window body + right-overlap for crossfade
        audio = jax.lax.dynamic_slice_in_dim(
            audio, lo, emit * samples_per_in, axis=1
        )
        sample_mask = jnp.repeat(
            jax.lax.dynamic_slice_in_dim(mask_p, start, emit, axis=1),
            samples_per_in, axis=1,
        )
        audio = audio * sample_mask
        if pcm16:
            # deliberate divergence from decode_frames' peak-normalize-
            # if-clipping: streaming is causal — the global peak is
            # unknowable at window k, and per-window rescaling would
            # modulate gain across chunk boundaries (audible pumping).
            # Hard clip is the only gain-stable option; with real
            # checkpoints rendered speech peaks well below full scale.
            audio = jnp.clip(audio, -1.0, 1.0)
            audio = jnp.round(audio * 32767.0).astype(jnp.int16)
        return audio

    # ---- combined (training / compile checks) -------------------------------

    def __call__(
        self,
        input_ids: jnp.ndarray,
        mask: jnp.ndarray,
        ref_s: jnp.ndarray,
        speed: Optional[jnp.ndarray] = None,
        num_frames: Optional[int] = None,
        rng: Optional[jax.Array] = None,
    ):
        if speed is None:
            speed = jnp.ones((input_ids.shape[0],), jnp.float32)
        duration, d = self.encode_durations(input_ids, mask, ref_s, speed)
        pred_dur = self.quantize_durations(duration, mask)
        if num_frames is None:
            num_frames = int(input_ids.shape[1]) * 8
        pred_dur = _fit_durations(pred_dur, num_frames)
        audio, fmask = self.decode_frames(
            input_ids, mask, d, pred_dur, ref_s, num_frames, rng
        )
        return audio, pred_dur, duration, fmask


def _fit_durations(pred_dur: jnp.ndarray, budget: int) -> jnp.ndarray:
    """Clip per-item durations so cumulative frames fit the static budget."""
    cum_prev = jnp.cumsum(pred_dur, axis=-1) - pred_dur
    return jnp.clip(budget - cum_prev, 0, pred_dur)
