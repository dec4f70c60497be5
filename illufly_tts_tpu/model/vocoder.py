# -*- coding: utf-8 -*-
"""iSTFTNet-style decoder: AdaIN residual decode stack + harmonic-source
generator emitting waveform through a tiny iSTFT head.

Role of ``self.decoder`` in the reference (src/illufly_tts/core/kmodel.py:143;
StyleTTS2/iSTFTNet architecture per SURVEY C21). TPU-first details:
- feature-last convs (MXU), static frame budgets, masks threaded through
  AdaIN so padded frames don't pollute instance-norm statistics;
- iSTFT + harmonic STFT as dense-basis matmuls (ops/stft.py);
- deterministic source module (optional PRNG noise).
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.stft import istft, stft_magphase
from .config import KokoroConfig
from .layers import (
    AdaIN1d,
    AdainResBlk1d,
    AdaSnakeResBlock,
    Conv1d,
    ConvTranspose1d,
    leaky_relu,
)


class SourceModule(nn.Module):
    """Harmonic-plus-noise source (SourceModuleHnNSF role)."""

    sample_rate: int
    harmonics: int = 8
    voiced_threshold: float = 10.0
    sine_amp: float = 0.1
    noise_std: float = 0.003  # voiced additive dither (SineGen default)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, f0_up, rng: Optional[jax.Array] = None,
                 rad_offset: Optional[jnp.ndarray] = None):
        """f0_up [B, L] (Hz per sample) -> harmonic source [B, L].

        ``rad_offset`` [B]: accumulated phase (in revolutions) BEFORE this
        window — makes windowed streaming decode phase-continuous with the
        full render (the cumsum below is otherwise global state)."""
        h = jnp.arange(1, self.harmonics + 2, dtype=jnp.float32)  # [H]
        # phase accumulates in f32: cumsum of instantaneous frequency
        rad = jnp.cumsum(
            f0_up.astype(jnp.float32) / self.sample_rate, axis=-1
        )
        if rad_offset is not None:
            rad = rad + rad_offset.astype(jnp.float32)[:, None]
        phase = 2.0 * math.pi * rad[..., None] * h[None, None, :]
        uv = (f0_up > self.voiced_threshold).astype(jnp.float32)[..., None]
        sines = self.sine_amp * jnp.sin(phase) * uv
        if rng is not None:
            # SineGen noise schedule: voiced harmonics get the small
            # additive dither (noise_std), UNVOICED regions get sine_amp/3
            # — the previous expression used sine_amp/3 for both, ~11x the
            # reference's voiced noise
            noise_std = uv * self.noise_std + (1 - uv) * (
                self.sine_amp / 3.0
            )
            sines = sines + noise_std * jax.random.normal(rng, sines.shape)
        merged = nn.Dense(1, name="merge", dtype=jnp.float32)(sines)
        return jnp.tanh(merged)[..., 0].astype(self.dtype)


class Generator(nn.Module):
    config: KokoroConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, s, f0, mask=None, rng=None, rad_offset=None):
        """x [B,2F,C0], s [B,S], f0 [B,2F] -> audio [B, 2F*300].

        ``rad_offset`` [B]: see SourceModule — phase continuity for
        windowed streaming decode."""
        cfg = self.config.istftnet
        n_fft, hop = cfg.gen_istft_n_fft, cfg.gen_istft_hop_size
        up_total = 1
        for u in cfg.upsample_rates:
            up_total *= u

        if mask is not None:
            f0 = f0 * mask.astype(f0.dtype)
            x = x * mask[..., None].astype(x.dtype)

        # harmonic source at sample rate
        samples_per_in = up_total * hop                       # 300
        f0_up = jnp.repeat(f0, samples_per_in, axis=1)        # [B, L]
        har = SourceModule(
            self.config.sample_rate, name="source", dtype=self.dtype
        )(f0_up, rng, rad_offset)
        # pad so har frame count == x length * up_total
        har = jnp.pad(har, ((0, 0), (0, n_fft - hop)), mode="reflect")
        mag_h, ph_h = stft_magphase(har.astype(jnp.float32), n_fft, hop)
        har_spec = jnp.concatenate([mag_h, ph_h], axis=-1).astype(self.dtype)

        num_ups = len(cfg.upsample_rates)
        ch = cfg.upsample_initial_channel
        cur_mask = mask
        for i, (u, k) in enumerate(
            zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)
        ):
            c_cur = ch // (2 ** (i + 1))
            x = leaky_relu(x, 0.1)
            x = ConvTranspose1d(
                c_cur, kernel=k, stride=u, name=f"up_{i}", dtype=self.dtype
            )(x)
            if cur_mask is not None:
                cur_mask = jnp.repeat(cur_mask, u, axis=1)
                x = x * cur_mask[..., None].astype(x.dtype)
            # noise branch from the harmonic spectrum
            if i + 1 < num_ups:
                stride_f0 = 1
                for r in cfg.upsample_rates[i + 1:]:
                    stride_f0 *= r
                x_src = Conv1d(
                    c_cur, kernel=stride_f0 * 2, stride=stride_f0,
                    padding=(stride_f0 + 1) // 2,  # torch istftnet geometry
                    name=f"noise_conv_{i}", dtype=self.dtype,
                )(har_spec)
                x_src = AdaSnakeResBlock(
                    c_cur, 7, (1, 3, 5), self.config.style_dim,
                    name=f"noise_res_{i}", dtype=self.dtype,
                )(x_src, s, cur_mask)
            else:
                x_src = Conv1d(
                    c_cur, kernel=1, name=f"noise_conv_{i}", dtype=self.dtype
                )(har_spec)
                x_src = AdaSnakeResBlock(
                    c_cur, 11, (1, 3, 5), self.config.style_dim,
                    name=f"noise_res_{i}", dtype=self.dtype,
                )(x_src, s, cur_mask)
            x = x + x_src
            acc = None
            for j, (kr, dr) in enumerate(
                zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes)
            ):
                out = AdaSnakeResBlock(
                    c_cur, kr, tuple(dr), self.config.style_dim,
                    name=f"res_{i}_{j}", dtype=self.dtype,
                )(x, s, cur_mask)
                acc = out if acc is None else acc + out
            x = acc / len(cfg.resblock_kernel_sizes)

        x = leaky_relu(x, 0.01)
        x = Conv1d(n_fft + 2, kernel=7, name="conv_post", dtype=self.dtype)(x)
        x = x.astype(jnp.float32)
        mag = jnp.exp(jnp.clip(x[..., : n_fft // 2 + 1], -12.0, 8.0))
        phase = math.pi * jnp.sin(x[..., n_fft // 2 + 1:])
        if self.config.use_pallas_istft:
            from ..ops.pallas.istft_oa import istft_pallas

            return istft_pallas(mag, phase, n_fft, hop)
        audio = istft(mag, phase, n_fft, hop)
        # trim iSTFT tail so audio length == frames * hop
        return audio[:, : x.shape[1] * hop]


class Decoder(nn.Module):
    """Trunk (frame-rate AdaIN conv stack) + Generator.

    setup-style (not compact) so the two halves are separately callable:
    streaming decode runs ``trunk`` once at the full frame budget, then
    ``generate`` per window (convolutions are local; the harmonic source's
    global phase is threaded through ``rad_offset``). Submodule names are
    identical to the original compact layout, so converted checkpoints and
    the torch-twin parity suite are unaffected."""

    config: KokoroConfig
    dtype: jnp.dtype = jnp.float32

    _SPECS = ((1024 + 2 + 64, 1024, False),) * 3 + ((1024 + 2 + 64, 512, True),)

    def setup(self):
        cfg = self.config
        self.f0_conv = Conv1d(1, kernel=3, stride=2, name="f0_conv",
                              dtype=self.dtype)
        self.n_conv = Conv1d(1, kernel=3, stride=2, name="n_conv",
                             dtype=self.dtype)
        self.encode = AdainResBlk1d(
            cfg.hidden_dim + 2, 1024, cfg.style_dim, name="encode",
            dtype=self.dtype,
        )
        self.asr_res = Conv1d(64, kernel=1, name="asr_res", dtype=self.dtype)
        self.decode_blocks = [
            AdainResBlk1d(
                dim_in, dim_out, cfg.style_dim, upsample=upsample,
                name=f"decode_{i}", dtype=self.dtype,
            )
            for i, (dim_in, dim_out, upsample) in enumerate(self._SPECS)
        ]
        self.generator = Generator(cfg, name="generator", dtype=self.dtype)

    def trunk(self, asr, f0_curve, n_curve, s, frame_mask=None):
        """-> (x [B,2F,512], f0_curve_masked [B,2F], cur_mask [B,2F])."""
        if frame_mask is not None:
            mask2 = jnp.repeat(frame_mask, 2, axis=1).astype(f0_curve.dtype)
            f0_curve = f0_curve * mask2
            n_curve = n_curve * mask2
        f0 = self.f0_conv(f0_curve[..., None])
        n = self.n_conv(n_curve[..., None])
        x = jnp.concatenate([asr, f0, n], axis=-1)
        x = self.encode(x, s, frame_mask)
        asr_res = self.asr_res(asr)

        residual = True
        cur_mask = frame_mask
        for block, (_, _, upsample) in zip(self.decode_blocks, self._SPECS):
            if residual:
                x = jnp.concatenate([x, asr_res, f0, n], axis=-1)
            x = block(x, s, cur_mask)
            if upsample:
                residual = False
                if cur_mask is not None:
                    cur_mask = jnp.repeat(cur_mask, 2, axis=1)
        return x, f0_curve, cur_mask

    def generate(self, x, s, f0_curve, cur_mask=None, rng=None,
                 rad_offset=None):
        return self.generator(x, s, f0_curve, cur_mask, rng, rad_offset)

    def __call__(self, asr, f0_curve, n_curve, s, frame_mask=None, rng=None):
        """asr [B,F,hidden], f0/n [B,2F], s [B,style] -> audio [B, F*600]."""
        x, f0_curve, cur_mask = self.trunk(
            asr, f0_curve, n_curve, s, frame_mask
        )
        return self.generate(x, s, f0_curve, cur_mask, rng)
