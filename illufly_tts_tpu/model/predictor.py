# -*- coding: utf-8 -*-
"""Style-conditioned duration / prosody predictor.

Role of ``self.predictor`` in the reference
(src/illufly_tts/core/kmodel.py:94-103, 132-133): DurationEncoder
(LSTM + AdaLayerNorm stack with style concat), duration projection
(sigmoid-sum over max_dur bins), and F0Ntrain (shared BiLSTM + AdainResBlk1d
towers for F0 and energy at 2x frame rate).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .config import KokoroConfig
from .layers import LSTM, AdaLayerNorm, AdainResBlk1d, Conv1d


class DurationEncoder(nn.Module):
    config: KokoroConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, d_en, style, mask):
        """d_en [B,T,hidden], style [B,style_dim] -> [B,T,hidden+style]."""
        cfg = self.config
        m = mask[..., None].astype(self.dtype)
        s_seq = jnp.broadcast_to(
            style[:, None, :], (d_en.shape[0], d_en.shape[1], cfg.style_dim)
        ).astype(self.dtype)
        x = d_en
        for i in range(3):
            x = jnp.concatenate([x, s_seq], axis=-1) * m
            x = LSTM(
                cfg.hidden_dim // 2, name=f"lstm_{i}", dtype=self.dtype
            )(x, mask)
            x = AdaLayerNorm(
                cfg.hidden_dim, name=f"adaln_{i}", dtype=self.dtype
            )(x, style)
            x = x * m
        return jnp.concatenate([x, s_seq], axis=-1) * m


class ProsodyPredictor(nn.Module):
    config: KokoroConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.config
        self.text_encoder = DurationEncoder(cfg, name="duration_encoder",
                                            dtype=self.dtype)
        self.lstm = LSTM(cfg.hidden_dim // 2, name="lstm", dtype=self.dtype)
        self.duration_proj = nn.Dense(cfg.max_dur, name="duration_proj",
                                      dtype=self.dtype)
        self.shared = LSTM(cfg.hidden_dim // 2, name="shared",
                           dtype=self.dtype)
        h = cfg.hidden_dim
        s = cfg.style_dim
        self.f0_blocks = [
            AdainResBlk1d(h, h, s, name="f0_0", dtype=self.dtype),
            AdainResBlk1d(h, h // 2, s, upsample=True, name="f0_1",
                          dtype=self.dtype),
            AdainResBlk1d(h // 2, h // 2, s, name="f0_2", dtype=self.dtype),
        ]
        self.n_blocks = [
            AdainResBlk1d(h, h, s, name="n_0", dtype=self.dtype),
            AdainResBlk1d(h, h // 2, s, upsample=True, name="n_1",
                          dtype=self.dtype),
            AdainResBlk1d(h // 2, h // 2, s, name="n_2", dtype=self.dtype),
        ]
        self.f0_proj = Conv1d(1, 1, name="f0_proj", dtype=self.dtype)
        self.n_proj = Conv1d(1, 1, name="n_proj", dtype=self.dtype)

    def encode_durations(self, d_en, style, mask):
        """-> (durations [B,T] float frames, d [B,T,hidden+style])."""
        d = self.text_encoder(d_en, style, mask)
        x = self.lstm(d, mask)
        logits = self.duration_proj(x)                    # [B,T,max_dur]
        duration = nn.sigmoid(logits).sum(axis=-1)        # [B,T]
        return duration * mask.astype(duration.dtype), d

    def f0n_train(self, en, style, frame_mask=None):
        """en [B,F,hidden+style] -> (F0 [B,2F], N [B,2F])."""
        x = self.shared(en, frame_mask)

        def tower(blocks, proj):
            h = x
            m = frame_mask
            for block in blocks:
                h = block(h, style, m)
                if block.upsample and m is not None:
                    m = jnp.repeat(m, 2, axis=1)
            return proj(h)[..., 0], m

        f0, _ = tower(self.f0_blocks, self.f0_proj)
        n, _ = tower(self.n_blocks, self.n_proj)
        return f0, n
