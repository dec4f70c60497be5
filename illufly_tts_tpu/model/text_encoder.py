# -*- coding: utf-8 -*-
"""Text encoder: phoneme embedding -> convs -> BiLSTM
(role of ``self.text_encoder`` in reference src/illufly_tts/core/kmodel.py:138)."""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .config import KokoroConfig
from .layers import LSTM, Conv1d, leaky_relu


class TextEncoder(nn.Module):
    config: KokoroConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, mask):
        cfg = self.config
        m = mask[..., None].astype(self.dtype)
        x = nn.Embed(
            cfg.n_token, cfg.hidden_dim, name="embed", dtype=self.dtype
        )(input_ids)
        for i in range(cfg.n_layer):
            x = Conv1d(
                cfg.hidden_dim, cfg.text_encoder_kernel_size,
                name=f"conv_{i}", dtype=self.dtype,
            )(x * m)
            x = nn.LayerNorm(name=f"ln_{i}", dtype=self.dtype)(x)
            x = leaky_relu(x)
            x = x * m
        x = LSTM(cfg.hidden_dim // 2, name="lstm", dtype=self.dtype)(x, mask)
        return x * m
