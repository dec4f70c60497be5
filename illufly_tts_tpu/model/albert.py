# -*- coding: utf-8 -*-
"""ALBERT phoneme encoder (parameter-shared transformer).

Plays the role of the reference's phoneme BERT (``self.bert`` in
src/illufly_tts/core/kmodel.py:70). ALBERT = factorized embedding
(vocab -> 128 -> 768) + ONE transformer layer applied ``num_layers`` times.
TPU notes: attention uses a single fused QKV matmul; the additive mask keeps
shapes static for XLA.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .config import AlbertConfig


class AlbertLayer(nn.Module):
    config: AlbertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attn_bias):
        cfg = self.config
        head_dim = cfg.hidden_size // cfg.num_heads

        qkv = nn.Dense(3 * cfg.hidden_size, name="qkv", dtype=self.dtype)(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            b, t_len, _ = t.shape
            return t.reshape(b, t_len, cfg.num_heads, head_dim)

        q, k, v = heads(q), heads(k), heads(v)
        scale = 1.0 / jnp.sqrt(head_dim).astype(x.dtype)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
        logits = logits + attn_bias  # [B,1,1,T] additive mask
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(
            x.dtype
        )
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        ctx = ctx.reshape(x.shape)
        attn_out = nn.Dense(cfg.hidden_size, name="attn_out", dtype=self.dtype)(
            ctx
        )
        x = nn.LayerNorm(name="ln_attn", dtype=self.dtype)(x + attn_out)

        h = nn.Dense(cfg.intermediate_size, name="ffn_in", dtype=self.dtype)(x)
        # tanh-approximate gelu == HF 'gelu_new', the AlbertConfig
        # default the real Kokoro PLBERT was trained with — exact
        # erf-gelu systematically deviates on converted checkpoints
        h = jax.nn.gelu(h, approximate=True)
        h = nn.Dense(cfg.hidden_size, name="ffn_out", dtype=self.dtype)(h)
        return nn.LayerNorm(name="ln_ffn", dtype=self.dtype)(x + h)


class Albert(nn.Module):
    config: AlbertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, mask: Optional[jnp.ndarray] = None):
        cfg = self.config
        batch, seq = input_ids.shape
        if mask is None:
            mask = jnp.ones((batch, seq), jnp.float32)

        emb = nn.Embed(
            cfg.vocab_size, cfg.embedding_size, name="tok_emb",
            dtype=self.dtype,
        )(input_ids)
        pos = self.param(
            "pos_emb",
            nn.initializers.normal(0.02),
            (cfg.max_position, cfg.embedding_size),
            jnp.float32,
        )
        emb = emb + pos[None, :seq, :].astype(self.dtype)
        emb = nn.LayerNorm(name="ln_emb", dtype=self.dtype)(emb)
        x = nn.Dense(cfg.hidden_size, name="emb_proj", dtype=self.dtype)(emb)

        neg = jnp.asarray(-1e9, self.dtype)
        attn_bias = jnp.where(
            mask[:, None, None, :] > 0, jnp.asarray(0, self.dtype), neg
        )
        layer = AlbertLayer(cfg, name="shared_layer", dtype=self.dtype)
        for _ in range(cfg.num_layers):  # shared parameters (ALBERT)
            x = layer(x, attn_bias)
        return x * mask[..., None].astype(x.dtype)
