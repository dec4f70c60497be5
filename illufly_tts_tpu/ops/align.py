# -*- coding: utf-8 -*-
"""Batched duration -> frame alignment, no host loops.

The reference builds a one-hot alignment matrix per item in a Python loop
with ``repeat_interleave`` (reference: src/illufly_tts/core/kmodel.py:108-125)
— dynamic shapes, host-bound. TPU-native replacement: for a fixed frame
budget F, compute each frame's source token index by comparing the frame
position against the cumulative duration boundaries (one [B,F,T] compare +
reduce on the VPU), then gather token features. Static shapes, fully batched.
"""
from __future__ import annotations

import jax.numpy as jnp


def frame_token_indices(durations: jnp.ndarray, num_frames: int) -> jnp.ndarray:
    """durations [B,T] (int frames per token) -> token index per frame [B,F].

    Frame j belongs to token i iff cumsum(d)[i-1] <= j < cumsum(d)[i].
    Frames beyond sum(d) clamp to the last valid token (callers mask them).
    """
    cum = jnp.cumsum(durations, axis=-1)                        # [B,T]
    frame_pos = jnp.arange(num_frames, dtype=cum.dtype)          # [F]
    # index = number of boundaries <= frame position
    idx = (frame_pos[None, :, None] >= cum[:, None, :]).sum(-1)  # [B,F]
    return jnp.minimum(idx, durations.shape[-1] - 1)


def expand_by_duration(
    features: jnp.ndarray, durations: jnp.ndarray, num_frames: int
) -> jnp.ndarray:
    """Gather token features to frames: [B,T,C] x [B,T] -> [B,F,C]."""
    idx = frame_token_indices(durations, num_frames)             # [B,F]
    return jnp.take_along_axis(features, idx[..., None], axis=1)


def frame_mask(durations: jnp.ndarray, num_frames: int) -> jnp.ndarray:
    """[B,T] -> [B,F] validity mask (1 for frames < sum durations)."""
    total = durations.sum(axis=-1, keepdims=True)                # [B,1]
    frame_pos = jnp.arange(num_frames, dtype=total.dtype)[None, :]
    return (frame_pos < total).astype(jnp.float32)
