# -*- coding: utf-8 -*-
"""Pallas TPU kernel: fused iSTFT (polar -> basis matmul -> window ->
overlap-add), the vocoder's final HBM-bound op.

Why a kernel: the jnp reference (ops/stft.py) materializes [B, F, n_fft]
frame tensors in HBM (4x the audio size at n_fft=20/hop=5, plus gather
traffic) before the overlap-add. Here each grid step reads one (mag, phase)
frame block into VMEM, reconstructs its audio samples entirely on-chip, and
writes only the final waveform — every output sample is computed fully
within its block, so there is no cross-block accumulation.

Halo handling: frame f's audio needs frames [f-halo, f]. The input is
front-padded by `halo` frames and each grid step reads TWO regular blocks
of the same array — its own (index f) and its successor (index f+1), whose
first `halo` rows complete the window. Regular BlockSpecs keep Mosaic happy
with the K=11 minor dim (sliced HBM DMAs would need 128-aligned slices —
the round-1 manual-DMA design failed to compile on real v5e hardware).

A jnp reference implementation lives in ops/stft.py; test_pallas.py checks
allclose between the two (interpret mode on CPU, real kernel on TPU).

STATUS: opt-in (``KokoroConfig.use_pallas_istft``), NOT the default —
measured slower than the XLA reference at serving shapes on real
hardware (round 2, v5e-1 via axon, [32, 30720, 11] mag/phase: XLA ~4 ms
vs Pallas ~15 ms once the ~30 ms/dispatch tunnel overhead is factored
out; the dense-basis matmul form in ops/stft.py is already MXU-shaped
and XLA fuses the magnitude/phase trig into it). Kept as a tested
Pallas exemplar; re-evaluate if n_fft/hop ever grow enough that the
[B, F, n_fft] frame materialization dominates.
"""
from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..stft import _bases, hann


@lru_cache(maxsize=None)
def _host_bases(n_fft: int):
    _, _, inv_cos, inv_sin = _bases(n_fft)  # [K, n_fft]
    win = np.asarray(hann(n_fft), np.float32)
    return (
        np.asarray(inv_cos, np.float32) * win[None, :],
        np.asarray(inv_sin, np.float32) * win[None, :],
    )


@lru_cache(maxsize=None)
def _envelope(num_frames: int, n_fft: int, hop: int) -> np.ndarray:
    """1 / (summed squared hann envelope) per output sample (torch.istft
    normalization), truncated to num_frames * hop samples."""
    win = np.asarray(hann(n_fft), np.float64)
    length = (num_frames - 1) * hop + n_fft
    env = np.zeros(length)
    for f in range(num_frames):
        env[f * hop: f * hop + n_fft] += win * win
    env = 1.0 / np.maximum(env, 1e-8)
    return env[: num_frames * hop].astype(np.float32)


def _kernel(mag_ref, mag_nxt, phase_ref, phase_nxt, env_ref, cos_ref,
            sin_ref, out_ref, *, n_fft, hop, fpb):
    chunks = n_fft // hop
    halo = chunks - 1
    mag = jnp.concatenate([mag_ref[0], mag_nxt[0, :halo]], axis=0)
    phase = jnp.concatenate([phase_ref[0], phase_nxt[0, :halo]], axis=0)
    re = mag * jnp.cos(phase)
    im = mag * jnp.sin(phase)
    # [fpb+halo, K] @ [K, n_fft] (windowed bases) — stays in VMEM
    frames = jnp.dot(
        re, cos_ref[:], preferred_element_type=jnp.float32
    ) + jnp.dot(im, sin_ref[:], preferred_element_type=jnp.float32)

    acc = jnp.zeros((fpb, hop), jnp.float32)
    for j in range(chunks):
        acc = acc + frames[halo - j: halo - j + fpb, j * hop:(j + 1) * hop]
    out_ref[0] = acc * env_ref[:]


@partial(jax.jit, static_argnames=("n_fft", "hop", "frames_per_block",
                                   "interpret"))
def istft_pallas(
    mag: jnp.ndarray,
    phase: jnp.ndarray,
    n_fft: int = 20,
    hop: int = 5,
    frames_per_block: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """(mag, phase) [B, F, K] -> audio [B, F * hop]; matches ops.stft.istft
    (torch.istft semantics) truncated to F*hop samples, which is exactly
    what the Generator consumes."""
    batch, num_frames, k = mag.shape
    assert k == n_fft // 2 + 1, (k, n_fft)
    chunks = n_fft // hop
    halo = chunks - 1
    # Mosaic tiling: block sublane dims must be multiples of 8
    fpb = min(frames_per_block, num_frames)
    fpb = max(128, -(-fpb // 128) * 128)
    grid_f = pl.cdiv(num_frames, fpb)
    # front halo + tail padding up to one FULL extra block so the f+1
    # halo read of the last step stays in bounds
    pad_tail = (grid_f + 1) * fpb - num_frames

    mag_p = jnp.pad(
        mag.astype(jnp.float32), ((0, 0), (halo, pad_tail - halo), (0, 0))
    )
    phase_p = jnp.pad(
        phase.astype(jnp.float32), ((0, 0), (halo, pad_tail - halo), (0, 0))
    )
    env = jnp.asarray(_envelope(num_frames, n_fft, hop))
    env_p = jnp.pad(
        env, (0, grid_f * fpb * hop - num_frames * hop)
    ).reshape(grid_f * fpb, hop)
    cos_b, sin_b = _host_bases(n_fft)

    blk = lambda b, f: (b, f, 0)          # own block
    blk_next = lambda b, f: (b, f + 1, 0)  # halo source
    out = pl.pallas_call(
        partial(_kernel, n_fft=n_fft, hop=hop, fpb=fpb),
        grid=(batch, grid_f),
        in_specs=[
            pl.BlockSpec((1, fpb, k), blk),
            pl.BlockSpec((1, fpb, k), blk_next),
            pl.BlockSpec((1, fpb, k), blk),
            pl.BlockSpec((1, fpb, k), blk_next),
            pl.BlockSpec((fpb, hop), lambda b, f: (f, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # cos basis
            pl.BlockSpec(memory_space=pltpu.VMEM),  # sin basis
        ],
        out_specs=pl.BlockSpec((1, fpb, hop), lambda b, f: (b, f, 0)),
        out_shape=jax.ShapeDtypeStruct(
            (batch, grid_f * fpb, hop), jnp.float32
        ),
        interpret=interpret,
    )(mag_p, mag_p, phase_p, phase_p, env_p,
      jnp.asarray(cos_b), jnp.asarray(sin_b))
    out = out.reshape(batch, grid_f * fpb * hop)
    return out[:, : num_frames * hop]
