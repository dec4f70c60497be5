# -*- coding: utf-8 -*-
"""Pallas TPU kernel: fused iSTFT (polar -> basis matmul -> window ->
overlap-add), the vocoder's final HBM-bound op.

Why a kernel: the jnp reference (ops/stft.py) materializes [B, F, n_fft]
frame tensors in HBM (4x the audio size at n_fft=20/hop=5, plus gather
traffic) before the overlap-add. Here each grid step DMAs one (mag, phase)
frame block (with a chunks-1 frame halo) into VMEM, reconstructs its audio
samples entirely on-chip, and writes only the final waveform — every output
sample is computed fully within its block, so there is no cross-block
accumulation.

A jnp reference implementation lives in ops/stft.py; test_pallas.py checks
allclose between the two.
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


def _kernel(mag_hbm, phase_hbm, env_ref, cos_ref, sin_ref, out_ref,
            mag_vmem, phase_vmem, sems, *, n_fft, hop, fpb):
    b = pl.program_id(0)
    f = pl.program_id(1)
    chunks = n_fft // hop
    halo = chunks - 1
    start = f * fpb  # into the halo-padded frame axis

    mag_dma = pltpu.make_async_copy(
        mag_hbm.at[b, pl.ds(start, fpb + halo), :],
        mag_vmem,
        sems.at[0],
    )
    phase_dma = pltpu.make_async_copy(
        phase_hbm.at[b, pl.ds(start, fpb + halo), :],
        phase_vmem,
        sems.at[1],
    )
    mag_dma.start()
    phase_dma.start()
    mag_dma.wait()
    phase_dma.wait()

    re = mag_vmem[:] * jnp.cos(phase_vmem[:])
    im = mag_vmem[:] * jnp.sin(phase_vmem[:])
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
    pad_tail = grid_f * fpb - num_frames

    mag_p = jnp.pad(
        mag.astype(jnp.float32), ((0, 0), (halo, pad_tail), (0, 0))
    )
    phase_p = jnp.pad(
        phase.astype(jnp.float32), ((0, 0), (halo, pad_tail), (0, 0))
    )
    env = jnp.asarray(_envelope(num_frames, n_fft, hop))
    env_p = jnp.pad(env, (0, pad_tail * hop)).reshape(grid_f * fpb, hop)
    cos_b, sin_b = _host_bases(n_fft)

    out = pl.pallas_call(
        partial(_kernel, n_fft=n_fft, hop=hop, fpb=fpb),
        grid=(batch, grid_f),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # mag stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),   # phase stays in HBM
            pl.BlockSpec(
                (fpb, hop), lambda b, f: (f, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # cos basis
            pl.BlockSpec(memory_space=pltpu.VMEM),  # sin basis
        ],
        out_specs=pl.BlockSpec(
            (1, fpb, hop), lambda b, f: (b, f, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(
            (batch, grid_f * fpb, hop), jnp.float32
        ),
        scratch_shapes=[
            pltpu.VMEM((fpb + halo, k), jnp.float32),
            pltpu.VMEM((fpb + halo, k), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(mag_p, phase_p, env_p, jnp.asarray(cos_b), jnp.asarray(sin_b))
    out = out.reshape(batch, grid_f * fpb * hop)
    return out[:, : num_frames * hop]
