# -*- coding: utf-8 -*-
"""Pallas TPU kernel: fused AdaIN + Snake + dilated 1-D conv.

The iSTFTNet generator's residual blocks (model/layers.py::AdaSnakeResBlock)
dominate vocoder time. XLA materializes the normalized+activated tensor to
HBM before every conv (convs don't fuse producers on TPU); this kernel keeps
it in VMEM: each grid step DMAs a haloed input block, applies the folded
AdaIN affine (scale/shift precomputed from instance-norm stats outside),
the Snake activation, and a k-tap dilated conv as k shifted MXU matmuls —
one HBM read + one HBM write per block instead of three passes.

jnp reference: `adain_snake_conv_reference` below; test_pallas.py checks
allclose in interpret mode.

STATUS: experimental. Hardware findings (the model still uses the XLA conv
path, which runs at ~40% MXU):
- DMA extents must be 8-sublane aligned: an unaligned halo FAULTS the TPU
  worker. Fixed below (halo rounded to the sublane tile); k=3/d=1 compiles
  in ~40 s and matches the XLA reference on-chip.
- Unaligned static sublane slices for the taps explode Mosaic's lowering
  (>8 min compiles at k=11/d=5). Replaced with pltpu.roll per tap (f32 —
  Mosaic cannot rotate non-32-bit data); interpret-mode exact, but the
  k=11 compile through this environment's remote Mosaic is still >7 min,
  so it stays opt-in. Round-2: profile the Mosaic pass (likely the 11
  unrolled full-buffer rotates); try a transposed layout with lane-axis
  taps, or fewer taps per kernel invocation (split k).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_hbm, scale_ref, shift_ref, alpha_ref, w_ref, bias_ref,
            out_ref, x_vmem, sem, *, k, dilation, lb, halo, base):
    b = pl.program_id(0)
    block = pl.program_id(1)
    start = block * lb  # into the halo-padded length axis

    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(start, lb + 2 * halo), :],
        x_vmem,
        sem,
    )
    dma.start()
    dma.wait()

    # folded AdaIN: scale = (1+gamma)*rsqrt(var+eps), shift = beta - mean*scale
    xn = x_vmem[:] * scale_ref[0] + shift_ref[0]
    alpha = alpha_ref[:]
    h = xn + (1.0 / alpha) * jnp.square(jnp.sin(alpha * xn))

    # tap accumulation with sublane rolls instead of unaligned slices —
    # unaligned static slices explode Mosaic's shift lowering (>8 min
    # compiles at k=11); a roll per tap lowers cleanly. Rolls stay in f32
    # (Mosaic can't rotate non-32-bit data); casts happen per tap.
    n_rows = h.shape[0]
    if base:
        h = pltpu.roll(h, shift=n_rows - base, axis=0)  # circular left-shift
    acc = jnp.zeros((lb, out_ref.shape[-1]), jnp.float32)
    for t in range(k):
        acc = acc + jnp.dot(
            h[:lb, :].astype(w_ref.dtype),
            w_ref[t],
            preferred_element_type=jnp.float32,
        )
        if t + 1 < k:
            h = pltpu.roll(h, shift=n_rows - dilation, axis=0)
    out_ref[0] = (acc + bias_ref[0, 0].astype(jnp.float32)).astype(
        out_ref.dtype
    )


@partial(
    jax.jit,
    static_argnames=("kernel", "dilation", "block_len", "interpret"),
)
def adain_snake_conv(
    x: jnp.ndarray,        # [B, L, C]
    mean: jnp.ndarray,     # [B, C] instance-norm mean
    rstd: jnp.ndarray,     # [B, C] 1/sqrt(var+eps)
    gamma: jnp.ndarray,    # [B, C] style gain
    beta: jnp.ndarray,     # [B, C] style bias
    alpha: jnp.ndarray,    # [C] snake frequency
    w: jnp.ndarray,        # [k, C, C_out] conv taps
    bias: jnp.ndarray,     # [C_out]
    kernel: int,
    dilation: int = 1,
    block_len: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    batch, length, channels = x.shape
    k = kernel
    # halo rounded up to the 8-sublane tile so the HBM->VMEM DMA extent
    # (lb + 2*halo) stays tile-aligned (unaligned extents fault the worker)
    halo = -(-((k - 1) // 2 * dilation) // 8) * 8
    lb = min(block_len, max(128, -(-length // 128) * 128))
    grid_l = pl.cdiv(length, lb)
    pad_tail = grid_l * lb - length

    compute_dtype = x.dtype
    scale = ((1.0 + gamma) * rstd).astype(jnp.float32)[:, None, :]
    shift = (beta - mean * (1.0 + gamma) * rstd).astype(jnp.float32)[
        :, None, :
    ]
    # conv 'SAME' semantics: padding must be zero AFTER the AdaIN affine,
    # i.e. pad x with p where p*scale + shift == 0
    safe_scale = jnp.where(jnp.abs(scale) < 1e-6, 1e-6, scale)
    pad_val = (-shift / safe_scale).astype(jnp.float32)          # [B,1,C]
    x_f = x.astype(jnp.float32)
    left = jnp.broadcast_to(pad_val, (batch, halo, channels))
    right = jnp.broadcast_to(
        pad_val, (batch, halo + pad_tail, channels)
    )
    x_p = jnp.concatenate([left, x_f, right], axis=1)
    alpha_2d = jnp.asarray(alpha, jnp.float32).reshape(1, channels)
    w = w.astype(compute_dtype)
    bias_3d = jnp.asarray(bias, jnp.float32).reshape(1, 1, -1)
    c_out = w.shape[-1]

    reach = (k - 1) // 2 * dilation
    out = pl.pallas_call(
        partial(_kernel, k=k, dilation=dilation, lb=lb, halo=halo,
                base=halo - reach),
        grid=(batch, grid_l),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),                  # x (HBM)
            pl.BlockSpec((1, 1, channels), lambda b, l: (b, 0, 0),
                         memory_space=pltpu.VMEM),              # scale
            pl.BlockSpec((1, 1, channels), lambda b, l: (b, 0, 0),
                         memory_space=pltpu.VMEM),              # shift
            pl.BlockSpec(memory_space=pltpu.VMEM),              # alpha
            pl.BlockSpec(memory_space=pltpu.VMEM),              # w
            pl.BlockSpec((1, 1, c_out), lambda b, l: (0, 0, 0),
                         memory_space=pltpu.VMEM),              # bias
        ],
        out_specs=pl.BlockSpec(
            (1, lb, c_out), lambda b, l: (b, l, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (batch, grid_l * lb, c_out), compute_dtype
        ),
        scratch_shapes=[
            pltpu.VMEM((lb + 2 * halo, channels), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(x_p, scale, shift, alpha_2d, w, bias_3d)
    return out[:, :length, :]


def adain_snake_conv_reference(
    x, mean, rstd, gamma, beta, alpha, w, bias, kernel, dilation=1
):
    """jnp reference implementation (same math, XLA-scheduled)."""
    scale = (1.0 + gamma) * rstd
    shift = beta - mean * scale
    xn = x * scale[:, None, :] + shift[:, None, :]
    a = alpha.reshape(1, 1, -1)
    h = xn + (1.0 / a) * jnp.square(jnp.sin(a * xn))
    return jax.lax.conv_general_dilated(
        h.astype(x.dtype), w.astype(x.dtype), (1,), "SAME",
        rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"),
    ) + bias.reshape(1, 1, -1)


def instance_moments(x: jnp.ndarray, mask=None, eps: float = 1e-5):
    """Per-(batch, channel) mean and 1/sqrt(var+eps) over the time axis."""
    if mask is not None:
        m = mask[..., None].astype(x.dtype)
        count = jnp.maximum(m.sum(axis=1), 1.0)
        mean = (x * m).sum(axis=1) / count
        var = (jnp.square(x - mean[:, None, :]) * m).sum(axis=1) / count
    else:
        mean = x.mean(axis=1)
        var = x.var(axis=1)
    return mean, jax.lax.rsqrt(var + eps)
