# -*- coding: utf-8 -*-
"""Pallas TPU kernel: fused AdaIN-affine + Snake + dilated 1-D conv.

The iSTFTNet generator's residual blocks (model/layers.py::AdaSnakeResBlock)
dominate decode time (~95% of stage B; measured 27% MXU / 24% HBM on v5e —
neither bound, i.e. XLA spends the time materializing the normalized+
activated tensor to HBM before every conv and running the conv at poor
utilization). This kernel keeps the activation in VMEM and turns each conv
tap into a full-width MXU matmul:

- layout: channels on sublanes, length on lanes (x is passed transposed
  [B, C, L]); a k-tap dilated conv is then k static lane-shifted views,
  each contracted [C_in, Lb] x [C_in, C_out] on the MXU — contraction dim
  C_in = 128/256, the shape the MXU wants;
- halo: the input is front-padded by one 128-lane tile and each grid step
  reads its own block plus its successor (regular BlockSpecs — sliced HBM
  DMAs would need 128-aligned slices, which killed the round-1 manual-DMA
  design on real v5e); the centered-conv halo (k-1)*d/2 <= 25 lanes lives
  inside that overlap;
- fused elementwise: folded AdaIN affine (scale/shift per [B, C], computed
  from the instance-norm stats outside — one cheap XLA reduction), Snake
  x + sin^2(ax)/a, and the frame mask, all applied in VMEM before the taps.

jnp reference: ``adain_snake_conv_reference``; tests/test_pallas.py checks
allclose (interpret on CPU, real kernel on TPU).

STATUS: opt-in, NOT the default path — measured slower than XLA on real
hardware. Round-2 measurement campaign (chained x20 dispatches to defeat
the ~30 ms/dispatch tunnel overhead that had polluted round-1 numbers;
v5e-1 via axon, bf16):
- chip reality: ~216 GB/s HBM, ~85 TFLOP/s bf16 MXU (both measured;
  well below v5e paper specs — utilization numbers in round-1 notes used
  the paper peaks and were over-optimistic about headroom);
- XLA's dilated conv alone runs at ~MXU peak (4.30 ms at B32 C128
  L30720 k11 vs 4.2 ms roofline), and the separate adain+snake pass
  is VPU-sin + one HBM round-trip (~3 ms);
- this kernel across the model's real (C, L, k, d) inventory:
  0.81x (k3 d1) / 0.83x (k7 d3) / 0.91x (k11 d5) at [32, 128, 61440],
  0.89x (k11) at [32, 256, 10240] — the halo double-read (each block is
  fetched as its own block AND as its neighbor's successor) cancels the
  round-trip saving, and the in-kernel serial VPU->MXU order can't beat
  XLA's overlapped separate passes on an HBM-bound op.
Conclusion: the XLA path IS the TPU-optimal form for this op at serving
shapes; the kernel is kept as a tested, working Pallas exemplar (and for
re-evaluation on hardware with a different byte:flop balance).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128  # front-pad tile; also the minimum lane alignment


def _kernel(x_ref, x_nxt, m_ref, m_nxt, scale_ref, shift_ref, alpha_ref,
            w_ref, b_ref, out_ref, *, k, dilation, lb, out_dtype):
    pad = ((k - 1) * dilation) // 2
    off0 = LANE - pad
    tail = LANE + pad  # lanes needed from the successor block
    # slice each source down to the conv window BEFORE gluing — copies
    # ~lb lanes per block instead of ~3*lb (concat-then-slice), and the
    # elementwise (f32) runs over lb+2*pad lanes, not 2*lb
    x = jnp.concatenate(
        [x_ref[0, :, off0:], x_nxt[0, :, :tail]], axis=-1)
    m = jnp.concatenate(
        [m_ref[0, :, off0:], m_nxt[0, :, :tail]], axis=-1)

    scale = scale_ref[0]            # [C, 1] f32
    shift = shift_ref[0]
    alpha = alpha_ref[:]            # [C, 1] f32
    xn = x.astype(jnp.float32) * scale + shift
    h = xn + (1.0 / alpha) * jnp.square(jnp.sin(alpha * xn))
    h = (h * m).astype(out_dtype)

    acc = jnp.zeros((w_ref.shape[2], lb), jnp.float32)
    for t in range(k):
        off = t * dilation
        acc = acc + jax.lax.dot_general(
            w_ref[t], h[:, off: off + lb],
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    out_ref[0] = (acc + b_ref[:][:, None]).astype(out_dtype)


@partial(jax.jit, static_argnames=("kernel", "dilation", "block_len",
                                   "interpret"))
def adain_snake_conv(
    x: jnp.ndarray,        # [B, C_in, L] transposed activations
    mask: jnp.ndarray,     # [B, L] frame/sample mask (1.0 = keep)
    scale: jnp.ndarray,    # [B, C_in] folded AdaIN scale
    shift: jnp.ndarray,    # [B, C_in] folded AdaIN shift
    alpha: jnp.ndarray,    # [C_in] snake alpha
    w: jnp.ndarray,        # [k, C_in, C_out]
    b: jnp.ndarray,        # [C_out]
    kernel: int,
    dilation: int = 1,
    block_len: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """mask(snake(x*scale+shift)) convolved with w -> [B, C_out, L]."""
    batch, c_in, length = x.shape
    k, c_in2, c_out = w.shape
    assert k == kernel and c_in2 == c_in
    pad = ((kernel - 1) * dilation) // 2
    assert pad <= LANE, (kernel, dilation)

    lb = min(block_len, -(-length // LANE) * LANE)
    lb = max(2 * LANE, -(-lb // LANE) * LANE)  # halo fits in block overlap
    grid_l = pl.cdiv(length, lb)
    # front 128-lane tile + tail up to one FULL extra block (f+1 read)
    pad_tail = (grid_l + 1) * lb - length

    dtype = x.dtype
    # x stays in its serving dtype (bf16) through HBM — halves kernel read
    # traffic and lets XLA fuse the pad into x's producer
    x_p = jnp.pad(x, ((0, 0), (0, 0), (LANE, pad_tail - LANE)))
    m_p = jnp.pad(
        mask.astype(jnp.float32)[:, None, :],
        ((0, 0), (0, 0), (LANE, pad_tail - LANE)),
    )

    blk = lambda bi, li: (bi, 0, li)
    blk_next = lambda bi, li: (bi, 0, li + 1)
    out = pl.pallas_call(
        partial(_kernel, k=kernel, dilation=dilation, lb=lb,
                out_dtype=dtype),
        grid=(batch, grid_l),
        in_specs=[
            pl.BlockSpec((1, c_in, lb), blk),
            pl.BlockSpec((1, c_in, lb), blk_next),
            pl.BlockSpec((1, 1, lb), blk),
            pl.BlockSpec((1, 1, lb), blk_next),
            pl.BlockSpec((1, c_in, 1), lambda bi, li: (bi, 0, 0)),
            pl.BlockSpec((1, c_in, 1), lambda bi, li: (bi, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # alpha
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bias
        ],
        out_specs=pl.BlockSpec((1, c_out, lb), lambda bi, li: (bi, 0, li)),
        out_shape=jax.ShapeDtypeStruct(
            (batch, c_out, grid_l * lb), dtype
        ),
        interpret=interpret,
    )(x_p, x_p, m_p, m_p,
      scale.astype(jnp.float32)[:, :, None],
      shift.astype(jnp.float32)[:, :, None],
      alpha.astype(jnp.float32).reshape(c_in, 1),
      w.astype(dtype), b.astype(jnp.float32))
    return out[:, :, :length]


def instance_moments(x: jnp.ndarray, mask=None, eps: float = 1e-5):
    """Per-(batch, channel) mean and 1/sqrt(var+eps) over the time axis.

    x is feature-last [B, T, C] (the model's layout); the cheap XLA
    reduction that runs before the transposed-layout kernel.
    """
    if mask is not None:
        m = mask[..., None].astype(x.dtype)
        count = jnp.maximum(m.sum(axis=1), 1.0)
        mean = (x * m).sum(axis=1) / count
        var = (jnp.square(x - mean[:, None, :]) * m).sum(axis=1) / count
    else:
        mean = x.mean(axis=1)
        var = x.var(axis=1)
    return mean, jax.lax.rsqrt(var + eps)


def fold_adain(mean, rstd, gamma, beta):
    """Fold AdaIN (instance norm + style affine) into one scale/shift:
    ``(x - mean)*rstd*(1+gamma) + beta == x*scale + shift``."""
    scale = (1.0 + gamma) * rstd
    return scale, beta - mean * scale


def adain_snake_conv_reference(x, mask, scale, shift, alpha, w, b,
                               kernel, dilation=1):
    """jnp reference with identical semantics (x [B, C, L] transposed)."""
    xn = x.astype(jnp.float32) * scale[:, :, None] + shift[:, :, None]
    a = alpha.astype(jnp.float32).reshape(1, -1, 1)
    h = xn + (1.0 / a) * jnp.square(jnp.sin(a * xn))
    h = h * mask[:, None, :].astype(jnp.float32)
    h = h.astype(x.dtype)
    pad = ((kernel - 1) * dilation) // 2
    y = jax.lax.conv_general_dilated(
        h, w.astype(x.dtype),
        window_strides=(1,),
        padding=[(pad, pad)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NCH", "HIO", "NCH"),
        preferred_element_type=jnp.float32,
    )
    return (y + b.reshape(1, -1, 1)).astype(x.dtype)
