# -*- coding: utf-8 -*-
"""Pallas TPU kernel: single-read fused AdaIN-affine + Snake + dilated conv.

Round-3 successor to ``fused_conv.adain_snake_conv``. That kernel lost to
XLA (0.81-0.91x at the serving inventory) because its halo came from a
second BlockSpec over the same input — every block was DMA'd twice, which
cancelled the fusion's round-trip saving on an HBM-bound op.

This version reads each input block exactly ONCE:

- the TPU grid executes sequentially on one core, so VMEM scratch persists
  across grid steps. Step (b, i) computes the elementwise stage
  h_i = mask * snake(x_i * scale + shift) for its own block, then emits the
  CONV OUTPUT FOR BLOCK i-1, whose window [i*lb - pad, i*lb + pad) is
  assembled from scratch: the tail of h_{i-2} (left halo), h_{i-1}, and the
  head of h_i (right halo). One extra grid step per batch row flushes the
  final block.
- all input DMAs are regular aligned BlockSpecs (no halo overlap, no sliced
  HBM reads — the pattern Mosaic compiles well on v5e).
- traffic per op: read x once + write y once (+ the stats pass outside),
  vs 2 reads + 1 write for the round-2 kernel and ~2 round-trips for XLA's
  separate elementwise+conv schedule.
- the carry resets at i == 0 (left edge = conv zero-padding), so batch rows
  are independent even though scratch outlives them.

Semantics are identical to ``fused_conv.adain_snake_conv_reference``:
``conv1d(mask * snake(x*scale + shift), w) + b`` with centered zero
padding, f32 accumulation, output in x.dtype.

Reference parity target: the iSTFTNet generator residual blocks
(model/layers.py::AdaSnakeResBlock; reference uses the external kokoro
package's torch AdaINResBlock1 — SURVEY C21). STATUS: measured on the real
chip by tests/test_pallas.py + the bench campaign; see ops/pallas/README
note in the docstring of fused_conv.py for the decision record.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128  # minor-dim alignment quantum; also the carried halo width


def _kernel(x_ref, m_ref, scale_ref, shift_ref, alpha_ref, w_ref, b_ref,
            out_ref, hprev_ref, tail_ref, *, k, dilation, lb, grid_l,
            out_dtype):
    li = pl.program_id(1)
    pad = ((k - 1) * dilation) // 2

    # --- elementwise stage for THIS block (skipped on the flush step) ----
    @pl.when(li < grid_l)
    def _elementwise():
        x = x_ref[0].astype(jnp.float32)           # [C, lb]
        scale = scale_ref[0]                        # [C, 1] f32
        shift = shift_ref[0]
        alpha = alpha_ref[:]                        # [C, 1] f32
        xn = x * scale + shift
        h = xn + (1.0 / alpha) * jnp.square(jnp.sin(alpha * xn))
        hprev_ref[1] = (h * m_ref[0]).astype(hprev_ref.dtype)

    @pl.when(li == grid_l)
    def _zero_right_halo():
        # flush step: block grid_l-1's right halo is the sequence's zero
        # padding, but slot 1 still holds h_{grid_l-1} from the previous
        # step's rotation — clear it before the emit below reads its head
        hprev_ref[1] = jnp.zeros_like(hprev_ref[1])

    @pl.when(li == 0)
    def _reset_carry():
        # left edge of a batch row: the halo is conv zero-padding, and the
        # scratch still holds the previous row's data — clear it
        tail_ref[...] = jnp.zeros_like(tail_ref)
        hprev_ref[0] = jnp.zeros_like(hprev_ref[0])

    # --- emit conv output for the PREVIOUS block ------------------------
    @pl.when(li >= 1)
    def _emit():
        # window [ (li-1)*lb - pad, li*lb + pad ) over h, assembled from
        # carried scratch; h_i's head supplies the right halo (zeros on the
        # flush step, matching the conv's right zero padding)
        window = jnp.concatenate(
            [
                tail_ref[:, LANE - pad:],
                hprev_ref[0],
                hprev_ref[1, :, :pad],
            ],
            axis=-1,
        )
        acc = jnp.zeros((w_ref.shape[2], lb), jnp.float32)
        for t in range(k):
            off = t * dilation
            acc = acc + jax.lax.dot_general(
                w_ref[t], window[:, off: off + lb],
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        out_ref[0] = (acc + b_ref[:][:, None]).astype(out_dtype)

    # --- rotate the carry: h_{i-1} -> tail + hprev slot 0 ---------------
    tail_ref[...] = hprev_ref[0, :, lb - LANE:]
    hprev_ref[0] = hprev_ref[1]


@partial(jax.jit, static_argnames=("kernel", "dilation", "block_len",
                                   "interpret"))
def adain_snake_conv_carry(
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
    """mask(snake(x*scale+shift)) convolved with w -> [B, C_out, L].

    Single-read carry-scratch schedule (see module docstring)."""
    batch, c_in, length = x.shape
    k, c_in2, c_out = w.shape
    assert k == kernel and c_in2 == c_in
    pad = ((kernel - 1) * dilation) // 2
    assert pad <= LANE, (kernel, dilation)

    lb = min(block_len, -(-length // LANE) * LANE)
    lb = max(2 * LANE, -(-lb // LANE) * LANE)
    grid_l = pl.cdiv(length, lb)
    pad_tail = grid_l * lb - length

    dtype = x.dtype
    x_p = jnp.pad(x, ((0, 0), (0, 0), (0, pad_tail)))
    m_p = jnp.pad(
        mask.astype(jnp.float32)[:, None, :],
        ((0, 0), (0, 0), (0, pad_tail)),
    )

    # the flush step (li == grid_l) re-reads block grid_l - 1; its
    # elementwise stage is @pl.when'd off, so the DMA cost is one block
    # per batch row — amortized away at serving lengths
    blk_in = lambda bi, li: (bi, 0, jnp.minimum(li, grid_l - 1))
    blk_out = lambda bi, li: (bi, 0, jnp.maximum(li, 1) - 1)
    out = pl.pallas_call(
        partial(_kernel, k=kernel, dilation=dilation, lb=lb,
                grid_l=grid_l, out_dtype=dtype),
        grid=(batch, grid_l + 1),
        in_specs=[
            pl.BlockSpec((1, c_in, lb), blk_in),
            pl.BlockSpec((1, 1, lb), blk_in),
            pl.BlockSpec((1, c_in, 1), lambda bi, li: (bi, 0, 0)),
            pl.BlockSpec((1, c_in, 1), lambda bi, li: (bi, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # alpha
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bias
        ],
        out_specs=pl.BlockSpec((1, c_out, lb), blk_out),
        out_shape=jax.ShapeDtypeStruct((batch, c_out, grid_l * lb), dtype),
        scratch_shapes=[
            # slot 0: h_{i-1}; slot 1: h_i (written by the elementwise
            # stage, consumed as the right halo, then rotated into slot 0)
            pltpu.VMEM((2, c_in, lb), dtype),
            pltpu.VMEM((c_in, LANE), dtype),
        ],
        interpret=interpret,
    )(x_p, m_p,
      scale.astype(jnp.float32)[:, :, None],
      shift.astype(jnp.float32)[:, :, None],
      alpha.astype(jnp.float32).reshape(c_in, 1),
      w.astype(dtype), b.astype(jnp.float32))
    return out[:, :, :length]
