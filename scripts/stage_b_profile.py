#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Where do stage B's ~360 ms go? (round-5 task 3 follow-up)

The int8-weights experiment (scripts/quant_stage_b.py) measured NO time
change — stage B is not weight-bandwidth-bound. This script times the
generator's constituent op classes at their REAL serving shapes to show
what the 0.43 MFU actually is: MXU conv work vs VPU elementwise (snake
activations, AdaIN instance norms) vs the iSTFT head.

Shapes (b32, frame bucket 512 -> 2F=1024 trunk positions):
  upsample 0 (x10): L=10240, ch=256 -> resblocks (k 3/7/11, d 1/3/5)
  upsample 1 (x6):  L=61440, ch=128 -> resblocks
  iSTFT head: [B, 61440, 22] conv_post -> exp/sin -> OLA @ hop 5

Prints one JSON line with per-class times; the sum should land near the
measured generator time (356.7 ms).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def t(jax, fn, args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from illufly_tts_tpu.model.config import KokoroConfig

    cfg = KokoroConfig(dtype=jnp.bfloat16)
    ist = cfg.istftnet
    B = 32
    L0 = 1024  # 2F at frame bucket 512
    out = {"upsample_rates": list(ist.upsample_rates),
           "resblock_kernels": list(ist.resblock_kernel_sizes)}

    import numpy as np

    rng = np.random.RandomState(0)
    total_conv = total_vpu = 0.0
    Ls = []
    L = L0
    ch = ist.upsample_initial_channel
    for i, u in enumerate(ist.upsample_rates):
        L *= u
        ch //= 2
        Ls.append((L, ch))
    for li, (L, ch) in enumerate(Ls):
        x = jnp.asarray(rng.randn(B, L, ch).astype(np.float32), cfg.dtype)
        # one resblock stage = 3 kernel branches x 2 convs x len(dilations)
        n_convs = 0
        conv_t = 0.0
        for k in ist.resblock_kernel_sizes:
            for d in (1, 3, 5):
                w = jnp.asarray(
                    rng.randn(k, ch, ch).astype(np.float32) * 0.02, cfg.dtype
                )
                fn = jax.jit(lambda x, w, d=d: jax.lax.conv_general_dilated(
                    x, w, (1,), "SAME", rhs_dilation=(d,),
                    dimension_numbers=("NHC", "HIO", "NHC"),
                ))
                conv_t += t(jax, fn, (x, w)) * 2  # two convs per branch
                n_convs += 2
        out[f"L{L}_convs_ms"] = round(conv_t * 1e3, 1)
        total_conv += conv_t

        # snake activation (x + sin^2(ax)/a) — same count as convs
        alpha = jnp.ones((ch,), cfg.dtype)
        snake = jax.jit(
            lambda x, a: x + jnp.sin(a * x) ** 2 / (a + 1e-9)
        )
        s_t = t(jax, snake, (x, alpha)) * n_convs
        # AdaIN instance norm over time: 2 per branch conv
        g = jnp.ones((B, 1, ch), cfg.dtype)
        adain = jax.jit(lambda x, g: (
            (x - x.mean(1, keepdims=True))
            / jnp.sqrt(x.var(1, keepdims=True) + 1e-5) * g
        ))
        a_t = t(jax, adain, (x, g)) * n_convs
        out[f"L{L}_snake_ms"] = round(s_t * 1e3, 1)
        out[f"L{L}_adain_ms"] = round(a_t * 1e3, 1)
        total_vpu += s_t + a_t

    # iSTFT head at final rate
    Lf = Ls[-1][0]
    n_fft, hop = ist.gen_istft_n_fft, ist.gen_istft_hop_size
    mag = jnp.asarray(
        rng.rand(B, Lf, n_fft // 2 + 1).astype(np.float32), jnp.float32
    )
    ph = jnp.asarray(
        rng.randn(B, Lf, n_fft // 2 + 1).astype(np.float32), jnp.float32
    )
    from illufly_tts_tpu.ops.stft import istft

    fn = jax.jit(lambda m, p: istft(m, p, n_fft, hop))
    out["istft_ms"] = round(t(jax, fn, (mag, ph)) * 1e3, 1)
    out["sum_conv_ms"] = round(total_conv * 1e3, 1)
    out["sum_vpu_ms"] = round(total_vpu * 1e3, 1)
    out["sum_all_ms"] = round(
        (total_conv + total_vpu) * 1e3 + out["istft_ms"], 1
    )
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main() or 0)
