# -*- coding: utf-8 -*-
"""Measure adain_snake_conv_carry vs XLA vs the round-2 kernel on the
real chip, at the generator's serving shape inventory.

Methodology (memory: tpu-bench-pitfalls): chain REP iterations inside one
jit via lax.scan with the op's OUTPUT feeding the next iteration's input
(defeats both the ~30 ms/dispatch tunnel overhead and XLA's hoisting of
loop-invariant bodies). Median of 3 timed calls.

Run from /root/repo (no PYTHONPATH — breaks axon plugin registration).
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from illufly_tts_tpu.ops.pallas.carry_conv import adain_snake_conv_carry
from illufly_tts_tpu.ops.pallas.fused_conv import (
    adain_snake_conv,
    adain_snake_conv_reference,
)

REP = 20
B = 32
CONFIGS = [
    # (C, L, k, d) — generator resblock inventory at serving shapes
    (128, 61440, 3, 1),
    (128, 61440, 7, 3),
    (128, 61440, 11, 5),
    (256, 10240, 11, 5),
]


def timed(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    print("devices:", jax.devices())
    dtype = jnp.bfloat16
    for C, L, k, d in CONFIGS:
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(B, C, L).astype(np.float32) * 0.3, dtype)
        mask = jnp.ones((B, L), jnp.float32)
        scale = jnp.asarray(rng.randn(B, C).astype(np.float32) * 0.2 + 1)
        shift = jnp.asarray(rng.randn(B, C).astype(np.float32) * 0.1)
        alpha = jnp.asarray(rng.rand(C).astype(np.float32) + 0.5)
        w = jnp.asarray(rng.randn(k, C, C).astype(np.float32) * 0.02, dtype)
        bias = jnp.asarray(rng.randn(C).astype(np.float32) * 0.1)

        def chain(op):
            @jax.jit
            def run(x0):
                def body(c, _):
                    y = op(c, mask, scale, shift, alpha, w, bias)
                    # thread the carry so the body can't be hoisted
                    return (x0 + y * jnp.asarray(1e-3, dtype)), None

                c, _ = jax.lax.scan(body, x0, None, length=REP)
                return c

            return run

        ops = {
            "xla": partial(adain_snake_conv_reference, kernel=k, dilation=d),
            "r2_kernel": partial(adain_snake_conv, kernel=k, dilation=d),
            "carry": partial(adain_snake_conv_carry, kernel=k, dilation=d),
            "carry2048": partial(adain_snake_conv_carry, kernel=k,
                                 dilation=d, block_len=2048),
        }
        # traffic floor: read x + write y once per iteration, bf16
        bytes_min = 2 * B * C * L * 2
        res = {}
        for name, op in ops.items():
            try:
                t = timed(chain(op), x) / REP
            except Exception as exc:  # compile failure etc.
                print(f"C{C} L{L} k{k} d{d} {name}: FAILED {exc}")
                continue
            res[name] = t
            gbps = bytes_min / t / 1e9
            print(f"C{C} L{L} k{k} d{d} {name}: {t * 1e3:7.2f} ms "
                  f"({gbps:6.1f} GB/s vs 216 floor)")
        if "xla" in res and "carry" in res:
            best = min(res.get("carry", 9e9), res.get("carry2048", 9e9))
            print(f"  -> carry speedup vs XLA: {res['xla'] / best:.2f}x")


if __name__ == "__main__":
    main()
