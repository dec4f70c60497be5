# -*- coding: utf-8 -*-
"""Measure adain_snake_conv_carry vs XLA (and optionally the round-2
kernel) on the real chip, at the generator's serving shape inventory.

Methodology (memory: tpu-bench-pitfalls): chain REP iterations inside one
jit via lax.scan with the op's OUTPUT feeding the next iteration's input
(defeats both the ~30 ms/dispatch tunnel overhead and XLA's hoisting of
loop-invariant bodies). Median of 3 timed calls.

Run from /root/repo (no PYTHONPATH — breaks axon plugin registration).
Pass --r2 to also measure the round-2 double-read kernel.
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
# (C, L, k, d) — the generator resblock inventory at b32 / F=512 serving
# shapes (vocoder.py: stage 0 C=256 L=F*10, stage 1 C=128 L=F*60)
CONFIGS = [
    (128, 30720, 3, 1),
    (128, 30720, 7, 3),
    (128, 30720, 11, 5),
    (256, 5120, 11, 5),
]


def say(msg):
    print(msg, flush=True)


def timed(fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    say(f"    (compile+first {time.perf_counter() - t0:.1f}s)")
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    say(f"devices: {jax.devices()}")
    with_r2 = "--r2" in sys.argv
    dtype = jnp.bfloat16
    for C, L, k, d in CONFIGS:
        say(f"config C{C} L{L} k{k} d{d}: building inputs...")
        rng = np.random.RandomState(0)
        x = jnp.asarray(
            rng.standard_normal((B, C, L)).astype(np.float32) * 0.3, dtype
        )
        mask = jnp.ones((B, L), jnp.float32)
        scale = jnp.asarray(rng.standard_normal((B, C)).astype(np.float32)
                            * 0.2 + 1)
        shift = jnp.asarray(rng.standard_normal((B, C)).astype(np.float32)
                            * 0.1)
        alpha = jnp.asarray(rng.rand(C).astype(np.float32) + 0.5)
        w = jnp.asarray(rng.standard_normal((k, C, C)).astype(np.float32)
                        * 0.02, dtype)
        bias = jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.1)
        jax.block_until_ready(x)
        say("  inputs on device")

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
            "carry": partial(adain_snake_conv_carry, kernel=k, dilation=d),
            "carry2048": partial(adain_snake_conv_carry, kernel=k,
                                 dilation=d, block_len=2048),
        }
        if with_r2:
            ops["r2_kernel"] = partial(adain_snake_conv, kernel=k,
                                       dilation=d)
        # traffic floor: read x + write y once per iteration, bf16
        bytes_min = 2 * B * C * L * 2
        res = {}
        for name, op in ops.items():
            say(f"  {name}: compiling/running...")
            try:
                t = timed(chain(op), x) / REP
            except Exception as exc:  # compile failure etc.
                say(f"  C{C} L{L} k{k} d{d} {name}: FAILED {exc}")
                continue
            res[name] = t
            gbps = bytes_min / t / 1e9
            say(f"  C{C} L{L} k{k} d{d} {name}: {t * 1e3:7.2f} ms "
                f"({gbps:6.1f} GB/s vs 216 floor)")
        if "xla" in res and "carry" in res:
            best = min(res.get("carry", 9e9), res.get("carry2048", 9e9))
            say(f"  -> carry speedup vs XLA: {res['xla'] / best:.2f}x")


if __name__ == "__main__":
    main()
