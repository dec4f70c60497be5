#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Stage-B weights-only int8 experiment (round-5 task 3).

Motivation: the honest in-run roofline (BENCH_r04) put stage B — 97% of
device time — at 0.43 MFU / 0.55 HBM fraction: not at any wall, with
nominal ~1.8x headroom. This experiment measures whether int8 weights
(per-output-channel symmetric, dequantized to bf16 in-program) buy any
stage-B time, and what they cost in output fidelity.

Method:
  1. Build the serving Synthesizer (bf16, b32 x t256 x f512) and time the
     real stage-B program (same jit path the scheduler uses).
  2. Decompose: time the decode_prepare program (front + decoder trunk)
     to split stage B into trunk vs generator+iSTFT halves.
  3. Quantize decoder-scope conv/dense kernels to int8 {q, s} pairs and
     time a wrapper program `stage_b(dequant(qparams), ...)` — XLA then
     streams int8 weights from HBM and upcasts on-chip.
  4. Fidelity: float32-format renders baseline vs quantized; report max
     abs sample diff, relative L2, and mel-L1 (audio/mel.py) — the same
     measure the golden-audio gate uses.

Prints one JSON line; paste results into BASELINE.md (ship or reject
with numbers — VERDICT r4 task 3).
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def time_fn(jax, fn, args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def quantize_decoder(params, jnp, min_size=4096):
    """Return (qtree, n_quantized, bytes_before, bytes_after): decoder-
    scope kernels with >= min_size elements become {"q": int8, "s": f32
    per-out-channel} dict leaves; everything else passes through."""
    stats = {"n": 0, "before": 0, "after": 0}

    def walk(tree, in_decoder):
        if isinstance(tree, dict):
            return {
                k: walk(v, in_decoder or k == "decoder")
                for k, v in tree.items()
            }
        w = tree
        if (not in_decoder or not hasattr(w, "ndim") or w.ndim < 2
                or w.size < min_size):
            return w
        wf = np.asarray(w, np.float32)
        axes = tuple(range(wf.ndim - 1))
        amax = np.max(np.abs(wf), axis=axes, keepdims=True)
        s = (amax / 127.0).astype(np.float32)
        s = np.where(s == 0, 1.0, s)
        q = np.clip(np.round(wf / s), -127, 127).astype(np.int8)
        stats["n"] += 1
        stats["before"] += wf.size * 2  # bf16 bytes
        stats["after"] += q.size + s.size * 4
        return {"q": jnp.asarray(q), "s": jnp.asarray(s)}

    return walk(params, False), stats


def dequant(tree, jnp, dtype):
    if isinstance(tree, dict):
        if set(tree.keys()) == {"q", "s"}:
            return tree["q"].astype(dtype) * tree["s"].astype(dtype)
        return {k: dequant(v, jnp, dtype) for k, v in tree.items()}
    return tree


def main():
    import jax
    import jax.numpy as jnp

    from illufly_tts_tpu.engine.synthesizer import Synthesizer
    from illufly_tts_tpu.model.config import KokoroConfig
    from illufly_tts_tpu.model.kokoro import KokoroModel

    batch, tokens, frames = 32, 256, 512
    cfg = KokoroConfig(dtype=jnp.bfloat16)
    synth = Synthesizer(config=cfg, token_buckets=(tokens,),
                        frame_buckets=(frames,))
    synth.register_random_voice("v", seed=7)
    base = "ni↗xau↓ma, tsʰɤ↘ʂɨ↘i↗kɤ↘tʰəst. "
    texts = [(base * 12)[:250]] * batch
    voices = ["v"] * batch

    handle = synth.dispatch(texts, voices)
    stage_b = synth._get_stage_b(batch, tokens, frames, "f32")
    args_b = (synth.params, handle.ids, handle.mask, handle.d,
              handle.pred_dur, handle.ref, handle.pitch)
    jax.block_until_ready(stage_b(*args_b))
    synth.absorb_drain()
    t_base = time_fn(jax, stage_b, args_b)

    # decomposition: front+trunk program (streaming prepare path)
    prep = jax.jit(lambda p, ids, m, d, pd, ref, pi: synth.model.apply(
        p, ids, m, d, pd, ref, frames, pitch=pi,
        method=KokoroModel.decode_prepare,
    ))
    jax.block_until_ready(prep(*args_b))
    t_trunk = time_fn(jax, prep, args_b)

    qparams, stats = quantize_decoder(synth.params, jnp)
    stage_b_q = jax.jit(
        lambda qp, ids, m, d, pd, ref, pi: stage_b(
            dequant(qp, jnp, cfg.dtype), ids, m, d, pd, ref, pi
        )
    )
    args_q = (qparams,) + args_b[1:]
    jax.block_until_ready(stage_b_q(*args_q))
    synth.absorb_drain()
    t_q = time_fn(jax, stage_b_q, args_q)

    # fidelity on the same inputs (f32 outputs)
    a0, _ = stage_b(*args_b)
    a1, _ = stage_b_q(*args_q)
    a0 = np.asarray(a0, np.float32)
    a1 = np.asarray(a1, np.float32)
    max_abs = float(np.max(np.abs(a0 - a1)))
    rel_l2 = float(np.linalg.norm(a1 - a0) / (np.linalg.norm(a0) + 1e-9))
    try:
        from illufly_tts_tpu.audio.mel import mel_l1

        mel = float(np.mean([
            mel_l1(a0[i], a1[i]) for i in range(0, batch, 8)
        ]))
    except Exception:
        mel = None

    print(json.dumps({
        "stage_b_bf16_ms": round(t_base * 1e3, 2),
        "stage_b_int8w_ms": round(t_q * 1e3, 2),
        "speedup": round(t_base / t_q, 3),
        "trunk_front_ms": round(t_trunk * 1e3, 2),
        "generator_ms_est": round((t_base - t_trunk) * 1e3, 2),
        "quantized_tensors": stats["n"],
        "weight_bytes_bf16": stats["before"],
        "weight_bytes_int8": stats["after"],
        "max_abs_sample_diff": max_abs,
        "rel_l2": rel_l2,
        "mel_l1": mel,
    }))


if __name__ == "__main__":
    main()
