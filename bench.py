#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Serving throughput benchmark (runs on the real TPU chip).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric: synthesized audio seconds per wall-clock second per chip at batch 32
(the BASELINE.md north star is >50x realtime/chip; the reference publishes no
numbers of its own, so vs_baseline is value/50).
"""
from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from illufly_tts_tpu.engine.synthesizer import Synthesizer
    from illufly_tts_tpu.model.config import KokoroConfig

    cfg = KokoroConfig(dtype=jnp.bfloat16)
    synth = Synthesizer(
        config=cfg,
        token_buckets=(256,),
        frame_buckets=(512, 1024, 2048),
    )
    synth.register_random_voice("bench_voice", seed=7)

    batch = 32
    # ~250-phoneme zh-style IPA utterances (the 510-cap regime the reference
    # serves, pipeline.py:191)
    base = "ni↗xau↓ma, tsʰɤ↘ʂɨ↘i↗kɤ↘tʰəst. "
    text = (base * 12)[:250]
    texts = [text] * batch
    voices = ["bench_voice"] * batch

    # warmup / compile
    for _ in range(2):
        out = synth.synthesize_batch(texts, voices)
    jax.block_until_ready(jnp.zeros(()))

    iters = 5
    start = time.perf_counter()
    total_samples = 0
    for _ in range(iters):
        out = synth.synthesize_batch(texts, voices)
        total_samples += sum(a.size for a in out)
    elapsed = time.perf_counter() - start

    audio_seconds = total_samples / synth.sample_rate
    throughput = audio_seconds / elapsed  # x realtime per chip
    rtf = elapsed / audio_seconds

    result = {
        "metric": "audio_sec_per_sec_per_chip_b32",
        "value": round(throughput, 2),
        "unit": "x_realtime",
        "vs_baseline": round(throughput / 50.0, 3),
        "detail": {
            "rtf": round(rtf, 5),
            "batch": batch,
            "phonemes_per_utt": len(text),
            "iters": iters,
            "elapsed_s": round(elapsed, 3),
            "platform": jax.devices()[0].platform,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
