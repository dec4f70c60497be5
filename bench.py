#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Serving throughput benchmark (runs on the real TPU chip).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric: synthesized audio seconds per wall-clock second per chip at batch 32
(BASELINE.md north star: >50x realtime/chip; the reference publishes no
numbers of its own, so vs_baseline = value / 50).

Shapes mirror real serving: ~10 s utterances (frame bucket 512 at 40
duration-frames/s), 256-token phoneme bucket — the chunk_size=200 regime the
reference serves (SURVEY §6). Durations from the random-init model are
clamped into the frame budget; throughput is shape-determined, not
weight-determined.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from illufly_tts_tpu.engine.synthesizer import Synthesizer
    from illufly_tts_tpu.model.config import KokoroConfig

    batch = 32
    frames = 512          # 12.8 s of audio per utterance at 40 frames/s
    cfg = KokoroConfig(dtype=jnp.bfloat16)

    log(f"platform={jax.devices()[0].platform} building synthesizer...")
    synth = Synthesizer(
        config=cfg,
        token_buckets=(256,),
        frame_buckets=(frames,),
    )
    synth.register_random_voice("bench_voice", seed=7)

    base = "ni↗xau↓ma, tsʰɤ↘ʂɨ↘i↗kɤ↘tʰəst. "
    text = (base * 12)[:250]
    texts = [text] * batch
    voices = ["bench_voice"] * batch

    log("compiling (warmup)...")
    t0 = time.perf_counter()
    out = synth.synthesize_batch(texts, voices)
    log(f"first call (compile) took {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    out = synth.synthesize_batch(texts, voices)
    log(f"second call took {time.perf_counter() - t0:.2f}s")

    # pipelined serving loop: keep several batches in flight so the host
    # download (PCIe on real hosts; a slow, high-variance relay in this dev
    # environment) overlaps with device compute
    from collections import deque

    iters = 10
    depth = 3
    start = time.perf_counter()
    total_samples = 0
    in_flight = deque(
        synth.dispatch(texts, voices) for _ in range(min(depth, iters))
    )
    submitted = len(in_flight)
    done = 0
    while in_flight:
        # launch the head's decode first: its frame-total readback has been
        # in flight since dispatch, so this rarely stalls; the fresh dispatch
        # below then overlaps the head's stage-B compute and audio download
        synth.launch_decode(in_flight[0])
        if submitted < iters:
            in_flight.append(synth.dispatch(texts, voices))
            submitted += 1
        out = synth.collect(in_flight.popleft(), pcm16=True)
        total_samples += sum(a.size for a in out)
        done += 1
        log(f"iter {done}/{iters}")
    elapsed = time.perf_counter() - start

    audio_seconds = total_samples / synth.sample_rate
    throughput = audio_seconds / elapsed
    rtf = elapsed / audio_seconds

    # single-request latency (batch 1, same utterance), post-warmup
    synth.synthesize_batch([text], ["bench_voice"], pcm16=True)  # compile b1
    lat = []
    for _ in range(3):
        t0 = time.perf_counter()
        synth.synthesize_batch([text], ["bench_voice"], pcm16=True)
        lat.append(time.perf_counter() - t0)
    b1_latency = min(lat)

    result = {
        "metric": "audio_sec_per_sec_per_chip_b32",
        "value": round(throughput, 2),
        "unit": "x_realtime",
        "vs_baseline": round(throughput / 50.0, 3),
        "detail": {
            "rtf": round(rtf, 6),
            "batch1_latency_s": round(b1_latency, 3),
            "batch": batch,
            "frame_bucket": frames,
            "phonemes_per_utt": len(text),
            "iters": iters,
            "elapsed_s": round(elapsed, 3),
            "platform": jax.devices()[0].platform,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
