#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Serving throughput benchmark (runs on the real TPU chip).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Primary metric: synthesized audio seconds per wall-clock second per chip at
batch 32 (BASELINE.md north star: >50x realtime/chip; the reference
publishes no numbers of its own, so vs_baseline = value / 50).

Scenarios (detail fields):
- value: pinned single frame bucket (the round-1 configuration, kept
  shape-identical across rounds for comparability)
- multibucket_x_realtime: same workload with a (256, 512) frame-bucket
  inventory — exercises the frame-bucket pick (async totals readback) in
  steady state; should sit within ~15% of the pinned number
- e2e_x_realtime: full texts->wav path (zh frontend + model) on distinct
  texts per batch (cache-miss regime)
- batch1_latency_s: single-utterance post-warmup latency

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
from collections import deque


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def pipelined_throughput(synth, batches, depth=3):
    """Run batches through the split-phase engine with `depth` in flight;
    returns (audio_seconds, elapsed_seconds)."""
    start = time.perf_counter()
    total_samples = 0
    in_flight = deque()
    it = iter(batches)
    for _ in range(depth):
        nxt = next(it, None)
        if nxt is None:
            break
        in_flight.append(synth.dispatch(*nxt))
    done = 0
    while in_flight:
        # launch the head's decode first: its frame-total readback has been
        # in flight since dispatch, so this rarely stalls; the fresh
        # dispatch below then overlaps the head's stage-B compute and
        # audio download
        synth.launch_decode(in_flight[0])
        nxt = next(it, None)
        if nxt is not None:
            in_flight.append(synth.dispatch(*nxt))
        out = synth.collect(in_flight.popleft(), pcm16=True)
        total_samples += sum(a.size for a in out)
        done += 1
        log(f"  iter {done}")
    elapsed = time.perf_counter() - start
    return total_samples / synth.sample_rate, elapsed


def main() -> None:
    import jax
    import jax.numpy as jnp

    from illufly_tts_tpu.engine.synthesizer import Synthesizer
    from illufly_tts_tpu.model.config import KokoroConfig

    batch = 32
    frames = 512          # 12.8 s of audio per utterance at 40 frames/s
    iters = 10
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
    synth.synthesize_batch(texts, voices)
    log(f"first call (compile) took {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    synth.synthesize_batch(texts, voices)
    log(f"second call took {time.perf_counter() - t0:.2f}s")

    log("scenario 1: pinned bucket, pipelined...")
    audio_sec, elapsed = pipelined_throughput(
        synth, [(texts, voices)] * iters
    )
    throughput = audio_sec / elapsed
    rtf = elapsed / audio_sec

    # ---- scenario 2: multi-bucket inventory, same workload -------------------
    log("scenario 2: multi-bucket (256, 512)...")
    synth_mb = Synthesizer(
        config=cfg, params=synth.params,
        token_buckets=(256,), frame_buckets=(256, frames),
    )
    synth_mb._voices = synth._voices
    synth_mb.synthesize_batch(texts, voices)  # warm (picks 512)
    audio_mb, elapsed_mb = pipelined_throughput(
        synth_mb, [(texts, voices)] * iters
    )
    mb_throughput = audio_mb / elapsed_mb

    # ---- scenario 3: end-to-end texts->wav (frontend included) ---------------
    log("scenario 3: end-to-end frontend+model...")
    from illufly_tts_tpu.pipeline import TTSPipeline

    pipe = TTSPipeline(synthesizer=synth)
    zh = "今天天气真不错，我们一起去公园散步，顺便讨论一下这个项目的进展情况。"
    e2e_iters = 4
    # distinct texts every batch: cache-miss regime, realistic serving
    e2e_batches = [
        [f"第{i * batch + j}次测试。{zh}" for j in range(batch)]
        for i in range(e2e_iters)
    ]
    pipe.batch_process_texts(e2e_batches[0], voices)  # warm compile+jieba
    t0 = time.perf_counter()
    e2e_samples = 0
    for batch_texts in e2e_batches:
        out = pipe.batch_process_texts(batch_texts, voices)
        e2e_samples += sum(a.size for a in out)
    e2e_elapsed = time.perf_counter() - t0
    e2e_throughput = (e2e_samples / synth.sample_rate) / e2e_elapsed

    # ---- single-request latency (batch 1, same utterance), post-warmup -------
    synth.synthesize_batch([text], ["bench_voice"], pcm16=True)
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
            "multibucket_x_realtime": round(mb_throughput, 2),
            "e2e_x_realtime": round(e2e_throughput, 2),
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
