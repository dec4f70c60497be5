#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Layer-by-layer manual debug harness
(capability parity with reference debug_layers.py:49-186): exercise each
pipeline stage directly, then hit a running service with concurrent
multi-user HTTP requests.

Usage:
  python scripts/debug_layers.py pipeline  "你好，世界"
  python scripts/debug_layers.py http --url http://localhost:31572 --users 3
"""
from __future__ import annotations

import argparse
import asyncio
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def test_pipeline_layers(text: str) -> None:
    from illufly_tts_tpu.pipeline import TTSPipeline

    class StubSynth:
        sample_rate = 24000

        def load_voice(self, v):
            raise ValueError(v)

        def list_voices(self):
            return []

    pipe = TTSPipeline(synthesizer=StubSynth())
    print(f"input      : {text}")
    t0 = time.perf_counter()
    normalized = pipe.preprocess_text(text)
    print(f"normalized : {normalized}   ({time.perf_counter()-t0:.3f}s)")
    t0 = time.perf_counter()
    phonemes = pipe.text_to_phonemes(normalized)
    print(f"zhuyin     : {phonemes}   ({time.perf_counter()-t0:.3f}s)")
    t0 = time.perf_counter()
    ipa = pipe.phonemes_to_ipa(phonemes)
    print(f"ipa        : {ipa}   ({time.perf_counter()-t0:.3f}s)")
    from illufly_tts_tpu.model.vocab import encode

    ids = encode(ipa)
    print(f"token ids  : {len(ids)} tokens, first 20: {ids[:20]}")


async def test_multi_user_requests(url: str, users: int, reqs: int) -> None:
    import aiohttp

    from illufly_tts_tpu.api.dev_mode import generate_dev_token

    async def one_user(session, uid):
        token = generate_dev_token(f"user_{uid}")
        results = []
        for i in range(reqs):
            start = time.perf_counter()
            async with session.post(
                f"{url}/api/tts",
                json={"text": f"用户{uid}的第{i}条消息。", "sequence_id": i},
                headers={"Authorization": f"Bearer {token}"},
            ) as resp:
                ok = resp.status == 200
                body = await resp.json() if ok else await resp.text()
                results.append(
                    (i, resp.status, time.perf_counter() - start)
                )
        return uid, results

    async with aiohttp.ClientSession() as session:
        outs = await asyncio.gather(
            *[one_user(session, u) for u in range(users)]
        )
    for uid, results in outs:
        for i, status, dt in results:
            print(f"user {uid} req {i}: HTTP {status} in {dt:.2f}s")


def main() -> None:
    parser = argparse.ArgumentParser()
    sub = parser.add_subparsers(dest="cmd", required=True)
    p1 = sub.add_parser("pipeline")
    p1.add_argument("text", nargs="?", default="今天是2023年5月10日，天气真好。")
    p2 = sub.add_parser("http")
    p2.add_argument("--url", default="http://localhost:31572")
    p2.add_argument("--users", type=int, default=3)
    p2.add_argument("--reqs", type=int, default=2)
    args = parser.parse_args()
    if args.cmd == "pipeline":
        test_pipeline_layers(args.text)
    else:
        asyncio.run(test_multi_user_requests(args.url, args.users, args.reqs))


if __name__ == "__main__":
    main()
