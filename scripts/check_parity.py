#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Mel-L1 / waveform parity harness against a real Kokoro checkpoint.

Ready-to-run once a checkpoint (and optionally reference audio) is present —
the converter itself is already proven against the torch twin
(tests/test_parity_torch.py). Two modes:

1. Checkpoint only: convert the torch checkpoint, synthesize a battery of
   texts, write wavs + report duration/energy stats.
     python scripts/check_parity.py --checkpoint kokoro-v1_0.pth \
         --voices-dir voices/ --out /tmp/parity
2. With reference wavs (produced by the reference CPU pipeline on the SAME
   texts, e.g. via its tests/integration/test_processing_steps.py harness):
   compute per-text mel-L1 + waveform MSE and print a JSON report.
     python scripts/check_parity.py --checkpoint kokoro-v1_0.pth \
         --voices-dir voices/ --ref-wavs refdir/ --out /tmp/parity

Reference behavioral contract: waveform MSE comparison per
/root/reference/tests/integration/test_processing_steps.py:384-418.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SMOKE_TEXTS = [
    "你好，这是一个测试",          # the reference's own smoke text
    "今天天气真不错，适合出去走走。",
    "2023年5月10日，气温25°C。",
    "Hello world, this is a test.",
    "你好 hello 混合 mixed 文本 text。",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True, help=".pt/.pth Kokoro checkpoint")
    ap.add_argument("--voices-dir", default=None)
    ap.add_argument("--voice-id", default="zf_001")
    ap.add_argument("--speed", type=float, default=1.0)
    ap.add_argument("--texts", nargs="*", default=SMOKE_TEXTS)
    ap.add_argument("--ref-wavs", default=None,
                    help="directory of {i}.wav files from the reference pipeline")
    ap.add_argument("--out", default="/tmp/parity_out")
    args = ap.parse_args()

    import numpy as np

    from illufly_tts_tpu.audio.mel import mel_l1
    from illufly_tts_tpu.audio.wav import read_wav, save_wav
    from illufly_tts_tpu.pipeline import TTSPipeline

    os.makedirs(args.out, exist_ok=True)
    pipe = TTSPipeline(repo_id=args.checkpoint, voices_dir=args.voices_dir)
    if not pipe.synthesizer.is_voice_loaded(args.voice_id):
        print(f"WARNING: voice {args.voice_id} not found; using random voice",
              file=sys.stderr)
        pipe.synthesizer.register_random_voice(args.voice_id, seed=42)

    report = {"checkpoint": args.checkpoint, "texts": []}
    for i, text in enumerate(args.texts):
        audio = pipe.process(text, voice_id=args.voice_id, speed=args.speed)
        out_path = os.path.join(args.out, f"{i}.wav")
        save_wav(out_path, audio, pipe.sample_rate)
        entry = {
            "text": text,
            "wav": out_path,
            "seconds": round(audio.size / pipe.sample_rate, 3),
            "rms": round(float(np.sqrt((audio ** 2).mean() + 1e-12)), 5),
        }
        if args.ref_wavs:
            ref_path = os.path.join(args.ref_wavs, f"{i}.wav")
            if os.path.exists(ref_path):
                ref, _ = read_wav(ref_path)
                n = min(len(ref), len(audio))
                entry["mel_l1"] = round(
                    float(mel_l1(audio[:n], ref[:n],
                                 sample_rate=pipe.sample_rate)), 5
                )
                entry["waveform_mse"] = round(
                    float(((audio[:n] - ref[:n]) ** 2).mean()), 7
                )
        report["texts"].append(entry)
    print(json.dumps(report, ensure_ascii=False, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
