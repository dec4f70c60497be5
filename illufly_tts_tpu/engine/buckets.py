# -*- coding: utf-8 -*-
"""Static shape buckets.

XLA compiles one program per distinct shape; a small warm bucket inventory
keeps tail latency flat (SURVEY §7 hard-part 5). Replaces the reference's
fully dynamic padded batches (src/illufly_tts/core/kmodel.py:44-64)."""
from __future__ import annotations

from typing import Sequence

TOKEN_BUCKETS: Sequence[int] = (16, 32, 64, 128, 256, 512)
FRAME_BUCKETS: Sequence[int] = (
    64, 128, 192, 256, 384, 512, 768, 1024, 1536, 2048, 3072, 4096,
)
BATCH_BUCKETS: Sequence[int] = (1, 2, 4, 8, 16, 32, 64)


def pick(buckets: Sequence[int], needed: int) -> int:
    for b in buckets:
        if needed <= b:
            return b
    return buckets[-1]
