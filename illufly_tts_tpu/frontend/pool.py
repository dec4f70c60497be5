# -*- coding: utf-8 -*-
"""Process-pool text frontend: shard per-row G2P across worker processes.

Why a POOL and not threads: the frontend (normalizers, jieba-style
segmentation, sandhi, G2P) is pure Python and GIL-bound — measured
~160 ms for a 32-row zh batch, which is the same order as the model's
per-batch device time at production throughput (bench.py e2e scenario).
Threads cannot overlap GIL-bound work with the host-side dispatch/collect
loop; processes can (VERDICT r3 next-7: e2e_x_realtime lagged the pinned
model loop 785.7x vs 945.3x because the host frontend ate the gap).

Workers are ``spawn``-started (fork is unsafe after jax initializes its
runtime threads), each builds its OWN frontend via
``TTSPipeline._init_frontend_only`` — no synthesizer, no device buffers —
with ``JAX_PLATFORMS=cpu`` pinned in the child so a worker can never
attach to the TPU tunnel. Custom-dictionary state is replayed from
``custom_dict.LOADED_ZH/LOADED_EN`` at worker init, so pooled output is
identical to the serial path (tests/test_frontend_pool.py asserts
equality on a mixed battery).

The reference has no counterpart (its frontend runs inline on the
request thread, reference pipeline.py:208-374); this is serving
infrastructure the TPU throughput makes necessary.
"""
from __future__ import annotations

import atexit
import logging
import os
from typing import List, Optional, Sequence

logger = logging.getLogger(__name__)

# --- worker side -------------------------------------------------------------

_WORKER = None  # per-process frontend (a frontend-only TTSPipeline)


def _init_worker(default_language: str, british: bool,
                 zh_dicts: Sequence[str], en_dicts: Sequence[str]) -> None:
    """Build this worker's frontend. Runs once per process."""
    # never let a frontend worker touch the TPU: pin the CPU backend
    # before anything imports jax (the package import chain does)
    os.environ["JAX_PLATFORMS"] = "cpu"
    global _WORKER
    from ..pipeline import TTSPipeline
    from .g2p import custom_dict

    pipe = TTSPipeline.__new__(TTSPipeline)
    pipe._init_frontend_only(default_language=default_language,
                             british=british)
    for path in zh_dicts:
        try:
            custom_dict.load_zh_dict(path)
        except OSError as exc:
            logger.warning("worker: zh dict %s unavailable: %s", path, exc)
    for path in en_dicts:
        try:
            custom_dict.load_en_dict(path)
        except OSError as exc:
            logger.warning("worker: en dict %s unavailable: %s", path, exc)
    _WORKER = pipe


def _ipa_shard(texts: Sequence[str]) -> List[str]:
    """texts -> IPA strings (the exact _texts_to_ipa per-row chain)."""
    from ..pipeline import MAX_PHONEMES

    return [
        _WORKER.phonemes_to_ipa(
            _WORKER.text_to_phonemes(_WORKER.preprocess_text(t))
        )[:MAX_PHONEMES]
        for t in texts
    ]


def _warm_shard(_: Sequence[str]) -> bool:
    """Force full worker init (lexicons, segmenter cache) off the
    request path."""
    _ipa_shard(["预热。warmup one."])
    return True


# --- parent side -------------------------------------------------------------


class FrontendPool:
    """Order-preserving parallel map of the text frontend over batch rows.

    ``texts_to_ipa`` splits the batch into contiguous shards (one per
    worker, floor 4 rows per shard so IPC never dominates tiny batches)
    and falls back to ``None`` (caller runs serial) if the pool is broken
    or still warming — the serial path is always correct, the pool is
    only an accelerator.
    """

    MIN_ROWS_PER_SHARD = 4

    def __init__(self, workers: int, default_language: str = "zh",
                 british: bool = False,
                 zh_dicts: Optional[Sequence[str]] = None,
                 en_dicts: Optional[Sequence[str]] = None):
        import multiprocessing as mp
        from concurrent.futures import ProcessPoolExecutor

        from .g2p import custom_dict

        self.workers = max(1, int(workers))
        # ProcessPoolExecutor (not mp.Pool): a worker that dies during
        # spawn/init marks the whole pool broken ONCE instead of being
        # respawned in a crash loop (e.g. a parent whose __main__ can't
        # be re-imported under spawn); texts_to_ipa then permanently
        # falls back to the serial path.
        self._pool = ProcessPoolExecutor(
            self.workers,
            mp_context=mp.get_context("spawn"),
            initializer=_init_worker,
            initargs=(
                default_language,
                british,
                tuple(zh_dicts if zh_dicts is not None
                      else custom_dict.LOADED_ZH),
                tuple(en_dicts if en_dicts is not None
                      else custom_dict.LOADED_EN),
            ),
        )
        self._broken = False
        # warm every worker in the background (jieba-cache load etc. is
        # seconds); ready() gates the first pooled batch
        self._warm = [self._pool.submit(_warm_shard, [])
                      for _ in range(self.workers)]
        atexit.register(self.close)
        logger.info("frontend pool: %d workers warming", self.workers)

    @property
    def ready(self) -> bool:
        if self._broken:
            return False
        if self._warm is None:
            return True
        if not all(f.done() for f in self._warm):
            return False
        try:
            for f in self._warm:
                f.result(0)
            self._warm = None
            return True
        except Exception as exc:  # worker died during warmup
            logger.warning(
                "frontend pool failed to warm (%s); serving serial", exc
            )
            self._broken = True
            return False

    def texts_to_ipa(self, texts: Sequence[str]) -> Optional[List[str]]:
        """Pooled frontend, or None when the caller should run serial
        (pool warming/broken, or the batch too small to shard)."""
        if len(texts) < 2 * self.MIN_ROWS_PER_SHARD or not self.ready:
            return None
        n_shards = min(self.workers,
                       max(1, len(texts) // self.MIN_ROWS_PER_SHARD))
        bounds = [len(texts) * i // n_shards for i in range(n_shards + 1)]
        shards = [list(texts[bounds[i]:bounds[i + 1]])
                  for i in range(n_shards)]
        try:
            parts = list(self._pool.map(_ipa_shard, shards))
        except Exception as exc:
            logger.warning(
                "frontend pool failed (%s); serving serial from now on",
                exc,
            )
            self._broken = True
            return None
        return [ipa for part in parts for ipa in part]

    def close(self) -> None:
        pool, self._pool = self._pool, None
        if pool is not None:
            try:
                pool.shutdown(wait=False, cancel_futures=True)
            except Exception:
                pass
        self._broken = True
