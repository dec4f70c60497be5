# -*- coding: utf-8 -*-
"""Observability: stage timers + jax.profiler hooks.

The reference has only ad-hoc wall-clock logging (SURVEY §5); here timing is
a first-class module: per-stage EWMA timers that the service can expose, and
a context manager around jax.profiler for TPU traces."""
from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict
from typing import Dict, Iterator

logger = logging.getLogger(__name__)


class StageTimers:
    """Exponential-moving-average wall-clock timers per pipeline stage."""

    def __init__(self, alpha: float = 0.2):
        self.alpha = alpha
        self.ewma: Dict[str, float] = {}
        self.count: Dict[str, int] = defaultdict(int)
        self.total: Dict[str, float] = defaultdict(float)

    @contextlib.contextmanager
    def track(self, stage: str) -> Iterator[None]:
        start = time.perf_counter()
        try:
            yield
        finally:
            elapsed = time.perf_counter() - start
            prev = self.ewma.get(stage)
            self.ewma[stage] = (
                elapsed if prev is None
                else self.alpha * elapsed + (1 - self.alpha) * prev
            )
            self.count[stage] += 1
            self.total[stage] += elapsed

    def snapshot(self) -> Dict[str, Dict[str, float]]:
        return {
            stage: {
                "ewma_s": self.ewma[stage],
                "count": self.count[stage],
                "total_s": self.total[stage],
            }
            for stage in self.ewma
        }


TIMERS = StageTimers()


@contextlib.contextmanager
def tpu_trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace (view with TensorBoard/xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("profiler trace written to %s", log_dir)
