# -*- coding: utf-8 -*-
"""Persistent XLA compilation cache.

Full-size stage compiles cost 150 s+ through this environment's remote TPU
compiler; the persistent cache cuts warm restarts (server, bench) to
seconds. Verified working through the axon PJRT path. Opt out with
TTS_COMPILE_CACHE=0; override the location with TTS_COMPILE_CACHE_DIR."""
from __future__ import annotations

import logging
import os

logger = logging.getLogger(__name__)

_enabled = False


def enable_compilation_cache() -> bool:
    global _enabled
    if _enabled:
        return True
    if os.environ.get("TTS_COMPILE_CACHE", "1").lower() in ("0", "false"):
        return False
    import jax

    if jax.default_backend() == "cpu":
        # CPU compiles are fast and CPU executables embed host machine
        # features (avx512 variants) — reusing them across machines risks
        # SIGILL and spams cpu_aot_loader warnings. The cache only pays
        # for itself on the tunneled-TPU compile path.
        return False
    cache_dir = os.environ.get(
        "TTS_COMPILE_CACHE_DIR",
        os.path.expanduser("~/.cache/illufly_tts_tpu/xla"),
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache EVERYTHING: through the remote tunnel even trivial ops can
        # take tens of seconds to compile when the compile service is
        # loaded (measured: a fresh process's eager-op warmup alone cost
        # minutes), and tiny cache entries deserialize in milliseconds
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        _enabled = True
        logger.info("XLA compilation cache: %s", cache_dir)
    except Exception as exc:
        logger.info("compilation cache unavailable: %s", exc)
    return _enabled
