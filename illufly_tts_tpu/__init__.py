# -*- coding: utf-8 -*-
"""illufly-tts-tpu: TPU-native (JAX/XLA/Pallas/pjit) Chinese-first TTS
serving framework — capability parity with arcstep/illufly-tts.

Top-level exports mirror the reference's (``from illufly_tts import
TTSPipeline, TTSServiceManager``) but resolve lazily (PEP 562) so importing
the package doesn't pull in JAX until a heavy symbol is touched."""

__version__ = "0.1.0"

_LAZY = {
    "TTSPipeline": ("illufly_tts_tpu.pipeline", "TTSPipeline"),
    "CachedTTSPipeline": ("illufly_tts_tpu.pipeline", "CachedTTSPipeline"),
    "TTSServiceManager": (
        "illufly_tts_tpu.runtime.scheduler", "TTSServiceManager",
    ),
    "TaskStatus": ("illufly_tts_tpu.runtime.scheduler", "TaskStatus"),
    "Synthesizer": ("illufly_tts_tpu.engine.synthesizer", "Synthesizer"),
    "KokoroConfig": ("illufly_tts_tpu.model.config", "KokoroConfig"),
    "ZhTextNormalizer": (
        "illufly_tts_tpu.frontend.normalization.zh", "ZhTextNormalizer",
    ),
    "EnTextNormalizer": (
        "illufly_tts_tpu.frontend.normalization.en", "EnTextNormalizer",
    ),
    "ChineseG2P": ("illufly_tts_tpu.frontend.g2p.chinese_g2p", "ChineseG2P"),
    "EnglishG2P": ("illufly_tts_tpu.frontend.g2p.en_g2p", "EnglishG2P"),
}

__all__ = ["__version__", *_LAZY]


def __getattr__(name: str):
    if name in _LAZY:
        import importlib

        module, attr = _LAZY[name]
        value = getattr(importlib.import_module(module), attr)
        globals()[name] = value
        return value
    raise AttributeError(f"module 'illufly_tts_tpu' has no attribute {name!r}")
