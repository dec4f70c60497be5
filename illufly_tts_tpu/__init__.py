# -*- coding: utf-8 -*-
"""illufly-tts-tpu: TPU-native (JAX/XLA/Pallas/pjit) Chinese-first TTS
serving framework — capability parity with arcstep/illufly-tts."""

__version__ = "0.1.0"
