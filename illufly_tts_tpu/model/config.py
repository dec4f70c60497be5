# -*- coding: utf-8 -*-
"""Model configuration (Kokoro-82M-class StyleTTS2 stack).

Dimensions follow the published Kokoro-82M config family (StyleTTS2-derived:
phoneme ALBERT -> style-conditioned prosody predictor -> text encoder ->
iSTFTNet decoder; see reference SURVEY C20/C21 and
src/illufly_tts/core/kmodel.py:70-144 for the call surface)."""
from __future__ import annotations

import dataclasses
from typing import Sequence

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class AlbertConfig:
    vocab_size: int = 256
    embedding_size: int = 128
    hidden_size: int = 768
    num_heads: int = 12
    intermediate_size: int = 2048
    num_layers: int = 12
    max_position: int = 512


@dataclasses.dataclass(frozen=True)
class IstftNetConfig:
    upsample_rates: Sequence[int] = (10, 6)
    upsample_kernel_sizes: Sequence[int] = (20, 12)
    upsample_initial_channel: int = 512
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilation_sizes: Sequence[Sequence[int]] = (
        (1, 3, 5), (1, 3, 5), (1, 3, 5)
    )
    gen_istft_n_fft: int = 20
    gen_istft_hop_size: int = 5


@dataclasses.dataclass(frozen=True)
class KokoroConfig:
    n_token: int = 256
    hidden_dim: int = 512
    style_dim: int = 128
    max_dur: int = 50
    n_layer: int = 3                 # text-encoder conv depth
    text_encoder_kernel_size: int = 5
    sample_rate: int = 24000
    albert: AlbertConfig = AlbertConfig()
    istftnet: IstftNetConfig = IstftNetConfig()
    # compute dtype for matmul-heavy paths; params stay float32
    dtype: jnp.dtype = jnp.float32
    # use the fused Pallas iSTFT kernel in the vocoder (TPU; the jnp
    # reference path is used when False, e.g. CPU tests)
    use_pallas_istft: bool = False

    @property
    def samples_per_frame(self) -> int:
        # duration frames -> samples: 2x (F0 upsampling in the predictor /
        # decoder) * prod(upsample_rates) * istft hop
        r = 2 * self.istftnet.gen_istft_hop_size
        for u in self.istftnet.upsample_rates:
            r *= u
        return r  # 600 with defaults -> 40 duration-frames/sec at 24 kHz

    @property
    def style_split(self) -> int:
        return self.style_dim  # ref_s = [decoder 128 | style 128]
