# -*- coding: utf-8 -*-
"""Voice adaptation: learn a new voice pack from reference audio.

Beyond the reference's surface (its voices are fixed HF-hub ``.pt``
packs, reference src/illufly_tts/core/pipeline.py:78-109): the acoustic
model is end-to-end differentiable in JAX, so a new voice is just a
256-d style vector optimized by gradient descent against a few
(wav, transcript) pairs — the model weights stay FROZEN, only the
AdaIN conditioning vector (ref_s: 128 decoder + 128 prosody, reference
kmodel.py:82-84) trains. A couple hundred Adam steps on one chip take
seconds; the result saves as a standard length-indexed ``[510, 1, 256]``
pack any surface (CLI/HTTP/MCP/blending) loads like a shipped voice.

TPU notes: the optimization state is tiny (256 floats), so the whole
step jits once at a static (batch, tokens, frames) shape and re-runs;
batches reuse the training loader's static-shape padding.
"""
from __future__ import annotations

import logging
from typing import Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..model.kokoro import KokoroModel
from .step import TrainBatch, make_loss_fn

logger = logging.getLogger(__name__)


def adapt_voice(
    model: KokoroModel,
    params,
    batches: Iterator[TrainBatch],
    steps: int = 200,
    learning_rate: float = 5e-2,
    frames: int = 128,
    init: Optional[np.ndarray] = None,
    spectral: bool = True,
    log_every: int = 20,
) -> Tuple[np.ndarray, dict]:
    """Optimize a style vector against ``batches``; returns
    (style [2*style_dim] float32, final metrics).

    ``batches`` yield TrainBatch whose ref_s column is ignored — the
    trained vector replaces it. ``init`` warm-starts from an existing
    voice's vector (e.g. adapt a shipped voice toward a new speaker).
    ``spectral=True`` is the real-recording objective (mel-L1 +
    multi-res STFT — phase-blind); ``spectral=False`` is exact waveform
    L1, only meaningful against model-rendered targets."""
    style_dim = 2 * model.config.style_dim
    if init is not None:
        s0 = jnp.asarray(np.asarray(init, np.float32).reshape(-1))
        if s0.shape[0] != style_dim:
            raise ValueError(
                f"init style has dim {s0.shape[0]}, model wants {style_dim}"
            )
    else:
        s0 = jnp.zeros((style_dim,), jnp.float32)

    loss_fn = make_loss_fn(model, frames, spectral=spectral)

    def s_loss(s, batch: TrainBatch):
        conditioned = batch._replace(
            ref_s=jnp.broadcast_to(s, batch.ref_s.shape)
        )
        return loss_fn(params, conditioned)

    optimizer = optax.chain(
        # the random-init generator's exp() spans make early grads spiky
        # (same guard as training/loop.py)
        optax.clip_by_global_norm(1.0),
        optax.adam(learning_rate),
    )
    opt_state = optimizer.init(s0)

    @jax.jit
    def step_fn(s, opt_state, batch):
        (loss, aux), grads = jax.value_and_grad(s_loss, has_aux=True)(
            s, batch
        )
        updates, opt_state = optimizer.update(grads, opt_state, s)
        return optax.apply_updates(s, updates), opt_state, loss, aux

    s = s0
    metrics: dict = {}
    best_loss = float("inf")
    best_s = s0
    best_aux: dict = {}
    for i in range(steps):
        batch = next(batches)
        next_s, next_opt_state, loss, aux = step_fn(s, opt_state, batch)
        # keep the best style seen: with few samples the per-batch loss
        # is noisy and the last step is not necessarily the best (the
        # vocoder's exp() spans make the landscape rough, especially far
        # from a trained operating point)
        step_loss = float(loss)
        if np.isfinite(step_loss):
            if step_loss < best_loss:
                best_loss = step_loss
                best_s = s  # the style loss was EVALUATED at, pre-update
                best_aux = {k: float(v) for k, v in aux.items()}
            s, opt_state = next_s, next_opt_state
        else:
            # a non-finite step (the random-init generator can overflow
            # under an aggressive style) would poison s AND the Adam
            # moments — skip the update entirely and keep stepping
            logger.warning(
                "voice-adapt step %d: non-finite loss, update skipped",
                i + 1,
            )
        if log_every and (i + 1) % log_every == 0:
            metrics = {"loss": step_loss, "best_loss": best_loss,
                       **{k: float(v) for k, v in aux.items()}}
            logger.info("voice-adapt step %d: %s", i + 1, metrics)
    # the returned style is the BEST one — report its metrics, not the
    # last step's (which may be the non-finite step the guard skipped)
    metrics = {"loss": best_loss, "best_loss": best_loss, **best_aux}
    return np.asarray(best_s, np.float32), metrics


def style_to_pack(style: np.ndarray, max_len: int = 510) -> np.ndarray:
    """Broadcast a single style vector into the length-indexed pack
    layout every loader accepts (``pack[len(phonemes)-1]``, reference
    pipeline.py:199; shape [510, 1, 256] like HF voice packs)."""
    style = np.asarray(style, np.float32).reshape(1, 1, -1)
    return np.broadcast_to(style, (max_len,) + style.shape[1:]).copy()


def rendered_batches(
    model: KokoroModel,
    params,
    target_style: jnp.ndarray,
    batch_size: int,
    tokens: int,
    frames: int,
    seed: int = 0,
) -> Iterator[TrainBatch]:
    """Self-test data: batches whose target audio the model itself
    renders under ``target_style`` — adaptation must recover a vector
    that reproduces it (tests/test_voice_adapt.py)."""
    cfg = model.config

    @jax.jit
    def render(ids, mask, ref_s, target_dur):
        _, d = model.apply(
            params, ids, mask, ref_s,
            jnp.ones((ids.shape[0],), jnp.float32),
            method=KokoroModel.encode_durations,
        )
        teacher = (target_dur * mask).astype(jnp.int32)
        audio, _ = model.apply(
            params, ids, mask, d, teacher, ref_s, frames,
            method=KokoroModel.decode_frames,
        )
        return audio

    rng = np.random.RandomState(seed)
    n_vocab = cfg.albert.vocab_size
    ref = jnp.broadcast_to(
        target_style, (batch_size, 2 * cfg.style_dim)
    )
    while True:
        lengths = rng.randint(tokens // 2, tokens - 1, batch_size)
        ids = np.zeros((batch_size, tokens), np.int32)
        mask = np.zeros((batch_size, tokens), np.float32)
        for i, ln in enumerate(lengths):
            ids[i, 1: ln + 1] = rng.randint(1, n_vocab, ln)
            mask[i, : ln + 2] = 1.0
        target_dur = (mask * 3.0).astype(np.float32)
        ids_j = jnp.asarray(ids)
        mask_j = jnp.asarray(mask)
        dur_j = jnp.asarray(target_dur)
        audio = render(ids_j, mask_j, ref, dur_j)
        yield TrainBatch(
            input_ids=ids_j, mask=mask_j, ref_s=ref,
            target_dur=dur_j, target_audio=audio,
        )
