# -*- coding: utf-8 -*-
"""Training loop: synthetic-teacher data, checkpointing, optional mesh.

The reference ships no training code (SURVEY §0); this completes the
subsystem around training/step.py: a driver that distills against a
frozen teacher (the initial parameters' own teacher-forced output), so
the loss is verifiably minimizable without external data — the loop,
sharding, and checkpoint/resume machinery are what's being exercised.
Real data plugs in by yielding ``TrainBatch`` from any source.
"""
from __future__ import annotations

import logging
import time
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..model.kokoro import KokoroModel
from .checkpoint import (
    latest_checkpoint,
    restore_train_state,
    save_train_state,
)
from .step import TrainBatch, make_gan_train_step, make_train_step

logger = logging.getLogger(__name__)


def synthetic_batches(
    model: KokoroModel,
    teacher_params,
    batch_size: int,
    tokens: int,
    frames: int,
    seed: int = 0,
) -> Iterator[TrainBatch]:
    """Endless batches whose audio targets come from a frozen teacher.

    Teacher-forced durations are fixed (3 frames/token) so the duration
    head has a stationary target too."""
    cfg = model.config
    spf = cfg.samples_per_frame

    @jax.jit
    def teacher_audio(ids, mask, ref_s, target_dur):
        _, d = model.apply(
            teacher_params, ids, mask, ref_s,
            jnp.ones((ids.shape[0],), jnp.float32),
            method=KokoroModel.encode_durations,
        )
        teacher = (target_dur * mask).astype(jnp.int32)
        audio, _ = model.apply(
            teacher_params, ids, mask, d, teacher, ref_s, frames,
            method=KokoroModel.decode_frames,
        )
        return audio

    rng = np.random.RandomState(seed)
    n_vocab = cfg.albert.vocab_size
    while True:
        lengths = rng.randint(tokens // 2, tokens - 1, batch_size)
        ids = np.zeros((batch_size, tokens), np.int32)
        mask = np.zeros((batch_size, tokens), np.float32)
        for i, ln in enumerate(lengths):
            ids[i, 1: ln + 1] = rng.randint(1, n_vocab, ln)
            mask[i, : ln + 2] = 1.0  # BOS/EOS zeros stay in-mask
        ref_s = (rng.randn(batch_size, 2 * cfg.style_dim) * 0.1).astype(
            np.float32
        )
        target_dur = (mask * 3.0).astype(np.float32)
        ids_j = jnp.asarray(ids)
        mask_j = jnp.asarray(mask)
        ref_j = jnp.asarray(ref_s)
        dur_j = jnp.asarray(target_dur)
        audio = teacher_audio(ids_j, mask_j, ref_j, dur_j)
        assert audio.shape[1] == frames * spf
        yield TrainBatch(
            input_ids=ids_j, mask=mask_j, ref_s=ref_j,
            target_dur=dur_j, target_audio=audio,
        )


def train(
    model: KokoroModel,
    params,
    steps: int,
    batch_size: int = 8,
    tokens: int = 64,
    frames: int = 128,
    learning_rate: float = 1e-4,
    max_grad_norm: float = 1.0,
    mesh=None,
    checkpoint_dir: Optional[str] = None,
    resume: bool = False,
    checkpoint_every: int = 100,
    log_every: int = 10,
    seed: int = 0,
    batches: Optional[Iterator[TrainBatch]] = None,
    data_dir: Optional[str] = None,
    spectral: Optional[bool] = None,
    on_metrics=None,
    adversarial: bool = False,
    disc_lr: float = 2e-4,
    disc_kwargs: Optional[dict] = None,
):
    """Run ``steps`` optimizer steps; returns (params, opt_state, metrics).

    With ``mesh``, the batch shards over 'data' and params per
    parallel/mesh.py (the same layout dryrun_multichip validates).

    ``adversarial=True`` adds the HiFi-GAN LSGAN objective on top of the
    reconstruction terms: a MultiPeriod + MultiResolution discriminator
    ensemble (training/discriminator.py) trains alongside the generator
    (D step on detached audio, then G step with adversarial + feature-
    matching losses — training/step.py::make_gan_train_step). The
    discriminator checkpoints under ``{checkpoint_dir}/disc`` so resume
    continues both players."""
    # the random-init generator's exp() magnitudes reach O(1e4); without
    # clipping the first waveform-gradient step NaNs the decoder
    optimizer = optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.adamw(learning_rate),
    )
    # the distillation teacher is the INITIAL parameters, frozen — capture
    # before any checkpoint restore so resume continues the original
    # objective instead of distilling the student against itself
    teacher_params = params

    data_sharding = None
    if mesh is not None:
        from ..parallel.mesh import batch_sharding, shard_params

        # batch must divide the data axis (same constraint the serving
        # engine rounds for, engine/synthesizer.py)
        n_data = mesh.shape["data"]
        rounded = -(-batch_size // n_data) * n_data
        if rounded != batch_size:
            logger.info(
                "batch_size %d -> %d (multiple of %d-way data axis)",
                batch_size, rounded, n_data,
            )
            batch_size = rounded
        # place params BEFORE optimizer.init so the adamw mu/nu pytrees
        # inherit the shardings instead of materializing unsharded
        params = shard_params(params, mesh)
        data_sharding = batch_sharding(mesh)

    opt_state = optimizer.init(params)
    start_step = 0
    if resume and checkpoint_dir:
        path = latest_checkpoint(checkpoint_dir)
        if path:
            params, opt_state, start_step = restore_train_state(
                path, params, opt_state
            )
            logger.info("resumed from %s (step %d)", path, start_step)

    if batches is None:
        if data_dir:
            # real data: spectral objective by default (waveform L1 is
            # phase-blind against recordings; see training/step.py)
            from .data import SpeechDataset, dataset_batches

            dataset = SpeechDataset(
                data_dir,
                sample_rate=model.config.sample_rate,
                style_dim=2 * model.config.style_dim,
                samples_per_frame=model.config.samples_per_frame,
            )
            from .data import prefetch

            batches = prefetch(dataset_batches(
                dataset, batch_size, tokens, frames,
                model.config.samples_per_frame, seed=seed,
                vocab_size=model.config.albert.vocab_size,
            ))
            if spectral is None:
                spectral = True
        else:
            batches = synthetic_batches(
                model, teacher_params, batch_size, tokens, frames,
                seed=seed,
            )
    d_params = d_opt_state = d_optimizer = None
    if adversarial:
        from .discriminator import HiFiGANDiscriminator

        disc = HiFiGANDiscriminator(**(disc_kwargs or {}))
        dummy = jnp.zeros(
            (1, frames * model.config.samples_per_frame), jnp.float32
        )
        d_params = disc.init(jax.random.PRNGKey(seed + 1), dummy)
        d_optimizer = optax.chain(
            optax.clip_by_global_norm(max_grad_norm),
            optax.adamw(disc_lr),
        )
        if mesh is not None:
            # replicate the (small) discriminator; the batch dim carries
            # the data parallelism through its purely-local convs
            from jax.sharding import NamedSharding, PartitionSpec

            d_params = jax.device_put(
                d_params, NamedSharding(mesh, PartitionSpec())
            )
        d_opt_state = d_optimizer.init(d_params)
        if resume and checkpoint_dir:
            d_path = latest_checkpoint(f"{checkpoint_dir}/disc")
            if d_path:
                d_params, d_opt_state, _ = restore_train_state(
                    d_path, d_params, d_opt_state
                )
                logger.info("resumed discriminator from %s", d_path)
        step_fn = jax.jit(make_gan_train_step(
            model, disc, optimizer, d_optimizer, num_frames=frames
        ))
    else:
        step_fn = jax.jit(make_train_step(
            model, optimizer, num_frames=frames, spectral=bool(spectral)
        ))

    metrics = {}
    last_saved = -1
    t0 = time.perf_counter()
    for step in range(start_step, start_step + steps):
        batch = next(batches)
        if data_sharding is not None:
            n_data = mesh.shape["data"]
            b = batch.input_ids.shape[0]
            if b % n_data:
                # caller-supplied iterators bypass the batch_size
                # rounding above; fail with guidance instead of a deep
                # GSPMD device_put error
                raise ValueError(
                    f"batch dim {b} does not divide the {n_data}-way "
                    "'data' mesh axis; yield TrainBatch with a leading "
                    f"dim that is a multiple of {n_data}"
                )
            batch = TrainBatch(*(
                jax.device_put(x, data_sharding) for x in batch
            ))
        if adversarial:
            params, d_params, opt_state, d_opt_state, metrics = step_fn(
                params, d_params, opt_state, d_opt_state, batch
            )
        else:
            params, opt_state, metrics = step_fn(params, opt_state, batch)
        if log_every and (step + 1) % log_every == 0:
            m = {k: float(v) for k, v in metrics.items()}
            logger.info(
                "step %d: loss=%.4f dur=%.4f audio=%.4f%s (%.2f s/step)",
                step + 1, m["loss"], m["dur_loss"], m["audio_loss"],
                (" d=%.4f adv=%.4f" % (m["d_loss"], m["adv_loss"])
                 if "d_loss" in m else ""),
                (time.perf_counter() - t0) / log_every,
            )
            if on_metrics is not None:
                on_metrics(step + 1, m)
            t0 = time.perf_counter()
        if (
            checkpoint_dir
            and checkpoint_every
            and (step + 1) % checkpoint_every == 0
        ):
            save_train_state(checkpoint_dir, step + 1, params, opt_state)
            if adversarial:
                save_train_state(
                    f"{checkpoint_dir}/disc", step + 1, d_params,
                    d_opt_state,
                )
            last_saved = step + 1
    if checkpoint_dir and last_saved != start_step + steps:
        save_train_state(
            checkpoint_dir, start_step + steps, params, opt_state
        )
        if adversarial:
            save_train_state(
                f"{checkpoint_dir}/disc", start_step + steps, d_params,
                d_opt_state,
            )
    return params, opt_state, {k: float(v) for k, v in metrics.items()}
