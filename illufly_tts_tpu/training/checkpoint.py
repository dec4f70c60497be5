# -*- coding: utf-8 -*-
"""Checkpoint/resume for training state (params + optimizer + step).

The reference is inference-only (SURVEY §5: checkpoints are HF-hub weights
and voice packs; task state dies with the process). For the trainable TPU
framework this adds orbax-backed save/restore; inference params use the
lighter flax-bytes path (engine/synthesizer.py::save_params)."""
from __future__ import annotations

import logging
import os
from typing import Any, Optional, Tuple

logger = logging.getLogger(__name__)


def save_train_state(
    directory: str, step: int, params: Any, opt_state: Any
) -> str:
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(directory, f"step_{step:08d}"))
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(
            path, {"params": params, "opt_state": opt_state, "step": step}
        )
    logger.info("saved train state at step %d -> %s", step, path)
    return path


def latest_checkpoint(directory: str) -> Optional[str]:
    if not os.path.isdir(directory):
        return None
    steps = sorted(
        d for d in os.listdir(directory) if d.startswith("step_")
    )
    return os.path.join(directory, steps[-1]) if steps else None


def restore_train_state(
    path: str, params_template: Any, opt_state_template: Any
) -> Tuple[Any, Any, int]:
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(
            os.path.abspath(path),
            item={
                "params": params_template,
                "opt_state": opt_state_template,
                "step": 0,
            },
        )
    return restored["params"], restored["opt_state"], int(restored["step"])
