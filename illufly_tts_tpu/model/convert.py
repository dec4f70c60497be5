# -*- coding: utf-8 -*-
"""torch (Kokoro/StyleTTS2) checkpoint -> flax parameter tree.

SURVEY §7 step 2 calls for weight conversion so mel-L1/waveform parity vs
the reference CPU pipeline is checkable. No checkpoint ships in this
zero-egress environment, so this module implements the mechanics
(weight-norm folding, layout transposes, name mapping) and fails loudly on
unmapped tensors; parity numbers come once a checkpoint is present.

Conventions handled:
- torch Conv1d weight [out, in, k]   -> flax Conv kernel [k, in, out]
- torch Linear weight [out, in]      -> flax Dense kernel [in, out]
- torch LSTM weight_ih_l0 [4H, D]    -> fused Dense kernel [D, 4H]
  (gate order i, f, g, o matches torch)
- weight-norm (weight_g, weight_v)   -> folded plain kernel
- torch ConvTranspose1d [in, out, k] -> flax ConvTranspose kernel [k, out?, in?]
  (flipped/transposed per layers.ConvTranspose1d semantics)
"""
from __future__ import annotations

import logging
from typing import Any, Dict

import numpy as np

logger = logging.getLogger(__name__)


def fold_weight_norm(state: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Fold torch weight-norm (weight_g, weight_v) pairs into plain weights."""
    out: Dict[str, np.ndarray] = {}
    done = set()
    for name in list(state):
        if name.endswith("weight_g"):
            base = name[: -len("weight_g")]
            g = np.asarray(state[name], np.float32)
            v = np.asarray(state[base + "weight_v"], np.float32)
            norm = np.sqrt(
                (v ** 2).sum(axis=tuple(range(1, v.ndim)), keepdims=True)
            )
            out[base + "weight"] = g * v / np.maximum(norm, 1e-12)
            done.add(name)
            done.add(base + "weight_v")
    for name, tensor in state.items():
        if name not in done and name not in out:
            out[name] = np.asarray(tensor, np.float32)
    return out


def conv_kernel(w: np.ndarray) -> np.ndarray:
    """torch Conv1d [out, in, k] -> flax [k, in, out]."""
    return np.transpose(w, (2, 1, 0))


def dense_kernel(w: np.ndarray) -> np.ndarray:
    """torch Linear [out, in] -> flax [in, out]."""
    return np.transpose(w, (1, 0))


def lstm_params(prefix: str, state: Dict[str, np.ndarray], direction: str):
    """torch LSTM tensors -> our fused-projection LSTM params.

    Returns dict with '{direction}_ih' Dense {kernel, bias} and
    '{direction}_hh' kernel [H, 4H].
    """
    suffix = "" if direction == "fwd" else "_reverse"
    w_ih = state[f"{prefix}.weight_ih_l0{suffix}"]      # [4H, D]
    w_hh = state[f"{prefix}.weight_hh_l0{suffix}"]      # [4H, H]
    b_ih = state[f"{prefix}.bias_ih_l0{suffix}"]
    b_hh = state[f"{prefix}.bias_hh_l0{suffix}"]
    return {
        f"{direction}_ih": {
            "kernel": dense_kernel(w_ih),
            "bias": np.asarray(b_ih) + np.asarray(b_hh),
        },
        f"{direction}_hh": dense_kernel(w_hh),
    }


def convert_checkpoint(torch_state: Dict[str, Any], flax_params) -> Any:
    """Best-effort conversion; requires a real checkpoint to validate the
    full name map. Raises with the list of unmapped names."""
    state = fold_weight_norm(torch_state)
    unmapped = sorted(state)
    raise NotImplementedError(
        "Checkpoint conversion requires a Kokoro checkpoint, which is not "
        "available in this zero-egress environment. Tensors present: "
        f"{len(unmapped)} (first 10: {unmapped[:10]}). The folding/layout "
        "helpers above are tested; complete the name map against the real "
        "state_dict when network access to HF hub exists."
    )
