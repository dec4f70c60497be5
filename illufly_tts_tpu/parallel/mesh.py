# -*- coding: utf-8 -*-
"""Device mesh + sharding rules.

The reference is strictly single-device (SURVEY §2 parallelism audit:
no distributed code at all). TPU-native design per SURVEY's mapping table:
- batch (data) parallelism over the 'data' mesh axis — the honest design
  point for an 82M-parameter TTS model served at high batch;
- optional tensor parallelism over 'model' for wide matmuls (ALBERT FFN,
  decoder channels), demonstrated via GSPMD: we annotate parameter
  shardings and let XLA insert all-gather/reduce-scatter over ICI.
"""
from __future__ import annotations

import re
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None, n_model: int = 1, devices=None
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    total = len(devices)
    if n_data is None:
        n_data = total // n_model
    assert n_data * n_model <= total, (n_data, n_model, total)
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, ("data", "model"))


# parameter-name patterns that carry the tensor-parallel (last-dim) shard
_TP_PATTERNS = [
    r"ffn_in", r"ffn_out", r"qkv", r"attn_out",          # ALBERT
    r"bert_encoder",                                     # 768 -> 512
    r"duration_proj",
    r"conv1$", r"conv2$", r"conv1x1", r"encode", r"decode_\d+",
    r"up_\d+", r"res_\d+_\d+", r"noise_conv", r"noise_res",
]


def param_spec(path: str, shape) -> P:
    """Partition rule for one parameter (path = '/'-joined names)."""
    if len(shape) == 0:
        return P()
    last = shape[-1]
    if last < 128 or last % 2 != 0:
        return P()
    if any(re.search(pat, path) for pat in _TP_PATTERNS):
        return P(*([None] * (len(shape) - 1) + ["model"]))
    return P()


def shard_params(params, mesh: Mesh):
    """Place a parameter tree on the mesh according to ``param_spec``."""

    def place(path, leaf):
        name = "/".join(str(p.key) for p in path if hasattr(p, "key"))
        spec = param_spec(name, leaf.shape)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def param_shardings(params, mesh: Mesh):
    """Sharding tree (for jit in_shardings) matching ``shard_params``."""

    def spec_of(path, leaf):
        name = "/".join(str(p.key) for p in path if hasattr(p, "key"))
        return NamedSharding(mesh, param_spec(name, leaf.shape))

    return jax.tree_util.tree_map_with_path(spec_of, params)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch dim over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
