"""Tensor-parallel parameter sharding (Megatron-style) via GSPMD.

The reference has no TP (SURVEY.md §2b) — its largest stock model is
ViT-L (304M).  The InternVideo2-1B/6B stretch configs motivate 2-4-way
model sharding; on TPU this is pure annotation: place parameters with
these PartitionSpecs over a ('data', 'model') mesh and jit the SAME train
step — XLA partitions the matmuls and inserts all-gathers/reduce-scatters
over ICI.

Scheme (column-parallel qkv/fc1, row-parallel proj/fc2; scanned leading
depth axis never sharded):
  attn qkv kernel (L, C, 3C)   -> (None, None, 'model')
  attn proj kernel (L, C, C)   -> (None, 'model', None)
  mlp fc1 kernel (L, C, H)     -> (None, None, 'model')
  mlp fc2 kernel (L, H, C)     -> (None, 'model', None)
  matching biases on the sharded output dim; everything else replicated.
GSPMD tolerates the packed-QKV boundary crossing an uneven shard split;
propagation keeps activations sharded through the attention heads.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_2d_mesh(n_devices: Optional[int] = None, model_parallel: int = 1,
                 data_axis: str = "data", model_axis: str = "model") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % model_parallel == 0, (n, model_parallel)
    grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, (data_axis, model_axis))


def _names(path) -> Tuple[str, ...]:
    return tuple(getattr(k, "key", str(k)) for k in path)


def vit_param_specs(params: Any, model_axis: str = "model") -> Any:
    """PartitionSpec pytree for the scanned-ViT / IV2 param layout."""
    def spec(path, leaf):
        names = _names(path)
        in_blocks = any(n.startswith("blocks") for n in names)
        tail = names[-1]
        parent = names[-2] if len(names) > 1 else ""
        if in_blocks:
            # column-parallel: output dim sharded
            if tail in ("qkv_kernel",) or parent in ("qkv", "fc1"):
                if tail == "bias" or tail.endswith("bias"):
                    return P(None, model_axis)
                return P(None, None, model_axis)
            if tail in ("q_bias", "v_bias"):
                return P(None, model_axis)
            # row-parallel: input dim sharded, output replicated
            if parent in ("proj", "fc2"):
                if tail == "kernel":
                    return P(None, model_axis, None)
                return P()                       # row-parallel bias
            return P()                           # norms, gammas
        return P()                               # embeddings, head, etc.
    return jax.tree_util.tree_map_with_path(spec, params)


def shard_params(mesh: Mesh, params: Any, model_axis: str = "model") -> Any:
    specs = vit_param_specs(params, model_axis)
    return jax.tree.map(
        lambda p, s: jax.device_put(p, NamedSharding(mesh, s)),
        params, specs)
