"""Device mesh + sharding helpers (the NCCL/DDP replacement).

The reference's distribution model is plain data parallelism
(/root/reference/utils.py:283-333, SURVEY.md §2b): one process per GPU,
DDP gradient all-reduce.  TPU-native equivalent: a 1-D 'data' mesh;
parameters replicated, batches sharded on 'data'; the gradient psum is
implicit in the jit-compiled train step (XLA inserts it over ICI).
Multi-host extends the same program via jax.distributed.initialize —
no per-rank code paths.

Optimizer-state (ZeRO-style) sharding over the data axis is available via
``optimizer_state_sharding`` — the DeepSpeed ZeRO-2 equivalent
(utils.py:547-594) for models where replicated Adam state matters.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension."""
    return NamedSharding(mesh, P(axis_name))


def shard_batch(mesh: Mesh, batch, axis_name: str = "data"):
    """Device-put a host batch pytree with the batch axis sharded."""
    sh = batch_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def data_parallel_setup():
    """Common CLI wiring for 1-D data parallelism.

    Returns ``(n_dev, put, replicate)``:
      n_dev     — device count (loader batches should be batch_size*n_dev)
      put(x)    — host array -> device, batch axis sharded over the mesh
                  (plain jnp.asarray on a single device)
      replicate(tree) — replicate a state pytree over the mesh (identity
                  on a single device)
    """
    import jax.numpy as jnp
    import numpy as _np

    n_dev = jax.device_count()
    if n_dev == 1:
        return 1, jnp.asarray, lambda tree: tree
    mesh = make_mesh()
    sh = batch_sharding(mesh)
    repl = replicated(mesh)
    return (n_dev,
            lambda x: jax.device_put(_np.asarray(x), sh),
            lambda tree: jax.device_put(tree, repl))


def optimizer_state_sharding(mesh: Mesh, opt_state,
                             axis_name: str = "data"):
    """ZeRO-ish sharding spec for optimizer state: shard each Adam moment
    leaf along its largest mesh-divisible axis; small/indivisible leaves
    stay replicated."""
    n = mesh.shape[axis_name]

    def spec(leaf):
        if not hasattr(leaf, "shape") or leaf.ndim == 0:
            return NamedSharding(mesh, P())
        for axis in range(leaf.ndim):
            if leaf.shape[axis] % n == 0 and leaf.shape[axis] >= n:
                parts = [None] * leaf.ndim
                parts[axis] = axis_name
                return NamedSharding(mesh, P(*parts))
        return NamedSharding(mesh, P())

    return jax.tree.map(spec, opt_state)
