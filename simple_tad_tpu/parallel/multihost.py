"""Multi-host SPMD helpers (the torchrun/Slurm rank-discovery replacement).

Behavioral reference: init_distributed_mode (/root/reference/utils.py:283-333)
discovers ranks from env/Slurm and wires NCCL; the TPU-native model is one
jax program per host over a global mesh — same compiled step at every
scale (SURVEY.md §5h).

Usage on each host of a slice:
    from simple_tad_tpu.parallel import multihost
    multihost.initialize()                     # no-op on single host
    mesh = make_mesh()                         # global devices
    batch = multihost.host_local_batch_to_global(mesh, local_batch)
Metric gathering uses process_allgather; string ids stay host-local and
per-host CSV shards merge on process 0 (the reference's
all_gather_object pattern re-done without pickled objects).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """jax.distributed.initialize from explicit args or env
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, with
    Slurm auto-detection built into jax).  Returns True if a multi-process
    runtime was started; False for single-host."""
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        env = os.environ.get("JAX_NUM_PROCESSES") or os.environ.get(
            "SLURM_NTASKS")
        num_processes = int(env) if env else None
    if process_id is None:
        env = os.environ.get("JAX_PROCESS_ID") or os.environ.get(
            "SLURM_PROCID")
        process_id = int(env) if env else None
    if not coordinator_address and (num_processes or 1) <= 1:
        return False
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def is_main_process() -> bool:
    return jax.process_index() == 0


def host_local_batch_to_global(mesh: Mesh, batch: Any,
                               axis_name: str = "data") -> Any:
    """Assemble per-host batch shards into global arrays sharded on the
    data axis (the DistributedSampler replacement: each host loads only
    its slice; jax stitches the global view)."""
    sharding = NamedSharding(mesh, P(axis_name))

    def make(x):
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))
    return jax.tree.map(make, batch)


def allgather_metrics(tree: Any) -> Any:
    """Numeric metric gather across hosts (all_gather_object equivalent
    for arrays; keep strings host-local and merge CSV shards instead)."""
    if jax.process_count() == 1:
        return jax.tree.map(np.asarray, tree)
    from jax.experimental.multihost_utils import process_allgather
    return process_allgather(tree)


def allgather_ragged_1d(tree: Any) -> Any:
    """Gather per-host 1-D arrays of UNEQUAL length (the reference's
    padded all_gather, utils.py:759-789): each leaf pads to the global
    max length, gathers, and concatenates only the valid prefixes.
    Single-process: returns the arrays unchanged."""
    if jax.process_count() == 1:
        return jax.tree.map(np.asarray, tree)
    from jax.experimental.multihost_utils import process_allgather

    def leaf_len(x):
        return np.asarray(x).shape[0]

    lens = process_allgather(
        jax.tree.map(lambda x: np.asarray(leaf_len(x), np.int32), tree))

    def gather(x, ln):
        x = np.asarray(x)
        n_max = int(np.max(ln))
        pad = np.zeros((n_max - x.shape[0],) + x.shape[1:], x.dtype)
        stacked = process_allgather(np.concatenate([x, pad]))
        return np.concatenate([stacked[r][:int(ln[r])]
                               for r in range(stacked.shape[0])])

    return jax.tree.map(gather, tree, lens)


def merge_csv_shards(output_dir: str, basename: str, n_shards: int,
                     out_name: Optional[str] = None) -> Optional[str]:
    """Merge per-host '<basename>.<rank>.csv' shards on process 0
    (the reference merge() pattern, engine_for_frame_finetuning.py:548)."""
    if not is_main_process():
        return None
    import pandas as pd
    parts = []
    for r in range(n_shards):
        path = os.path.join(output_dir, f"{basename}.{r}.csv")
        if os.path.exists(path):
            parts.append(pd.read_csv(path))
    if not parts:
        return None
    out = os.path.join(output_dir, out_name or f"{basename}.csv")
    pd.concat(parts, ignore_index=True).to_csv(out, index=False)
    return out
