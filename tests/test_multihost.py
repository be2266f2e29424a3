"""Multi-host helpers degenerate correctly on a single process."""

import os

import numpy as np

import jax
import jax.numpy as jnp

from simple_tad_tpu.parallel.mesh import make_mesh
from simple_tad_tpu.parallel import multihost


def test_initialize_noop_single_host(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("SLURM_NTASKS", raising=False)
    assert multihost.initialize() is False
    assert multihost.is_main_process()


def test_host_local_batch_to_global():
    mesh = make_mesh(8)
    batch = {"x": np.arange(16, dtype=np.float32).reshape(16, 1),
             "y": np.arange(16, dtype=np.int32)}
    g = multihost.host_local_batch_to_global(mesh, batch)
    assert g["x"].shape == (16, 1)
    # sharded over the data axis
    assert not g["x"].sharding.is_fully_replicated
    np.testing.assert_array_equal(np.asarray(g["y"]), batch["y"])


def test_allgather_metrics_single_process():
    out = multihost.allgather_metrics({"a": jnp.asarray([1.0, 2.0])})
    np.testing.assert_array_equal(out["a"], [1.0, 2.0])


def test_merge_csv_shards(tmp_path):
    import pandas as pd
    for r in range(3):
        pd.DataFrame({"v": [r]}).to_csv(
            tmp_path / f"predictions.{r}.csv", index=False)
    out = multihost.merge_csv_shards(str(tmp_path), "predictions", 3)
    df = pd.read_csv(out)
    assert sorted(df["v"].tolist()) == [0, 1, 2]
