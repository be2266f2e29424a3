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


def test_data_parallel_step_matches_single_device():
    """Same global batch, same params: a jit step over an 8-device data
    mesh must produce the same loss/params as the unsharded step (the
    implicit psum averages exactly like one big batch)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from simple_tad_tpu.models.vit import ViTConfig, VisionTransformer
    from simple_tad_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                              replicated)
    from simple_tad_tpu.train import losses as L
    from simple_tad_tpu.train.steps import TrainState, make_finetune_train_step
    import optax

    model = VisionTransformer(ViTConfig(
        img_size=32, all_frames=4, embed_dim=64, depth=2, num_heads=2,
        num_classes=2, attn_impl="naive", drop_rate=0.0,
        drop_path_rate=0.0, attn_drop_rate=0.0))
    params = model.init_params(jax.random.PRNGKey(0))
    tx = optax.sgd(0.1)
    crit = L.create_criterion("crossentropy", 0.0)
    step = make_finetune_train_step(model, tx, crit)

    B = 8
    k = jax.random.PRNGKey(1)
    batch = {
        "video": jax.random.normal(k, (B, 4, 32, 32, 3), jnp.float32),
        "label": jnp.arange(B, dtype=jnp.int32) % 2,
        "smoothed": (jnp.arange(B, dtype=jnp.float32) % 2)[:, None]
        * jnp.ones((B, 4)),
        "ttc": jnp.zeros((B,), jnp.float32),
    }

    # the step donates its state: build each state from its own param copy
    p1 = jax.tree.map(jnp.array, params)
    p2 = jax.tree.map(jnp.array, params)
    s0 = TrainState.create(p1, tx, jax.random.PRNGKey(2))
    s1, (m1, _) = step(s0, batch)

    mesh = make_mesh()
    sh = batch_sharding(mesh)
    s0r = jax.device_put(TrainState.create(p2, tx, jax.random.PRNGKey(2)),
                         replicated(mesh))
    sharded = {kk: jax.device_put(v, sh) for kk, v in batch.items()}
    s2, (m2, _) = step(s0r, sharded)

    assert np.isclose(float(m1["loss"]), float(m2["loss"]), atol=1e-6)
    a = jax.tree.leaves(s1.params)
    b = jax.tree.leaves(s2.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   atol=2e-6, rtol=2e-6)
