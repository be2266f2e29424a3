"""Masking, checkpointing, config, logging infra tests."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from simple_tad_tpu.config import FinetuneConfig, PretrainConfig
from simple_tad_tpu.data.masking import TubeMaskingGenerator
from simple_tad_tpu.utils import checkpoint as ckpt
from simple_tad_tpu.utils.logging import MetricLogger, SmoothedValue


class TestTubeMasking:
    def test_single_mask_properties(self):
        gen = TubeMaskingGenerator((8, 14, 14), 0.75)
        m = gen(np.random.default_rng(0))
        assert m.shape == (8 * 196,)
        assert m.sum() == 8 * int(0.75 * 196)
        # tube property: identical across temporal slots
        per = m.reshape(8, 196)
        assert (per == per[0]).all()

    def test_batch_masks(self):
        gen = TubeMaskingGenerator((8, 14, 14), 0.9)
        mb = gen.batch(16, np.random.default_rng(0))
        assert mb.shape == (16, 8 * 196)
        counts = mb.sum(1)
        assert (counts == 8 * int(0.9 * 196)).all()
        per = mb.reshape(16, 8, 196)
        assert (per == per[:, :1]).all()
        # masks differ across batch
        assert not (mb[0] == mb[1]).all()


class TestRandomMasking:
    """--mask_type random (IV2 datasets/masking_generator.py:28-49):
    one draw over ALL T*H*W patches, NOT tiled across frames."""

    def test_single_mask_properties(self):
        from simple_tad_tpu.data.masking import RandomMaskingGenerator
        gen = RandomMaskingGenerator((8, 14, 14), 0.75)
        m = gen(np.random.default_rng(0))
        assert m.shape == (8 * 196,)
        assert m.sum() == int(0.75 * 8 * 196)
        # NOT a tube: temporal slots differ (probability of 8 identical
        # 196-slot rows is astronomically small)
        per = m.reshape(8, 196)
        assert not (per == per[0]).all()

    def test_batch_masks_and_dispatch(self):
        from simple_tad_tpu.data.masking import (RandomMaskingGenerator,
                                                 make_mask_generator)
        gen = make_mask_generator("random", (8, 14, 14), 0.9)
        assert isinstance(gen, RandomMaskingGenerator)
        mb = gen.batch(16, np.random.default_rng(0))
        assert mb.shape == (16, 8 * 196)
        assert (mb.sum(1) == gen.total_masks).all()
        assert not (mb[0] == mb[1]).all()
        assert isinstance(make_mask_generator("tube", (8, 14, 14), 0.9),
                          TubeMaskingGenerator)
        with pytest.raises(ValueError):
            make_mask_generator("nope", (8, 14, 14), 0.9)


def test_checkpoint_roundtrip(tmp_path):
    from simple_tad_tpu.models.vit import ViTConfig, VisionTransformer
    from simple_tad_tpu.train import optim as O
    from simple_tad_tpu.train.steps import TrainState

    model = VisionTransformer(ViTConfig(
        img_size=32, all_frames=4, embed_dim=64, depth=1, num_heads=2,
        num_classes=2, attn_impl="naive"))
    params = model.init_params(jax.random.PRNGKey(0))
    tx = O.create_optimizer(params, lr_schedule=1e-3)
    state = TrainState.create(params, tx, jax.random.PRNGKey(1))
    state = state.replace(step=jnp.asarray(7, jnp.int32))

    out = str(tmp_path / "run")
    os.makedirs(out)
    ckpt.save_train_state(out, state, epoch=3)
    state2 = TrainState.create(params, tx, jax.random.PRNGKey(99))
    state2, start_epoch = ckpt.load_train_state(out, state2)
    assert start_epoch == 4
    assert int(state2.step) == 7
    a = jax.tree.leaves(state.params)[0]
    b = jax.tree.leaves(state2.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # weights-only + best tracker
    tracker = ckpt.BestTracker(out)
    improved = tracker.update(params, {"auroc": 0.8, "ap": 0.5})
    assert set(improved) == {"auroc", "ap"}
    assert os.path.exists(os.path.join(out, "checkpoint-bestauroc"))
    improved = tracker.update(params, {"auroc": 0.7})
    assert improved == {}
    restored = ckpt.load_weights(os.path.join(out, "checkpoint-bestauroc"),
                                 params)
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(restored)[0]), np.asarray(a))


def test_missing_checkpoint_returns_epoch0(tmp_path):
    from simple_tad_tpu.models.vit import ViTConfig, VisionTransformer
    from simple_tad_tpu.train import optim as O
    from simple_tad_tpu.train.steps import TrainState
    model = VisionTransformer(ViTConfig(
        img_size=32, all_frames=4, embed_dim=64, depth=1, num_heads=2,
        attn_impl="naive"))
    params = model.init_params(jax.random.PRNGKey(0))
    tx = O.create_optimizer(params, lr_schedule=1e-3)
    state = TrainState.create(params, tx, jax.random.PRNGKey(1))
    _, epoch = ckpt.load_train_state(str(tmp_path), state)
    assert epoch == 0


def test_config_from_args_and_save(tmp_path):
    cfg = FinetuneConfig.from_args([
        "--model", "vit_small_patch16_224", "--batch_size", "32",
        "--lr", "2e-3", "--eval", "--loss", "2bce"])
    assert cfg.model == "vit_small_patch16_224"
    assert cfg.batch_size == 32 and cfg.lr == 2e-3
    assert cfg.eval is True and cfg.loss == "2bce"
    p = tmp_path / "params.json"
    cfg.save(str(p))
    assert "vit_small_patch16_224" in p.read_text()
    pcfg = PretrainConfig.from_args(["--mask_ratio", "0.75"])
    assert pcfg.mask_ratio == 0.75


def test_config_optional_float_flags_parse_as_float():
    # None-default Optional[float] fields must not come back as strings
    cfg = FinetuneConfig.from_args([
        "--clip_grad", "5.0", "--weight_decay_end", "0.01",
        "--crop_pct", "0.875"])
    assert cfg.clip_grad == 5.0 and isinstance(cfg.clip_grad, float)
    assert cfg.weight_decay_end == 0.01
    assert cfg.crop_pct == 0.875
    assert FinetuneConfig.from_args([]).clip_grad is None
    p = PretrainConfig.from_args(["--clip_grad", "0.02"])
    assert p.clip_grad == 0.02 and isinstance(p.clip_grad, float)


def test_metric_logger_smoothing(capsys):
    ml = MetricLogger(print_freq=2)
    for i, _ in enumerate(ml.log_every(range(5), header="ep0")):
        ml.update(loss=float(i))
    out = capsys.readouterr().out
    assert "ep0 [0/5]" in out and "Total time" in out
    assert ml.epoch_stats()["loss"] == pytest.approx(2.0)


# ---- decoded-frame LRU + train-input probe (VERDICT r1 #6) ----

def test_frame_lru_bounded_and_correct():
    import numpy as np
    from simple_tad_tpu.data.zipreader import FrameLRU
    lru = FrameLRU(max_bytes=4 * 100)   # fits 4 100-byte frames
    arrs = [np.full((100,), i, np.uint8) for i in range(6)]
    for i, a in enumerate(arrs):
        lru.put(("z", i), a)
    assert lru.get(("z", 0)) is None          # evicted
    assert lru.get(("z", 5))[0] == 5          # newest retained
    # hit refreshes recency
    lru.get(("z", 2))
    lru.put(("z", 9), np.zeros((100,), np.uint8))
    assert lru.get(("z", 2)) is not None
    # oversize entries are skipped, not crashing the cache
    lru.put(("z", 10), np.zeros((1000,), np.uint8))
    assert lru.get(("z", 10)) is None


def test_decode_scaled_uses_cache(tmp_path, monkeypatch):
    import numpy as np
    from tests.fixtures import make_synthetic_dota
    from simple_tad_tpu.data import zipreader as zr
    root = make_synthetic_dota(str(tmp_path), n_clips=1, frames_per_clip=8)
    zp = f"{root}/frames/clip_000/images.zip"
    names = [f"{t:06d}.jpg" for t in range(4)]
    monkeypatch.setattr(zr, "_FRAME_CACHE", zr.FrameLRU(64 * 2 ** 20))
    a = zr.decode_scaled(zp, names, 64, 1.0)
    cache = zr.frame_cache()
    assert cache.misses == 4 and cache.hits == 0
    b = zr.decode_scaled(zp, names, 64, 1.0)
    assert cache.hits == 4
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    # different scale is a different key, not a stale hit
    c = zr.decode_scaled(zp, names, 64, 1.5)
    assert c[0].shape != a[0].shape


def test_train_input_probe_runs(tmp_path, monkeypatch, capsys):
    from tests.fixtures import make_synthetic_dota
    from simple_tad_tpu.cli.efficiency import main as eff_main
    root = make_synthetic_dota(str(tmp_path), n_clips=2,
                               frames_per_clip=30,
                               split="train_split.txt", prefix="train")
    import json as _json
    import os
    # metadata_train.json written; loader needs train split
    rows = eff_main(["--train_input", "--data_path", root,
                     "--data_set", "DoTA", "--batch_size", "4",
                     "--steps", "3", "--step_ms", "485"])
    assert len(rows) == 2
    assert rows[0]["windows_per_sec"] > 0
    assert rows[1]["cache_hit_rate"] is None or \
        rows[1]["cache_hit_rate"] >= rows[0]["cache_hit_rate"]
    assert "input_occupancy" in rows[0]


def test_efficiency_device_rows_have_memory_column():
    """The device benchmark reports the reference's peak-memory column
    (test_efficiency.py:174-194 prints peak CUDA MB per model)."""
    from simple_tad_tpu.cli.efficiency import benchmark_model
    rows = benchmark_model("vit_small_patch16_224", batches=(1,), iters=2,
                           num_frames=16, input_size=32,
                           attn_impl="naive")
    assert rows and "peak_hbm_mb" in rows[0]
    assert rows[0]["latency_ms"] > 0


def test_optimizer_menu_variants():
    """Every reference --opt menu entry builds and takes a step that
    changes the params (optim_factory.py:91-175 capability parity)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from simple_tad_tpu.train import optim as O

    params = {"w": jnp.ones((4, 4)), "bias": jnp.zeros((4,))}
    grads = {"w": jnp.full((4, 4), 0.5), "bias": jnp.full((4,), 0.1)}
    for name in ("adamw", "adam", "nadam", "sgd", "nesterov", "momentum",
                 "radam", "novograd", "rmsprop", "adadelta", "adafactor",
                 "adabelief", "lamb", "lion"):
        tx = O.create_optimizer(params, lr_schedule=1e-2, opt=name)
        state = tx.init(params)
        updates, _ = tx.update(grads, state, params)
        new = optax.apply_updates(params, updates)
        assert not np.allclose(np.asarray(new["w"]),
                               np.asarray(params["w"])), name
    import pytest
    with pytest.raises(ValueError):
        O.create_optimizer(params, lr_schedule=1e-2, opt="adahessian")
