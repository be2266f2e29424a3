"""Freeze-layers, balanced sampling, repeated augmentation, eval plots."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from simple_tad_tpu.models.vit import ViTConfig, VisionTransformer
from simple_tad_tpu.train import losses as L
from simple_tad_tpu.train import optim as O
from simple_tad_tpu.train.engine import TrainLoader
from simple_tad_tpu.train.steps import TrainState, make_finetune_train_step


def _tiny():
    model = VisionTransformer(ViTConfig(
        img_size=32, all_frames=4, embed_dim=64, depth=3, num_heads=2,
        num_classes=2, attn_impl="naive"))
    return model, model.init_params(jax.random.PRNGKey(0))


def test_freeze_layers_zeroes_updates():
    model, params = _tiny()
    tx = O.create_optimizer(params, lr_schedule=1e-2,
                            freeze_layers="first N blocks;2",
                            depth=3)
    crit = L.create_criterion("crossentropy")
    step = make_finetune_train_step(model, tx, crit, donate=False)
    state = TrainState.create(params, tx, jax.random.PRNGKey(1))
    batch = {"video": jax.random.normal(jax.random.PRNGKey(2),
                                        (4, 4, 32, 32, 3)),
             "label": jnp.asarray([0, 1, 0, 1]),
             "smoothed": jnp.zeros((4, 2)), "ttc": jnp.zeros(4)}
    state2, _ = step(state, batch)

    before = np.asarray(params["blocks"]["attn"]["qkv_kernel"])
    after = np.asarray(state2.params["blocks"]["attn"]["qkv_kernel"])
    # first 2 blocks frozen, block 2 trains
    np.testing.assert_array_equal(before[0], after[0])
    np.testing.assert_array_equal(before[1], after[1])
    assert np.abs(before[2] - after[2]).max() > 0
    # patch embed frozen, head trains
    np.testing.assert_array_equal(
        np.asarray(params["patch_embed"]["kernel"]),
        np.asarray(state2.params["patch_embed"]["kernel"]))
    assert np.abs(np.asarray(params["head"]["kernel"])
                  - np.asarray(state2.params["head"]["kernel"])).max() > 0


@pytest.fixture(scope="module")
def frame_ds(tmp_path_factory):
    from simple_tad_tpu.data.frame_datasets import FrameDataset, read_dota_clips
    from tests.fixtures import make_synthetic_dota
    root = str(tmp_path_factory.mktemp("opt_dota"))
    make_synthetic_dota(root, n_clips=2, frames_per_clip=30, h=48, w=64)
    clips = read_dota_clips(root, "val_split.txt")
    return FrameDataset(clips, mode="train", view_len=16, target_fps=10,
                        orig_fps=10, view_step=1, crop_size=32)


def test_balanced_loader_ratio(frame_ds):
    loader = TrainLoader(frame_ds, 8, balanced_ratio=0.5, num_threads=1)
    batch = next(loader.epoch(0))
    labels = batch["label"]
    assert labels.sum() == 4        # 50% positives per batch


def test_repeated_augmentation_duplicates(frame_ds):
    loader = TrainLoader(frame_ds, 4, num_sample=2, num_threads=1)
    batch = next(loader.epoch(0))
    assert batch["video_u8"].shape[0] == 8          # 4 windows x 2 copies
    # consecutive pairs are the same decoded window
    np.testing.assert_array_equal(batch["video_u8"][0],
                                  batch["video_u8"][1])
    assert batch["label"][0] == batch["label"][1]


def test_eval_plots_written(tmp_path):
    from simple_tad_tpu.eval.metrics import binary_metrics
    from simple_tad_tpu.eval.plots import save_metric_plots
    rng = np.random.default_rng(0)
    labels = (rng.random(500) < 0.3).astype(int)
    probs = np.clip(labels * 0.4 + rng.random(500) * 0.6, 0, 1)
    m = binary_metrics(probs, labels)
    written = save_metric_plots(m, probs, labels, str(tmp_path))
    for k in ("pr", "roc", "confusion", "dist"):
        assert os.path.exists(written[k])
        assert os.path.getsize(written[k]) > 1000


def test_iv2_flat_params_in_optim_trees():
    """InternVideo2's flat patch_kernel/patch_bias and separable pos-embed
    tables must be treated as embedding-layer params (no decay for pos
    tables; embed-depth layer scale; frozen by freeze_layers)."""
    params = {
        "patch_kernel": np.zeros((48, 64), np.float32),
        "patch_bias": np.zeros((64,), np.float32),
        "pos_embed_spatial": np.zeros((1, 16, 64), np.float32),
        "pos_embed_temporal": np.zeros((1, 4, 64), np.float32),
        "pos_embed_cls": np.zeros((1, 1, 64), np.float32),
        "cls_token": np.zeros((1, 1, 64), np.float32),
        "blocks": {"attn": {"qkv": {"kernel":
                                    np.zeros((3, 64, 192), np.float32)}}},
        "head": {"kernel": np.zeros((64, 2), np.float32)},
    }
    wd = O.weight_decay_mask(params)
    assert not wd["pos_embed_spatial"]
    assert not wd["pos_embed_temporal"]
    assert not wd["pos_embed_cls"]
    assert wd["patch_kernel"]          # 2-D weight: decayed
    assert wd["head"]["kernel"]

    depth = 3
    ls = O.layer_scale_tree(params, 0.75, depth)
    embed_scale = 0.75 ** (depth + 1)
    assert np.isclose(float(ls["patch_kernel"]), embed_scale)
    assert np.isclose(float(ls["pos_embed_spatial"]), embed_scale)
    assert float(ls["head"]["kernel"]) == 1.0

    fz = O.freeze_mask_tree(params, "first N blocks;2", depth)
    assert float(fz["patch_kernel"]) == 0.0
    assert float(fz["pos_embed_temporal"]) == 0.0
    assert float(fz["head"]["kernel"]) == 1.0


def test_train_loader_propagates_worker_failure():
    """A dataset whose decode always fails must raise in the consumer
    instead of hanging on q.get() forever."""

    class BadDataset:
        labels = np.zeros(8, np.int64)

        def __len__(self):
            return 8

        def get_window_frames(self, i, **kw):
            raise RuntimeError("decode exploded")

    loader = TrainLoader(BadDataset(), batch_size=4, num_threads=2,
                         seed=0)
    with pytest.raises(IOError):
        next(loader.epoch(0))


def test_aug_seed_is_deterministic():
    """Augmentation keys derive from fold_in(PRNGKey(seed), epoch), not
    PYTHONHASHSEED-randomized hash()."""
    from simple_tad_tpu.train.engine import FinetuneTrainer
    model, params = _tiny()
    tr1 = FinetuneTrainer(model, None, None, seed=7)
    k1 = jax.random.fold_in(jax.random.PRNGKey(7), 3)
    k2 = jax.random.fold_in(jax.random.PRNGKey(7), 3)
    assert np.array_equal(np.asarray(k1), np.asarray(k2))
    assert tr1.seed == 7


def test_zero_stage_shards_opt_state_and_trains():
    """--zero_stage: Adam moments sharded over the data mesh, and the
    sharded step still reproduces the replicated step's result."""
    from simple_tad_tpu.parallel.mesh import make_mesh
    from simple_tad_tpu.train.engine import FinetuneTrainer
    from simple_tad_tpu.train.steps import make_finetune_train_step
    import optax

    model, params = _tiny()
    tx = optax.adamw(1e-3)
    crit = L.create_criterion("crossentropy", 0.0)
    step = make_finetune_train_step(model, tx, crit)
    state = TrainState.create(params, tx, jax.random.PRNGKey(0))
    mesh = make_mesh()
    tr = FinetuneTrainer(model, step, state, seed=0, mesh=mesh,
                         zero_stage=2)
    # at least one Adam moment leaf actually sharded over 'data'
    from jax.sharding import PartitionSpec
    specs = [x.sharding.spec for x in jax.tree.leaves(tr.state.opt_state)
             if hasattr(x, "sharding") and hasattr(x.sharding, "spec")]
    assert any("data" in str(s) for s in specs), specs

    B = 8
    batch = {
        "video": tr._put(np.random.default_rng(0).standard_normal(
            (B, 4, 32, 32, 3)).astype(np.float32)),
        "label": tr._put(np.arange(B, dtype=np.int32) % 2),
        "smoothed": tr._put(np.tile((np.arange(B) % 2)[:, None],
                                    (1, 4)).astype(np.float32)),
        "ttc": tr._put(np.zeros(B, np.float32)),
    }
    new_state, (metrics, _) = tr.train_step(tr.state, batch)
    assert np.isfinite(float(metrics["loss"]))
    # moments remain sharded after the step (jit preserved the layout)
    specs2 = [x.sharding.spec for x in jax.tree.leaves(new_state.opt_state)
              if hasattr(x, "sharding") and hasattr(x.sharding, "spec")]
    assert any("data" in str(s) for s in specs2), specs2


def test_remat_policy_grads_match_no_remat():
    """Gradient checkpointing (with the attention-saving policy active,
    models/layers.py:remat_policy) is numerically a no-op: grads match the
    plain backward.  On CPU the flash kernel is not in the dispatch, so
    this gates the nn.remat(policy=...) wiring; the named-residual DCE is
    validated on hardware (docs/TRAIN.md A/B)."""
    video = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 4, 32, 32, 3)).astype(np.float32))

    def grads(remat):
        model = VisionTransformer(ViTConfig(
            img_size=32, all_frames=4, embed_dim=64, depth=3, num_heads=2,
            num_classes=2, attn_impl="naive", remat=remat))
        params = model.init(jax.random.PRNGKey(0), video)["params"]

        def f(p):
            return jnp.sum(model.apply({"params": p}, video,
                                       deterministic=True) ** 2)
        return params, jax.grad(f)(params)

    p0, g_plain = grads(False)
    p1, g_remat = grads(True)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, atol=1e-5),
                 p0, p1)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, atol=1e-4),
                 g_plain, g_remat)


def test_remat_policy_env_gate(monkeypatch):
    from simple_tad_tpu.models.layers import remat_policy
    monkeypatch.setenv("SIMPLE_TAD_REMAT_SAVE_ATTN", "0")
    assert remat_policy() is None
    monkeypatch.delenv("SIMPLE_TAD_REMAT_SAVE_ATTN")
    assert remat_policy() is not None


def test_remat_policy_saves_flash_residuals(monkeypatch, capsys):
    """The attention kernel's (out, lse) are SAVED under the remat policy
    (refwd kernel call DCE'd) — asserted by tracing saved_residuals with
    the packed flash path forced (abstract eval only; no kernel runs).
    Measured on v5e: ViT-B batch-24 full step 341.7 -> 336.0 ms."""
    monkeypatch.setenv("SIMPLE_TAD_FORCE_PACKED_ATTN", "1")
    model = VisionTransformer(ViTConfig(
        num_classes=2, dtype=jnp.bfloat16, remat=True))
    video = jnp.zeros((2, 16, 224, 224, 3), jnp.bfloat16)
    params = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), video))["params"]
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), params)

    def f(p):
        out = model.apply({"params": p}, video, deterministic=True)
        return jnp.sum(out.astype(jnp.float32))

    from jax.ad_checkpoint import print_saved_residuals
    print_saved_residuals(f, params)
    text = capsys.readouterr().out
    # the stacked (depth-major) kernel outputs appear as saved scan
    # outputs.  Packed training layout (round 4, the default): out
    # bf16[12, 2, 1568, 768] and lse f32[12, 2, 6, 1568, 2]
    # (B, ng, Np, heads-per-group).  SIMPLE_TAD_ATTN_TRAIN_PACKED=0
    # reverts to the BH layout: out bf16[12,24,1568,64], lse
    # f32[12,24,1568].
    assert "bf16[12,2,1568,768]" in text, text
    assert "f32[12,2,6,1568,2]" in text, text
