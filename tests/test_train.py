"""Losses vs torch oracles, optimizer semantics, end-to-end train steps."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from simple_tad_tpu.models.vit import ViTConfig, VisionTransformer
from simple_tad_tpu.models.mae import MAEConfig, PretrainVideoMAE
from simple_tad_tpu.train import losses as L
from simple_tad_tpu.train import optim as O
from simple_tad_tpu.train.steps import (TrainState, make_finetune_train_step,
                                        make_mae_train_step)


@pytest.fixture
def batch_np():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(32, 2)).astype(np.float32)
    labels = rng.integers(0, 2, 32)
    ttc = np.where(rng.random(32) < 0.5,
                   rng.uniform(-2, 1, 32), -100.0).astype(np.float32)
    smoothed = rng.random((32, 2)).astype(np.float32)
    smoothed /= smoothed.sum(-1, keepdims=True)
    return logits, labels, smoothed, ttc


def test_cross_entropy_matches_torch(batch_np):
    logits, labels, _, _ = batch_np
    want = F.cross_entropy(torch.tensor(logits), torch.tensor(labels)).item()
    got = float(L.cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
    assert abs(got - want) < 1e-6


def test_focal_matches_torch(batch_np):
    logits, labels, _, _ = batch_np
    ce = F.cross_entropy(torch.tensor(logits), torch.tensor(labels),
                         reduction="none")
    pt = torch.exp(-ce)
    want = (100 * 0.75 * (1 - pt) ** 6 * ce).mean().item()
    got = float(L.focal_loss(jnp.asarray(logits), jnp.asarray(labels),
                             alpha=0.75, gamma=6, multiplier=100))
    assert abs(got - want) < 1e-5


def test_focal2_matches_torch(batch_np):
    logits, labels, _, _ = batch_np
    ce = F.cross_entropy(torch.tensor(logits), torch.tensor(labels),
                         reduction="none")
    pt = torch.exp(-ce)
    at = torch.tensor([0.40, 0.60])[torch.tensor(labels)]
    want = ((1 - pt) ** 2 * (at * ce) * 10).mean().item()
    got = float(L.focal_loss2(jnp.asarray(logits), jnp.asarray(labels),
                              gamma=2, multiplier=10))
    assert abs(got - want) < 1e-5


def test_double_bce_matches_torch(batch_np):
    logits, _, smoothed, _ = batch_np
    lg, sm = torch.tensor(logits), torch.tensor(smoothed)
    want = (F.binary_cross_entropy_with_logits(lg[:, 0], sm[:, 0],
                                               reduction="none")
            + F.binary_cross_entropy_with_logits(lg[:, 1], sm[:, 1],
                                                 reduction="none")
            ).mean().item()
    got = float(L.double_bce(jnp.asarray(logits), jnp.asarray(smoothed)))
    assert abs(got - want) < 1e-6


def test_smooth_ap_matches_torch(batch_np):
    logits, labels, _, _ = batch_np
    probs = torch.softmax(torch.tensor(logits), 1)[:, 1]
    pos = probs[torch.tensor(labels) == 1]
    neg = probs[torch.tensor(labels) == 0]
    want = sum(torch.relu(neg - p + 0.01).sum() for p in pos) / max(len(pos), 1)
    got = float(L.smooth_ap(jnp.asarray(logits), jnp.asarray(labels)))
    assert abs(got - float(want)) < 1e-5


def test_temporal_exponential_matches_torch(batch_np):
    logits, labels, _, ttc = batch_np
    ce = F.cross_entropy(torch.tensor(logits), torch.tensor(labels),
                         reduction="none")
    t = torch.tensor(ttc)
    w = torch.ones_like(t)
    w[t < 0] = torch.exp(0.1 * t[t < 0])
    w[t > 0] = torch.exp(-0.5 * t[t > 0])
    w = torch.clamp(w, max=1.0)
    want = (ce * w).mean().item()
    got = float(L.temporal_exponential(jnp.asarray(logits),
                                       jnp.asarray(labels), jnp.asarray(ttc)))
    assert abs(got - want) < 1e-5


def test_cosine_scheduler_matches_reference_formula():
    import math
    sched = O.cosine_scheduler(1e-3, 1e-6, epochs=10, niter_per_ep=50,
                               warmup_epochs=2)
    assert len(sched) == 500
    np.testing.assert_allclose(sched[0], 0.0)
    np.testing.assert_allclose(sched[99], 1e-3, rtol=1e-6)  # end of warmup
    n = 400
    for i in (0, 100, 399):
        want = 1e-6 + 0.5 * (1e-3 - 1e-6) * (1 + math.cos(math.pi * i / n))
        np.testing.assert_allclose(sched[100 + i], want, rtol=1e-9)


def _tiny_vit(depth=2, gamma=False):
    cfg = ViTConfig(img_size=32, all_frames=4, embed_dim=64, depth=depth,
                    num_heads=2, num_classes=2, attn_impl="naive",
                    init_values=0.1 if gamma else 0.0, drop_path_rate=0.1)
    model = VisionTransformer(cfg)
    return model, model.init_params(jax.random.PRNGKey(0))


def test_weight_decay_mask_rules():
    model, params = _tiny_vit()
    mask = O.weight_decay_mask(params)
    assert mask["patch_embed"]["kernel"] is True
    assert mask["patch_embed"]["bias"] is False
    assert mask["blocks"]["attn"]["qkv_kernel"] is True      # (d, C, 3C)
    assert mask["blocks"]["attn"]["q_bias"] is False         # (d, C) eff 1-D
    assert mask["blocks"]["norm1"]["scale"] is False
    assert mask["head"]["kernel"] is True


def test_layer_scale_tree_values():
    model, params = _tiny_vit(depth=2)
    decay = 0.75
    scales = O.layer_scale_tree(params, decay, depth=2)
    np.testing.assert_allclose(np.asarray(scales["patch_embed"]["kernel"]),
                               decay ** 3)
    blk = np.asarray(scales["blocks"]["attn"]["qkv_kernel"]).reshape(-1)
    np.testing.assert_allclose(blk, [decay ** 2, decay ** 1])
    np.testing.assert_allclose(np.asarray(scales["head"]["kernel"]), 1.0)


def test_finetune_step_learns():
    model, params = _tiny_vit()
    sched = O.cosine_scheduler(5e-3, 1e-4, epochs=1, niter_per_ep=40)
    tx = O.create_optimizer(params, lr_schedule=O.array_schedule(sched),
                            weight_decay=0.05, layer_decay=0.75, depth=2,
                            clip_grad=5.0)
    crit = L.create_criterion("crossentropy")
    step = make_finetune_train_step(model, tx, crit, donate=False)
    state = TrainState.create(params, tx, jax.random.PRNGKey(1))

    rng = np.random.default_rng(0)
    labels = rng.integers(0, 2, 16)
    video = rng.normal(size=(16, 4, 32, 32, 3)).astype(np.float32)
    video += labels[:, None, None, None, None] * 2.0   # separable signal
    batch = {"video": jnp.asarray(video), "label": jnp.asarray(labels),
             "smoothed": jnp.zeros((16, 2)), "ttc": jnp.zeros(16)}
    losses = []
    for _ in range(25):
        state, (metrics, _) = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.5, losses
    assert int(state.step) == 25
    assert np.isfinite(losses).all()


def test_mae_step_learns():
    cfg = MAEConfig(img_size=32, all_frames=4, encoder_embed_dim=64,
                    encoder_depth=2, encoder_num_heads=2,
                    decoder_embed_dim=32, decoder_depth=1,
                    decoder_num_heads=2, attn_impl="naive")
    model = PretrainVideoMAE(cfg)
    n_patches = cfg.num_patches                      # 8
    num_masked = 6
    rng = np.random.default_rng(0)
    video = rng.normal(size=(4, 4, 32, 32, 3)).astype(np.float32)
    mask = np.zeros((4, n_patches), bool)
    for b in range(4):
        mask[b, rng.choice(n_patches, num_masked, replace=False)] = True
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(video),
                        jnp.asarray(mask), num_masked)["params"]
    tx = O.create_optimizer(params, lr_schedule=1e-3, weight_decay=0.05)
    step = make_mae_train_step(model, tx, num_masked=num_masked,
                               donate=False)
    state = TrainState.create(params, tx, jax.random.PRNGKey(1))
    batch = {"video": jnp.asarray(video), "mask": jnp.asarray(mask)}
    losses = []
    for _ in range(20):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses


def test_sharded_train_step_on_mesh():
    """Full DP train step over the 8-device CPU mesh (SURVEY.md §2b)."""
    from simple_tad_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                              replicated, shard_batch)
    model, params = _tiny_vit()
    tx = O.create_optimizer(params, lr_schedule=1e-3, weight_decay=0.05)
    crit = L.create_criterion("crossentropy")
    step = make_finetune_train_step(model, tx, crit, donate=False)
    state = TrainState.create(params, tx, jax.random.PRNGKey(1))

    mesh = make_mesh(8)
    state = jax.device_put(state, replicated(mesh))
    rng = np.random.default_rng(0)
    batch = {"video": jnp.asarray(
                 rng.normal(size=(16, 4, 32, 32, 3)).astype(np.float32)),
             "label": jnp.asarray(rng.integers(0, 2, 16)),
             "smoothed": jnp.zeros((16, 2)), "ttc": jnp.zeros(16)}
    batch = shard_batch(mesh, batch)
    state2, (metrics, _) = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    # params stay replicated after the update
    sh = jax.tree.leaves(state2.params)[0].sharding
    assert sh.is_fully_replicated
