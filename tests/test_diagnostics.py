"""Grad-norm tracer, ViViT converter, profiler utilities."""

import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from simple_tad_tpu.models.vit import ViTConfig, VisionTransformer
from simple_tad_tpu.train import losses as L
from simple_tad_tpu.train import optim as O
from simple_tad_tpu.train.steps import TrainState, make_finetune_train_step
from simple_tad_tpu.utils import torch_convert as tc
from simple_tad_tpu.utils.diagnostics import (GradNormAccumulator,
                                              device_memory_stats,
                                              grad_norm_summary)


def _tiny():
    model = VisionTransformer(ViTConfig(
        img_size=32, all_frames=4, embed_dim=64, depth=3, num_heads=2,
        num_classes=2, attn_impl="naive"))
    return model, model.init_params(jax.random.PRNGKey(0))


def test_grad_norm_summary_shapes_and_math():
    model, params = _tiny()

    def loss(p, x):
        return jnp.sum(model.apply({"params": p}, x) ** 2)

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 32, 32, 3))
    grads = jax.grad(loss)(params, x)
    s = grad_norm_summary(grads, num_heads=2)
    assert s["qkv"].shape == (3, 2, 3)      # (layers, heads, qkv)
    assert s["proj"].shape == (3,)
    assert s["fc1"].shape == (3,)
    # cross-check one entry against a direct computation
    qkv = np.asarray(grads["blocks"]["attn"]["qkv_kernel"])  # (3, 64, 192)
    q_head0 = qkv[1, :, :32]                 # layer 1, q, head 0
    np.testing.assert_allclose(np.asarray(s["qkv"])[1, 0, 0],
                               np.linalg.norm(q_head0), rtol=1e-5)
    assert float(s["patch_embed"]) > 0


def test_grad_norm_step_integration(tmp_path):
    model, params = _tiny()
    tx = O.create_optimizer(params, lr_schedule=1e-3)
    crit = L.create_criterion("crossentropy")
    step = make_finetune_train_step(model, tx, crit, grad_norm_heads=2,
                                    donate=False)
    state = TrainState.create(params, tx, jax.random.PRNGKey(1))
    batch = {"video": jnp.zeros((2, 4, 32, 32, 3)),
             "label": jnp.asarray([0, 1]),
             "smoothed": jnp.zeros((2, 2)), "ttc": jnp.zeros(2)}
    state, (metrics, _) = step(state, batch)
    assert "grad_norms" in metrics
    acc = GradNormAccumulator(str(tmp_path), num_heads=2)
    acc.update(jax.tree.map(np.asarray, metrics["grad_norms"])
               if False else
               # accumulate from the summary-producing grads directly
               jax.grad(lambda p: crit(model.apply({"params": p},
                                                   batch["video"]),
                                       batch["label"], None, None))(
                   state.params))
    path = acc.save_epoch(0)
    assert path and os.path.exists(path)
    data = np.load(path)
    assert data["qkv"].shape == (3, 2, 3) and int(data["count"]) == 1


def test_vivit_converter_roundtrip():
    """Synthetic HF-ViViT dict -> VideoMAE naming -> flax params; separate
    q/k/v attention must equal packed-qkv attention with zero k bias."""
    depth, dim, heads = 1, 64, 2
    g = torch.Generator().manual_seed(0)

    def r(*s):
        return torch.randn(*s, generator=g) * 0.05

    hf = {
        "embeddings.patch_embeddings.projection.weight": r(dim, 3, 2, 16, 16),
        "embeddings.patch_embeddings.projection.bias": r(dim),
        "embeddings.cls_token": r(1, 1, dim),
        "embeddings.position_embeddings": r(1, 16 * 4 + 1, dim),
        "layernorm.weight": 1 + r(dim),
        "layernorm.bias": r(dim),
    }
    pre = "encoder.layer.0."
    hf.update({
        f"{pre}layernorm_before.weight": 1 + r(dim),
        f"{pre}layernorm_before.bias": r(dim),
        f"{pre}attention.attention.query.weight": r(dim, dim),
        f"{pre}attention.attention.query.bias": r(dim),
        f"{pre}attention.attention.key.weight": r(dim, dim),
        f"{pre}attention.attention.key.bias": torch.zeros(dim),
        f"{pre}attention.attention.value.weight": r(dim, dim),
        f"{pre}attention.attention.value.bias": r(dim),
        f"{pre}attention.output.dense.weight": r(dim, dim),
        f"{pre}attention.output.dense.bias": r(dim),
        f"{pre}layernorm_after.weight": 1 + r(dim),
        f"{pre}layernorm_after.bias": r(dim),
        f"{pre}intermediate.dense.weight": r(4 * dim, dim),
        f"{pre}intermediate.dense.bias": r(4 * dim),
        f"{pre}output.dense.weight": r(dim, 4 * dim),
        f"{pre}output.dense.bias": r(dim),
    })
    hf_np = {k: v.numpy() for k, v in hf.items()}
    sd = tc.convert_vivit_state_dict(hf_np, depth=depth, num_temp_vivit=16,
                                     num_temp_target=8)
    assert sd["blocks.0.attn.qkv.weight"].shape == (3 * dim, dim)
    assert "blocks.0.attn.k_bias" not in sd       # dropped -> implicit zero
    assert sd["pos_embed"].shape == (1, 8 * 4, dim)   # CLS gone, T 16->8

    cfg = ViTConfig(img_size=32, all_frames=16, embed_dim=dim, depth=depth,
                    num_heads=heads, num_classes=0, attn_impl="naive",
                    use_learnable_pos_emb=True, final_reduction="fc_norm")
    model = VisionTransformer(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    loaded = tc.torch_to_vit_params(sd, depth=depth)
    params = tc.merge_params(params, loaded)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 32, 32, 3))
    out = model.apply({"params": params}, x)
    assert out.shape == (1, dim) and np.isfinite(np.asarray(out)).all()


def test_device_memory_stats():
    s = device_memory_stats()
    assert len(s) >= 1
