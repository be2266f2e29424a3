"""Int8 inference path: quantized logits track fp32, evaluator integration."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from simple_tad_tpu.models.vit import ViTConfig, VisionTransformer
from simple_tad_tpu.ops.quant import (int8_matmul, quantize_vit_params,
                                      quantize_weight)


def test_quantize_weight_roundtrip():
    rng = np.random.default_rng(0)
    w = rng.normal(0, 0.05, (64, 128)).astype(np.float32)
    w_q, s = quantize_weight(w)
    assert w_q.dtype == np.int8 and s.shape == (128,)
    recon = w_q.astype(np.float32) * s
    assert np.abs(recon - w).max() <= s.max() * 0.51


def test_int8_matmul_close_to_fp32():
    rng = np.random.default_rng(1)
    x = rng.normal(0, 1.0, (32, 64)).astype(np.float32)
    w = rng.normal(0, 0.05, (64, 128)).astype(np.float32)
    w_q, s = quantize_weight(w)
    got = np.asarray(int8_matmul(jnp.asarray(x), jnp.asarray(w_q),
                                 jnp.asarray(s)))
    want = x @ w
    denom = np.abs(want).mean() + 1e-6
    assert np.abs(got - want).mean() / denom < 0.02


def _model(quant):
    cfg = ViTConfig(img_size=32, all_frames=4, embed_dim=64, depth=2,
                    num_heads=2, num_classes=2, attn_impl="naive",
                    quant=quant)
    return VisionTransformer(cfg)


def test_quant_model_tracks_fp32():
    fp = _model(False)
    params = fp.init_params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 4, 32, 32, 3))
    want = np.asarray(fp.apply({"params": params}, x))

    q = _model(True)
    qparams = quantize_vit_params(params)
    got = np.asarray(q.apply({"params": qparams}, x))
    # int8 w8a8: feature-level quantization noise; logits must track
    assert np.abs(got - want).max() < 0.05, np.abs(got - want).max()
    # rankings preserved
    assert (np.argmax(got, -1) == np.argmax(want, -1)).mean() >= 0.75


def test_evaluator_quant8(tmp_path):
    from simple_tad_tpu.data.frame_datasets import FrameDataset, read_dota_clips
    from simple_tad_tpu.eval.engine import FrameEvaluator
    from tests.fixtures import make_synthetic_dota
    root = str(tmp_path / "d")
    make_synthetic_dota(root, n_clips=1, frames_per_clip=24, h=48, w=64)
    model = VisionTransformer(ViTConfig(
        img_size=32, all_frames=16, embed_dim=64, depth=2, num_heads=2,
        num_classes=2, attn_impl="naive"))
    params = model.init_params(jax.random.PRNGKey(0))
    clips = read_dota_clips(root, "val_split.txt")
    ds = FrameDataset(clips, mode="test", view_len=16, target_fps=10,
                      orig_fps=10, view_step=1, crop_size=32)
    view = ds.clip_eval_views()[0]
    base = FrameEvaluator(model, params, batch_size=16,
                          dtype=jnp.float32).score_view(ds, view)
    quant = FrameEvaluator(model, params, batch_size=16, dtype=jnp.float32,
                           quant8=True).score_view(ds, view)
    assert np.abs(base - quant).max() < 0.05
