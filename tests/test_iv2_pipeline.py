"""IV2 through the shared CLIs/evaluator (fold-norm, checkpoint auto-load,
end-to-end eval)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from simple_tad_tpu.models.internvideo2 import InternVideo2, IV2Config
from simple_tad_tpu.ops.image import IMAGENET_MEAN, IMAGENET_STD
from simple_tad_tpu.utils.fold_norm import fold_normalization


def _tiny_iv2():
    cfg = IV2Config(img_size=28, patch_size=14, num_frames=16, embed_dim=64,
                    depth=1, num_heads=2, mlp_ratio=4.0,
                    attn_pool_num_heads=2, clip_embed_dim=32, num_classes=2,
                    attn_impl="naive", drop_path_rate=0.0)
    model = InternVideo2(cfg)
    return model, model.init_params(jax.random.PRNGKey(0))


def test_iv2_fold_norm_parity():
    model, params = _tiny_iv2()
    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 256, (2, 16, 28, 28, 3), dtype=np.uint8)
    x_norm = (u8.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    want = model.apply({"params": params}, jnp.asarray(x_norm))
    folded = fold_normalization(params)
    got = model.apply({"params": folded},
                      jnp.asarray(u8.astype(np.float32)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=1e-3)


def test_iv2_evaluator_end_to_end(tmp_path):
    from simple_tad_tpu.data.frame_datasets import FrameDataset, read_dota_clips
    from simple_tad_tpu.eval.engine import FrameEvaluator
    from tests.fixtures import make_synthetic_dota
    root = str(tmp_path / "d")
    make_synthetic_dota(root, n_clips=1, frames_per_clip=24, h=40, w=56)
    model, params = _tiny_iv2()
    clips = read_dota_clips(root, "val_split.txt")
    ds = FrameDataset(clips, mode="test", view_len=16, target_fps=10,
                      orig_fps=10, view_step=1, crop_size=28)
    ev = FrameEvaluator(model, params, batch_size=8, dtype=jnp.float32)
    res = ev.evaluate(ds)
    assert res.n_windows == 9
    assert np.isfinite(res.rows["logits_risk"].to_numpy()).all()


def test_iv2_checkpoint_auto_load(tmp_path):
    """Round-trip an IV2 torch-named dict through load_checkpoint_auto."""
    from simple_tad_tpu.utils.torch_convert import load_checkpoint_auto
    from tests.test_internvideo2 import make_iv2_sd

    sd = make_iv2_sd(0, 64, 1, 2, 32, frames=16, grid=2)
    path = str(tmp_path / "iv2.pth")
    torch.save({"model": {k: v for k, v in sd.items()}}, path)
    model, params = _tiny_iv2()
    loaded = load_checkpoint_auto(path, model, params)
    want = np.asarray(sd["cls_token"])
    np.testing.assert_allclose(np.asarray(loaded["cls_token"]), want,
                               atol=1e-6)
