"""Folded-normalization parity: raw-pixel model == normalize + model."""

import numpy as np

import jax
import jax.numpy as jnp

from simple_tad_tpu.models.vit import ViTConfig, VisionTransformer
from simple_tad_tpu.ops.image import IMAGENET_MEAN, IMAGENET_STD
from simple_tad_tpu.utils.fold_norm import fold_normalization


def test_folded_matches_normalized():
    cfg = ViTConfig(img_size=32, all_frames=4, embed_dim=64, depth=2,
                    num_heads=2, num_classes=2, attn_impl="naive")
    model = VisionTransformer(cfg)
    params = model.init_params(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 256, (2, 4, 32, 32, 3), dtype=np.uint8)
    x_norm = (u8.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD

    want = model.apply({"params": params}, jnp.asarray(x_norm))
    folded = fold_normalization(params)
    got = model.apply({"params": folded},
                      jnp.asarray(u8.astype(np.float32)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=1e-4)


def test_evaluator_fold_matches_unfolded():
    from simple_tad_tpu.data.frame_datasets import FrameDataset, read_dota_clips
    from simple_tad_tpu.eval.engine import FrameEvaluator
    from tests.fixtures import make_synthetic_dota
    import tempfile

    with tempfile.TemporaryDirectory() as root:
        make_synthetic_dota(root, n_clips=1, frames_per_clip=24, h=48, w=64)
        cfg = ViTConfig(img_size=32, all_frames=16, embed_dim=64, depth=1,
                        num_heads=2, num_classes=2, attn_impl="naive")
        model = VisionTransformer(cfg)
        params = model.init_params(jax.random.PRNGKey(0))
        clips = read_dota_clips(root, "val_split.txt")
        ds = FrameDataset(clips, mode="test", view_len=16, target_fps=10,
                          orig_fps=10, view_step=1, crop_size=32)
        view = ds.clip_eval_views()[0]
        a = FrameEvaluator(model, params, batch_size=16, dtype=jnp.float32,
                           fold_norm=True).score_view(ds, view)
        b = FrameEvaluator(model, params, batch_size=16, dtype=jnp.float32,
                           fold_norm=False).score_view(ds, view)
        np.testing.assert_allclose(a, b, atol=1e-3, rtol=1e-3)
